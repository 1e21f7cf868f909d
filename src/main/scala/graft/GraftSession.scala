package graft

import org.apache.spark.sql.SparkSession

/** User entry point: a SparkSession wired for this engine — the graft
  * SQL extensions (native `vector_dot` / `minhash_sig` / `simhash32`
  * expressions and the TopKPerKey planner strategy) plus the
  * configuration the operators assume (UTC session time,
  * nanosecond-parquet handling for `events`-style tables, shuffle
  * parallelism sized to cores rather than the 200 default, and the
  * byte-verified stored-ANN serving settings below).
  *
  * ```scala
  * val spark = GraftSession.builder(master = "local[8]").getOrCreate()
  * // cluster deployments: point the checkpoint dir at durable storage
  * // so the iterative operators (connected components, label
  * // propagation, k-means) checkpoint RELIABLY — an executor loss then
  * // replays one round, not the whole loop (Graph.iterCheckpoint)
  * spark.sparkContext.setCheckpointDir("hdfs:///checkpoints/graft")
  * Tables.registerViews(spark, "/data/sf0.01")
  * spark.sql("SELECT vector_dot(embedding, embedding) FROM embeddings")
  * ```
  *
  * Serving-path notes (measured in `graft.WeakScale`, recorded in
  * BENCH_NOTES.md):
  *  - runtime bloom-filter injection is DISABLED: on the stored-ANN
  *    probe the injected filter re-scans the already-cell-pruned
  *    vector table once per probe to "reduce" a heap-bounded shortlist
  *    of a few hundred rows — byte-measured pure overhead (2.41 →
  *    1.19 MB per ×8 probe with it off). Sessions that never serve
  *    stored indexes may re-enable it after `builder(...)`.
  *  - dynamic partition pruning stays ON, but note its
  *    `reuseBroadcastOnly` default: a DPP subquery that cannot reuse a
  *    broadcast is dropped at planning, so a plan can LOOK pruned while
  *    reading the full table. The stored-index probes therefore push
  *    their probed-partition sets as STATIC IN-lists and do not depend
  *    on DPP being byte-effective.
  */
object GraftSession {

  /** The exact configuration [[builder]] applies — exposed so
    * deployments embedding the library into an existing session
    * builder (and the specs) can apply/assert the same settings.
    */
  def configs(shufflePartitions: Int): Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")

  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    configs(parts).foldLeft(SparkSession.builder().master(master)) {
      case (b, (k, v)) => b.config(k, v)
    }
  }
}
