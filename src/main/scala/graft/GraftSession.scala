package graft

import org.apache.spark.sql.SparkSession

/** User entry point: a SparkSession wired for this engine — the graft
  * SQL extensions (native `vector_dot` / `minhash_sig` / `simhash32`
  * expressions and the TopKPerKey planner strategy) plus the
  * configuration the operators assume (UTC session time,
  * nanosecond-parquet handling for `events`-style tables, shuffle
  * parallelism sized to cores rather than the 200 default).
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
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
