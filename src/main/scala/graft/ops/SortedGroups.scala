package graft.ops

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Grouped-ordered processing: the general form of the secondary-sort
  * pattern the merge-scan as-of join uses — co-partition by key,
  * sort WITHIN partitions by (key, order), and stream each partition
  * through sequential per-partition logic.
  *
  * This is the disciplined escape hatch when per-key logic is
  * genuinely imperative (merge scans, legacy state machines, format
  * encoders): exactly ONE shuffle, no per-key groupBy materialization
  * (an iterator, never a collected Seq — a hot key streams instead of
  * OOMing), and the callback sees rows of a key contiguously and in
  * order. Prefer windows/aggregates when they can express the
  * semantics; they stay in codegen and this does not.
  */
object SortedGroups {

  /** Repartition `ds` by `keys`, sort within partitions by `keys ++
    * order`, and map each partition's row iterator through `f`. The
    * iterator is lazy — `f` must consume it strictly forward (standard
    * mapPartitions contract). Partition count stays explicit at the
    * session default parallelism: these pipelines are CPU-heavy, and
    * AQE would otherwise coalesce small-byte stages onto one core.
    */
  def processOrdered[T, O: Encoder](
      ds: Dataset[T], keys: Seq[Column], order: Seq[Column])(
      f: Iterator[T] => Iterator[O]): Dataset[O] = {
    val parallelism = ds.sparkSession.sparkContext.defaultParallelism
    ds.repartition(parallelism, keys: _*)
      .sortWithinPartitions(keys ++ order: _*)
      .mapPartitions(f)
  }
}
