package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch as a custom distributed
  * `Aggregator` — the "novel sketch" slot of the engine's operator
  * brief: a mergeable, bounded-state estimator whose reduce/merge
  * split gives map-side partial aggregation for free (each partition
  * keeps its own k smallest hashes; merging two sketches is a k-way
  * min-merge), so the shuffle carries at most k longs per group no
  * matter how many rows feed it.
  *
  * Estimator: with hashes uniform on [0, 2^32), the k-th smallest
  * distinct hash h_k estimates density k/n, giving
  * n̂ = (k−1)·2^32 / h_k (the classic KMV/bottom-k estimator,
  * Bar-Yossef et al.); below k distinct hashes the sketch IS the
  * exact distinct set.
  *
  * Everything here is DETERMINISTIC cross-engine: the input hash is
  * the engine's md5-prefix hash (bit-identical in DuckDB), min-k of
  * a set has one answer, and the estimate is a single IEEE division
  * of exact integers — so unlike HLL, the ESTIMATE itself
  * hash-matches the oracle, not just an error envelope.
  */
object KmvSketch extends Aggregator[Long, Seq[Long], Double] {

  val k = 64
  private val HashSpace = 4294967296.0 // 2^32

  override def zero: Seq[Long] = Vector.empty

  /** Insert one hash: dedup, keep the k smallest, stay sorted. */
  override def reduce(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.nonEmpty && b.length >= k && h >= b.last) b
    else {
      val i = searchInsert(b, h)
      if (i < 0) b // already present
      else {
        val grown = (b.take(i) :+ h) ++ b.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }
  }

  /** Binary search: insertion index, or -1 if the value is present. */
  private def searchInsert(b: Seq[Long], h: Long): Int = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = b(mid)
      if (v == h) return -1
      else if (v < h) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    y.foldLeft(x)(reduce)

  override def finish(r: Seq[Long]): Double =
    if (r.length < k) r.length.toDouble
    else (k - 1).toDouble * HashSpace / r.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form over a hash column (use `Text.tokenHash` to build it). */
  def estimate(hashCol: Column): Column = udaf(KmvSketch).apply(hashCol)
}

/** The same KMV sketch, finishing to the sketch ITSELF (the sorted
  * bottom-k hash array) instead of the estimate — the composable form:
  * two groups' sketches union into the union-set's sketch with plain
  * array expressions (`slice(array_sort(array_union(a, b)), 1, k)`),
  * which is what powers set-OVERLAP estimation between groups without
  * rescanning either group's rows.
  */
object KmvSketchState extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = KmvSketch.zero
  override def reduce(b: Seq[Long], h: Long): Seq[Long] = KmvSketch.reduce(b, h)
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = KmvSketch.merge(x, y)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form: the sketch array for downstream set algebra. */
  def sketch(hashCol: Column): Column = udaf(KmvSketchState).apply(hashCol)
}
