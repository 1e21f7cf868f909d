package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit, engine-portable form of the
  * runtime filter Spark's optimizer injects for selective joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`).
  *
  * At 100 TB the dominant cost of `fact ⋈ dim` with a selective dim
  * predicate is shuffling fact rows that can never match. The fix is a
  * semi-join reduction: build a tiny bit-set over the dim keys, ship it
  * to every fact partition, and drop non-candidate rows BEFORE the
  * join's exchange. This module builds that bit-set as a plain
  * aggregation (32-bit lanes via `bit_or`, m=1024 bits, k=3 md5-seeded
  * hash functions), so:
  *
  *  - construction is one distributed pass with map-side partial
  *    `bit_or` (lane count is fixed — the shuffle carries ≤32 rows per
  *    partition regardless of dim size);
  *  - the finished filter is ONE row (an `array<bigint>`), broadcast to
  *    the probe side as a ~256-byte payload — no driver `collect()`;
  *  - membership tests are pure codegen'd bit arithmetic per fact row;
  *  - every hash is md5-derived (bit-identical across engines), so the
  *    filter's exact contents — including its false positives — are
  *    DuckDB-oracle-checkable, unlike the builtin murmur-based
  *    `bloom_filter_agg`.
  *
  * No false negatives by construction: a true member sets exactly the
  * bits it later tests (`BloomSpec` asserts the property).
  */
object Bloom {

  /** Same >2^32 prime as the MinHash family (universal hashing mod). */
  val P: Long = Dedup.P

  /** Filter width in bits: 32 lanes × 32 bits each (lanes are 32-bit so
    * the `1 << bit` never reaches the sign bit — DuckDB's checked shift
    * rejects `1::BIGINT << 63`). For the fixture dims (hundreds of keys)
    * this gives a low single-digit false-positive rate with k=3; at
    * scale, m grows with the key count (m ≈ 10·n bits for ~1% FP) and
    * stays broadcast-cheap up to millions of keys.
    */
  val numBits: Int = 1024
  val bitsPerLane: Int = 32
  val numLanes: Int = numBits / bitsPerLane

  /** k=3 fixed (a, b) universal-hash constants (a < 2^30 keeps a·v+b in
    * signed-64 range for v < 2^32).
    */
  val bloomAB: Seq[(Long, Long)] = Seq(
    (387420489L, 1000000007L),
    (536870909L, 777767777L),
    (715827883L, 899809343L))

  /** Portable 32-bit key hash (md5 prefix — see [[Text.tokenHash]]). */
  private def keyHash(key: Column): Column = Text.tokenHash(key.cast("string"))

  /** The k bit positions for a hashed key value `v`. */
  private def positions(v: Column): Seq[Column] =
    bloomAB.map { case (a, b) => ((lit(a) * v + lit(b)) % P) % numBits }

  /** Build the filter over `dim`'s key column: ONE row with a
    * `bits: array<bigint>` column of [[numLanes]] lanes (lane j holds
    * bits [64j, 64j+64)). Two-phase `bit_or` aggregation — the shuffle
    * after partial agg carries at most [[numLanes]] rows per partition.
    */
  def buildFilter(dim: DataFrame, key: Column): DataFrame = {
    val hs = dim.select(keyHash(key).as("v")).distinct()
      .select(explode(array(positions(col("v")): _*)).as("h"))
    val laneBits = hs
      .groupBy(expr(s"CAST(h DIV $bitsPerLane AS INT)").as("lane"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(h % $bitsPerLane AS INT)))").as("bits"))
    // assemble the fixed-width lane array (absent lanes → 0); the map is
    // keyed, so collect_list's partition order can't affect the result
    laneBits
      .agg(map_from_entries(collect_list(struct(col("lane"), col("bits")))).as("mp"))
      .select(transform(sequence(lit(0), lit(numLanes - 1)),
        i => coalesce(element_at(col("mp"), i), lit(0L))).as("bits"))
  }

  /** `fact` with a `pass_bloom` column: true iff the key MIGHT be in the
    * filter (all k bits set). The one-row filter arrives by broadcast;
    * the tests are codegen'd bit arithmetic — no shuffle of `fact`.
    */
  def withMembership(fact: DataFrame, factKey: Column, filter: DataFrame): DataFrame = {
    var df = fact.crossJoin(broadcast(filter))
      .withColumn("bloom_v", keyHash(factKey))
    positions(col("bloom_v")).zipWithIndex.foreach { case (h, i) =>
      df = df.withColumn(s"bloom_h$i", h)
        .withColumn(s"bloom_hit$i", expr(
          s"(element_at(bits, CAST(bloom_h$i DIV $bitsPerLane AS INT) + 1) & " +
            s"shiftleft(CAST(1 AS BIGINT), CAST(bloom_h$i % $bitsPerLane AS INT))) <> 0"))
    }
    df.withColumn("pass_bloom",
        bloomAB.indices.map(i => col(s"bloom_hit$i")).reduce(_ && _))
      .drop((Seq("bits", "bloom_v") ++
        bloomAB.indices.flatMap(i => Seq(s"bloom_h$i", s"bloom_hit$i"))): _*)
  }

  /** The usable operator: `fact` reduced to bloom-candidate rows for
    * `dim`'s key set — what you run BEFORE the real join so the join's
    * shuffle only carries candidates.
    */
  def pruneForJoin(fact: DataFrame, factKey: Column,
                   dim: DataFrame, dimKey: Column): DataFrame =
    withMembership(fact, factKey, buildFilter(dim, dimKey))
      .filter(col("pass_bloom")).drop("pass_bloom")

  /** Filter-effectiveness accounting over the probe side: row count,
    * bloom-pass count, true-member count (exact semi join twin), and
    * false positives — one deterministic row, the registry/oracle
    * surface for the whole family.
    */
  def pruneStats(fact: DataFrame, factKey: Column,
                 dim: DataFrame, dimKey: Column): DataFrame = {
    val probed = withMembership(fact, factKey, buildFilter(dim, dimKey))
    val truth = dim.select(dimKey.as("bloom_mk")).distinct()
    probed.join(truth, factKey === col("bloom_mk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("pass_bloom"), 1)).as("n_pass_bloom"),
        count(when(col("bloom_mk").isNotNull, 1)).as("n_members"),
        count(when(col("pass_bloom") && col("bloom_mk").isNull, 1)).as("n_false_pos"))
  }
}
