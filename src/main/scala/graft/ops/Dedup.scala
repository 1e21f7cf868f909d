package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the LLM-pipeline dedup
  * family (BASELINE.json north star): exact (hash), MinHash+LSH banding,
  * SimHash, and bucketed exact n-gram Jaccard.
  *
  * Scale design:
  *  - exact dedup is one shuffle on the content hash (no skew: hashes
  *    are uniform);
  *  - MinHash/LSH is the 100 TB near-dup path: signatures are computed
  *    array-natively per document (no explode of shingle rows), the
  *    self-join runs on tiny band buckets instead of all pairs —
  *    O(n·candidates), never O(n²);
  *  - the bucketed exact-Jaccard operator bounds the pair space by
  *    (lang, length-band) blocking — the classic blocking fallback when
  *    candidate recall must be exact within a block;
  *  - every hash is md5-derived (bit-identical across engines), so the
  *    whole family is DuckDB-oracle-checkable.
  */
object Dedup {

  /** Mersenne-ish prime > 2^32 for minhash universal hashing. */
  val P: Long = 4294967311L

  /** 16 fixed (a, b) universal-hash constants; a < 2^30 keeps a·v+b
    * within signed-64 range for v < 2^32.
    */
  val minhashAB: Seq[(Long, Long)] = Seq(
    (387420489L, 1000000007L), (268435399L, 998244353L),
    (536870909L, 777767777L), (479001599L, 123456791L),
    (715827883L, 899809343L), (999999937L, 433494437L),
    (86028121L, 370248451L), (104395301L, 54018521L),
    (122949823L, 982451653L), (141650939L, 275604541L),
    (160481183L, 715225739L), (179424673L, 472882027L),
    (198491317L, 613651349L), (217645177L, 236887691L),
    (236887691L, 198491317L), (256203161L, 15485863L))

  val numBands = 4
  val rowsPerBand = 4

  /** w-token shingles (w=3), deduplicated — the unit set for Jaccard. */
  def shingleSet(text: Column, w: Int = 3): Column = {
    val t = Text.tokens(text)
    val grams = when(size(t) >= w,
        transform(sequence(lit(1), size(t) - (w - 1)),
          i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** Exact dedup: keep the lowest doc_id per identical text (md5 key —
    * grouping by a 16-byte hash, not the full text, is what makes the
    * shuffle payload small at 100 TB).
    */
  def exactDedup(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    documents
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Exact-duplicate group statistics (empty when the corpus is clean). */
  def exactDupStats(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"),
           min(col("doc_id")).as("keep_doc_id"),
           max(col("doc_id")).as("max_doc_id"))
      .filter(col("n_copies") > 1)
      .orderBy(col("text_hash"))

  /** MinHash signature columns sig_0..sig_15 (array-native, one pass). */
  def withMinhashSignature(documents: DataFrame, w: Int = 3): DataFrame = {
    val base = documents
      .withColumn("ss", shingleSet(col("text"), w))
      .filter(size(col("ss")) > 0)
      .withColumn("vs", transform(col("ss"), s => Text.tokenHash(s)))
    minhashAB.zipWithIndex.foldLeft(base) { case (df, ((a, b), i)) =>
      df.withColumn(s"sig_$i",
        array_min(transform(col("vs"), v => (lit(a) * v + lit(b)) % P)))
    }
  }

  /** LSH near-dup candidates + exact Jaccard verification.
    * Pipeline: signature → band keys → explode(bands) → self-join on
    * (band_idx, key) → distinct pairs → exact shingle-set Jaccard.
    */
  def minhashNearDups(documents: DataFrame, w: Int = 3,
                      threshold: Double = 0.8): DataFrame = {
    val sigs = withMinhashSignature(documents, w)
    val bandKeys = (0 until numBands).map { j =>
      concat_ws(",", (0 until rowsPerBand).map(r => col(s"sig_${j * rowsPerBand + r}")): _*)
    }
    val bands = sigs.select(
        col("doc_id"), col("ss"),
        posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
    val left = bands.select(col("doc_id").as("doc1"), col("ss").as("ss1"),
      col("band_idx"), col("band_key"))
    val right = bands.select(col("doc_id").as("doc2"), col("ss").as("ss2"),
      col("band_idx"), col("band_key"))
    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), col("ss1"), col("ss2")).distinct()
      .select(col("doc1"), col("doc2"),
        (size(array_intersect(col("ss1"), col("ss2"))).cast("double") /
          size(array_union(col("ss1"), col("ss2")))).as("jaccard"))
      .withColumn("is_near_dup", col("jaccard") >= threshold)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** 32-bit SimHash over the token stream (occurrence-weighted).
    * Formulated as explode → 32 conditional sums → bit reassembly; the
    * group-by runs partial aggregation so the shuffle carries one row
    * per (doc, 32 counters), not per token.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
      .withColumn("v", Text.tokenHash(col("t")))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("v"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"bit_$b")
    }
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Hamming distance between two simhash values (near-dup predicate). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard near-dup within (lang, token-length-band)
    * blocks: the blocking keys bound the candidate pair space so the
    * self-join is per-block O(block²), not corpus O(n²).
    */
  def jaccardPairs(documents: DataFrame, w: Int = 3,
                   minJaccard: Double = 0.3): DataFrame = {
    val docs = documents
      .withColumn("ss", shingleSet(col("text"), w))
      .filter(size(col("ss")) > 0)
      .withColumn("bucket",
        concat_ws("#", col("lang"), floor(size(Text.tokens(col("text"))) / 20)))
      .select(col("doc_id"), col("bucket"), col("ss"))
    val l = docs.select(col("bucket"), col("doc_id").as("doc1"), col("ss").as("ss1"))
    val r = docs.select(col("bucket"), col("doc_id").as("doc2"), col("ss").as("ss2"))
    l.join(r, Seq("bucket"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        (size(array_intersect(col("ss1"), col("ss2"))).cast("double") /
          size(array_union(col("ss1"), col("ss2")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("doc1"), col("doc2"))
  }
}
