package graft.oracles

import graft.ops._
import Kit._

/** DuckDB oracles for the multimodal family (mm_*): metadata/tiling twins, digest-stub embeddings, ANN retrieval, and the pHash near-dup tier.
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object MmOracles {

  /** mm_ann oracle: the mm_embed projection (md5 hex pairs / 255.0) as
    * a list column, then brute-force cosine top-k — the embedding and
    * cosine expressions mirror the engine term-for-term.
    */
  def mmAnnOracle(nq: Int, k: Int, dims: Int): String = {
    val embList = (0 until dims).map(i =>
      s"('0x' || substr(dg, ${i * 2 + 1}, 2))::BIGINT / 255.0")
      .mkString("[", ",\n   ", "]")
    s"""WITH m AS (SELECT doc_id, md5(text) AS dg FROM documents),
       |e AS MATERIALIZED (SELECT doc_id, $embList AS embedding FROM m),
       |q AS (SELECT doc_id AS query_id, embedding AS qe FROM e
       |      WHERE doc_id < $nq),
       |s AS (SELECT query_id, c.doc_id AS neighbor_id,
       |        ${cosSql("q.qe", "c.embedding")} AS sim
       |      FROM q, e c WHERE c.doc_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** mm_phash_dups oracle: band sums, banding, candidate join, and
    * Hamming verification generated from the same
    * `Multimodal.phashChunkLen/phashBandBits/phashNBands` constants as
    * the engine (integer arithmetic throughout — order-free).
    */
  def phashDupsOracle(maxHamming: Int): String = {
    import Multimodal.{phashChunks, phashBandBits, phashNBands}
    def bandSql(b: Int) = (0 until phashBandBits).map { r =>
      val i = b * phashBandBits + r
      s"(('0x' || substr(md5(substr(text, 1 + $i * clen, clen)), 1, 1))::BIGINT % 2) * ${1L << r}"
    }.mkString("(", " + ", ")")
    val fpCols = (0 until phashNBands).map(b => s"${bandSql(b)} AS b$b").mkString(",\n    ")
    val bandArr = (0 until phashNBands).map(b => s"b$b").mkString("[", ", ", "]")
    val hamSql = (0 until phashNBands)
      .map(b => s"bit_count(xor(a.b$b, b.b$b))").mkString(" + ")
    s"""WITH sized AS (SELECT doc_id, text,
       |    greatest(1, length(text) // $phashChunks) AS clen FROM documents),
       |fp AS (SELECT doc_id,
       |    $fpCols
       |  FROM sized),
       |banded AS (SELECT doc_id, unnest($bandArr) AS band_val,
       |    generate_subscripts($bandArr, 1) AS band_idx FROM fp),
       |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
       |  FROM banded x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       |       AND x.doc_id < y.doc_id),
       |h AS (SELECT id1, id2, CAST($hamSql AS BIGINT) AS hamming
       |  FROM cand JOIN fp a ON a.doc_id = cand.id1
       |            JOIN fp b ON b.doc_id = cand.id2)
       |SELECT id1, id2, hamming FROM h WHERE hamming <= $maxHamming
       |ORDER BY id1, id2""".stripMargin
  }

  /** mm_phash_clusters oracle: the pair chain of [[phashDupsOracle]]
    * closed into components by recursive min-reachability — the same
    * algorithm-independent fixpoint contract as rel_concomp's oracle,
    * so the engine's star-contraction rounds are checked against the
    * RESULT, not the round structure.
    */
  def phashClustersOracle(maxHamming: Int): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (${phashDupsOracle(maxHamming)}),
       |sym AS MATERIALIZED (SELECT id1 AS src, id2 AS dst FROM pairs
       |        UNION SELECT id2, id1 FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS anc FROM sym
       |  UNION
       |  SELECT r.id, s.dst AS anc FROM reach r JOIN sym s ON r.anc = s.src),
       |m AS (SELECT id, min(anc) AS canon_id FROM reach GROUP BY id),
       |sz AS (SELECT canon_id, count(*) AS n_members FROM m GROUP BY canon_id)
       |SELECT m.id AS doc_id, m.canon_id, sz.n_members
       |FROM m JOIN sz USING (canon_id)
       |ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    "mm_phash_family" -> foldedOracle(
      Seq("id1" -> "long", "id2" -> "long", "hamming" -> "long", "doc_id" -> "long", "canon_id" -> "long", "n_members" -> "long"),
      ("dups", Seq("id1", "id2", "hamming"),
        phashDupsOracle(4)),
      ("clusters", Seq("doc_id", "canon_id", "n_members"),
        phashClustersOracle(4))),
    "mm_grid_family" -> foldedOracle(
      Seq("doc_id" -> "long", "frame_idx" -> "long", "frame_len" -> "long", "tx" -> "long", "ty" -> "long", "tile_w" -> "long", "tile_h" -> "long"),
      ("frames", Seq("doc_id", "frame_idx", "frame_len"),
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
                |f AS (SELECT doc_id, n,
                |        unnest(generate_series(0, greatest(1, n // 256) - 1)) AS i FROM d)
                |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
                | CAST(least(256, n - i * 256) AS BIGINT) AS frame_len
                |FROM f WHERE i % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin),
      ("tiles", Seq("doc_id", "tx", "ty", "tile_w", "tile_h"),
        """WITH m AS (SELECT doc_id,
                |   CAST(16 * strpos('0123456789abcdef', substr(md5(text), 1, 1)) AS BIGINT) AS width,
                |   CAST(16 * strpos('0123456789abcdef', substr(md5(text), 2, 1)) AS BIGINT) AS height
                | FROM documents),
                |g AS (SELECT doc_id, width, height,
                |   unnest(generate_series(0, (width + 63) // 64 - 1)) AS tx FROM m),
                |t AS (SELECT doc_id, width, height, tx,
                |   unnest(generate_series(0, (height + 63) // 64 - 1)) AS ty FROM g)
                |SELECT doc_id, CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
                | CAST(least(64, width - tx * 64) AS BIGINT) AS tile_w,
                | CAST(least(64, height - ty * 64) AS BIGINT) AS tile_h
                |FROM t ORDER BY doc_id, tx, ty""".stripMargin)),
    "mm_ann" -> mmAnnOracle(8, 5, 8),
    "mm_meta" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(16 * strpos('0123456789abcdef', substr(md5(text), 1, 1)) AS BIGINT) AS width,
        | CAST(16 * strpos('0123456789abcdef', substr(md5(text), 2, 1)) AS BIGINT) AS height,
        | CAST(strpos('0123456789abcdef', substr(md5(text), 3, 1)) AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id, CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
        | CAST(least(64, octet_length(encode(text))) AS BIGINT) AS n_bytes_out,
        | md5(substr(text, 1, 64)) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_embed" ->
      """SELECT doc_id,
        | ('0x' || substr(md5(text), 1, 2))::BIGINT / 255.0 AS e0,
        | ('0x' || substr(md5(text), 3, 2))::BIGINT / 255.0 AS e1,
        | ('0x' || substr(md5(text), 5, 2))::BIGINT / 255.0 AS e2,
        | ('0x' || substr(md5(text), 7, 2))::BIGINT / 255.0 AS e3,
        | ('0x' || substr(md5(text), 9, 2))::BIGINT / 255.0 AS e4,
        | ('0x' || substr(md5(text), 11, 2))::BIGINT / 255.0 AS e5,
        | ('0x' || substr(md5(text), 13, 2))::BIGINT / 255.0 AS e6,
        | ('0x' || substr(md5(text), 15, 2))::BIGINT / 255.0 AS e7
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
