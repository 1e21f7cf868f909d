package graft.oracles

import graft.ops._
import Kit._

/** DuckDB oracles for the dedup family (dedup_*): minhash/LSH CTE generators, the incremental and stored-index probes, and the sequential admission-gate replay.
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object DedupOracles {

  def minhashOracle: String = {
    val sigExprs = Dedup.minhashAB.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(vs, v -> ($a * v + $b) % ${Dedup.P})) AS sig_$i"
    }.mkString(",\n  ")
    val bandKeys = (0 until Dedup.numBands).map { j =>
      (0 until Dedup.rowsPerBand)
        .map(r => s"CAST(sig_${j * Dedup.rowsPerBand + r} AS VARCHAR)")
        .mkString(" || ',' || ")
    }
    val bandList = bandKeys.mkString("[", ",\n    ", "]")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ls) - 2),
       |         i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS ss FROM tok),
       |sh2 AS (SELECT doc_id, ss FROM sh WHERE len(ss) > 0),
       |v AS (SELECT doc_id, list_transform(ss, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS vs FROM sh2),
       |sig AS (SELECT doc_id, $sigExprs FROM v),
       |band AS (SELECT doc_id, unnest($bandList) AS band_key,
       |         generate_subscripts($bandList, 1) AS band_idx FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |         FROM band x JOIN band y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       |              AND x.doc_id < y.doc_id),
       |hsd AS (SELECT doc_id, list_distinct(list_transform(ss,
       |          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs FROM sh2),
       |j AS (SELECT doc1, doc2,
       |        CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
       |          len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
       |      FROM cand JOIN hsd a ON a.doc_id = cand.doc1 JOIN hsd b ON b.doc_id = cand.doc2)
       |SELECT doc1, doc2, jaccard, jaccard >= 0.8 AS is_near_dup FROM j
       |ORDER BY doc1, doc2""".stripMargin
  }

  /** Per-side MinHash CTE chain (tokenize → distinct shingles → sig →
    * bands → 60-bit hash sets), prefixed so the incremental oracle can
    * instantiate it for batch and history independently.
    */
  def minhashSideCtes(prefix: String, src: String): String = {
    val sigExprs = Dedup.minhashAB.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(vs, v -> ($a * v + $b) % ${Dedup.P})) AS sig_$i"
    }.mkString(",\n  ")
    val bandKeys = (0 until Dedup.numBands).map { j =>
      (0 until Dedup.rowsPerBand)
        .map(r => s"CAST(sig_${j * Dedup.rowsPerBand + r} AS VARCHAR)")
        .mkString(" || ',' || ")
    }
    val bandList = bandKeys.mkString("[", ",\n    ", "]")
    s"""${prefix}tok AS (SELECT doc_id, string_split(text, ' ') AS ls FROM $src),
       |${prefix}sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ls) - 2),
       |         i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS ss FROM ${prefix}tok),
       |${prefix}sh2 AS MATERIALIZED (SELECT doc_id, ss FROM ${prefix}sh WHERE len(ss) > 0),
       |${prefix}v AS (SELECT doc_id, list_transform(ss, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS vs FROM ${prefix}sh2),
       |${prefix}sig AS (SELECT doc_id, $sigExprs FROM ${prefix}v),
       |${prefix}band AS MATERIALIZED (SELECT doc_id, unnest($bandList) AS band_key,
       |         generate_subscripts($bandList, 1) AS band_idx FROM ${prefix}sig),
       |${prefix}hsd AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(ss,
       |          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs FROM ${prefix}sh2)"""
      .stripMargin
  }

  /** dedup_incr_near oracle: train/rest split, per-side MinHash bands,
    * batch×history candidate join, exact Jaccard ≥ threshold verdict
    * folded per batch doc.
    */
  def incrNearOracle(threshold: Double): String =
    s"""WITH sp AS MATERIALIZED (SELECT doc_id, text,
       |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
       |         THEN 'train' ELSE 'rest' END AS split
       |  FROM documents),
       |bt AS MATERIALIZED (SELECT doc_id, text FROM sp WHERE split <> 'train'),
       |ht AS MATERIALIZED (SELECT doc_id, text FROM sp WHERE split = 'train'),
       |${minhashSideCtes("b_", "bt")},
       |${minhashSideCtes("h_", "ht")},
       |cand AS (SELECT DISTINCT b.doc_id AS batch_id, h.doc_id AS hist_id
       |  FROM b_band b JOIN h_band h
       |    ON b.band_idx = h.band_idx AND b.band_key = h.band_key),
       |j AS (SELECT batch_id, hist_id,
       |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
       |      (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
       |  FROM cand JOIN b_hsd a ON a.doc_id = cand.batch_id
       |            JOIN h_hsd b ON b.doc_id = cand.hist_id),
       |p AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n_cands,
       |    CAST(count(CASE WHEN jaccard >= $threshold THEN 1 END) AS BIGINT) AS n_dups,
       |    min(CASE WHEN jaccard >= $threshold THEN hist_id END) AS dup_of0
       |  FROM j GROUP BY batch_id)
       |SELECT d.doc_id, coalesce(p.n_cands, 0) AS n_cands,
       |  coalesce(p.n_dups, 0) AS n_dups,
       |  CAST(coalesce(p.dup_of0, -1) AS BIGINT) AS dup_of,
       |  coalesce(p.n_dups, 0) > 0 AS is_dup
       |FROM bt d LEFT JOIN p ON d.doc_id = p.batch_id
       |ORDER BY d.doc_id""".stripMargin

  /** dedup_admit oracle: the admission gate's sequential replay,
    * unrolled — batch k's documents band-join against history_k
    * (train ∪ admitted batches < k), exact-Jaccard verdicts, and the
    * per-doc delta-layout census the engine reads back from its
    * snapshot (an admitted doc with shingles contributes exactly
    * numBands band rows and |distinct shingle hashes| shingle rows;
    * everything else contributes zero).
    */
  def dedupAdmitOracle(nBatches: Int, threshold: Double): String = {
    val rounds = (0 until nBatches).map { k =>
      val ht = s"ht$k"; val bt = s"bt$k"
      val nextHt =
        s"""ht${k + 1} AS MATERIALIZED (SELECT * FROM $ht UNION ALL
           |  SELECT d.doc_id, d.text FROM $bt d
           |  JOIN v$k ON d.doc_id = v$k.doc_id AND v$k.admitted)""".stripMargin
      s"""$bt AS MATERIALIZED (SELECT doc_id, text FROM rst WHERE batch = $k),
         |${minhashSideCtes(s"q${k}_", bt)},
         |${minhashSideCtes(s"g${k}_", ht)},
         |c$k AS (SELECT DISTINCT b.doc_id AS batch_id, h.doc_id AS hist_id
         |  FROM q${k}_band b JOIN g${k}_band h
         |    ON b.band_idx = h.band_idx AND b.band_key = h.band_key),
         |j$k AS (SELECT batch_id, hist_id,
         |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
         |      (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
         |  FROM c$k JOIN q${k}_hsd a ON a.doc_id = c$k.batch_id
         |           JOIN g${k}_hsd b ON b.doc_id = c$k.hist_id),
         |p$k AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n_cands,
         |    CAST(count(CASE WHEN jaccard >= $threshold THEN 1 END) AS BIGINT) AS n_dups,
         |    min(CASE WHEN jaccard >= $threshold THEN hist_id END) AS dup_of0
         |  FROM j$k GROUP BY batch_id),
         |v$k AS MATERIALIZED (SELECT d.doc_id, CAST($k AS BIGINT) AS batch,
         |    coalesce(p.n_cands, 0) AS n_cands,
         |    coalesce(p.n_dups, 0) AS n_dups,
         |    CAST(coalesce(p.dup_of0, -1) AS BIGINT) AS dup_of,
         |    coalesce(p.n_dups, 0) = 0 AS admitted,
         |    CAST(coalesce(len(hh.hs), 0) AS BIGINT) AS hs_len
         |  FROM $bt d LEFT JOIN p$k p ON d.doc_id = p.batch_id
         |             LEFT JOIN q${k}_hsd hh ON d.doc_id = hh.doc_id)""".stripMargin +
        (if (k < nBatches - 1) s",\n$nextHt" else "")
    }.mkString(",\n")
    s"""WITH sp AS MATERIALIZED (SELECT doc_id, text,
       |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
       |         THEN 'train' ELSE 'rest' END AS split
       |  FROM documents),
       |ht0 AS MATERIALIZED (SELECT doc_id, text FROM sp WHERE split = 'train'),
       |rst AS MATERIALIZED (SELECT doc_id, text,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $nBatches AS batch
       |  FROM sp WHERE split <> 'train'),
       |$rounds
       |SELECT doc_id, batch, admitted, n_cands, n_dups, dup_of,
       |  CASE WHEN admitted AND hs_len > 0
       |       THEN CAST(${Dedup.numBands} AS BIGINT) ELSE 0 END AS idx_bands,
       |  CASE WHEN admitted THEN hs_len ELSE 0 END AS idx_shingles
       |FROM (${(0 until nBatches).map(k => s"SELECT * FROM v$k")
           .mkString(" UNION ALL ")}) allv
       |ORDER BY doc_id""".stripMargin
  }

  /** dedup_index_build oracle: the band census of the train split's
    * minhash bands (oracle band_idx is 1-based generate_subscripts —
    * shifted to the engine's 0-based posexplode).
    */
  def dedupIndexBuildOracle: String =
    s"""WITH sp AS MATERIALIZED (SELECT doc_id, text,
       |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
       |         THEN 'train' ELSE 'rest' END AS split
       |  FROM documents),
       |ht AS MATERIALIZED (SELECT doc_id, text FROM sp WHERE split = 'train'),
       |${minhashSideCtes("h_", "ht")}
       |SELECT CAST(band_idx - 1 AS BIGINT) AS band_idx,
       |  CAST(count(*) AS BIGINT) AS n_postings,
       |  CAST(count(DISTINCT band_key) AS BIGINT) AS n_keys
       |FROM h_band GROUP BY 1 ORDER BY 1""".stripMargin

  /** dedup_simhash oracle: 32 conditional bit sums + reassembly. */
  def simhashOracle: String = {
    val bitSums = (0 until 32).map(b =>
      s"sum(CASE WHEN (v >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bit_$b").mkString(",\n  ")
    val assemble = (0 until 32).map(b =>
      s"CASE WHEN bit_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS v
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u),
       |bits AS (SELECT doc_id, $bitSums FROM tok GROUP BY doc_id)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits
       |ORDER BY doc_id""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "dedup_incr_family" -> foldedOracle(
      Seq("doc_id" -> "long", "lang" -> "string", "source" -> "string", "n_cands" -> "long", "n_dups" -> "long", "dup_of" -> "long", "is_dup" -> "boolean"),
      ("exact", Seq("doc_id", "lang", "source"),
        """WITH s AS (SELECT doc_id, lang, source, text,
                |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                |         ELSE 'test' END AS split
                |  FROM documents),
                |seen AS (SELECT DISTINCT md5(text) AS h FROM s WHERE split = 'train'),
                |inc AS (SELECT doc_id, lang, source, text FROM s
                |        WHERE split <> 'train'
                |          AND md5(text) NOT IN (SELECT h FROM seen)),
                |r AS (SELECT doc_id, lang, source,
                |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                |      FROM inc)
                |SELECT doc_id, lang, source FROM r WHERE rn = 1
                |ORDER BY doc_id""".stripMargin),
      ("near", Seq("doc_id", "n_cands", "n_dups", "dup_of", "is_dup"),
        incrNearOracle(0.3))),
    "dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_dup_stats" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies,
        | min(doc_id) AS keep_doc_id, max(doc_id) AS max_doc_id
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1
        |ORDER BY text_hash""".stripMargin,
    "dedup_minhash" -> minhashOracle,
    "dedup_index_build" -> dedupIndexBuildOracle,
    // the stored probe serves the same signatures (parquet round-trips
    // the integer hashes exactly), so its oracle IS the inline one
    "dedup_incr_stored" -> incrNearOracle(0.3),
    "dedup_admit" -> dedupAdmitOracle(3, 0.3),
    "dedup_simhash" -> simhashOracle,
    "dedup_jaccard" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ls FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id, lang, len(ls) AS ntok,
        |         list_distinct(list_transform(
        |           list_distinct(list_transform(generate_series(1, len(ls) - 2),
        |             i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])),
        |           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs FROM tok),
        |d AS MATERIALIZED (SELECT doc_id,
        |        lang || '#' || CAST(CAST(floor(ntok / 20) AS BIGINT) AS VARCHAR) AS bucket, hs
        |      FROM sh WHERE len(hs) > 0)
        |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
        |FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.hs, b.hs))) >= 0.3
        |ORDER BY doc1, doc2""".stripMargin,
    "dedup_cluster" -> (clusterCte +
      """
        |SELECT id AS doc_id, canon_id,
        |  CAST(count(*) OVER (PARTITION BY canon_id) AS BIGINT) AS cluster_size
        |FROM canon ORDER BY doc_id""".stripMargin),
    "dedup_apply" -> (clusterCte +
      """
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM canon WHERE id <> canon_id)
        |ORDER BY doc_id""".stripMargin),
  )
}
