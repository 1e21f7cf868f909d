package graft.oracles

import graft.ops._

/** Shared oracle-SQL fragments: fold/typing helpers and the CTE generators used by more than one family (cosine arithmetic, the k-means training chain, the clustering tail).
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object Kit {

  /** Missing TIMESTAMP columns pad with this sentinel epoch instead of
    * NULL: a NULL timestamp surfaces as numpy NaT in pandas-based
    * compares, and NaT != NaT — a hash checker may count the pad
    * itself as a mismatch. The sentinel is identical on both sides.
    */
  val tsPad = "1900-01-01 00:00:00"

  def duckType(sparkType: String): String = sparkType match {
    case "long"      => "BIGINT"
    case "double"    => "DOUBLE"
    case "string"    => "VARCHAR"
    case "boolean"   => "BOOLEAN"
    case "timestamp" => "TIMESTAMP"
    case "int"       => "INTEGER"
  }

  /** Oracle twin of [[foldedQuery]]: tagged UNION ALL over the arms'
    * SELECTs, NULL-padded to the same column union. Each arm lists the
    * columns its SELECT yields.
    */
  def foldedOracle(cols: Seq[(String, String)],
                           arms: (String, Seq[String], String)*): String =
    arms.map { case (tag, own, sql) =>
      val proj = cols.map { case (c, t) =>
        if (own.contains(c)) s""""$c""""
        else if (t == "timestamp") s"""TIMESTAMP '$tsPad' AS "$c""""
        else s"""CAST(NULL AS ${duckType(t)}) AS "$c""""
      }.mkString(", ")
      s"SELECT '$tag' AS variant, $proj FROM (\n$sql\n) q_$tag"
    }.mkString("\nUNION ALL\n")

  /** Target mixture for txt_mixture_sample (basis-point keep rates):
    * boost English, downsample Chinese, default 10% elsewhere. The
    * oracle CASE is generated from this same map.
    */
  val mixtureRates: Map[String, Int] = Map("en" -> 2500, "zh" -> 500)

  /** dedup_minhash oracle, generated from the same (a,b)/P/band
    * constants the Spark operator uses.
    */
  /** Shared near-dup clustering CTE chain (shingles → blocked Jaccard
    * pairs → recursive connected components → canon) — the oracle body
    * behind BOTH dedup_cluster and dedup_apply.
    */
  val clusterCte: String =
    """WITH RECURSIVE
      |tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ls FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id, lang, len(ls) AS ntok,
      |         list_distinct(list_transform(
      |           list_distinct(list_transform(generate_series(1, len(ls) - 2),
      |             i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])),
      |           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs FROM tok),
      |d AS MATERIALIZED (SELECT doc_id,
      |        lang || '#' || CAST(CAST(floor(ntok / 20) AS BIGINT) AS VARCHAR) AS bucket, hs
      |      FROM sh WHERE len(hs) > 0),
      |pairs AS MATERIALIZED (SELECT a.doc_id AS doc1, b.doc_id AS doc2
      |          FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      |          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
      |              len(list_distinct(list_concat(a.hs, b.hs))) >= 0.3),
      |edges AS MATERIALIZED (SELECT doc1 AS src, doc2 AS dst FROM pairs
      |          UNION SELECT doc2, doc1 FROM pairs),
      |reach(id, lab) AS (SELECT src, src FROM edges
      |          UNION SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
      |canon AS (SELECT id, min(lab) AS canon_id FROM reach GROUP BY id)""".stripMargin

  /** Shared cosine fragment: in-order double fold, two sequential
    * divisions — mirrors Similarity.cosine exactly (argument order
    * matters for the final-ulp division sequence).
    */
  def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |        / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |        / sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  /** The training-sample predicate twin of `Similarity.trainingSample`
    * (md5-prefix hash of vec_id, same device as txt_hash_sample).
    */
  val trainSampleSql =
    s"('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 100" +
      s" < ${Similarity.trainPct}"

  /** k-means training CTE chain mirroring Similarity.kmeansCentroids:
    * cent0 = first-nlist init from the FULL corpus (cast to DOUBLE[]),
    * then per iteration argmax-cosine assignment of the hash-SAMPLE
    * (ties on centroid_id) and per-dimension means via the same
    * fixed-boundary two-level fold as `Similarity.twoLevelMean`: block
    * sums fold in vec_id order within vec_id div trainBlock blocks,
    * then block sums fold in block order — `list(x ORDER BY k)` +
    * `list_sum` is the same left fold as Spark's sorted collect_list +
    * aggregate at BOTH levels, so the trained centroids are
    * bit-identical.
    */
  def kmeansSql(nlist: Int, iters: Int,
                        src: String = "embeddings",
                        dimN: Int = Similarity.dim): String = {
    val blk = Similarity.trainBlock
    val init = s"ksamp AS MATERIALIZED (SELECT * FROM $src WHERE $trainSampleSql),\n" +
      s"cent0 AS MATERIALIZED (SELECT vec_id AS centroid_id, " +
      s"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce " +
      s"FROM $src WHERE vec_id < $nlist)"
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""ka$p AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
         |    FROM ksamp e, cent$p c) t WHERE rn = 1),
         |kb$p AS (SELECT cell, j, vec_id // $blk AS blk,
         |    list_sum(list(CAST(embedding[j] AS DOUBLE) ORDER BY vec_id)) AS bsum,
         |    count(*) AS bn
         |  FROM ka$p, unnest(generate_series(1, $dimN)) AS u(j)
         |  GROUP BY cell, j, blk),
         |km$p AS (SELECT cell, j,
         |    list_sum(list(bsum ORDER BY blk)) / sum(bn) AS mv
         |  FROM kb$p GROUP BY cell, j),
         |cent$i AS MATERIALIZED (SELECT cell AS centroid_id, list(mv ORDER BY j) AS ce FROM km$p GROUP BY cell)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

}
