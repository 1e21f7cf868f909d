package graft.oracles

import graft.ops._
import Kit._

/** DuckDB oracles for the similarity/ANN family (sim_*): brute cosine, IVF, PQ/IVFADC (flat + residual), stored-index maintenance replays, rerank/recall harnesses.
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object SimOracles {

  val cosineSql = cosSql("qe", "ce")

  /** Brute-force cosine top-k oracle body (shared by sim_cosine_topk
    * and as the ground truth inside the recall oracles). `nq`/`k` are
    * threaded from every caller so the registered parameters can't
    * silently desynchronize between the approximate side and the
    * ground-truth side.
    */
  def cosineTopkOracle(nq: Int, k: Int,
                               candPred: String = "TRUE"): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $nq),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
       |      WHERE ($candPred)),
       |s AS (SELECT query_id, neighbor_id,
       |        $cosineSql AS sim
       |      FROM q, c WHERE neighbor_id <> query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_ivf_recall oracle: recall@k of the IVF result against the
    * brute-force ground truth, both recomputed independently.
    */
  def ivfRecallOracle(nq: Int, k: Int): String =
    s"""WITH ivf AS (${ivfOracle(nq, k)}),
       |bf AS (${cosineTopkOracle(nq, k)})
       |SELECT bf.query_id,
       |  CAST(count(ivf.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN ivf
       |  ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** sim_filtered_recall oracle: filtered IVF vs the filtered brute
    * force — the same predicate pushed into both derivations.
    */
  def filteredRecallOracle(nq: Int, k: Int): String =
    s"""WITH ivf AS (${ivfOracle(nq, k, candPred = "a.label % 2 = 0")}),
       |bf AS (${cosineTopkOracle(nq, k, candPred = "label % 2 = 0")})
       |SELECT bf.query_id,
       |  CAST(count(ivf.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN ivf
       |  ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** sim_ivf_topk oracle: same k-means coarse quantizer (3 Lloyd
    * iterations from the first-nlist seed), assignment, probe, and
    * scoring order as the engine. `candPred` (over alias `a`) restricts
    * the scored candidates — the filtered-search (`sim_ivf_filtered`)
    * pre-filter; the quantizer, assignment, and probe ranking always
    * see the full corpus, exactly like the engine.
    */
  def ivfOracle(nq: Int, k: Int, nlist: Int = 16,
                        nprobe: Int = 4,
                        candPred: String = "TRUE"): String =
    s"""WITH ${kmeansSql(nlist, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, label, cell FROM (
       |    SELECT e.vec_id, e.embedding, e.label, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |probes AS MATERIALIZED (
       |  SELECT query_id, qe, cell FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qe, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $nq) q, cent c) t WHERE rn <= $nprobe),
       |s AS (SELECT query_id, a.vec_id AS neighbor_id,
       |        ${cosSql("p.qe", "a.embedding")} AS sim
       |      FROM probes p JOIN assigned a USING (cell)
       |      WHERE a.vec_id <> p.query_id AND ($candPred)),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_kmeans_cells oracle: the trained quantizer's cell census —
    * same k-means CTE chain and argmax-cosine assignment as the IVF
    * oracles, reduced to (cell, size, smallest member).
    */
  def kmeansCellsOracle(nlist: Int): String =
    s"""WITH ${kmeansSql(nlist, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1)
       |SELECT cell, count(*) AS n_members, min(vec_id) AS first_vec
       |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin

  /** sim_semdedup oracle: the same trained coarse quantizer (k-means
    * CTE chain), argmax-cosine assignment of the full corpus, then the
    * one-pass SemDeDup decision — a vector is pruned iff an earlier
    * same-cell member sits at ≥ threshold cosine; the smallest such
    * member is the exemplar. The threshold literal is interpolated from
    * the same Scala double the engine filters on.
    */
  def semDedupOracle(nlist: Int, threshold: Double): String =
    s"""WITH ${kmeansSql(nlist, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |pruned AS (
       |  SELECT b.vec_id AS cand_id, min(a.vec_id) AS exemplar
       |  FROM assigned a JOIN assigned b USING (cell)
       |  WHERE a.vec_id < b.vec_id
       |    AND ${cosSql("a.embedding", "b.embedding")} >= $threshold
       |  GROUP BY b.vec_id)
       |SELECT s.vec_id, s.cell, p.exemplar IS NULL AS kept,
       |  coalesce(p.exemplar, s.vec_id) AS exemplar_id
       |FROM assigned s LEFT JOIN pruned p ON s.vec_id = p.cand_id
       |ORDER BY s.vec_id""".stripMargin

  /** sim_sq_topk oracle: per-dimension min/max training, floor-encode
    * to 0..255 (floor not round — identical tie behavior across
    * engines), dequantize x̂_j = mn_j + code_j·span_j/255 with the same
    * association order as the engine's zip_with chain, then cosine
    * top-k against the reconstruction.
    */
  def sqTopkOracle(nq: Int, k: Int): String =
    s"""WITH dims AS (
       |  SELECT j, min(CAST(embedding[j] AS DOUBLE)) AS mn,
       |         max(CAST(embedding[j] AS DOUBLE)) AS mx
       |  FROM embeddings, unnest(generate_series(1, ${Similarity.dim})) AS u(j)
       |  GROUP BY j),
       |codes AS (
       |  SELECT e.vec_id, d.j, d.mn, d.mx - d.mn AS sp,
       |    CASE WHEN d.mx - d.mn = 0 THEN 0.0
       |         ELSE least(floor((CAST(e.embedding[d.j] AS DOUBLE) - d.mn) * 255.0 / (d.mx - d.mn)), 255.0)
       |    END AS code
       |  FROM embeddings e, dims d),
       |recon AS (
       |  SELECT vec_id, list(mn + (code * sp / 255.0) ORDER BY j) AS ce
       |  FROM codes GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $nq),
       |s AS (SELECT query_id, r.vec_id AS neighbor_id,
       |        ${cosSql("qe", "ce")} AS sim
       |      FROM q, recon r WHERE r.vec_id <> q.query_id),
       |rk AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM rk WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_sq_recall oracle: recall@k of the SQ8 result vs brute force,
    * both independently re-derived.
    */
  def sqRecallOracle(nq: Int, k: Int): String =
    s"""WITH sq AS (${sqTopkOracle(nq, k)}),
       |bf AS (${cosineTopkOracle(nq, k)})
       |SELECT bf.query_id,
       |  CAST(count(sq.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN sq
       |  ON bf.query_id = sq.query_id AND bf.neighbor_id = sq.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** sim_near_dup oracle: 8 bands × 4 sign bits, plane literals
    * generated from the same `Similarity.planeValue` constants.
    */
  def nearDupOracle: String = {
    val bandExprs = (0 until Similarity.ndBands).map { b =>
      (0 until Similarity.ndRows).map { r =>
        val p = (0 until Similarity.dim).map(j =>
          Similarity.planeValue(Similarity.numPlanes + b * Similarity.ndRows + r, j))
        val lits = p.map(_.toString).mkString("[", ", ", "]")
        s"""CASE WHEN list_sum(list_transform(list_zip(CAST($lits AS DOUBLE[]), embedding),
           |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) > 0
           |   THEN '1' ELSE '0' END""".stripMargin
      }.mkString(" ||\n   ")
    }
    val bandList = bandExprs.mkString("[\n    ", ",\n    ", "]")
    s"""WITH banded AS (
       |  SELECT vec_id, unnest($bandList) AS band_key,
       |         generate_subscripts($bandList, 1) AS band_idx
       |  FROM embeddings),
       |cand AS (SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
       |         FROM banded x JOIN banded y
       |           ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       |              AND x.vec_id < y.vec_id),
       |s AS (SELECT id1, id2,
       |        list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |        / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |        / sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS sim
       |      FROM cand
       |      JOIN embeddings a ON a.vec_id = cand.id1
       |      JOIN embeddings b ON b.vec_id = cand.id2)
       |SELECT id1, id2, sim FROM s WHERE sim >= 0.5 ORDER BY id1, id2""".stripMargin
  }

  /** kNN-graph CTE chain (banded candidates → one undirected scoring
    * pass → both directions → per-node rank), ending in `knnr` —
    * shared by the graph oracle and the label-propagation oracle.
    */
  def knnGraphCtes: String = {
    val bandExprs = (0 until Similarity.ndBands).map { b =>
      (0 until Similarity.ndRows).map { r =>
        val p = (0 until Similarity.dim).map(j =>
          Similarity.planeValue(Similarity.numPlanes + b * Similarity.ndRows + r, j))
        val lits = p.map(_.toString).mkString("[", ", ", "]")
        s"""CASE WHEN list_sum(list_transform(list_zip(CAST($lits AS DOUBLE[]), embedding),
           |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) > 0
           |   THEN '1' ELSE '0' END""".stripMargin
      }.mkString(" ||\n   ")
    }
    val bandList = bandExprs.mkString("[\n    ", ",\n    ", "]")
    s"""banded AS (
       |  SELECT vec_id, unnest($bandList) AS band_key,
       |         generate_subscripts($bandList, 1) AS band_idx
       |  FROM embeddings),
       |cand AS (SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
       |         FROM banded x JOIN banded y
       |           ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       |              AND x.vec_id < y.vec_id),
       |s AS MATERIALIZED (SELECT id1, id2,
       |        ${cosSql("a.embedding", "b.embedding")} AS sim
       |      FROM cand
       |      JOIN embeddings a ON a.vec_id = cand.id1
       |      JOIN embeddings b ON b.vec_id = cand.id2),
       |sym AS (SELECT id1 AS query_id, id2 AS neighbor_id, sim FROM s
       |        UNION ALL SELECT id2, id1, sim FROM s),
       |knnr AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM sym)""".stripMargin
  }

  /** sim_knn_graph oracle: same banded candidates as the near-dup
    * oracle, each undirected pair scored once and emitted in both
    * directions, per-node top-k by (sim DESC, neighbor).
    */
  def knnGraphOracle(k: Int): String =
    s"""WITH $knnGraphCtes
       |SELECT query_id, neighbor_id, sim, rank FROM knnr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_knn_refine oracle: the [[knnGraphCtes]] round-0 graph, the
    * NN-Descent u→v→w expansion, the orphan-wiring candidates from the
    * trained IVF cells (same k-means CTE chain as the ANN oracles),
    * all collapsed to one undirected distinct set, scored once, fanned
    * both ways, per-node top-k.
    */
  def knnRefineOracle(k: Int, nlist: Int = 16): String =
    s"""WITH $knnGraphCtes,
       |g AS MATERIALIZED (SELECT query_id, neighbor_id FROM knnr
       |  WHERE rank <= $k),
       |nn AS (SELECT a.query_id AS u, b.neighbor_id AS w
       |  FROM g a JOIN g b ON a.neighbor_id = b.query_id
       |    AND a.query_id <> b.neighbor_id),
       |orph AS (SELECT vec_id FROM embeddings
       |  WHERE vec_id NOT IN (SELECT query_id FROM g)),
       |${kmeansSql(nlist, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |kassigned AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |oc AS (SELECT o.vec_id AS u, a2.vec_id AS w
       |  FROM orph o JOIN kassigned a1 ON a1.vec_id = o.vec_id
       |  JOIN kassigned a2 ON a2.cell = a1.cell AND a2.vec_id <> o.vec_id),
       |uc AS (SELECT DISTINCT least(u, w) AS id1, greatest(u, w) AS id2
       |  FROM (SELECT query_id AS u, neighbor_id AS w FROM g
       |        UNION ALL SELECT u, w FROM nn
       |        UNION ALL SELECT u, w FROM oc)),
       |s2 AS MATERIALIZED (SELECT id1, id2,
       |        ${cosSql("a.embedding", "b.embedding")} AS sim
       |      FROM uc
       |      JOIN embeddings a ON a.vec_id = uc.id1
       |      JOIN embeddings b ON b.vec_id = uc.id2),
       |sym2 AS (SELECT id1 AS query_id, id2 AS neighbor_id, sim FROM s2
       |         UNION ALL SELECT id2, id1, sim FROM s2),
       |knnr2 AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM sym2)
       |SELECT query_id, neighbor_id, sim, rank FROM knnr2 WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_label_prop oracle: the kNN graph, then `rounds` synchronous
    * voting rounds — modal neighbor label per node (votes DESC, label
    * ASC — the textual twin of the engine's max_by over
    * (votes, −label)), seeds clamped, no-vote nodes keep state.
    */
  def labelPropOracle(nSeeds: Int, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS (SELECT dst, lbl, count(*) AS votes
         |  FROM g JOIN $prev ON $prev.vec_id = g.src
         |  WHERE lbl IS NOT NULL GROUP BY dst, lbl),
         |b$i AS (SELECT dst, lbl AS new_lbl FROM (
         |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst
         |      ORDER BY votes DESC, lbl ASC) AS rn FROM v$i) t
         |  WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT $prev.vec_id,
         |    CASE WHEN $prev.vec_id < $nSeeds THEN $prev.lbl
         |         ELSE coalesce(b$i.new_lbl, $prev.lbl) END AS lbl
         |  FROM $prev LEFT JOIN b$i ON b$i.dst = $prev.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $knnGraphCtes,
       |g AS MATERIALIZED (SELECT query_id AS dst, neighbor_id AS src
       |  FROM knnr WHERE rank <= $k),
       |l0 AS MATERIALIZED (SELECT vec_id,
       |    CASE WHEN vec_id < $nSeeds THEN CAST(label AS BIGINT) END AS lbl
       |  FROM embeddings),
       |$roundCtes
       |SELECT vec_id, vec_id < $nSeeds AS is_seed,
       |  CAST(coalesce(lbl, -1) AS BIGINT) AS label
       |FROM l$rounds ORDER BY vec_id""".stripMargin
  }

  /** sim_lsh_topk oracle: the hyperplane literals are generated from the
    * same `Similarity.planes` constants the Spark operator uses.
    */
  def lshOracle: String = {
    val bucketBits = Similarity.planes.map { p =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"""CASE WHEN list_sum(list_transform(list_zip(CAST($lits AS DOUBLE[]), embedding),
         |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) > 0
         |   THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" ||\n   ")
    s"""WITH b AS (SELECT vec_id, embedding,
       |   $bucketBits AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 8),
       |s AS (SELECT query_id, c.vec_id AS neighbor_id,
       |        $cosineSql AS sim
       |      FROM q JOIN (SELECT vec_id, embedding AS ce, bucket FROM b) c USING (bucket)
       |      WHERE c.vec_id <> query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** sim_rp_rerank oracle: the 16 projection-plane literals are
    * generated from the same `Similarity.rpPlanes` constants the Spark
    * operator uses; each projected dimension is the same in-order
    * double fold as the engine's codegen'd dot, the shortlist ranks by
    * reduced-space cosine, and the re-rank is full-width cosine over
    * the shortlist only.
    */
  def rpRerankOracle(nq: Int, k: Int, nCand: Int): String = {
    val rpExprs = Similarity.rpPlanes.map { p =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"""list_sum(list_transform(list_zip(CAST($lits AS DOUBLE[]), embedding),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))""".stripMargin
    }.mkString("[\n   ", ",\n   ", "]")
    s"""WITH pr AS MATERIALIZED (SELECT vec_id, embedding,
       |   $rpExprs AS rp
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, rp AS qrp
       |      FROM pr WHERE vec_id < $nq),
       |srp AS (SELECT query_id, c.vec_id AS neighbor_id,
       |        ${cosSql("q.qrp", "c.rp")} AS rpsim
       |      FROM q, pr c WHERE c.vec_id <> q.query_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY rpsim DESC, neighbor_id) AS rn
       |    FROM srp) t WHERE rn <= $nCand),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |        ${cosSql("q.qe", "c.embedding")} AS sim
       |      FROM cand
       |      JOIN pr c ON c.vec_id = cand.neighbor_id
       |      JOIN q ON q.query_id = cand.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** sim_mrl_rerank oracle: prefix-slice shortlist → exact re-rank —
    * [[rpRerankOracle]] with the projection replaced by list_slice.
    */
  def mrlRerankOracle(nq: Int, k: Int, nCand: Int): String =
    s"""WITH pr AS MATERIALIZED (SELECT vec_id, embedding,
       |   list_slice(embedding, 1, ${Similarity.mrlDim}) AS mr
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, mr AS qmr
       |      FROM pr WHERE vec_id < $nq),
       |smr AS (SELECT query_id, c.vec_id AS neighbor_id,
       |        ${cosSql("q.qmr", "c.mr")} AS msim
       |      FROM q, pr c WHERE c.vec_id <> q.query_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY msim DESC, neighbor_id) AS rn
       |    FROM smr) t WHERE rn <= $nCand),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |        ${cosSql("q.qe", "c.embedding")} AS sim
       |      FROM cand
       |      JOIN pr c ON c.vec_id = cand.neighbor_id
       |      JOIN q ON q.query_id = cand.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Shared CTE chain re-deriving the hot-cell resplit: `n` carries
    * (vec_id, embedding, cell, new_cell) — the full post-split
    * assignment at the registry's 1.1×-mean threshold; `cent` and
    * `pe` stay visible for the probe oracle's augmented centroids.
    */
  def resplitCtes: String =
    s"""${kmeansSql(16, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |cnt AS (SELECT cell, count(*) AS n FROM assigned GROUP BY cell),
       |tot AS (SELECT count(*) AS n_total FROM assigned),
       |hot AS (SELECT cell FROM cnt, tot WHERE n * 16 * 100 > n_total * 110),
       |piv AS (SELECT a.cell, min(a.vec_id) AS pivot_id
       |        FROM assigned a JOIN hot USING (cell) GROUP BY a.cell),
       |pe AS MATERIALIZED (SELECT piv.cell, e.embedding AS pe
       |       FROM piv JOIN embeddings e ON e.vec_id = piv.pivot_id),
       |n AS MATERIALIZED (SELECT a.vec_id, a.embedding, a.cell,
       |        CASE WHEN pe.pe IS NULL THEN a.cell
       |             WHEN ${cosSql("a.embedding", "pe.pe")}
       |               >= ${cosSql("a.embedding", "c.ce")} THEN a.cell + 16
       |             ELSE a.cell END AS new_cell
       |      FROM assigned a LEFT JOIN pe USING (cell)
       |        JOIN cent c ON c.centroid_id = a.cell)""".stripMargin

  /** In-order double dot product over two DuckDB lists — the SQL twin
    * of the engine's codegen'd `vector_dot` fold.
    */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  /** Squared L2 as three in-order dot folds — textual twin of
    * `Similarity.l2sq` (same association: (d_aa - 2·d_ac) + d_cc).
    */
  def l2Sql(a: String, c: String): String =
    s"(${dotSql(a, a)} - 2.0 * ${dotSql(a, c)} + ${dotSql(c, c)})"

  /** Shared PQ CTE chain (un → codebooks → codes → query LUTs):
    * unit-normalize, train M per-subspace L2 k-means codebooks
    * (first-ksub seed from the full corpus, hash-sampled training
    * input, two-level block-fold means), encode, per-query LUT —
    * generated from the same
    * `Similarity.pqM/pqDsub/pqKsub/pqIters/trainPct/trainBlock`
    * constants as the engine. Consumed by the flat-PQ oracles (ADC
    * over every code) and the IVFADC oracle (ADC over probed cells).
    */
  /** Unit-normalized corpus CTE (the `un` table every PQ oracle uses). */
  def unCte: String =
    s"""un AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)
       |      / sqrt(${dotSql("embedding", "embedding")})) AS embedding
       |  FROM embeddings)""".stripMargin

  /** PQ training + encoding CTE chain: per-subspace sampled k-means
    * over `src` → `cb` codebooks → `enc` codes over `encSrc`
    * (defaults to `src`; the append oracle trains on the base split
    * and encodes the union — the stored-quantizer maintenance
    * contract).
    */
  def pqTrainEncCtes(src: String, encSrc: String = null): String = {
    import Similarity.{pqM, pqDsub, pqKsub, pqIters}
    val encode = Option(encSrc).getOrElse(src)
    val blk = Similarity.trainBlock
    val subspaces = (0 until pqM).map { m =>
      val lo = m * pqDsub + 1
      val hi = (m + 1) * pqDsub
      val rounds = (1 to pqIters).map { i =>
        val p = i - 1
        s"""pq${m}a$p AS (SELECT vec_id, sv, cell FROM (
           |    SELECT s.vec_id, s.sv, c.centroid_id AS cell,
           |      row_number() OVER (PARTITION BY s.vec_id
           |        ORDER BY ${l2Sql("s.sv", "c.ce")} ASC, c.centroid_id) AS rn
           |    FROM pq${m}t s, pq${m}c$p c) t WHERE rn = 1),
           |pq${m}b$p AS (SELECT cell, j, vec_id // $blk AS blk,
           |    list_sum(list(CAST(sv[j] AS DOUBLE) ORDER BY vec_id)) AS bsum,
           |    count(*) AS bn
           |  FROM pq${m}a$p, unnest(generate_series(1, $pqDsub)) AS u(j)
           |  GROUP BY cell, j, blk),
           |pq${m}k$p AS (SELECT cell, j,
           |    list_sum(list(bsum ORDER BY blk)) / sum(bn) AS mv
           |  FROM pq${m}b$p GROUP BY cell, j),
           |pq${m}c$i AS MATERIALIZED (SELECT cell AS centroid_id, list(mv ORDER BY j) AS ce
           |  FROM pq${m}k$p GROUP BY cell)""".stripMargin
      }.mkString(",\n")
      s"""pq${m}s AS MATERIALIZED (SELECT vec_id, list_slice(embedding, $lo, $hi) AS sv FROM $src),
         |pq${m}t AS MATERIALIZED (SELECT * FROM pq${m}s WHERE $trainSampleSql),
         |pq${m}c0 AS (SELECT vec_id AS centroid_id, sv AS ce
         |  FROM pq${m}s WHERE vec_id < $pqKsub),
         |$rounds""".stripMargin
    }.mkString(",\n")
    val cbUnion = (0 until pqM).map(m =>
      s"SELECT $m AS m, CAST(centroid_id AS BIGINT) AS code, ce FROM pq${m}c$pqIters")
      .mkString("\n  UNION ALL ")
    s"""$subspaces,
       |cb AS MATERIALIZED ($cbUnion),
       |subs AS (SELECT vec_id, u.m,
       |    list_slice(embedding, u.m * $pqDsub + 1, u.m * $pqDsub + $pqDsub) AS sv
       |  FROM $encode, unnest(generate_series(0, ${pqM - 1})) AS u(m)),
       |enc AS MATERIALIZED (SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY ${l2Sql("s.sv", "c.ce")} ASC, c.code) AS rn
       |    FROM subs s JOIN cb c ON s.m = c.m) t WHERE rn = 1)""".stripMargin
  }

  /** Flat-PQ query-side LUT CTEs (one LUT per query over `src`). */
  def pqQueryLutCtes(nq: Int, src: String = "un"): String = {
    import Similarity.{pqM, pqDsub}
    s"""qs AS (SELECT vec_id AS query_id, u.m,
       |    list_slice(embedding, u.m * $pqDsub + 1, u.m * $pqDsub + $pqDsub) AS qsv
       |  FROM $src, unnest(generate_series(0, ${pqM - 1})) AS u(m)
       |  WHERE vec_id < $nq),
       |lut AS (SELECT query_id, q.m, c.code, ${dotSql("q.qsv", "c.ce")} AS pd
       |  FROM qs q JOIN cb c ON q.m = c.m)""".stripMargin
  }

  def pqCtes(nq: Int): String =
    s"$unCte,\n${pqTrainEncCtes("un")},\n${pqQueryLutCtes(nq)}"

  /** sim_pq_topk oracle tail over [[pqCtes]]: full-corpus ADC fold +
    * per-query rank.
    */
  def pqTopkOracle(nq: Int, k: Int): String =
    s"""WITH ${pqCtes(nq)},
       |adc AS (SELECT l.query_id, e.vec_id AS neighbor_id,
       |    list_sum(list(l.pd ORDER BY l.m)) AS adc
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
       |  WHERE e.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, adc,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM adc)
       |SELECT query_id, neighbor_id, adc, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_ivfpq_topk oracle: the IVFADC composition — the PQ CTE chain
    * ([[pqCtes]]) for codebooks/codes/LUTs, the k-means CTE chain
    * ([[kmeansSql]]) for the coarse quantizer, candidates restricted to
    * the query's nprobe probed cells, ADC fold in subspace order, then
    * exact-cosine re-rank of the ADC shortlist.
    */
  def ivfpqOracle(nq: Int, k: Int, nlist: Int = 16,
                          nprobe: Int = 4, shortlist: Int = 20,
                          corpusPred: String = "TRUE"): String =
    s"""WITH ${pqCtes(nq)},
       |${kmeansSql(nlist, Similarity.ivfIters)},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c WHERE $corpusPred) t WHERE rn = 1),
       |probes AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $nq) q, cent c) t WHERE rn <= $nprobe),
       |cand AS (SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.query_id),
       |adcs AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
       |    list_sum(list(l.pd ORDER BY l.m)) AS adc
       |  FROM cand cd JOIN enc e ON e.vec_id = cd.vec_id
       |  JOIN lut l ON l.query_id = cd.query_id
       |    AND l.m = e.m AND l.code = e.code
       |  GROUP BY 1, 2),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC, neighbor_id) AS rn
       |    FROM adcs) t WHERE rn <= $shortlist),
       |qq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq),
       |s AS (SELECT sh.query_id, sh.neighbor_id,
       |        ${cosSql("qq.qe", "c.embedding")} AS sim
       |      FROM short sh
       |      JOIN embeddings c ON c.vec_id = sh.neighbor_id
       |      JOIN qq ON qq.query_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_ivfpq_append oracle: the maintenance contract — quantizers
    * (coarse k-means AND the PQ codebooks) train on the BASE
    * four-fifths split only (`vec_id % 5 <> 4` — seeds, training
    * sample, and Lloyd iterations all see base rows exclusively,
    * exactly what the engine's build-on-base stored), while
    * assignment, encoding, probing, and re-rank run over the FULL
    * corpus — the layout the engine serves after appending the batch
    * fifth with the stored quantizers. Everything else is
    * [[ivfpqOracle]] verbatim.
    */
  def ivfpqAppendOracle(nq: Int, k: Int, nlist: Int = 16,
                                nprobe: Int = 4, shortlist: Int = 20): String =
    s"""WITH eb AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id % 5 <> 4),
       |$unCte,
       |unb AS MATERIALIZED (SELECT * FROM un WHERE vec_id % 5 <> 4),
       |${pqTrainEncCtes("unb", "un")},
       |${pqQueryLutCtes(nq)},
       |${kmeansSql(nlist, Similarity.ivfIters, "eb")},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |probes AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $nq) q, cent c) t WHERE rn <= $nprobe),
       |cand AS (SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.query_id),
       |adcs AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
       |    list_sum(list(l.pd ORDER BY l.m)) AS adc
       |  FROM cand cd JOIN enc e ON e.vec_id = cd.vec_id
       |  JOIN lut l ON l.query_id = cd.query_id
       |    AND l.m = e.m AND l.code = e.code
       |  GROUP BY 1, 2),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC, neighbor_id) AS rn
       |    FROM adcs) t WHERE rn <= $shortlist),
       |qq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq),
       |s AS (SELECT sh.query_id, sh.neighbor_id,
       |        ${cosSql("qq.qe", "c.embedding")} AS sim
       |      FROM short sh
       |      JOIN embeddings c ON c.vec_id = sh.neighbor_id
       |      JOIN qq ON qq.query_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_ivfpq_admit oracle: the streaming-ingestion replay, unrolled —
    * quantizers (coarse k-means + PQ codebooks) train on the BASE four
    * fifths exactly as in [[ivfpqAppendOracle]]; then per ingest step k
    * the probe's candidate corpus widens to base ∪ batches ≤ k
    * (`(vec_id div 5) % nB` assigns the batch fifth), each step
    * re-deriving the ADC fold, shortlist, and exact-cosine re-rank over
    * its own corpus — the layout the engine serves after k production
    * appends, since appends never retrain quantizers. Training,
    * encoding, probes, and LUTs are shared CTEs; only the per-step
    * candidate set differs.
    */
  def ivfpqAdmitOracle(nB: Int, nq: Int, k: Int, nlist: Int = 16,
                               nprobe: Int = 4,
                               shortlist: Int = 20): String = {
    val steps = (0 until nB).map { kk =>
      s"""cand$kk AS (SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a USING (cell)
         |  WHERE a.vec_id <> p.query_id
         |    AND (a.vec_id % 5 <> 4 OR (a.vec_id // 5) % $nB <= $kk)),
         |adcs$kk AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
         |    list_sum(list(l.pd ORDER BY l.m)) AS adc
         |  FROM cand$kk cd JOIN enc e ON e.vec_id = cd.vec_id
         |  JOIN lut l ON l.query_id = cd.query_id
         |    AND l.m = e.m AND l.code = e.code
         |  GROUP BY 1, 2),
         |short$kk AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc DESC, neighbor_id) AS rn
         |    FROM adcs$kk) t WHERE rn <= $shortlist),
         |s$kk AS (SELECT sh.query_id, sh.neighbor_id,
         |        ${cosSql("qq.qe", "c.embedding")} AS sim
         |      FROM short$kk sh
         |      JOIN embeddings c ON c.vec_id = sh.neighbor_id
         |      JOIN qq ON qq.query_id = sh.query_id),
         |r$kk AS (SELECT CAST($kk AS BIGINT) AS batch, query_id,
         |    neighbor_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM s$kk)""".stripMargin
    }.mkString(",\n")
    s"""WITH eb AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id % 5 <> 4),
       |$unCte,
       |unb AS MATERIALIZED (SELECT * FROM un WHERE vec_id % 5 <> 4),
       |${pqTrainEncCtes("unb", "un")},
       |${pqQueryLutCtes(nq)},
       |${kmeansSql(nlist, Similarity.ivfIters, "eb")},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM embeddings e, cent c) t WHERE rn = 1),
       |probes AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $nq) q, cent c) t WHERE rn <= $nprobe),
       |qq AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq),
       |$steps
       |SELECT batch, query_id, neighbor_id, sim, rank
       |FROM (${(0 until nB).map(kk => s"SELECT * FROM r$kk")
           .mkString(" UNION ALL ")}) allr
       |WHERE rank <= $k
       |ORDER BY batch, query_id, rank""".stripMargin
  }

  /** sim_ivfpq_res oracle: TRUE residual IVFADC — coarse k-means over
    * the unit corpus, PQ codebooks trained on residuals r = x − c(x),
    * per-(query, probed-cell) LUTs with the dot(q, c) offset, ADC fold
    * in subspace order, exact-cosine re-rank of the shortlist. Every
    * stage is generated from the same Similarity constants the engine
    * uses.
    */
  def ivfpqResidualOracle(nq: Int, k: Int, nlist: Int = 16,
                                  nprobe: Int = 4,
                                  shortlist: Int = 20): String = {
    import Similarity.{pqM, pqDsub}
    s"""WITH $unCte,
       |${kmeansSql(nlist, Similarity.ivfIters, "un")},
       |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM un e, cent c) t WHERE rn = 1),
       |res AS MATERIALIZED (SELECT a.vec_id,
       |    list_transform(list_zip(a.embedding, c.ce), p -> p[1] - p[2]) AS embedding,
       |    a.cell
       |  FROM assigned a JOIN cent c ON a.cell = c.centroid_id),
       |${pqTrainEncCtes("res")},
       |probes AS MATERIALIZED (
       |  SELECT query_id, qe, cell FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qe, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM (SELECT * FROM un WHERE vec_id < $nq) q, cent c) t WHERE rn <= $nprobe),
       |qres AS (SELECT p.query_id, p.cell,
       |    list_transform(list_zip(p.qe, c.ce), z -> z[1] - z[2]) AS qr,
       |    ${dotSql("p.qe", "c.ce")} AS qc
       |  FROM probes p JOIN cent c ON p.cell = c.centroid_id),
       |rqs AS (SELECT query_id, cell, qc, u.m,
       |    list_slice(qr, u.m * $pqDsub + 1, u.m * $pqDsub + $pqDsub) AS qsv
       |  FROM qres, unnest(generate_series(0, ${pqM - 1})) AS u(m)),
       |rlut AS (SELECT query_id, cell, qc, q.m, c.code,
       |    ${dotSql("q.qsv", "c.ce")} AS pd
       |  FROM rqs q JOIN cb c ON q.m = c.m),
       |cand AS (SELECT p.query_id, a.vec_id, a.cell
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.query_id),
       |adcs AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
       |    l.qc + list_sum(list(l.pd ORDER BY l.m)) AS adc
       |  FROM cand cd JOIN enc e ON e.vec_id = cd.vec_id
       |  JOIN rlut l ON l.query_id = cd.query_id AND l.cell = cd.cell
       |    AND l.m = e.m AND l.code = e.code
       |  GROUP BY cd.query_id, cd.vec_id, l.qc),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC, neighbor_id) AS rn
       |    FROM adcs) t WHERE rn <= $shortlist),
       |qq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq),
       |s AS (SELECT sh.query_id, sh.neighbor_id,
       |        ${cosSql("qq.qe", "c.embedding")} AS sim
       |      FROM short sh
       |      JOIN embeddings c ON c.vec_id = sh.neighbor_id
       |      JOIN qq ON qq.query_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** sim_mmr oracle: the SAME unrolled greedy recursion as
    * [[graft.ops.Similarity.mmrTopK]] — shortlist by cosine, then k
    * argmax steps each keeping a running max-sim-to-picked column. λ
    * and (1−λ) are interpolated from the identical Scala doubles
    * (including 1−0.7's last-ulp representation), so the float scores
    * and therefore the selection hash-match exactly.
    */
  def mmrOracle(nq: Int, k: Int, nCand: Int,
                        lambda: Double): String = {
    val om = 1.0 - lambda
    val steps = (2 to k).map { i =>
      val p = i - 1
      val sel =
        s"""s$i AS (SELECT query_id, cand_id, cemb, simq FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY simq * $lambda - ms * $om DESC, cand_id) AS rn
           |    FROM r$p) t WHERE rn = 1)""".stripMargin
      val rec = if (i < k)
        s""",
           |r$i AS (SELECT r.query_id, r.cand_id, r.cemb, r.simq,
           |    greatest(r.ms, ${cosSql("r.cemb", "s.cemb")}) AS ms
           |  FROM r$p r JOIN s$i s ON r.query_id = s.query_id
           |    AND r.cand_id <> s.cand_id)""".stripMargin
      else ""
      sel + rec
    }.mkString(",\n")
    val unioned = (1 to k).map(i =>
      s"""SELECT query_id, cand_id AS neighbor_id, simq AS sim,
         |    CAST($i AS BIGINT) AS mmr_rank FROM s$i""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id < $nq),
       |sc AS (SELECT q.query_id, e.vec_id AS cand_id, e.embedding AS cemb,
       |    ${cosSql("q.qe", "e.embedding")} AS simq
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |cands AS (SELECT query_id, cand_id, cemb, simq FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY simq DESC, cand_id) AS rn FROM sc) t
       |  WHERE rn <= $nCand),
       |s1 AS (SELECT query_id, cand_id, cemb, simq FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY simq DESC, cand_id) AS rn FROM cands) t WHERE rn = 1),
       |r1 AS (SELECT c.query_id, c.cand_id, c.cemb, c.simq,
       |    ${cosSql("c.cemb", "s.cemb")} AS ms
       |  FROM cands c JOIN s1 s ON c.query_id = s.query_id
       |    AND c.cand_id <> s.cand_id),
       |$steps
       |SELECT query_id, neighbor_id, sim, mmr_rank FROM ($unioned)
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  def ivfpqResidualRecallOracle(nq: Int, k: Int): String =
    s"""WITH iv AS (${ivfpqResidualOracle(nq, k)}),
       |bf AS (${cosineTopkOracle(nq, k)})
       |SELECT bf.query_id,
       |  CAST(count(iv.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN iv
       |  ON bf.query_id = iv.query_id AND bf.neighbor_id = iv.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** sim_ivfpq_recall oracle: recall@k of IVFADC vs brute-force cosine
    * (same join shape as the other recall gates).
    */
  def ivfpqRecallOracle(nq: Int, k: Int): String =
    s"""WITH iv AS (${ivfpqOracle(nq, k)}),
       |bf AS (${cosineTopkOracle(nq, k)})
       |SELECT bf.query_id,
       |  CAST(count(iv.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN iv
       |  ON bf.query_id = iv.query_id AND bf.neighbor_id = iv.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** sim_pq_rerank oracle: exact-cosine re-rank of the PQ shortlist. */
  def pqRerankOracle(nq: Int, k: Int, shortlist: Int): String =
    s"""WITH pq AS (${pqTopkOracle(nq, shortlist)}),
       |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |      WHERE vec_id < $nq),
       |s AS (SELECT pq.query_id, pq.neighbor_id,
       |        ${cosSql("q.qe", "c.embedding")} AS sim
       |      FROM pq
       |      JOIN embeddings c ON c.vec_id = pq.neighbor_id
       |      JOIN q ON q.query_id = pq.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** sim_pq_recall oracle: recall@k of PQ/ADC vs the brute-force
    * cosine ground truth (same join shape as sim_ivf_recall).
    */
  def pqRecallOracle(nq: Int, k: Int): String =
    s"""WITH pq AS (${pqTopkOracle(nq, k)}),
       |bf AS (${cosineTopkOracle(nq, k)})
       |SELECT bf.query_id,
       |  CAST(count(pq.neighbor_id) AS DOUBLE) / $k AS recall_at_k
       |FROM bf LEFT JOIN pq
       |  ON bf.query_id = pq.query_id AND bf.neighbor_id = pq.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  val sql: Map[String, String] = Map(
    "sim_cosine_topk" -> cosineTopkOracle(8, 5),
    "sim_lsh_topk" -> lshOracle,
    "sim_near_dup" -> nearDupOracle,
    "sim_ivf_topk" -> ivfOracle(8, 5),
    "sim_ivf_filtered" -> ivfOracle(8, 5, candPred = "a.label % 2 = 0"),
    // the stored filtered probe serves the same trained geometry, so
    // its oracle IS the inline filtered-IVF derivation
    "sim_ivfpq_filtered" -> ivfOracle(8, 5, candPred = "a.label % 2 = 0"),
    "sim_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS ce, label FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, label,
        |        $cosineSql AS sim
        |      FROM q, c WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, label, sim,
        |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM s),
        |v AS (SELECT query_id, label, count(*) AS votes FROM r WHERE rank <= 5
        |      GROUP BY query_id, label),
        |p AS (SELECT query_id, label, votes,
        |        row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
        |      FROM v)
        |SELECT query_id, CAST(label AS BIGINT) AS predicted_label, votes
        |FROM p WHERE rn = 1 ORDER BY query_id""".stripMargin,
    "sim_pq_topk" -> pqTopkOracle(8, 5),
    "sim_ivfpq_topk" -> ivfpqOracle(8, 5),
    "sim_ivfpq_res" -> ivfpqResidualOracle(8, 5),
    "sim_mmr" -> mmrOracle(8, 5, 20, 0.7),
    // salting is a physical-plan device: the oracle is the UNSALTED
    // plan, so the hash check proves result-identity under salting
    "sim_ivf_salted" -> ivfOracle(8, 5),
    "sim_kmeans_cells" -> kmeansCellsOracle(16),
    "sim_semdedup" -> semDedupOracle(16, 0.2),
    "sim_sq_topk" -> sqTopkOracle(8, 5),
    "sim_recall_gates" -> foldedOracle(
      Seq("query_id" -> "long", "recall_at_k" -> "double"),
      ("pq", Seq("query_id", "recall_at_k"), pqRecallOracle(8, 5)),
      ("sq", Seq("query_id", "recall_at_k"), sqRecallOracle(8, 5)),
      ("ivf", Seq("query_id", "recall_at_k"), ivfRecallOracle(8, 5)),
      ("ivfpq", Seq("query_id", "recall_at_k"), ivfpqRecallOracle(8, 5)),
      ("ivfpq_res", Seq("query_id", "recall_at_k"),
        ivfpqResidualRecallOracle(8, 5)),
      ("ivf_filtered", Seq("query_id", "recall_at_k"),
        filteredRecallOracle(8, 5))),
    "sim_rerank_family" -> foldedOracle(
      Seq("query_id" -> "long", "neighbor_id" -> "long",
        "sim" -> "double", "rank" -> "long"),
      ("pq", Seq("query_id", "neighbor_id", "sim", "rank"),
        pqRerankOracle(8, 5, 20)),
      ("rp", Seq("query_id", "neighbor_id", "sim", "rank"),
        rpRerankOracle(8, 5, 20)),
      ("mrl", Seq("query_id", "neighbor_id", "sim", "rank"),
        mrlRerankOracle(8, 5, 20))),
    "sim_knn_family" -> foldedOracle(
      Seq("query_id" -> "long", "neighbor_id" -> "long",
        "sim" -> "double", "rank" -> "long"),
      ("graph", Seq("query_id", "neighbor_id", "sim", "rank"),
        knnGraphOracle(5)),
      ("refine", Seq("query_id", "neighbor_id", "sim", "rank"),
        knnRefineOracle(5))),
    "sim_label_prop" -> labelPropOracle(100, 5, 3),
    // the stored-index pair: the build's census is the k-means census
    // (the layout IS the trained assignment), and probing the stored
    // artifacts must be result-identical to the inline IVFADC plan —
    // parquet round-trips the trained doubles bit-exactly
    "sim_ivfpq_build" -> kmeansCellsOracle(16),
    "sim_ivfpq_stored" -> ivfpqOracle(8, 5),
    // health: occupancy over the same re-derived k-means assignment;
    // exact integer share (floor division to basis points)
    "sim_ivfpq_health" ->
      s"""WITH ${kmeansSql(16, Similarity.ivfIters)},
         |cent AS MATERIALIZED (SELECT * FROM cent${Similarity.ivfIters}),
         |assigned AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
         |    FROM embeddings e, cent c) t WHERE rn = 1),
         |pc AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY cell),
         |tot AS (SELECT count(*) AS n_total FROM assigned)
         |SELECT CAST(cell AS INTEGER) AS cell,
         |  CAST(n_vecs AS BIGINT) AS n_vecs,
         |  CAST(n_vecs * 10000 // n_total AS BIGINT) AS share_bp,
         |  n_vecs * 16 > n_total * 2 AS is_hot
         |FROM pc, tot ORDER BY cell""".stripMargin,
    // resplit: same assignment chain; hot cells (>1.1x mean) split by
    // cosine-nearer-of(pivot, centroid), pivot = min-vec_id member
    "sim_ivfpq_resplit" ->
      s"""WITH $resplitCtes
         |SELECT CAST(new_cell AS BIGINT) AS new_cell,
         |  CAST(min(cell) AS BIGINT) AS parent_cell,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  new_cell >= 16 AS is_split_half
         |FROM n GROUP BY new_cell ORDER BY new_cell""".stripMargin,
    // probe over the resplit generation: queries rank the augmented
    // centroid table (original centroids + pivots at cell+16), probe
    // nprobe of them, score only those partitions' members
    "sim_ivfpq_resprobe" ->
      s"""WITH $resplitCtes,
         |aug AS MATERIALIZED (
         |  SELECT centroid_id AS cell, ce FROM cent
         |  UNION ALL SELECT pe.cell + 16 AS cell, pe.pe AS ce FROM pe),
         |probes AS MATERIALIZED (
         |  SELECT query_id, qe, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qe, a.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "a.ce")} DESC, a.cell) AS rn
         |    FROM (SELECT * FROM embeddings WHERE vec_id < 8) q, aug a) t
         |  WHERE rn <= 4),
         |s AS (SELECT query_id, n.vec_id AS neighbor_id,
         |        ${cosSql("p.qe", "n.embedding")} AS sim
         |      FROM probes p JOIN n ON n.new_cell = p.cell
         |      WHERE n.vec_id <> p.query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "sim_ivfpq_append" -> ivfpqAppendOracle(8, 5),
    "sim_ivfpq_admit" -> ivfpqAdmitOracle(3, 8, 5),
    // deletion: quantizers trained on the FULL corpus (the standing
    // index's training), candidates restricted to the survivors
    "sim_ivfpq_delete" -> ivfpqOracle(8, 5, corpusPred = "e.vec_id % 7 <> 3"),
    "sim_label_centroids" ->
      s"""WITH d AS (SELECT CAST(label AS BIGINT) AS label, vec_id, j,
        |    CAST(embedding[j] AS DOUBLE) AS v
        |  FROM embeddings, unnest(generate_series(1, ${Similarity.dim})) AS u(j)),
        |b AS (SELECT label, j, vec_id // ${Similarity.trainBlock} AS blk,
        |    list_sum(list(v ORDER BY vec_id)) AS bsum, count(*) AS bn
        |  FROM d GROUP BY label, j, blk)
        |SELECT label, CAST(j AS BIGINT) AS dim_idx,
        |  list_sum(list(bsum ORDER BY blk)) / sum(bn) AS mean_v
        |FROM b GROUP BY label, j ORDER BY label, dim_idx""".stripMargin,
  )
}
