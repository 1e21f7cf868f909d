package graft.oracles

import graft.ops._
import Kit._

/** DuckDB oracles for the reference-core bulk-update family (bu_*), the relational tier (rel_*), scalar families (sca_*), streaming batch-analogs (str_*), and sketches/extensions (xtr_*).
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object BaseOracles {

  /** The same input as a DuckDB e'' literal (escapes handled by Verify). */
  val zipTextSql: String =
    "e'alpha\\n\\nbeta\\ngamma\\n   \\ndelta\\nepsilon\\nzeta\\n\\neta\\ntheta'"

  /** xtr_bloom_prune oracle, generated from the same (a,b)/P/m bloom
    * constants the Spark operator uses — DuckDB rebuilds the identical
    * 16-lane bit array and reproduces the filter's exact false positives.
    */
  def bloomPruneOracle: String = {
    val pos = Bloom.bloomAB.map { case (a, b) =>
      s"(($a * v + $b) % ${Bloom.P}) % ${Bloom.numBits}"
    }
    val bpl = Bloom.bitsPerLane
    val checks = pos.map { p =>
      s"(bl[CAST(($p) // $bpl AS INT) + 1] & (1::BIGINT << CAST(($p) % $bpl AS INT))) <> 0"
    }.mkString("\n        |          AND ")
    s"""WITH keys AS (SELECT DISTINCT c_custkey FROM customer WHERE c_nationkey = 7),
        |hv AS (SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS v
        |       FROM keys),
        |hs AS (SELECT unnest([${pos.mkString(", ")}]) AS h FROM hv),
        |lanebits AS (SELECT CAST(h // $bpl AS INT) AS lane,
        |               bit_or(1::BIGINT << CAST(h % $bpl AS INT)) AS bits
        |             FROM hs GROUP BY 1),
        |full_lanes AS (SELECT CAST(i AS INT) AS lane, coalesce(b.bits, 0::BIGINT) AS bits
        |               FROM range(0, ${Bloom.numLanes}) t(i)
        |               LEFT JOIN lanebits b ON b.lane = CAST(i AS INT)),
        |filt AS (SELECT list(bits ORDER BY lane) AS bl FROM full_lanes),
        |probe AS (SELECT o_custkey,
        |            ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS v
        |          FROM orders),
        |chk AS (SELECT o_custkey,
        |          ${checks} AS pass_bloom
        |        FROM probe CROSS JOIN filt),
        |q AS (SELECT o_custkey, pass_bloom,
        |        o_custkey IN (SELECT c_custkey FROM keys) AS is_member FROM chk)
        |SELECT count(*) AS n_rows,
        |  count(CASE WHEN pass_bloom THEN 1 END) AS n_pass_bloom,
        |  count(CASE WHEN is_member THEN 1 END) AS n_members,
        |  count(CASE WHEN pass_bloom AND NOT is_member THEN 1 END) AS n_false_pos
        |FROM q""".stripMargin
  }

  /** xtr_cms_topk oracle: the count-min counter matrix and point
    * estimates rebuilt from the same (a,b)/P/width constants.
    */
  def cmsOracle: String = {
    import CountMin.{cmAB, P, width}
    val rows = cmAB.zipWithIndex.map { case ((a, b), j) =>
      s"SELECT $j AS row, (($a * v + $b) % $P) % $width AS col FROM v"
    }.mkString("\n        |  UNION ALL ")
    val ests = cmAB.zipWithIndex.map { case ((a, b), j) =>
      s"""coalesce((SELECT n FROM counters c
          |      WHERE c.row = $j AND c.col = (($a * e.v + $b) % $P) % $width), 0::BIGINT)"""
        .stripMargin
    }.mkString(",\n        |    ")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |v AS (SELECT ('0x' || substr(md5(token), 1, 8))::BIGINT AS v FROM tok),
        |bkt AS (
        |  $rows),
        |counters AS (SELECT row, col, count(*) AS n FROM bkt GROUP BY 1, 2),
        |exact AS (SELECT token, count(*) AS exact_n FROM tok GROUP BY token
        |          ORDER BY exact_n DESC, token LIMIT 20),
        |e AS (SELECT token, exact_n,
        |        ('0x' || substr(md5(token), 1, 8))::BIGINT AS v FROM exact),
        |est AS (SELECT token, exact_n, least(
        |    $ests) AS est_n FROM e)
        |SELECT token, exact_n, est_n, est_n - exact_n AS overcount
        |FROM est ORDER BY exact_n DESC, token""".stripMargin
  }

  /** xtr_zorder_key oracle: the builtin-twin bit-interleave expanded to
    * DuckDB SQL (generated from the same bit width as the native
    * expression).
    */
  def zorderOracle: String = {
    val z = graft.functions.ZOrderKey.zorderSqlDuckDb("l_partkey", "l_suppkey")
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST($z AS BIGINT) AS z_key
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin
  }

  /** xtr_approx_quantile oracle: exact rank-based median; the rank-band
    * pass flag is the engine-computed accuracy gate (same design as
    * xtr_approx_distinct — the oracle states the EXPECTED verdict, so a
    * sketch regression fails the hash check).
    */
  val approxQuantileOracle: String =
    """WITH ranked AS (
      |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  CAST(min(CASE WHEN rn = (n + 1) // 2 THEN v END) AS DOUBLE) AS exact_p50,
      |  true AS approx_in_rank_band
      |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** rel_pagerank oracle: the same fixed-point integer recurrence as
    * `Graph.pageRank`, unrolled to `iters` CTE rounds (the Scala loop
    * and this generator share `Graph.scale` and the 15/85/100
    * constants, so they cannot drift apart).
    */
  def pageRankOracle(iters: Int): String = {
    val sc = Graph.scale
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""r$i AS (
         |  SELECT n.id,
         |    CAST((15 * $sc) // (100 * cnt.n_nodes)
         |      + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS contrib
         |    FROM edges e JOIN r$p r ON e.src = r.id
         |    JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) c ON n.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
       |cnt AS (SELECT count(*) AS n_nodes FROM nodes),
       |edges AS MATERIALIZED (SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
       |                 CAST(s.s_nationkey AS BIGINT) AS dst
       |          FROM lineitem l
       |          JOIN orders o ON l.l_orderkey = o.o_orderkey
       |          JOIN customer c ON o.o_custkey = c.c_custkey
       |          JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |          WHERE c.c_nationkey <> s.s_nationkey),
       |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT id, CAST($sc // cnt.n_nodes AS BIGINT) AS rank
       |       FROM nodes CROSS JOIN cnt),
       |$rounds
       |SELECT n.n_nationkey, n.n_name, r.rank AS rank_scaled
       |FROM r$iters r JOIN nation n ON r.id = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY rank_scaled DESC, n.n_nationkey""".stripMargin
  }

  /** rel_concomp oracle: the algorithm-independent FIXPOINT —
    * component(id) = min node reachable over the symmetrized edge set,
    * re-derived by a recursive min-reachability closure. The engine's
    * large-star/small-star rounds must land on exactly this labeling,
    * so the oracle checks the RESULT contract, not the round structure.
    */
  def concompOracle: String =
    s"""WITH RECURSIVE li AS MATERIALIZED (
       |  SELECT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderpriority = '1-URGENT' AND l_quantity >= 45),
       |e AS MATERIALIZED (SELECT DISTINCT a.pk AS src, b.pk AS dst
       |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |sym AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |reach AS (
       |  SELECT src AS id, src AS anc FROM sym
       |  UNION
       |  SELECT r.id, s.dst AS anc FROM reach r JOIN sym s ON r.anc = s.src),
       |m AS (SELECT id, min(anc) AS component FROM reach GROUP BY id),
       |sz AS (SELECT component, count(*) AS n_members FROM m GROUP BY component)
       |SELECT m.id AS part_id, m.component, sz.n_members
       |FROM m JOIN sz USING (component)
       |ORDER BY part_id""".stripMargin

  val sql: Map[String, String] = Map(
    "bu_broadcast" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | CASE WHEN l_quantity > 25 AND NOT (l_returnflag = 'R') THEN 'U'
        |      ELSE l_linestatus END AS l_linestatus
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,
    "bu_zip" ->
      s"""WITH ls AS (
        |  SELECT list_filter(string_split($zipTextSql, chr(10)),
        |                     x -> trim(x) <> '') AS l),
        |vals AS (
        |  SELECT unnest(l) AS newval, generate_subscripts(l, 1) - 1 AS pos FROM ls),
        |vis AS (
        |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
        |  FROM orders WHERE o_orderstatus = 'O'),
        |upd AS (
        |  SELECT v.o_orderkey, newval FROM vis v JOIN vals USING (pos))
        |SELECT t.o_orderkey, t.o_orderstatus,
        |  CASE WHEN u.newval IS NOT NULL AND NOT (t.o_orderpriority = '1-URGENT')
        |       THEN u.newval ELSE t.o_orderpriority END AS o_orderpriority
        |FROM orders t
        |LEFT JOIN upd u ON t.o_orderkey = u.o_orderkey
        |ORDER BY t.o_orderkey""".stripMargin,
    "bu_zip_large" ->
      """WITH vals AS (
        |  SELECT i AS pos, 'v' || CAST(i AS VARCHAR) AS newval FROM range(0, 1000) t(i)),
        |vis AS (
        |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
        |  FROM orders WHERE o_orderstatus = 'O'),
        |upd AS (SELECT o_orderkey, newval FROM vis JOIN vals USING (pos))
        |SELECT t.o_orderkey, t.o_orderstatus,
        |  CASE WHEN u.newval IS NOT NULL AND NOT (t.o_orderpriority = '1-URGENT')
        |       THEN u.newval ELSE t.o_orderpriority END AS o_orderpriority
        |FROM orders t LEFT JOIN upd u ON t.o_orderkey = u.o_orderkey
        |ORDER BY t.o_orderkey""".stripMargin,
    "bu_outcome" ->
      """SELECT
        | count(CASE WHEN l_quantity > 25 AND NOT (l_returnflag = 'R') THEN 1 END) AS n_updated,
        | count(CASE WHEN l_quantity > 25 AND l_returnflag = 'R' THEN 1 END) AS n_skipped_readonly,
        | count(CASE WHEN NOT (l_quantity > 25) THEN 1 END) AS n_hidden,
        | count(*) AS n_total
        |FROM lineitem""".stripMargin,
    "bu_readonly_guard" ->
      """SELECT max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_readonly,
        | count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_readonly
        |FROM lineitem""".stripMargin,
    "bu_split_lines" ->
      s"""WITH ls AS (
        |  SELECT list_filter(string_split($zipTextSql, chr(10)),
        |                     x -> trim(x) <> '') AS l)
        |SELECT generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS line
        |FROM ls ORDER BY pos""".stripMargin,
    "bu_bool_coerce" ->
      """SELECT raw, lower(trim(raw)) = 'true' AS coerced
        |FROM (VALUES ('true'),('True'),('TRUE'),(' true '),('false'),('FALSE'),
        |             ('1'),('yes'),(''),('truthy')) t(raw)
        |ORDER BY raw""".stripMargin,
    "bu_int_clamp" ->
      """SELECT raw,
        | greatest(0, CAST(floor(TRY_CAST(raw AS DOUBLE)) AS BIGINT)) AS clamped
        |FROM (VALUES ('400'),('0'),('-100'),('7'),('-1'),('250'),('abc'),
        |             (' 42 '),('3.9')) t(raw)
        |ORDER BY raw""".stripMargin,
    "bu_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 500""".stripMargin,
    "rel_join_strategies" -> foldedOracle(
      Seq("s_name" -> "string", "n_items" -> "long", "revenue" -> "double"),
      ("hash", Seq("s_name", "n_items", "revenue"),
        """SELECT s_name, count(*) AS n_items,
                | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
                |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                |GROUP BY s_name ORDER BY s_name""".stripMargin),
      ("merge", Seq("s_name", "n_items", "revenue"),
        """SELECT s_name, count(*) AS n_items,
                | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
                |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                |GROUP BY s_name ORDER BY s_name""".stripMargin)),
    "rel_resample" -> foldedOracle(
      Seq("user_id" -> "long", "day" -> "timestamp", "n_events" -> "long", "filled_value" -> "double", "interp_value" -> "double", "is_gap" -> "boolean"),
      ("ffill", Seq("user_id", "day", "n_events", "filled_value", "is_gap"),
        """WITH daily AS (
                |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                |    sum(CAST(value AS DECIMAL(12,2))) AS day_value,
                |    count(*) AS n_events
                |  FROM events GROUP BY 1, 2),
                |grid AS (
                |  SELECT user_id, unnest(generate_series(min(day), max(day),
                |    INTERVAL 1 DAY)) AS day
                |  FROM daily GROUP BY user_id)
                |SELECT g.user_id, g.day,
                |  CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
                |  CAST(last_value(d.day_value IGNORE NULLS) OVER (
                |    PARTITION BY g.user_id ORDER BY g.day
                |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                |    AS filled_value,
                |  d.day_value IS NULL AS is_gap
                |FROM grid g LEFT JOIN daily d
                |  ON g.user_id = d.user_id AND g.day = d.day
                |ORDER BY g.user_id, g.day""".stripMargin),
      ("interp", Seq("user_id", "day", "interp_value", "is_gap"),
        """WITH daily AS (
                |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                |    sum(CAST(value AS DECIMAL(12,2))) AS day_value
                |  FROM events GROUP BY 1, 2),
                |grid AS (
                |  SELECT user_id, unnest(generate_series(min(day), max(day),
                |    INTERVAL 1 DAY)) AS day
                |  FROM daily GROUP BY user_id),
                |br AS (
                |  SELECT g.user_id, g.day, d.day_value,
                |    last_value(d.day_value IGNORE NULLS) OVER (
                |      PARTITION BY g.user_id ORDER BY g.day
                |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                |    last_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                |      IGNORE NULLS) OVER (
                |      PARTITION BY g.user_id ORDER BY g.day
                |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                |    first_value(d.day_value IGNORE NULLS) OVER (
                |      PARTITION BY g.user_id ORDER BY g.day
                |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                |    first_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                |      IGNORE NULLS) OVER (
                |      PARTITION BY g.user_id ORDER BY g.day
                |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                |  FROM grid g LEFT JOIN daily d
                |    ON g.user_id = d.user_id AND g.day = d.day)
                |SELECT user_id, day,
                |  CASE WHEN day_value IS NOT NULL THEN CAST(day_value AS DOUBLE)
                |    ELSE CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                |      * (CAST(date_diff('day', CAST(pd AS DATE), CAST(day AS DATE)) AS DOUBLE)
                |         / CAST(date_diff('day', CAST(pd AS DATE), CAST(nd AS DATE)) AS DOUBLE))
                |  END AS interp_value,
                |  day_value IS NULL AS is_gap
                |FROM br ORDER BY user_id, day""".stripMargin)),
    "xtr_kmv" -> foldedOracle(
      Seq("l_returnflag" -> "string", "exact_parts" -> "long", "kmv_est" -> "double", "lang1" -> "string", "lang2" -> "string", "est_1" -> "double", "est_2" -> "double", "est_union" -> "double", "est_inter" -> "double", "jaccard_est" -> "double"),
      ("distinct", Seq("l_returnflag", "exact_parts", "kmv_est"),
        """WITH ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
                |            FROM lineitem GROUP BY 1),
                |h AS (SELECT DISTINCT l_returnflag,
                |        ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS hv
                |      FROM lineitem),
                |r AS (SELECT l_returnflag, hv,
                |        row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
                |        count(*) OVER (PARTITION BY l_returnflag) AS nd
                |      FROM h),
                |est AS (SELECT l_returnflag,
                |          CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                |               ELSE 63.0 * 4294967296.0 /
                |                    CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END AS kmv_est
                |        FROM r GROUP BY l_returnflag)
                |SELECT ex.l_returnflag, exact_parts, kmv_est
                |FROM ex JOIN est USING (l_returnflag)
                |ORDER BY l_returnflag""".stripMargin),
      ("overlap", Seq("lang1", "lang2", "est_1", "est_2", "est_union", "est_inter", "jaccard_est"),
        """WITH tok AS (SELECT lang,
                |        ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv
                |      FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS t
                |            FROM documents) u),
                |h AS (SELECT DISTINCT lang, hv FROM tok),
                |r AS (SELECT lang, hv,
                |        row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
                |      FROM h),
                |sk AS (SELECT lang, list(hv ORDER BY hv) AS s
                |       FROM r WHERE rn <= 64 GROUP BY lang),
                |p AS (SELECT a.lang AS lang1, b.lang AS lang2, a.s AS sa, b.s AS sb
                |      FROM sk a JOIN sk b ON a.lang < b.lang),
                |u2 AS (SELECT lang1, lang2, sa, sb,
                |        list_slice(list_sort(list_distinct(sa || sb)), 1, 64) AS su
                |       FROM p),
                |e AS (SELECT lang1, lang2,
                |    CASE WHEN len(sa) < 64 THEN CAST(len(sa) AS DOUBLE)
                |         ELSE 63.0 * 4294967296.0 / CAST(sa[64] AS DOUBLE) END AS est_1,
                |    CASE WHEN len(sb) < 64 THEN CAST(len(sb) AS DOUBLE)
                |         ELSE 63.0 * 4294967296.0 / CAST(sb[64] AS DOUBLE) END AS est_2,
                |    CASE WHEN len(su) < 64 THEN CAST(len(su) AS DOUBLE)
                |         ELSE 63.0 * 4294967296.0 / CAST(su[64] AS DOUBLE) END AS est_union
                |  FROM u2)
                |SELECT lang1, lang2, est_1, est_2, est_union,
                |  greatest(est_1 + est_2 - est_union, 0.0) AS est_inter,
                |  greatest(est_1 + est_2 - est_union, 0.0) / est_union AS jaccard_est
                |FROM e ORDER BY lang1, lang2""".stripMargin)),
    "xtr_quantiles" -> foldedOracle(
      Seq("event_type" -> "string", "exact_p50" -> "double", "approx_in_rank_band" -> "boolean", "l_returnflag" -> "string", "qty_p25" -> "double", "qty_p50" -> "double", "qty_p75" -> "double", "n" -> "long"),
      ("approx_gate", Seq("event_type", "exact_p50", "approx_in_rank_band"),
        approxQuantileOracle),
      ("grouped", Seq("l_returnflag", "qty_p25", "qty_p50", "qty_p75", "n"),
        """SELECT l_returnflag,
                | quantile_cont(l_quantity, 0.25) AS qty_p25,
                | quantile_cont(l_quantity, 0.5) AS qty_p50,
                | quantile_cont(l_quantity, 0.75) AS qty_p75,
                | count(*) AS n
                |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    "rel_topk_variants" -> foldedOracle(
      Seq("o_orderkey" -> "long", "o_custkey" -> "long", "o_totalprice" -> "double", "n_nationkey" -> "int", "s_suppkey" -> "long", "s_acctbal" -> "double"),
      ("native_heap", Seq("o_orderkey", "o_custkey", "o_totalprice"),
        """WITH r AS (SELECT o_orderkey, o_custkey, o_totalprice,
                |  row_number() OVER (PARTITION BY o_custkey
                |    ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 10000 AS BIGINT)
                |             * 10000000 + o_orderkey DESC) AS rn
                |  FROM orders)
                |SELECT o_orderkey, o_custkey, o_totalprice FROM r WHERE rn <= 3
                |ORDER BY o_custkey, o_orderkey""".stripMargin),
      ("lateral", Seq("n_nationkey", "s_suppkey", "s_acctbal"),
        """SELECT n_nationkey, s_suppkey, s_acctbal
                |FROM nation n,
                |LATERAL (SELECT s_suppkey, s_acctbal FROM supplier s
                |         WHERE s.s_nationkey = n.n_nationkey
                |         ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
                |ORDER BY n_nationkey, s_acctbal DESC, s_suppkey""".stripMargin)),
    "rel_argminmax" -> foldedOracle(
      Seq("l_partkey" -> "long", "l_suppkey" -> "long", "o_orderstatus" -> "string", "priciest_order" -> "long", "cheapest_order" -> "long", "max_price" -> "double", "min_price" -> "double"),
      ("argmin", Seq("l_partkey", "l_suppkey", "min_price"),
        """SELECT DISTINCT l_partkey, l_suppkey,
                | CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS min_price
                |FROM lineitem l
                |WHERE CAST(l_extendedprice AS DECIMAL(12,2)) = (
                |  SELECT min(CAST(x.l_extendedprice AS DECIMAL(12,2)))
                |  FROM lineitem x WHERE x.l_partkey = l.l_partkey)
                |ORDER BY l_partkey, l_suppkey""".stripMargin),
      ("minmax_by", Seq("o_orderstatus", "priciest_order", "cheapest_order", "max_price", "min_price"),
        """SELECT o_orderstatus,
                | arg_max(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 10000 AS BIGINT) * 10000000 + o_orderkey) AS priciest_order,
                | arg_min(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 10000 AS BIGINT) * 10000000 + o_orderkey) AS cheapest_order,
                | CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
                | CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
                |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),
    "sca_genseq" -> foldedOracle(
      Seq("n_nationkey" -> "int", "pos" -> "long", "part" -> "string", "seq_len" -> "long", "seq_sum" -> "long", "one_two_three" -> "string"),
      ("generators", Seq("n_nationkey", "pos", "part"),
        """WITH s AS (SELECT n_nationkey, string_split(n_name, '_') AS parts FROM nation)
                |SELECT n_nationkey, CAST(i - 1 AS BIGINT) AS pos, parts[i] AS part
                |FROM s, unnest(generate_series(1, len(parts))) AS u(i)
                |ORDER BY n_nationkey, pos""".stripMargin),
      ("sequence", Seq("n_nationkey", "seq_len", "seq_sum", "one_two_three"),
        """SELECT n_nationkey,
                | CAST(len(generate_series(0, n_nationkey)) AS BIGINT) AS seq_len,
                | CAST(list_sum(generate_series(0, n_nationkey)) AS BIGINT) AS seq_sum,
                | '1-2-3' AS one_two_three
                |FROM nation ORDER BY n_nationkey""".stripMargin)),
    "str_watermarks" -> foldedOracle(
      Seq("event_type" -> "string", "n_events" -> "long", "n_late" -> "long", "n_on_time" -> "long", "late_share" -> "double", "window_start" -> "timestamp", "n_users" -> "long"),
      ("late_audit", Seq("event_type", "n_events", "n_late", "n_on_time", "late_share"),
        """WITH b AS (SELECT event_type, epoch_us(ts) AS tsu,
                |    (epoch_us(ts)
                |      + (('0x' || substr(md5('lda:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                |         % 3600) * 1000000) // 3600000000 AS batch_id
                |  FROM events),
                |bm AS (SELECT batch_id, max(tsu) AS bmax FROM b GROUP BY batch_id),
                |wm AS (SELECT batch_id,
                |    max(bmax) OVER (ORDER BY batch_id
                |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                |      - 1800000000 AS wmu
                |  FROM bm),
                |t AS (SELECT event_type,
                |    (wmu IS NOT NULL AND tsu < wmu) AS late
                |  FROM b JOIN wm USING (batch_id))
                |SELECT event_type, count(*) AS n_events,
                |  CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                |  CAST(sum(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_on_time,
                |  CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                |    AS late_share
                |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin),
      ("window_users", Seq("window_start", "n_users", "n_events"),
        """SELECT date_trunc('hour', ts) AS window_start,
                | count(DISTINCT user_id) AS n_users, count(*) AS n_events
                |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin)),
    "rel_scd_family" -> foldedOracle(
      Seq("o_custkey" -> "long", "o_orderkey" -> "long", "o_orderstatus" -> "string", "effective_from" -> "timestamp", "effective_to" -> "timestamp", "is_current" -> "boolean", "op" -> "string", "n_rows" -> "long"),
      ("scd2", Seq("o_custkey", "o_orderkey", "o_orderstatus", "effective_from", "effective_to", "is_current"),
        """SELECT o_custkey, o_orderkey, o_orderstatus,
                | o_orderdate AS effective_from,
                | coalesce(lead(o_orderdate) OVER w, TIMESTAMP '2200-01-01') AS effective_to,
                | (lead(o_orderdate) OVER w IS NULL) AS is_current
                |FROM orders
                |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                |ORDER BY o_custkey, effective_from, o_orderkey""".stripMargin),
      ("snapshot_diff", Seq("op", "n_rows"),
        """WITH next AS (
                |  SELECT o_orderkey,
                |    o_orderstatus,
                |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
                |         ELSE o_totalprice END AS o_totalprice
                |  FROM orders WHERE o_orderkey % 97 <> 0
                |  UNION ALL
                |  SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
                |  FROM orders WHERE o_orderkey % 101 = 0),
                |d AS (SELECT
                |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                |         WHEN n.o_orderkey IS NULL THEN 'delete'
                |         WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                |           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                |           THEN 'update'
                |         ELSE 'same' END AS op
                |  FROM orders o FULL OUTER JOIN next n
                |    ON o.o_orderkey = n.o_orderkey)
                |SELECT op, count(*) AS n_rows FROM d GROUP BY op ORDER BY op""".stripMargin)),
    "rel_join_predicates" -> foldedOracle(
      Seq("ckey_s" -> "long", "n_pairs" -> "long", "revenue" -> "double", "n_items" -> "long"),
      ("null_safe", Seq("ckey_s", "n_pairs"),
        """SELECT coalesce(ckey, -1) AS ckey_s, count(*) AS n_pairs
                |FROM (SELECT nullif(CAST(c_nationkey % 5 AS BIGINT), 0) AS ckey FROM customer) c
                |JOIN (SELECT nullif(CAST(s_nationkey % 5 AS BIGINT), 0) AS skey FROM supplier) s
                |ON c.ckey IS NOT DISTINCT FROM s.skey
                |GROUP BY 1 ORDER BY 1""".stripMargin),
      ("disjunctive", Seq("revenue", "n_items"),
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                |   CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
                | count(*) AS n_items
                |FROM lineitem JOIN part ON l_partkey = p_partkey
                |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                |        AND l_quantity BETWEEN 1 AND 20)
                |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                |        AND l_quantity BETWEEN 10 AND 35)
                |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                |        AND l_quantity BETWEEN 20 AND 50)""".stripMargin)),
    "rel_asof_directed" -> foldedOracle(
      Seq("o_orderkey" -> "long", "next_event_id" -> "long", "next_ts" -> "timestamp", "event_id" -> "long", "asof_orderkey" -> "long", "asof_orderdate" -> "timestamp"),
      ("forward", Seq("o_orderkey", "next_event_id", "next_ts"),
        """SELECT o_orderkey, next_event_id, next_ts FROM (
                |  SELECT o.o_orderkey, e.event_id AS next_event_id, e.ts AS next_ts,
                |         row_number() OVER (PARTITION BY o.o_orderkey
                |                            ORDER BY e.ts ASC, e.event_id ASC) AS rn
                |  FROM orders o JOIN events e
                |    ON o.o_custkey = e.user_id AND e.ts >= o.o_orderdate) t
                |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin),
      ("merge_scan", Seq("event_id", "asof_orderkey", "asof_orderdate"),
        """SELECT event_id, asof_orderkey, asof_orderdate FROM (
                |  SELECT e.event_id, o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
                |         row_number() OVER (PARTITION BY e.event_id
                |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
                |  FROM events e JOIN orders o
                |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
                |WHERE rn = 1 ORDER BY event_id""".stripMargin)),
    "rel_set_ops" -> foldedOracle(
      Seq("nk" -> "int", "n" -> "long"),
      ("union", Seq("nk", "n"),
        "SELECT nk, CAST(1 AS BIGINT) AS n FROM (" + (
        """SELECT c_nationkey AS nk FROM customer
                |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) + ") q1"),
      ("intersect", Seq("nk", "n"),
        "SELECT nk, CAST(1 AS BIGINT) AS n FROM (" + (
        """SELECT c_nationkey AS nk FROM customer
                |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) + ") q1"),
      ("except", Seq("nk", "n"),
        "SELECT nk, CAST(1 AS BIGINT) AS n FROM (" + (
        """SELECT c_nationkey AS nk FROM customer
                |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) + ") q1"),
      ("union_all", Seq("nk", "n"),
        """SELECT nk, count(*) AS n FROM (
                |  SELECT c_nationkey AS nk FROM customer
                |  UNION ALL SELECT s_nationkey FROM supplier) t
                |GROUP BY nk ORDER BY nk""".stripMargin),
      ("intersect_all", Seq("nk", "n"),
        """SELECT nk, count(*) AS n FROM (
                |  SELECT c_nationkey AS nk FROM customer
                |  INTERSECT ALL SELECT s_nationkey FROM supplier) t
                |GROUP BY nk ORDER BY nk""".stripMargin),
      ("except_all", Seq("nk", "n"),
        """SELECT nk, count(*) AS n FROM (
                |  SELECT c_nationkey AS nk FROM customer
                |  EXCEPT ALL SELECT s_nationkey FROM supplier) t
                |GROUP BY nk ORDER BY nk""".stripMargin)),
    "rel_grouping_family" -> foldedOracle(
      Seq("k1" -> "string", "k2" -> "string", "n" -> "long", "agg" -> "double"),
      ("rollup", Seq("k1", "k2", "n", "agg"),
        "SELECT o_orderstatus AS k1, o_orderpriority AS k2, n, total AS agg FROM (" + (
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
                |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
                |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) + ") qg"),
      ("cube", Seq("k1", "k2", "n", "agg"),
        "SELECT l_returnflag AS k1, l_linestatus AS k2, n, sum_qty AS agg FROM (" + (
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
                |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) + ") qg"),
      ("gsets", Seq("k1", "k2", "n", "agg"),
        "SELECT o_orderstatus AS k1, o_orderpriority AS k2, n, total AS agg FROM (" + (
        """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
                | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) + ") qg")),
    "rel_semi_anti" -> foldedOracle(
      Seq("c_custkey" -> "long", "c_name" -> "string", "c_mktsegment" -> "string", "acctbal" -> "double"),
      ("semi", Seq("c_custkey", "c_name", "c_mktsegment"),
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
                |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                |ORDER BY c_custkey""".stripMargin),
      ("anti", Seq("c_custkey", "c_name", "acctbal"),
        """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
                |FROM customer
                |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                |ORDER BY c_custkey""".stripMargin)),
    "bu_merge" ->
      """SELECT l_returnflag,
        | CASE WHEN l_quantity >= 45 THEN CAST(0.99 AS DOUBLE)
        |      ELSE l_discount END AS l_discount,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        | count(*) AS count_order,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_revenue_by_region" ->
      """SELECT r_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "rel_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
        | coalesce(n_orders, 0) AS n_orders, total_spend
        |FROM (SELECT c_custkey, c_name FROM customer) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        |  FROM orders GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "rel_right_outer" ->
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM (SELECT c_custkey, c_mktsegment FROM customer) c
        |RIGHT JOIN (SELECT o_orderkey, o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
    "rel_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice, rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC, o_orderkey ASC) AS rk
        |      FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "rel_window_running" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(l_quantity AS DOUBLE) AS qty,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (
        |   PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        | CAST(lag(CAST(l_quantity AS DECIMAL(18,4)), 1) OVER (
        |   PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS DOUBLE) AS prev_qty,
        | CAST(lead(CAST(l_quantity AS DECIMAL(18,4)), 1) OVER (
        |   PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS DOUBLE) AS next_qty,
        | rank() OVER (PARTITION BY l_orderkey
        |              ORDER BY CAST(l_quantity AS DECIMAL(18,4)) DESC,
        |                       l_linenumber, l_partkey, l_suppkey) AS rank_in_order
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "rel_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "rel_count_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "rel_range_join" ->
      """SELECT bucket, count(*) AS n_parts, min(p_size) AS min_size, max(p_size) AS max_size
        |FROM part
        |JOIN (VALUES (0, 9, 'small'), (10, 29, 'medium'), (30, 1000, 'large')) b(lo, hi, bucket)
        |  ON p_size >= lo AND p_size <= hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "rel_asof_join" ->
      """SELECT event_id, asof_orderkey, asof_orderdate FROM (
        |  SELECT e.event_id, o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "rel_pivot" ->
      """SELECT o_orderstatus,
        | count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        | count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
        | count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_medium,
        | count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_notspec,
        | count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "rel_window_family" ->
      """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
        | CAST(ntile(4) OVER w AS BIGINT) AS bucket4,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | CAST(first_value(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |   (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,4)), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS cheapest,
        | CAST(last_value(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |   (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,4)), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS priciest,
        | CAST(nth_value(CAST(o_totalprice AS DECIMAL(18,4)), 2) OVER
        |   (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,4)), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_cheapest,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |   (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,4))
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_range,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_rows
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) ASC, o_orderkey ASC)
        |ORDER BY o_custkey, totalprice, o_orderkey""".stripMargin,
    "sca_string2" ->
      """SELECT p_partkey,
        | split_part(p_type, ' ', 1) AS type_first_word,
        | substring(p_brand, 1, 5) AS brand_left5,
        | substring(p_name, length(p_name) - 3, 4) AS name_right4,
        | repeat(p_brand, 2) AS brand_twice,
        | translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper,
        | contains(p_name, 'blue') AS has_blue,
        | starts_with(p_type, 'small') AS is_small_type,
        | ends_with(p_type, 'steel') AS is_steel,
        | CAST(strpos(p_name, ' ') AS BIGINT) AS first_space_at
        |FROM part ORDER BY p_partkey""".stripMargin,
    "sca_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_brand, '([0-9]+)', 1) AS brand_digits,
        | regexp_matches(p_name, '^[a-z]+ ') AS starts_lower_word,
        | regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
        | CAST(len(string_split_regex(p_name, '[aeiou]')) AS BIGINT) AS vowel_segments
        |FROM part ORDER BY p_partkey""".stripMargin,
    "sca_date2" ->
      """SELECT event_id,
        | CAST(quarter(ts) AS BIGINT) AS q,
        | CAST(hour(ts) AS BIGINT) AS h,
        | CAST(minute(ts) AS BIGINT) AS m,
        | CAST(second(ts) AS BIGINT) AS s,
        | last_day(CAST(ts AS DATE)) AS month_end,
        | CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2_months,
        | epoch_us(ts) AS epoch_us
        |FROM events ORDER BY event_id""".stripMargin,
    "sca_array2" ->
      """SELECT doc_id,
        | list_contains(string_split(text, ' '), 'data') AS has_data,
        | CAST(list_position(string_split(text, ' '), 'data') AS BIGINT) AS data_at,
        | array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5_sorted,
        | list_sort(string_split(text, ' '), 'DESC')[1] AS max_token,
        | CAST(len(flatten([string_split(text, ' '), string_split(text, ' ')])) AS BIGINT) AS doubled_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sca_string" ->
      """SELECT p_partkey, p_name,
        | upper(p_name) AS name_upper,
        | lower(p_brand) AS brand_lower,
        | substring(p_name, 1, 8) AS name_prefix,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        | lpad(p_brand, 12, '*') AS brand_padded,
        | reverse(p_type) AS type_reversed,
        | length(p_name) AS name_len,
        | len(string_split(p_name, ' ')) AS name_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "sca_date" ->
      """SELECT o_orderkey, o_orderdate,
        | year(o_orderdate) AS o_year,
        | month(o_orderdate) AS o_month,
        | day(o_orderdate) AS o_day,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
        | CAST(o_orderdate AS DATE) + 30 AS due_date,
        | date_diff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sca_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | abs(l_quantity - 25.0) AS qty_dev,
        | CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        | CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        | sqrt(l_extendedprice) AS price_sqrt,
        | l_partkey % 10 AS partkey_mod,
        | l_quantity * l_quantity AS qty_sq
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "sca_array" ->
      """SELECT vec_id,
        | len(embedding) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first_val,
        | CAST(embedding[1] AS DOUBLE) AS head3_1,
        | CAST(embedding[2] AS DOUBLE) AS head3_2,
        | CAST(embedding[3] AS DOUBLE) AS head3_3,
        | list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "sca_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
    "sca_conditional" ->
      """SELECT c_custkey,
        | CASE WHEN c_mktsegment = 'BUILDING' THEN 'B'
        |      WHEN c_mktsegment = 'AUTOMOBILE' THEN 'A'
        |      ELSE 'other' END AS segment_code,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'suppressed') AS segment_or_suppressed,
        | CAST(least(CAST(c_acctbal AS DECIMAL(12,2)), CAST(5000 AS DECIMAL(12,2))) AS DOUBLE) AS capped_bal,
        | CAST(greatest(c_nationkey, 10) AS BIGINT) AS floored_nation
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "xtr_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        | true AS approx_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "xtr_map_funcs" ->
      """WITH tc AS (SELECT doc_id, t.term, count(*) AS n
        |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |  GROUP BY doc_id, t.term)
        |SELECT doc_id,
        | min(term) AS a_key,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(coalesce(sum(CASE WHEN term = 'the' THEN n END), 0) AS BIGINT) AS the_count,
        | CAST(count(CASE WHEN n >= 2 THEN 1 END) AS BIGINT) AS n_repeated,
        | CAST(sum(n * 2) AS BIGINT) AS double_total
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "str_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "str_sliding" ->
      """SELECT window_start, event_type, count(*) AS n
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |             AS window_start, event_type
        |      FROM events) t
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // the stream-stream inner band join's batch-equivalent form (the
    // watermark only bounds state, so the pair set is identical)
    "str_click_attr" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts,
        |             value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, purchase_id,
        |  (epoch_us(p_ts) - epoch_us(c_ts)) // 60000000 AS mins_to_purchase,
        |  purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 10 MINUTE
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "str_session" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS is_break
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts, value,
        |         CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM y)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "rel_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rel_monthly_trend" ->
      """SELECT month, revenue, n_items,
        | lag(revenue, 1) OVER (ORDER BY month) AS prev_revenue
        |FROM (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |    count(*) AS n_items
        |  FROM lineitem GROUP BY 1) t
        |ORDER BY month""".stripMargin,
    "rel_string_agg" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        | string_agg(s_name, ',' ORDER BY s_name) AS names
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "rel_window_range_time" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "rel_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "rel_scalar_subquery" ->
      """SELECT o_orderstatus, count(1) AS n_above_avg
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |        (SELECT count(1) FROM orders)
        |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // same relation as rel_shuffle_hash_join — the oracle proves the
    // merge-hinted plan is result-identical to the hash-strategy one
    "sca_cast" ->
      """SELECT raw,
        | TRY_CAST(raw AS DOUBLE) AS as_double,
        | coalesce(TRY_CAST(raw AS DATE), DATE '1900-01-01') AS as_date,
        | coalesce(TRY_CAST(raw AS DOUBLE), CAST(-1.0 AS DOUBLE)) AS dbl_or_neg1,
        | TRY_CAST(raw AS DOUBLE) IS NOT NULL AS is_numeric,
        | nullif(raw, '') IS NULL AS is_empty
        |FROM (VALUES ('42'),(' 7 '),('3.14'),('abc'),('2020-01-02'),('')) t(raw)
        |ORDER BY raw""".stripMargin,
    "sca_hof" ->
      """SELECT doc_id,
        | CAST(len(list_filter(tk, t -> len(t) > 6)) AS BIGINT) AS n_long_tokens,
        | len(list_filter(tk, t -> starts_with(t, 'a'))) > 0 AS any_a_token,
        | len(list_filter(tk, t -> len(t) = 0)) = 0 AS all_nonempty,
        | CAST(list_sum(list_transform(tk, t -> len(t))) AS BIGINT) AS total_token_chars,
        | array_to_string(list_transform(list_zip(tk,
        |     list_transform(tk, t -> CAST(len(t) AS VARCHAR))),
        |   p -> p[1] || ':' || p[2])[1:3], ',') AS first3_tagged
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) s
        |ORDER BY doc_id""".stripMargin,
    "xtr_custom_agg" ->
      """SELECT event_type, count(*) AS n,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rel_market_basket" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS part1, b.l_partkey AS part2, count(*) AS n_orders
        |      FROM items a JOIN items b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2)
        |SELECT part1, part2, n_orders FROM p
        |ORDER BY n_orders DESC, part1, part2 LIMIT 20""".stripMargin,
    "rel_histogram" ->
      """SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |         // 1000000 * 10000 AS bin_floor,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_latest_per_key" ->
      """SELECT user_id, last_event_id, last_type, last_ts FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |         ts AS last_ts,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "sca_date3" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m') AS period,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS stamp,
        | CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sca_url" ->
      """WITH u AS (SELECT doc_id,
        |  'https://corpus.example.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
        |    || '?src=' || source || '&v=2' AS url FROM documents)
        |SELECT doc_id,
        | 'corpus.example.com' AS host,
        | regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        | regexp_extract(url, '\?(.*)$', 1) AS query,
        | regexp_extract(url, 'src=([^&]*)', 1) AS src_param
        |FROM u ORDER BY doc_id""".stripMargin,
    "rel_cohorts" ->
      """WITH a AS (SELECT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS act_day FROM events),
        |f AS (SELECT user_id, min(act_day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT cohort_day, act_day,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_day, act_day
        |ORDER BY cohort_day, act_day""".stripMargin,
    "rel_left_outer" ->
      """SELECT c_custkey, c_name, coalesce(n_orders, 0) AS n_orders
        |FROM customer
        |LEFT OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
        |                 FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "rel_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS next_type
        | FROM events)
        |SELECT event_type, next_type, count(*) AS n
        |FROM s WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY event_type, next_type""".stripMargin,
    "rel_salted_join" ->
      """SELECT s_name, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "xtr_corr_exact" ->
      """WITH m AS (SELECT count(*) AS n,
        |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
        |  sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
        |  sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
        | FROM lineitem)
        |SELECT n,
        | CAST(n * sxy - sx * sy AS DOUBLE) /
        |  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |   sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
        |FROM m""".stripMargin,
    // Hash-oracle for the moments query: the two double-arithmetic stages
    // are the SAME strings Spark evaluates (Scalar.momentCastExprs/
    // momentOutExprs), over exact integer sums — only the percentile
    // function name differs (quantile_cont ≡ percentile on
    // integer-valued doubles).
    "xtr_stats_moments" ->
      s"""WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
         |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
         | FROM lineitem),
         |s AS (SELECT l_returnflag, count(*) AS n,
         |  sum(q) AS s1, sum(q * q) AS s2, sum(q * q * q) AS s3,
         |  sum(q * q * q * q) AS s4, sum(pc) AS sy, sum(q * pc) AS sxy,
         |  quantile_cont(CAST(q AS DOUBLE), 0.5) AS qty_median,
         |  quantile_cont(CAST(pc AS DOUBLE), 0.25) AS p25c,
         |  quantile_cont(CAST(pc AS DOUBLE), 0.5) AS p50c,
         |  quantile_cont(CAST(pc AS DOUBLE), 0.75) AS p75c
         | FROM b GROUP BY l_returnflag),
         |d AS (SELECT ${graft.ops.Scalar.momentCastExprs.mkString(", ")} FROM s)
         |SELECT ${graft.ops.Scalar.momentOutExprs.mkString(", ")}
         |FROM d ORDER BY l_returnflag""".stripMargin,
    "rel_funnel" ->
      """WITH f AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
        |  FROM events GROUP BY user_id)
        |SELECT (fv IS NOT NULL AND fp IS NOT NULL AND fv < fp) AS converted,
        |  count(*) AS n_users
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "sca_bits" ->
      """SELECT n_nationkey,
        | CAST(n_nationkey & 5 AS BIGINT) AS band,
        | CAST(n_nationkey | 8 AS BIGINT) AS bor,
        | CAST(xor(CAST(n_nationkey AS BIGINT), 3) AS BIGINT) AS bxor,
        | CAST(n_nationkey << 2 AS BIGINT) AS shl,
        | CAST(n_nationkey >> 1 AS BIGINT) AS shr,
        | CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS popcount
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "rel_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "rel_unpivot" ->
      """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
        |ORDER BY p_partkey, measure""".stripMargin,
    "rel_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |          CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(4,2))) DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "rel_returned_items" ->
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |          CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | n_name
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(4,2))) DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // blocked semantics on both sides: candidates share a 3-gram
    // (txt_fuzzy_match) or their first token (txt_fuzzy_parts), then the
    // exact levenshtein verify runs per candidate
    "rel_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |          CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY supp_nation, cust_nation, ship_year
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    "rel_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        | CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        | sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0) h
        |  ON o_orderkey = h.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "rel_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "str_session_native" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS is_break
        |  FROM x),
        |z AS (
        |  SELECT user_id, event_id, ts, value,
        |         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, min(event_id) AS first_event_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "rel_supplier_dist" ->
      """SELECT p_brand, p_type,
        | count(DISTINCT l_suppkey) AS supplier_cnt,
        | count(DISTINCT l_partkey) AS part_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "rel_dq_audit" ->
      """SELECT 'orders_fk_customer' AS "check",
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_violations
        |UNION ALL SELECT 'lineitem_fk_orders',
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
        |UNION ALL SELECT 'orders_pk_unique',
        |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |UNION ALL SELECT 'customer_name_not_null',
        |  (SELECT count(*) FILTER (WHERE c_name IS NULL) FROM customer)
        |UNION ALL SELECT 'discount_in_unit_interval',
        |  (SELECT count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) FROM lineitem)
        |UNION ALL SELECT 'totalprice_positive',
        |  (SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders)
        |ORDER BY "check"""".stripMargin,
    "sca_struct" ->
      """SELECT c_custkey, c_name AS name_rt,
        | CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_rt,
        | CAST(c_nationkey AS BIGINT) AS nation_rt,
        | c_mktsegment AS segment_rt,
        | true AS struct_eq
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "xtr_bloom_prune" -> bloomPruneOracle,
    "xtr_zorder_key" -> zorderOracle,
    "xtr_cms_topk" -> cmsOracle,
    "rel_waiting_supp" ->
      """WITH f AS (
        |  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |ps AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS my_max
        |       FROM f GROUP BY 1, 2),
        |w AS (SELECT s.l_orderkey, s.l_suppkey FROM ps s
        |      WHERE EXISTS (SELECT 1 FROM ps x
        |                    WHERE x.l_orderkey = s.l_orderkey
        |                      AND x.l_suppkey <> s.l_suppkey)
        |        AND NOT EXISTS (SELECT 1 FROM ps y
        |                        WHERE y.l_orderkey = s.l_orderkey
        |                          AND y.l_suppkey <> s.l_suppkey
        |                          AND y.my_max >= s.my_max))
        |SELECT sp.s_suppkey, sp.s_name, count(*) AS numwait
        |FROM w JOIN supplier sp ON w.l_suppkey = sp.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, sp.s_suppkey
        |LIMIT 10""".stripMargin,
    "xtr_outliers" ->
      """WITH ranked AS (
        |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |quart AS (
        |  SELECT event_type,
        |    min(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
        |    min(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3
        |  FROM ranked WHERE rn = (n + 3) // 4 OR rn = (3 * n + 3) // 4
        |  GROUP BY event_type),
        |j AS (SELECT e.event_type, CAST(e.value AS DECIMAL(12,2)) AS v,
        |        q.q1, q.q3, q.q3 - q.q1 AS iqr
        |      FROM events e JOIN quart q USING (event_type))
        |SELECT event_type, count(*) AS n_events,
        |  CAST(min(q1) AS DOUBLE) AS q1, CAST(min(q3) AS DOUBLE) AS q3,
        |  count(CASE WHEN v < q1 - iqr * 1.5 OR v > q3 + iqr * 1.5 THEN 1 END) AS n_outliers
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rel_event_paths" ->
      """WITH s AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |           FROM events GROUP BY user_id),
        |g AS (SELECT unnest(list_transform(generate_series(1, len(seq) - 2),
        |        i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2])) AS path
        |      FROM s WHERE len(seq) >= 3)
        |SELECT path, count(*) AS n FROM g
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "rel_idle_rich" ->
      """WITH t AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS s_bal,
        |         count(*) AS n_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer, t
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_bal > s_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "rel_pagerank" -> pageRankOracle(3),
    "rel_concomp" -> concompOracle,
    "rel_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "rel_promo_revenue" ->
      """WITH a AS (
        |  SELECT sum(CASE WHEN p_type = 'PROMO'
        |           THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - l_discount AS DECIMAL(4,2)) END) AS promo_dec,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_dec
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01')
        |SELECT 100.0 * CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) AS promo_pct,
        |  CAST(promo_dec AS DOUBLE) AS promo_revenue,
        |  CAST(total_dec AS DOUBLE) AS total_revenue
        |FROM a""".stripMargin,
    "rel_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "rel_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,4)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        |    sum(CAST(l_quantity AS DECIMAL(18,4)))
        |      OVER (PARTITION BY l_partkey) AS sum_qty,
        |    count(*) OVER (PARTITION BY l_partkey) AS n_items
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1')
        |SELECT CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_small
        |FROM li WHERE qty * 5 * n_items < sum_qty""".stripMargin,
    "rel_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1 - l_discount AS DECIMAL(4,2)) AS vol,
        |    (SELECT n_name FROM nation WHERE n_nationkey = s_nationkey) AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_custkey IN (
        |      SELECT c_custkey FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey
        |      JOIN region ON n_regionkey = r_regionkey
        |      WHERE r_name = 'ASIA'))
        |SELECT o_year,
        |  CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol END), 0) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE) AS mkt_share,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    "rel_min_cost_supp" ->
      """WITH pp AS (SELECT p_partkey FROM part
        |  WHERE p_size <= 15 AND p_type = 'ECONOMY'),
        |costs AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
        |  FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT c.l_partkey AS p_partkey, s_suppkey, s_name, n_name,
        |  s_acctbal, CAST(cost AS DOUBLE) AS supply_cost
        |FROM costs c
        |JOIN supplier ON c.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost = (SELECT min(cost) FROM costs c2
        |              WHERE c2.l_partkey = c.l_partkey)
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey""".stripMargin,
    "rel_priority_count" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "rel_nation_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1 - l_discount AS DECIMAL(4,2))
        |    - CAST(p_retailprice AS DECIMAL(12,2))
        |      * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%ring%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "rel_top_value_parts" ->
      """WITH suppin AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'),
        |vals AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_dec
        |  FROM lineitem JOIN suppin ON l_suppkey = s_suppkey
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM vals
        |WHERE val_dec * (SELECT count(*) FROM vals)
        |      > (SELECT sum(val_dec) FROM vals) * 2
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "rel_priority_mix" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "rel_bulk_suppliers" ->
      """WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        |qual AS (
        |  SELECT l_suppkey FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 50)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
        |ORDER BY s_suppkey""".stripMargin,
    "rel_triangles" ->
      """WITH edges AS MATERIALIZED (SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
        |                 CAST(s.s_nationkey AS BIGINT) AS dst
        |          FROM lineitem l
        |          JOIN orders o ON l.l_orderkey = o.o_orderkey
        |          JOIN customer c ON o.o_custkey = c.c_custkey
        |          JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |          WHERE c.c_nationkey <> s.s_nationkey),
        |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM edges WHERE src <> dst),
        |deg AS (SELECT id, count(*) AS deg FROM (
        |          SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) u
        |        GROUP BY id),
        |k AS MATERIALIZED (SELECT id, deg * 4294967296 + id AS k FROM deg),
        |o AS MATERIALIZED (SELECT CASE WHEN ka.k < kb.k THEN ka.k ELSE kb.k END AS u,
        |             CASE WHEN ka.k < kb.k THEN kb.k ELSE ka.k END AS v
        |      FROM und JOIN k ka ON und.a = ka.id JOIN k kb ON und.b = kb.id),
        |w AS (SELECT x.v AS p, y.v AS q FROM o x JOIN o y
        |      ON x.u = y.u AND x.v < y.v),
        |t AS (SELECT count(*) AS n_triangles
        |      FROM w JOIN o z ON w.p = z.u AND w.q = z.v)
        |SELECT (SELECT count(*) FROM und) AS n_edges,
        |       (SELECT count(*) FROM w) AS n_wedges,
        |       n_triangles
        |FROM t""".stripMargin,
    "str_dedup" ->
      """WITH k AS (
        |  SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
        |    event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)
        |                       ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)) AS n
        |  FROM events)
        |SELECT user_id, event_type, minute,
        |  event_id AS first_event_id, ts AS first_ts,
        |  CAST(n AS BIGINT) AS n_dups
        |FROM k WHERE rn = 1
        |ORDER BY user_id, event_type, minute""".stripMargin,
  )
}
