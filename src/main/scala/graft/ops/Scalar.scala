package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-function coverage (SURVEY.md §2.2 "Scalar functions"): the
  * reference's own scalar surface is trim/split/lower/equality/parseInt/
  * min/round (O7–O10, O15); the engine exposes the full families —
  * string, date, math, array, map, JSON — as plain `functions._`
  * compositions so everything stays inside whole-stage codegen.
  *
  * Cross-engine parity notes (DuckDB oracle):
  *  - integer division / casts go through explicit floor (DuckDB CAST
  *    rounds, Spark truncates);
  *  - counts/lengths are cast to LongType (DuckDB len/count are BIGINT);
  *  - float math sticks to operations with exact IEEE semantics (sqrt,
  *    abs, +,*) or single divisions — never rounded multi-op chains.
  */
object Scalar {

  /** String family over part names: trim/upper/lower/substring/concat/
    * replace/lpad/reverse/length/split.
    */
  def stringFunctions(part: DataFrame): DataFrame =
    part.select(
        col("p_partkey"),
        col("p_name"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        reverse(col("p_type")).as("type_reversed"),
        length(col("p_name")).cast("long").as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("name_words"))
      .orderBy(col("p_partkey"))

  /** Date/time family over orders: extract fields, truncate, offset,
    * day difference against a fixed epoch.
    */
  def dateFunctions(orders: DataFrame): DataFrame =
    orders.select(
        col("o_orderkey"),
        col("o_orderdate"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_trunc("quarter", col("o_orderdate")).as("quarter_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(col("o_orderdate").cast("date"), lit("1994-01-01").cast("date"))
          .cast("long").as("days_since_epoch"))
      .orderBy(col("o_orderkey"))

  /** Math family over lineitem: abs/ceil/floor/sqrt/mod/power on
    * parity-exact operations only.
    */
  def mathFunctions(lineitem: DataFrame): DataFrame =
    lineitem.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        ceil(col("l_discount") * 100).cast("long").as("disc_pct_ceil"),
        floor(col("l_tax") * 100).cast("long").as("tax_pct_floor"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        (col("l_partkey") % 10).as("partkey_mod"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))

  /** Array family over embeddings: size / element access / slice /
    * fold-based L2 norm — the building blocks the similarity operators
    * reuse. The fold seeds 0.0 then adds left-to-right, which matches
    * any in-order list sum exactly (0.0 + x == x in IEEE).
    */
  def arrayFunctions(embeddings: DataFrame): DataFrame =
    embeddings.select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        // driver-comparable scalars, not an array column (the compare
        // sorts rows in pandas, which cannot sort ndarray cells)
        element_at(col("embedding"), 1).cast("double").as("head3_1"),
        element_at(col("embedding"), 2).cast("double").as("head3_2"),
        element_at(col("embedding"), 3).cast("double").as("head3_3"),
        aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("norm_sq"))
      .orderBy(col("vec_id"))

  /** JSON family over events.props (JSON text): path extraction, typed
    * cast, and full `from_json` parsing into a struct column.
    */
  def jsonFunctions(events: DataFrame): DataFrame =
    events.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k_struct"))
      .orderBy(col("event_id"))

  /** Extended string family: split_part, left/right, repeat, translate,
    * predicates (contains/startswith/endswith), instr.
    */
  def stringFunctions2(part: DataFrame): DataFrame =
    part.select(
        col("p_partkey"),
        split(col("p_type"), " ").getItem(0).as("type_first_word"),
        substring(col("p_brand"), 1, 5).as("brand_left5"),
        col("p_name").substr(length(col("p_name")) - 3, lit(4)).as("name_right4"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels_upper"),
        col("p_name").contains("blue").as("has_blue"),
        col("p_type").startsWith("small").as("is_small_type"),
        col("p_type").endsWith("steel").as("is_steel"),
        instr(col("p_name"), " ").cast("long").as("first_space_at"))
      .orderBy(col("p_partkey"))

  /** Regex family: extract, match predicate, global replace, count. */
  def regexFunctions(part: DataFrame): DataFrame =
    part.select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_digits"),
        col("p_name").rlike("^[a-z]+ ").as("starts_lower_word"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_devoweled"),
        size(split(col("p_name"), "[aeiou]")).cast("long").as("vowel_segments"))
      .orderBy(col("p_partkey"))

  /** Extended date family over events' microsecond timestamps: quarter,
    * hour/minute/second, last_day, add_months, epoch extraction.
    */
  def dateFunctions2(events: DataFrame): DataFrame =
    events.select(
        col("event_id"),
        quarter(col("ts")).cast("long").as("q"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("m"),
        second(col("ts")).cast("long").as("s"),
        last_day(col("ts").cast("date")).as("month_end"),
        add_months(col("ts").cast("date"), 2).as("plus_2_months"),
        unix_micros(col("ts")).as("epoch_us"))
      .orderBy(col("event_id"))

  /** Extended array family over token arrays: contains, position, sort,
    * join, distinct count, max/min of the hashed tokens.
    */
  def arrayFunctions2(documents: DataFrame): DataFrame = {
    val tk = col("tk")
    documents
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        array_contains(tk, "data").as("has_data"),
        array_position(tk, "data").cast("long").as("data_at"),
        array_join(slice(sort_array(array_distinct(tk)), 1, 5), ",").as("first5_sorted"),
        element_at(sort_array(tk, asc = false), 1).as("max_token"),
        size(flatten(array(tk, tk))).cast("long").as("doubled_len"))
      .orderBy(col("doc_id"))
  }

  /** Map family: token → count map per document via map_from_entries,
    * then typed access. The MAP itself stays internal (MAP columns don't
    * survive the driver's pandas compare); the projected scalars are
    * fully oracle-checked. `the_count` coalesces to 0 so the column
    * stays int64 on both sides (a NULL would demote pandas to float64).
    */
  def mapFunctions(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    documents.createOrReplaceTempView("graft_docs_map")
    spark.sql(
      """SELECT doc_id,
        |  map_from_entries(sort_array(collect_list(struct(token, n)))) AS token_counts
        |FROM (
        |  SELECT doc_id, token, count(1) AS n
        |  FROM (SELECT doc_id, explode(split(text, ' ')) AS token FROM graft_docs_map)
        |  GROUP BY doc_id, token)
        |GROUP BY doc_id
        |""".stripMargin)
      .select(col("doc_id"),
        map_keys(col("token_counts")).getItem(0).as("a_key"),
        size(map_keys(col("token_counts"))).cast("long").as("n_distinct"),
        coalesce(element_at(col("token_counts"), "the"), lit(0L)).as("the_count"),
        size(map_filter(col("token_counts"), (_, v) => v >= 2))
          .cast("long").as("n_repeated"),
        aggregate(map_values(transform_values(col("token_counts"),
            (_, v) => v * 2L)), lit(0L), (acc, x) => acc + x)
          .as("double_total"))
      .orderBy(col("doc_id"))
  }

  /** Approximate distinct (HLL++). The raw estimate is engine-specific,
    * so the registered output carries the exact count plus a BOOLEAN
    * accuracy gate (estimate within ±10% of exact) — the oracle asserts
    * the gate is true, turning HLL accuracy itself into a hash-checkable
    * property instead of settling for a rows-only check.
    */
  def approxDistinct(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
           countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= lit(0.1) * col("exact_parts")).as("approx_within_10pct"))
      .orderBy(col("l_returnflag"))

  /** Approximate median (KLL sketch via approx_percentile) gated by an
    * exact RANK envelope: the sketch's answer must land between the
    * exact 45th and 55th percentile values — the rank-error bound KLL
    * actually guarantees, checked in-engine. The oracle hash-checks the
    * exact median and the (engine-computed) pass flag, the same
    * accuracy-gate design as [[approxDistinct]].
    */
  def approxQuantileGate(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col("value").cast("decimal(12,2)")
    val byType = Window.partitionBy(col("event_type"))
    val ranked = events
      .select(col("event_type"), v.as("v"), col("event_id"))
      .withColumn("rn", row_number().over(
        byType.orderBy(col("v"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
    val qs = ranked.groupBy(col("event_type")).agg(
      min(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("exact_p50"),
      min(when(col("rn") === expr("greatest((45 * n) div 100, 1)"), col("v"))).as("p45"),
      min(when(col("rn") === expr("greatest((55 * n) div 100, 1)"), col("v"))).as("p55"))
    val ap = events.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("approx"))
    qs.join(ap, Seq("event_type"))
      .select(col("event_type"),
        col("exact_p50").cast("double").as("exact_p50"),
        (col("approx") >= col("p45").cast("double") &&
          col("approx") <= col("p55").cast("double")).as("approx_in_rank_band"))
      .orderBy(col("event_type"))
  }

  /** KMV bottom-k distinct sketch vs exact — unlike the HLL entry,
    * the md5-based hash makes the ESTIMATE itself engine-portable, so
    * the oracle hash-checks the sketch's actual output.
    */
  def kmvDistinct(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
           graft.functions.KmvSketch.estimate(
             Text.tokenHash(col("l_partkey").cast("string"))).as("kmv_est"))
      .orderBy(col("l_returnflag"))

  /** Shared Spark/DuckDB formula strings for [[statsMoments]]: the sums
    * are exact integers (quantity is integer-valued 1..50; price carries
    * exactly 2 decimals → cents as BIGINT), so every engine-specific
    * floating-point reduction is eliminated. The final moments are then
    * ONE identical double-arithmetic expression tree evaluated over
    * identical double inputs on both engines — IEEE 754 makes the result
    * bit-equal, so the driver can hash-check stddev/skew/kurtosis.
    * Stage 1 casts the exact sums to double; stage 2 is the textbook
    * power-sum moment algebra (M2/M3/M4 from Σx..Σx⁴).
    */
  val momentCastExprs: Seq[String] = Seq(
    "l_returnflag", "n", "qty_median", "p25c", "p50c", "p75c",
    "CAST(n AS DOUBLE) AS nd",
    "CAST(s1 AS DOUBLE) AS d1",
    "CAST(s2 AS DOUBLE) AS d2",
    "CAST(s3 AS DOUBLE) AS d3",
    "CAST(s4 AS DOUBLE) AS d4",
    "CAST(sy AS DOUBLE) AS dy",
    "CAST(sxy AS DOUBLE) AS dxy",
    "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu")

  val momentOutExprs: Seq[String] = Seq(
    "l_returnflag",
    "n AS n_rows",
    "mu AS qty_mean",
    "(d2 - d1 * mu) / (nd - 1.0) AS qty_var",
    "sqrt((d2 - d1 * mu) / (nd - 1.0)) AS qty_stddev",
    "sqrt(nd) * (d3 - 3.0 * mu * d2 + 2.0 * mu * mu * d1) / pow(d2 - d1 * mu, 1.5) AS qty_skew",
    "nd * (d4 - 4.0 * mu * d3 + 6.0 * mu * mu * d2 - 3.0 * mu * mu * mu * d1) / ((d2 - d1 * mu) * (d2 - d1 * mu)) - 3.0 AS qty_kurt",
    "(dxy - d1 * (dy / nd)) / (nd - 1.0) / 100.0 AS qty_price_covar",
    "qty_median",
    "p25c / 100.0 AS price_p25",
    "p50c / 100.0 AS price_p50",
    "p75c / 100.0 AS price_p75")

  /** Statistical moments + exact percentiles, hash-oracle-checkable:
    * sample variance/stddev, population skewness g1 and excess kurtosis
    * g2, sample covariance, and exact interpolated quartiles — all
    * derived from exact integer power sums (see [[momentCastExprs]]).
    * Percentiles run over integer-valued doubles, where Spark's
    * `percentile` and DuckDB's `quantile_cont` interpolate identically.
    */
  def statsMoments(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("q"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("pc"))
    val sums = base.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("s1"),
      sum(col("q") * col("q")).as("s2"),
      sum(col("q") * col("q") * col("q")).as("s3"),
      sum(col("q") * col("q") * col("q") * col("q")).as("s4"),
      sum(col("pc")).as("sy"),
      sum(col("q") * col("pc")).as("sxy"),
      expr("percentile(CAST(q AS DOUBLE), 0.5)").as("qty_median"),
      expr("percentile(CAST(pc AS DOUBLE), 0.25)").as("p25c"),
      expr("percentile(CAST(pc AS DOUBLE), 0.5)").as("p50c"),
      expr("percentile(CAST(pc AS DOUBLE), 0.75)").as("p75c"))
    sums.selectExpr(momentCastExprs: _*)
      .selectExpr(momentOutExprs: _*)
      .orderBy(col("l_returnflag"))
  }

  /** Cast/null-handling family: try_cast (ANSI-safe lossy casts return
    * NULL instead of throwing), nvl, null predicates. Inputs include
    * whitespace, empty strings, and garbage — the coercion surface the
    * reference's sink-side parsing implies (OBP.js:583-590).
    */
  def castFamily(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq("42", " 7 ", "3.14", "abc", "2020-01-02", "")
      .toDF("raw")
      .select(
        col("raw"),
        expr("try_cast(raw AS double)").as("as_double"),
        coalesce(expr("try_cast(raw AS date)"), lit("1900-01-01").cast("date"))
          .as("as_date"),
        coalesce(expr("try_cast(raw AS double)"), lit(-1.0)).as("dbl_or_neg1"),
        expr("try_cast(raw AS double)").isNotNull.as("is_numeric"),
        nullif(col("raw"), lit("")).isNull.as("is_empty"))
      .orderBy(col("raw"))
  }

  /** Higher-order array functions over token arrays: filter, exists,
    * forall, transform+aggregate (ordered fold), zip_with. All scalar
    * outputs so the driver compare stays array-free.
    */
  def hofFamily(documents: DataFrame): DataFrame = {
    val tk = col("tk")
    val lens = transform(tk, t => length(t).cast("string"))
    documents
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(filter(tk, t => length(t) > 6)).cast("long").as("n_long_tokens"),
        exists(tk, t => t.startsWith("a")).as("any_a_token"),
        forall(tk, t => length(t) > 0).as("all_nonempty"),
        aggregate(transform(tk, t => length(t).cast("long")), lit(0L),
          (acc, x) => acc + x).as("total_token_chars"),
        array_join(slice(zip_with(tk, lens, (t, l) => concat(t, lit(":"), l)), 1, 3), ",")
          .as("first3_tagged"))
      .orderBy(col("doc_id"))
  }

  /** Generator family: sequence() arrays (and their fold), the
    * DataFrame-side analog of a generate_series table function.
    */
  def sequenceFamily(nation: DataFrame): DataFrame =
    nation.select(
        col("n_nationkey"),
        size(sequence(lit(0L), col("n_nationkey"))).cast("long").as("seq_len"),
        aggregate(sequence(lit(0L), col("n_nationkey")), lit(0L),
          (acc, x) => acc + x).as("seq_sum"),
        array_join(transform(sequence(lit(1L), lit(3L)), i => i.cast("string")), "-")
          .as("one_two_three"))
      .orderBy(col("n_nationkey"))

  /** Custom typed UDAF (Aggregator) surface: one-pass count/min/max per
    * group. The double SUM the aggregator also carries stays internal —
    * double addition isn't associative, so only the order-independent
    * fields are exposed to the oracle.
    */
  def customStatsAgg(events: DataFrame): DataFrame = {
    val stats = org.apache.spark.sql.functions
      .udaf(graft.functions.StatsAggregator).apply(col("value"))
    events.groupBy(col("event_type"))
      .agg(stats.as("s"))
      .select(col("event_type"), col("s._1").as("n"),
        col("s._2").as("min_value"), col("s._3").as("max_value"))
      .orderBy(col("event_type"))
  }

  /** Date formatting/part-extraction family. Cross-engine traps handled:
    * Spark `dayofweek` is 1=Sunday while DuckDB's is 0=Sunday (align by
    * subtracting 1); both `weekofyear` are ISO; format patterns map
    * yyyy-MM ↔ %Y-%m.
    */
  def dateFormatFamily(orders: DataFrame): DataFrame =
    orders.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("period"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("stamp"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** URL parsing family: host/path/query extraction with `parse_url`
    * over URLs synthesized from fixture columns (deterministic input,
    * no fixture URL column exists).
    */
  def urlFamily(documents: DataFrame): DataFrame = {
    val url = concat(lit("https://corpus.example.com/"), col("lang"),
      lit("/doc/"), col("doc_id").cast("string"),
      lit("?src="), col("source"), lit("&v=2"))
    documents.select(
        col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("src")).as("src_param"))
      .orderBy(col("doc_id"))
  }

  /** Bitwise family: and/or/xor, shifts, popcount. */
  def bitsFamily(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey").cast("long")
    nation.select(
        col("n_nationkey"),
        k.bitwiseAND(lit(5L)).as("band"),
        k.bitwiseOR(lit(8L)).as("bor"),
        k.bitwiseXOR(lit(3L)).as("bxor"),
        shiftleft(k, 2).cast("long").as("shl"),
        shiftright(k, 1).cast("long").as("shr"),
        bit_count(k).cast("long").as("popcount"))
      .orderBy(col("n_nationkey"))
  }

  /** Struct (nested-record) family: named_struct creation, field
    * extraction, nested structs, and struct comparison — the row-type
    * surface. Outputs are flattened back to scalars (the driver compare
    * can't sort composite cells), so the oracle checks the VALUES that
    * went through the struct round-trip.
    */
  def structFamily(customer: DataFrame): DataFrame =
    customer
      .withColumn("s", struct(
        col("c_name").as("name"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"),
        struct(col("c_nationkey").cast("long").as("nk"),
          col("c_mktsegment").as("seg")).as("geo")))
      .select(
        col("c_custkey"),
        col("s.name").as("name_rt"),
        col("s.bal").cast("double").as("bal_rt"),
        col("s.geo.nk").as("nation_rt"),
        col("s.geo.seg").as("segment_rt"),
        (col("s.geo.nk") === col("c_nationkey").cast("long")).as("struct_eq"))
      .orderBy(col("c_custkey"))

  /** Generator family: posexplode (LATERAL VIEW / UNNEST WITH
    * ORDINALITY equivalent) — one output row per array element with its
    * position. The Generate node multiplies rows without a shuffle.
    */
  def generatorFamily(nation: DataFrame): DataFrame =
    nation
      .select(col("n_nationkey"),
        posexplode_outer(split(col("n_name"), "_")).as(Seq("pos", "part")))
      .select(col("n_nationkey"), col("pos").cast("long").as("pos"), col("part"))
      .orderBy(col("n_nationkey"), col("pos"))

  /** Conditional family over customer: CASE/coalesce/nullif/least/
    * greatest. (Both Spark and DuckDB least/greatest skip NULLs.)
    */
  def conditionalFunctions(customer: DataFrame): DataFrame =
    customer.select(
        col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", "B")
          .when(col("c_mktsegment") === "AUTOMOBILE", "A")
          .otherwise("other").as("segment_code"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("suppressed"))
          .as("segment_or_suppressed"),
        least(col("c_acctbal").cast("decimal(12,2)"), lit(5000).cast("decimal(12,2)"))
          .cast("double").as("capped_bal"),
        greatest(col("c_nationkey"), lit(10)).cast("long").as("floored_nation"))
      .orderBy(col("c_custkey"))

  /** Robust outlier detection (Tukey fences) per event type: discrete
    * quartiles picked by INTEGER rank — q1 at row ⌈n/4⌉, q3 at ⌈3n/4⌉
    * of the (value, event_id)-ordered partition — so both engines
    * select the same concrete data point (interpolated percentiles are
    * a float boundary; rank selection is exact). Fences are exact
    * decimal arithmetic (1.5·IQR is a power-of-two-friendly multiplier
    * but the decimals make it engine-exact regardless). One window
    * pass + one tiny fence join; the outlier count shuffles only the
    * group key.
    */
  def robustOutliers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col("value").cast("decimal(12,2)")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("v").asc, col("event_id").asc)
    val ranked = events
      .select(col("event_type"), col("event_id"), v.as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val quart = ranked
      .filter(col("rn") === expr("(n + 3) div 4") ||
        col("rn") === expr("(3 * n + 3) div 4"))
      .groupBy(col("event_type"))
      .agg(min(when(col("rn") === expr("(n + 3) div 4"), col("v"))).as("q1"),
        min(when(col("rn") === expr("(3 * n + 3) div 4"), col("v"))).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    // q1/q3 are constant within a group, so they ride through the
    // aggregate (min) instead of a second quart join — `quart` feeds
    // exactly one downstream chain
    events.select(col("event_type"), v.as("v"))
      .join(broadcast(quart), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("q1")).cast("double").as("q1"),
        min(col("q3")).cast("double").as("q3"),
        count(when(col("v") < col("q1") - col("iqr") * lit(1.5).cast("decimal(2,1)") ||
          col("v") > col("q3") + col("iqr") * lit(1.5).cast("decimal(2,1)"), 1))
          .as("n_outliers"))
      .select(col("event_type"), col("n_events"), col("q1"), col("q3"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }
}
