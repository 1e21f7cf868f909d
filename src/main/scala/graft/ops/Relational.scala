package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth (SURVEY.md §2.2): scans, filter/project, joins of
  * every flavor, hash aggregation, windows, sorts/top-k, set ops,
  * cube/rollup. Everything here composes built-in Catalyst operators —
  * predicate pushdown, column pruning, partial aggregation, broadcast
  * join selection and AQE come for free (SURVEY.md §4.2).
  *
  * Scale conventions:
  *  - dimension tables (region/nation/customer/supplier/part at TPC-H
  *    ratios) are broadcast explicitly — the fact table never shuffles
  *    for a dim join;
  *  - fact-fact joins (lineitem ⋈ orders) stay as shuffle joins on the
  *    join key so AQE can re-plan skew;
  *  - top-k is orderBy+limit (TakeOrderedAndProject: per-partition heap,
  *    no global sort);
  *  - per-group top-k uses a window partitioned by the group key —
  *    shuffles once on the key, never a global single-partition window.
  */
object Relational {

  /** Decimal(18,4) cast for money arithmetic: decimal sums are exact and
    * associative, so results are independent of partitioning/merge order
    * (double sums are not — they'd flap under AQE and between engines).
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Final-output cast: decimal aggregates leave the engine as DOUBLE.
    * Internally everything is exact decimal (associative, partition-order
    * independent); the one decimal→double conversion at the end is
    * correctly rounded in both Spark (BigDecimal.doubleValue) and DuckDB,
    * so both engines emit bit-identical float64 — which is also what the
    * driver's pandas-based compare reads back from parquet on both sides
    * (a DECIMAL output column round-trips as python Decimal objects on
    * one side and float64 on the other and can never hash-match).
    */
  def outD(c: Column): Column = c.cast("double")

  /** Money columns carry exactly 2 decimal digits (TPC-H convention), so
    * a (12,2)/(4,2) cast is EXACT — no rounding happens at all, and all
    * downstream arithmetic is pure decimal: associative, engine- and
    * partition-order-independent. Never round a multi-factor double
    * product (engines disagree on half-ulp ties).
    */
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private def rate(c: Column): Column  = c.cast("decimal(4,2)")

  /** l_extendedprice * (1 - l_discount), exact decimal. */
  def discPrice: Column = money(col("l_extendedprice")) * rate(lit(1) - col("l_discount"))
  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal. */
  def charge: Column = discPrice * rate(lit(1) + col("l_tax"))

  /** Pricing summary (TPC-H Q1 shape): hash agg with automatic
    * partial+final phases; one shuffle on the two group keys.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        outD(sum(dec(col("l_quantity")))).as("sum_qty"),
        outD(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        outD(sum(discPrice)).as("sum_disc_price"),
        outD(sum(charge)).as("sum_charge"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Star join: fact ⋈ broadcast dims up the FK chain
    * lineitem→orders→customer→nation→region. Only lineitem⋈orders
    * shuffles; every dim is broadcast.
    */
  def revenueByRegion(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        outD(sum(discPrice)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))

  /** TPC-H Q3 shape (shipping priority): the full analytic composition —
    * segment-filtered customers prune orders via a BROADCAST SEMI join
    * before the fact table is touched, both date predicates push into
    * the parquet scans, and the top-10 runs as TakeOrderedAndProject
    * (per-partition top-k + driver merge of 10 rows, never a global
    * sort). Revenue is ordered on the EXACT decimal (ties broken by
    * l_orderkey), so the limit boundary is engine-deterministic.
    */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame,
                       cutoff: String = "1998-06-01", k: Int = 10): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val buildingOrders = orders
      .filter(col("o_orderdate") < cut)
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_semi")
    lineitem
      .filter(col("l_shipdate") > cut)
      .join(buildingOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("l_orderkey"))
      .limit(k)
      .select(col("l_orderkey"), outD(col("rev_dec")).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** TPC-H Q10 shape (returned-item reporting): fact filtered on the
    * scan (returnflag pushdown), dims broadcast, top-k customers by
    * exact-decimal revenue.
    */
  def returnedItemRevenue(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, nation: DataFrame,
                          k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"),
          col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(discPrice).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("c_custkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_name"),
        outD(col("rev_dec")).as("revenue"), col("n_name"))

  /** TPC-H Q6 shape (forecasting revenue change): the pure scan-side
    * reduction — every predicate pushes into the parquet scan
    * (plan-audited), no join, one global aggregate. At 100 TB this
    * query is ENTIRELY I/O-bound on the pruned scan, which is the
    * point: the engine's job is to make sure nothing else happens.
    */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(outD(sum(money(col("l_extendedprice")) * rate(col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q14 shape (promotion effect): one year of lineitem joined
    * to the broadcast part dim; the promo share is a conditional sum
    * riding the SAME single aggregation as the total. Money stays
    * decimal until one final double division (mirrored textually by
    * the oracle, so even the percentage hash-matches).
    */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", discPrice)).as("promo_dec"),
        sum(discPrice).as("total_dec"))
      .select(
        (lit(100.0) * outD(col("promo_dec")) / outD(col("total_dec")))
          .as("promo_pct"),
        outD(col("promo_dec")).as("promo_revenue"),
        outD(col("total_dec")).as("total_revenue"))

  /** TPC-H Q15 shape (top supplier): per-supplier quarterly revenue,
    * then the max-revenue supplier(s) selected by an exact DECIMAL
    * equality against the one-row broadcast max — a double revenue
    * could drop a tied winner to representation error; decimal can't.
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    rev.join(broadcast(mx), col("rev_dec") === col("mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        outD(col("rev_dec")).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape (small-quantity revenue), container→brand
    * adapted to the fixture schema: revenue locked up in one brand's
    * below-20%-of-average-quantity orders. The per-part average
    * threshold is a WINDOW over the brand-pruned join (one shuffle,
    * one scan — no second join back), and the 0.2·avg comparison is
    * restated multiplicatively (5·qty·n < Σqty) so the whole predicate
    * is exact integer-decimal arithmetic — no division anywhere for
    * engines to round differently.
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame,
                      brand: String = "Brand#1"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    lineitem
      .join(broadcast(part.filter(col("p_brand") === brand)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty", sum(dec(col("l_quantity"))).over(w))
      .withColumn("n_items", count(lit(1)).over(w))
      .filter(dec(col("l_quantity")) * 5 * col("n_items") < col("sum_qty"))
      .agg((outD(sum(money(col("l_extendedprice")))) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** TPC-H Q8 shape (national market share): one nation's suppliers'
    * share of a region's import volume of one part type, by order
    * year. Every dimension is a broadcast build (part-type prune,
    * region-customer semi, supplier-nation tag); the national and
    * total volumes ride ONE aggregation as a conditional sum. Years
    * with no national volume coalesce to 0 (total, not null).
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, nation: DataFrame, region: DataFrame,
                  supplier: DataFrame, part: DataFrame,
                  regionName: String = "ASIA",
                  supplierNation: String = "NATION_3",
                  partType: String = "PROMO"): DataFrame = {
    val natRegion = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val custInRegion = customer
      .join(broadcast(natRegion), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = lineitem
      .join(broadcast(part.filter(col("p_type") === partType)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custInRegion),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        discPrice.as("vol"), col("supp_nation"))
    vol.groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === supplierNation, col("vol")))
          .as("nat_dec"),
        sum(col("vol")).as("tot_dec"))
      .select(col("o_year"),
        (outD(coalesce(col("nat_dec"), lit(0))) / outD(col("tot_dec")))
          .as("mkt_share"),
        outD(col("tot_dec")).as("total_volume"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q2 shape (min-cost supplier), with the supply-cost table
    * DERIVED from lineitem (the fixtures carry no partsupp): cost per
    * (part, supplier) = min observed extended price. The correlated
    * `cost = (SELECT min(cost) ... WHERE same part)` decorrelates to
    * aggregate-then-join; because the part filter is selective, the
    * per-part minima table is broadcast — the classic plan when the
    * probe side has already been pruned to a dimension-sized set.
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      maxSize: Int = 15, pType: String = "ECONOMY"): DataFrame = {
    val parts = part
      .filter(col("p_size") <= maxSize && col("p_type") === pType)
      .select(col("p_partkey"))
    val costs = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(money(col("l_extendedprice"))).as("cost"))
    val minCost = costs.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost")).as("min_cost"))
    costs
      .join(broadcast(minCost),
        col("l_partkey") === col("mk") && col("cost") === col("min_cost"))
      .join(broadcast(supplier
          .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            col("s_acctbal"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("n_name"),
        col("s_acctbal").cast("double").as("s_acctbal"),
        outD(col("cost")).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q4 shape (order priority checking): orders in one quarter
    * with EXISTS a returned line item, counted by priority. The semi
    * join reduces lineitem to its key column before any shuffle and
    * carries no payload; both sides stay partitioned on the order key
    * so AQE is free to pick shuffle-hash vs broadcast by actual size.
    */
  def priorityOrderCounts(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q9 shape (product-type profit by nation and year), cost
    * proxied by p_retailprice·quantity (no partsupp in the fixtures).
    * The name-pruned part dim and supplier→nation tag broadcast; the
    * one fact-fact shuffle is lineitem ⋈ orders on the order key. All
    * arithmetic is exact decimal until the final double cast, so the
    * nation/year sums are partition-order independent.
    */
  def nationProfit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                   supplier: DataFrame, nation: DataFrame,
                   namePattern: String = "%ring%"): DataFrame = {
    val amount = discPrice - money(col("p_retailprice")) * dec(col("l_quantity"))
    lineitem
      .join(broadcast(part.filter(col("p_name").like(namePattern))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier
          .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(outD(sum(amount)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock): per-part value from one
    * nation's suppliers, kept only where it exceeds a fixed fraction
    * of the GLOBAL total — a scalar subquery in HAVING. The global
    * total joins back as a broadcast one-row build, and the fraction
    * test is restated multiplicatively (value·1000 > total) so the
    * comparison is exact integer-decimal arithmetic on both engines.
    */
  def topValueParts(lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame,
                    nationName: String = "NATION_3"): DataFrame = {
    val suppIn = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = lineitem
      .join(broadcast(suppIn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(money(col("l_extendedprice"))).as("val_dec"))
    // TPC-H Q11 scales its fraction by 1/SF for exactly this reason: a
    // FIXED share-of-total threshold empties as the part count grows.
    // The data-driven restatement — keep parts worth > 2× the MEAN
    // per-part value (val · n_parts > 2 · total) — is scale-invariant,
    // stays all-integer×decimal (exact, hash-checkable), and still
    // exercises the Q11 shape: a global-scalar HAVING restated
    // multiplicatively against a one-row broadcast.
    val total = vals.agg(sum(col("val_dec")).as("tot_dec"),
      count(lit(1)).as("n_parts"))
    vals.join(broadcast(total),
        col("val_dec") * col("n_parts") > col("tot_dec") * 2)
      .select(col("l_partkey").as("p_partkey"),
        outD(col("val_dec")).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 shape (shipping-mode priority mix), return flag standing
    * in for the missing l_shipmode: one year of lineitem joined to the
    * orders dim, with high- and low-priority order counts riding one
    * aggregation as conditional sums.
    */
  def priorityMix(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q20 shape (bulk suppliers): suppliers whose shipped volume
    * of name-pruned parts crossed a threshold in one year — a nested
    * semi: qualified (supplier, part) pairs come from a HAVING over the
    * part-pruned fact scan, then supplier semi-joins the distinct
    * qualifying supplier set. The qualifying set is aggregate output
    * (dimension-sized), so its semi join broadcasts.
    */
  def bulkSuppliers(lineitem: DataFrame, part: DataFrame,
                    supplier: DataFrame, namePattern: String = "small%",
                    minQty: Int = 50): DataFrame = {
    val qualified = lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(broadcast(part.filter(col("p_name").like(namePattern))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > minQty)
      .select(col("l_suppkey")).distinct()
    supplier
      .join(broadcast(qualified), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Left-semi join: EXISTS. The orders side is reduced to its join key
    * before the shuffle (semi join needs no payload columns).
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: NOT EXISTS. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal").cast("double").as("acctbal"))
      .orderBy(col("c_custkey"))

  /** Full-outer join: customers ⋈ per-customer order rollup, keeping
    * both unmatched sides (customers without orders and — were the FK
    * ever violated — orders without customers).
    */
  def customerOrderFullOuter(customer: DataFrame, orders: DataFrame): DataFrame = {
    val counts = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           outD(sum(dec(col("o_totalprice")))).as("total_spend"))
    customer.select(col("c_custkey"), col("c_name"))
      .join(counts, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("total_spend"))
      .orderBy(col("custkey"))
  }

  /** Left-outer join: every customer kept; order-less customers surface
    * with zero counts (the aggregate side is pre-reduced, so the outer
    * join carries one row per customer, not per order).
    */
  def customerOrderLeftOuter(customer: DataFrame, orders: DataFrame): DataFrame = {
    val counts = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey"), col("c_name"))
      .join(counts, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Right-outer join: every order row kept, customer columns nullable. */
  def orderCustomerRightOuter(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"), col("c_mktsegment"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "right_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment").asc_nulls_first)

  /** Per-group top-k via ranked window: one shuffle on the partition key;
    * ties broken by orderkey so the result is deterministic.
    */
  def topOrdersPerCustomer(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("totalprice").desc, col("o_orderkey").asc)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).as("totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .withColumn("totalprice", outD(col("totalprice")))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Window frames: running sum / lag / lead within an order, frame
    * ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW. Decimal input so
    * the running sum is exact (engine-order independent).
    *
    * (l_orderkey, l_linenumber) is NOT unique in the fixtures; the window
    * order key includes l_partkey/l_suppkey to make the within-partition
    * order total — an ambiguous window order would make lag/lead
    * nondeterministic across engines.
    */
  def runningLineTotals(lineitem: DataFrame): DataFrame = {
    val ord = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val w = Window.partitionBy(col("l_orderkey")).orderBy(ord: _*)
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), dec(col("l_quantity")).as("qty"))
      .withColumn("running_qty",
        outD(sum(col("qty")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("prev_qty", outD(lag(col("qty"), 1).over(w)))
      .withColumn("next_qty", outD(lead(col("qty"), 1).over(w)))
      .withColumn("rank_in_order", rank().over(
        Window.partitionBy(col("l_orderkey")).orderBy((col("qty").desc +: ord): _*)).cast("long"))
      .withColumn("qty", outD(col("qty")))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
  }

  /** Global top-k: planned as TakeOrderedAndProject (per-partition heap +
    * driver merge of k rows), not a full sort — the shape that survives
    * 100 TB.
    */
  def topKByPrice(lineitem: DataFrame, k: Int): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        dec(col("l_extendedprice")).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(k)
      .withColumn("price", outD(col("price")))

  /** Set operations over the customer/supplier nation domains. */
  def nationKeysUnion(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .union(supplier.select(col("s_nationkey").as("nk")))
      .distinct().orderBy(col("nk"))

  def nationKeysIntersect(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .intersect(supplier.select(col("s_nationkey").as("nk")))
      .orderBy(col("nk"))

  def nationKeysExcept(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .except(supplier.select(col("s_nationkey").as("nk")))
      .orderBy(col("nk"))

  /** ROLLUP over order status/priority: partial aggregation still applies;
    * the grouping-id column disambiguates subtotal rows for the oracle.
    */
  def orderRollup(orders: DataFrame): DataFrame =
    orders.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), outD(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** CUBE over return flag/line status. */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), outD(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact + approximate distinct aggregation. The HLL++ estimate is
    * engine-specific so only the exact column is oracle-checked; the
    * approx column is exercised in the ScalaTest spec instead.
    */
  def distinctPartsPerSupplier(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_suppkey"))

  /** Theta (range) join: band join of part sizes against a tiny literal
    * bucket table — broadcast nested-loop on a BETWEEN condition.
    */
  def partSizeBuckets(part: DataFrame): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    val buckets = Seq((0, 9, "small"), (10, 29, "medium"), (30, 1000, "large"))
      .toDF("lo", "hi", "bucket")
    part.join(broadcast(buckets),
        col("p_size") >= col("lo") && col("p_size") <= col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_parts"),
           min(col("p_size")).as("min_size"),
           max(col("p_size")).as("max_size"))
      .orderBy(col("bucket"))
  }

  /** UNION ALL / INTERSECT ALL / EXCEPT ALL (bag semantics). */
  def nationKeysUnionAll(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .unionAll(supplier.select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))
      .orderBy(col("nk"))

  def nationKeysIntersectAll(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .intersectAll(supplier.select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))
      .orderBy(col("nk"))

  def nationKeysExceptAll(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .exceptAll(supplier.select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))
      .orderBy(col("nk"))

  /** GROUPING SETS via the SQL surface (the DataFrame API exposes only
    * rollup/cube); grouping_id disambiguates the aggregation level.
    */
  def orderGroupingSets(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    orders.createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(1) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  /** Pivot: order counts + decimal totals per status, one column per
    * priority class. Catalyst plans pivot as a single two-phase
    * aggregate (no per-column pass).
    */
  def orderPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .pivot(col("o_orderpriority"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high", "3-MEDIUM" -> "n_medium",
        "4-NOT SPECIFIED" -> "n_notspec", "5-LOW" -> "n_low"))
      .na.fill(0) // empty combinations: 0 like the oracle's CASE counts, not null
      .orderBy(col("o_orderstatus"))

  /** Unpivot (melt) — the inverse of [[orderPivot]]: wide measure
    * columns become (measure, value) rows. Planned as an Expand node:
    * one pass, rows × measures output, no shuffle.
    */
  def partMeasuresUnpivot(part: DataFrame): DataFrame =
    part
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "measure", "value")
      .orderBy(col("p_partkey"), col("measure"))

  /** The full ranking/distribution window family: ntile, percent_rank,
    * cume_dist, first/last/nth value over explicit frames, and a
    * RANGE frame (peer-inclusive) contrasted with the ROWS frame.
    */
  def windowFunctionFamily(orders: DataFrame): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("totalprice").asc, col("o_orderkey").asc)
    val peers = Window.partitionBy(col("o_custkey")).orderBy(col("totalprice").asc)
    orders
      .select(col("o_custkey"), col("o_orderkey"), dec(col("o_totalprice")).as("totalprice"))
      .withColumn("bucket4", ntile(4).over(byCust).cast("long"))
      .withColumn("pct_rank", percent_rank().over(byCust))
      .withColumn("cume", cume_dist().over(byCust))
      .withColumn("cheapest", first(col("totalprice")).over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("priciest", last(col("totalprice")).over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("second_cheapest", nth_value(col("totalprice"), 2).over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // RANGE frame: running sum including peers (ties sum together)
      .withColumn("running_range", outD(sum(col("totalprice")).over(
        peers.rangeBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("running_rows", outD(sum(col("totalprice")).over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("totalprice", outD(col("totalprice")))
      .withColumn("cheapest", outD(col("cheapest")))
      .withColumn("priciest", outD(col("priciest")))
      .withColumn("second_cheapest", outD(col("second_cheapest")))
      .orderBy(col("o_custkey"), col("totalprice"), col("o_orderkey"))
  }

  /** Time-series rollup with month-over-month deltas: aggregate to
    * month grain, then window over the AGGREGATED output. The lag
    * window is unpartitioned but runs over #months rows (the aggregate
    * domain), not the fact table — the only safe place for a global
    * window at scale.
    */
  def monthlyRevenueTrend(lineitem: DataFrame): DataFrame = {
    val monthly = lineitem
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(outD(sum(discPrice)).as("revenue"),
           count(lit(1)).as("n_items"))
    monthly
      .withColumn("prev_revenue",
        lag(col("revenue"), 1).over(Window.orderBy(col("month"))))
      .orderBy(col("month"))
  }

  /** Salted two-phase aggregation — the skew-mitigation pattern: a hot
    * group key is first split across `salts` sub-keys (phase 1 runs
    * partial aggregation on (key, salt), spreading one hot key over
    * many reducers), then the salt is folded away in phase 2. Results
    * are identical to a direct groupBy — decimal sums are associative —
    * which is exactly what makes salting safe to apply mechanically
    * when AQE's skew handling isn't available (e.g. non-join aggs).
    */
  def saltedEventStats(events: DataFrame, salts: Int = 8): DataFrame =
    events
      .groupBy(col("event_type"), pmod(col("event_id"), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast("decimal(12,2)")).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
           outD(sum(col("ps"))).as("sum_value"))
      .orderBy(col("event_type"))

  /** Ordered string aggregation (LISTAGG): names per nation, sorted in
    * the group so the concatenation is deterministic. collect_list +
    * sort_array keeps the sort per-group (tiny) instead of a global one.
    */
  def nationSupplierNames(supplier: DataFrame): DataFrame =
    supplier.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
           concat_ws(",", sort_array(collect_list(col("s_name")))).as("names"))
      .orderBy(col("s_nationkey"))

  /** min_by/max_by with an explicit total tie-break: the ordering value
    * folds (price, orderkey) into one exact BIGINT (unscaled decimal
    * price × 10⁷ + orderkey) because arg-extrema functions take a single
    * scalar ordering key and ties would otherwise be nondeterministic.
    */
  def orderExtremes(orders: DataFrame): DataFrame = {
    val combo = (money(col("o_totalprice")) * lit(10000)).cast("long") *
      lit(10000000L) + col("o_orderkey")
    orders.groupBy(col("o_orderstatus"))
      .agg(max_by(col("o_orderkey"), combo).as("priciest_order"),
           min_by(col("o_orderkey"), combo).as("cheapest_order"),
           outD(max(money(col("o_totalprice")))).as("max_price"),
           outD(min(money(col("o_totalprice")))).as("min_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Time-range window frame: trailing one-hour count/sum per user,
    * RANGE over integral epoch-microseconds (sub-second-exact and
    * engine-portable, unlike interval frames over mixed ts precisions).
    * One shuffle on user_id; the frame is evaluated with a sliding
    * pointer over the sorted partition, not O(n²).
    */
  def trailingHourStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    events.select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_trailing_1h",
        outD(sum(col("value").cast("decimal(12,2)")).over(w)))
      .select(col("event_id"), col("user_id"), col("n_trailing_1h"),
        col("sum_trailing_1h"))
      .orderBy(col("event_id"))
  }

  /** Cross join (cartesian): the one join shape with no key. Only ever
    * sane when one side is tiny — Catalyst plans broadcast nested loop.
    */
  def regionNationPairs(region: DataFrame, nation: DataFrame): DataFrame =
    region.select(col("r_name")).crossJoin(nation.select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  /** Scalar subqueries (uncorrelated): orders above the global average
    * price. The comparison is cross-multiplied into exact decimal×count
    * arithmetic so no division is hashed. Both subqueries broadcast one
    * row; the fact table is scanned once.
    */
  def aboveAverageOrders(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    orders.createOrReplaceTempView("graft_orders_sq")
    spark.sql(
      """SELECT o_orderstatus, count(1) AS n_above_avg
        |FROM graft_orders_sq
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |        (SELECT count(1) FROM graft_orders_sq)
        |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,4))) FROM graft_orders_sq)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** Per-customer top-k through the CUSTOM plan node
    * ([[graft.plans.TopKPerKeyPlan]]): bounded heap per key instead of a
    * window sort — same result as [[topOrdersPerCustomer]], O(n log k)
    * per partition and no sort buffer. The ordering value folds
    * (price, orderkey) into one exact long so top-k is total-ordered.
    */
  def topOrdersPerCustomerNative(orders: DataFrame, k: Int): DataFrame = {
    val combo = (money(col("o_totalprice")) * lit(10000)).cast("long") *
      lit(10000000L) + col("o_orderkey")
    org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          combo.as("__ord")),
        Seq("o_custkey"), Seq("__ord"), k)
      .drop("__ord")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Correlated EXISTS subquery: Catalyst decorrelates it into a
    * left-semi hash join (the O4 existential check, correlated per-row).
    */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame,
                             minPrice: Double = 300000.0): DataFrame = {
    val spark = customer.sparkSession
    customer.createOrReplaceTempView("graft_cust_ex")
    orders.createOrReplaceTempView("graft_orders_ex")
    spark.sql(
      s"""SELECT c_custkey, c_name FROM graft_cust_ex c
         |WHERE EXISTS (SELECT 1 FROM graft_orders_ex o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > $minPrice)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL correlated subquery with LIMIT — per-group top-k through
    * the SQL surface; Catalyst decorrelates to a ranked window, the
    * same plan as [[topOrdersPerCustomer]] (never a per-row re-scan).
    */
  def topSuppliersPerNationLateral(nation: DataFrame,
                                   supplier: DataFrame): DataFrame = {
    val spark = nation.sparkSession
    nation.createOrReplaceTempView("graft_nation_lat")
    supplier.createOrReplaceTempView("graft_supp_lat")
    spark.sql(
      """SELECT n_nationkey, s_suppkey, s_acctbal
        |FROM graft_nation_lat n,
        |LATERAL (SELECT s_suppkey, s_acctbal FROM graft_supp_lat s
        |         WHERE s.s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
        |ORDER BY n_nationkey, s_acctbal DESC, s_suppkey""".stripMargin)
  }

  /** Price histogram in ALL-INTEGER arithmetic: the bin edge comes from
    * the exact decimal unscaled value (never floor of a double division
    * — engines disagree at representability boundaries). One hash agg.
    */
  def priceHistogram(lineitem: DataFrame, binWidth: Long = 10000L): DataFrame = {
    // `div` (integer division), not `/`: the Column `/` operator is
    // always DOUBLE division
    val bin = expr(
      s"CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
        s" div ${binWidth * 100} * $binWidth")
    lineitem
      .groupBy(bin.as("bin_floor"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin_floor"))
  }

  /** Cohort retention: users grouped by first-seen day (the cohort),
    * counted by distinct activity day — the classic retention triangle.
    * Two aggregations; the first-seen day joins back broadcast (one row
    * per user).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val activity = events.select(col("user_id"),
      date_trunc("day", col("ts")).as("act_day"))
    val firstSeen = activity.groupBy(col("user_id"))
      .agg(min(col("act_day")).as("cohort_day"))
    activity.join(broadcast(firstSeen), Seq("user_id"))
      .groupBy(col("cohort_day"), col("act_day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("act_day"))
  }

  /** Keep-latest-per-key compaction (the CDC/upsert snapshot pattern):
    * one row per user — their most recent event by a TOTAL (ts,
    * event_id) order. One shuffle on the key; at table scale this is
    * the compaction that turns an append log into current state.
    */
  def latestEventPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("ts").as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** Event-transition matrix: (event_type → next event_type) counts per
    * user stream, via lag over a TOTAL per-user order (ts alone is not
    * unique; event_id breaks ties). One shuffle on user_id.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Behavioral path mining: the top length-3 event-type sequences
    * across users — the sequence-n-gram operator (the event-stream
    * analog of text shingling, same gram construction as
    * [[Dedup.shinglesFromTokens]]). One shuffle assembles each user's
    * ordered path (collect_list + array_sort on a (ts, event_id, type)
    * struct — the sort key is total, so assembly is partition-order
    * free); trigram expansion is array-local, and the count shuffles
    * grams, not events. Top-k by (count desc, path asc) is a total
    * order → deterministic limit.
    */
  def eventPaths(events: DataFrame, k: Int = 20): DataFrame = {
    val seqs = events
      .groupBy(col("user_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")).as("seq"))
    val grams = seqs
      .select(explode(when(size(col("seq")) >= 3,
          transform(sequence(lit(1), size(col("seq")) - 2),
            i => concat_ws(">", element_at(col("seq"), i),
              element_at(col("seq"), i + 1), element_at(col("seq"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("path"))
    grams.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Skew-resilient JOIN via salting: the probe side gets a
    * deterministic salt in [0, salts); the build side replicates once
    * per salt value (explode, not a crossJoin). The join key becomes
    * (suppkey, salt), so one hot supplier's rows spread over `salts`
    * reducers instead of one. Result is identical to the unsalted join
    * — verified by the oracle computing the plain join.
    */
  def saltedSupplierRevenue(lineitem: DataFrame, supplier: DataFrame,
                            salts: Int = 8): DataFrame = {
    val probe = lineitem
      .withColumn("salt", pmod(col("l_orderkey") + col("l_linenumber"), lit(salts)))
    val build = supplier.select(col("s_suppkey"), col("s_name"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    probe.join(build,
        col("l_suppkey") === build("s_suppkey") &&
          probe("salt") === build("salt"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
           outD(sum(money(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("s_name"))
  }

  /** Exact distributed Pearson correlation: every moment (Σx, Σy, Σxy,
    * Σx², Σy², n) accumulates in DECIMAL — associative and
    * partition-order-independent, unlike the built-in `corr`'s double
    * sums — and only the FINAL formula evaluates in double. The way to
    * get bit-stable statistics out of a 1000-executor aggregation.
    */
  def exactCorrelation(lineitem: DataFrame): DataFrame = {
    val x = col("l_quantity").cast("decimal(12,2)")
    val y = money(col("l_extendedprice"))
    val agg = lineitem.agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    agg.select(col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
         sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("corr_qty_price"))
  }

  /** Market-basket co-occurrence: part pairs bought in the same order,
    * top-k by support. The self-join runs per order key (co-occurrence
    * mass Σ items², never all part pairs) and the top-k is
    * TakeOrderedAndProject on an exact (count, keys) ordering.
    */
  def partCooccurrence(lineitem: DataFrame, k: Int = 20): DataFrame = {
    // one shuffle builds the per-order basket (collect_set dedups in
    // the aggregation — no separate distinct pass), then pairs are
    // generated array-locally per basket (baskets are small; the pair
    // lambda is O(|basket|²) with no join and no second scan of the
    // item set) and counted with map-side partial aggregation.
    val basket = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    // pair enumeration is the codegen'd pair_combos expression (one
    // pass, one allocation) — the interpreted transform/slice/flatten
    // HOF stack it replaces was the hottest spot in this query
    val pairs = basket
      .select(explode(graft.functions.PairCombos.pair_combos(col("parts"))).as("pr"))
      .select(col("pr.a").as("part1"), col("pr.b").as("part2"))
      .groupBy(col("part1"), col("part2"))
      .agg(count(lit(1)).as("n_orders"))
    pairs
      .orderBy(col("n_orders").desc, col("part1"), col("part2"))
      .limit(k)
  }

  /** Event funnel: users whose FIRST 'view' precedes their FIRST
    * 'purchase' — order-sensitive conversion, one pass with
    * conditional min aggregates (no self-join, no window).
    */
  def viewToPurchaseFunnel(events: DataFrame): DataFrame = {
    val firstView = min(when(col("event_type") === "view",
      unix_micros(col("ts"))))
    val firstPurchase = min(when(col("event_type") === "purchase",
      unix_micros(col("ts"))))
    events.groupBy(col("user_id"))
      .agg(firstView.as("first_view_us"), firstPurchase.as("first_purchase_us"))
      .select(col("user_id"),
        (col("first_view_us").isNotNull && col("first_purchase_us").isNotNull &&
          col("first_view_us") < col("first_purchase_us")).as("converted"))
      .groupBy(col("converted"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("converted"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other — the join shape for nullable FKs. The NULL group
    * is re-labeled with a sentinel in the OUTPUT only (a nullable BIGINT
    * column round-trips as float64 on one compare side).
    */
  def nullSafeJoinCounts(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.select(
      nullif((col("c_nationkey") % 5).cast("long"), lit(0L)).as("ckey"))
    val s = supplier.select(
      nullif((col("s_nationkey") % 5).cast("long"), lit(0L)).as("skey"))
    c.join(s, col("ckey") <=> col("skey"))
      .groupBy(coalesce(col("ckey"), lit(-1L)).as("ckey_s"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("ckey_s"))
  }

  /** Join-strategy control: the same equi-join forced to SHUFFLE_HASH
    * via hint. For a mid-size build side that fits executor memory but
    * not the broadcast threshold, hash beats sort-merge (no sort on the
    * 100 TB probe side).
    */
  def supplierRevenueHashJoin(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(supplier.select(col("s_suppkey"), col("s_name")).hint("shuffle_hash"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
           outD(sum(money(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("s_name"))

  /** Join-strategy control, third leg: the same equi-join forced to
    * SORT-MERGE via hint. The right default when BOTH sides are large
    * and neither hash table fits executor memory — merge degrades
    * gracefully to spill, hash does not. With [[supplierRevenueHashJoin]]
    * and the broadcast dims everywhere else, all three distributed
    * equi-join strategies are exercised and result-identical.
    */
  def supplierRevenueMergeJoin(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(supplier.select(col("s_suppkey"), col("s_name")).hint("merge"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
           outD(sum(money(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("s_name"))

  /** As-of join: latest order at-or-before each event timestamp for the
    * matching customer. Spark lacks a native ASOF join; the scalable
    * composition is equi-join on the key + max_by aggregation (one
    * shuffle, no windows). DuckDB's native ASOF JOIN is the oracle.
    */
  /** Forward as-of join: the FIRST event at-or-after each order — the
    * look-ahead twin of [[asofLatestOrder]] (attribution: "next user
    * action after the purchase"). Same composition, min_by.
    */
  def asofNextEvent(orders: DataFrame, events: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(events.select(col("user_id"), col("event_id"), col("ts")),
        col("o_custkey") === col("user_id") && col("ts") >= col("o_orderdate"),
        "inner")
      .groupBy(col("o_orderkey"))
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("next_event_id"),
           min(col("ts")).as("next_ts"))
      .orderBy(col("o_orderkey"))

  /** Per-group EXACT quantiles: `percentile` interpolates on the sorted
    * group — integer-valued doubles make the interpolation arithmetic
    * engine-stable (DuckDB quantile_cont computes the same a+(b-a)·t).
    */
  def groupQuantiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("qty_p25"),
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.75)").as("qty_p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  def asofLatestOrder(events: DataFrame, orders: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("ts"))
      .join(orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
        "inner")
      .groupBy(col("event_id"))
      .agg(max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("asof_orderkey"),
           max(col("o_orderdate")).as("asof_orderdate"))
      .orderBy(col("event_id"))

  /** Tagged input row for the merge-scan as-of join (public: encoder
    * codegen instantiates it). kind 0 = order (build), 1 = event (probe).
    */
  case class AsofRow(user_id: Long, ts_us: Long, kind: Int, id: Long, date_us: Long)
  /** Merge-scan as-of output row. */
  case class AsofOut(event_id: Long, asof_orderkey: Long, asof_orderdate_us: Long)

  /** Merge-scan as-of join: one shuffle co-partitions BOTH inputs on
    * the entity key, a secondary sort orders each partition by
    * (user, time, kind), and a single forward scan carries the
    * latest-order-so-far — O(n+m) per partition, versus the
    * conditional-join formulation (`asofLatestOrder`) that first
    * materializes every (event, earlier-order) pair and then reduces
    * them (Σ pairs can be quadratic per hot user). Same output, same
    * oracle; this is the formulation that survives users with long
    * histories at 100 TB. Orders sort before events at equal
    * timestamps (kind 0 < 1), preserving the `<=` bound; ascending
    * (date, orderkey) makes "last seen" ≡ max_by(struct(date, key)).
    */
  def asofMergeJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // o_orderdate is parquet TIMESTAMP_NTZ; the LTZ hop is exact under
    // the engine's fixed UTC session timezone
    val od = unix_micros(col("o_orderdate").cast("timestamp"))
    val o = orders.select(col("o_custkey").as("user_id"),
      od.as("ts_us"), lit(0).as("kind"),
      col("o_orderkey").as("id"), od.as("date_us"))
    val e = events.select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"), lit(1).as("kind"),
      col("event_id").as("id"), lit(0L).as("date_us"))
    SortedGroups.processOrdered(o.unionByName(e).as[AsofRow],
      Seq(col("user_id")), Seq(col("ts_us"), col("kind"), col("id"))) { rows =>
        var curUser = Long.MinValue
        var haveOrder = false
        var bestKey = 0L
        var bestDate = 0L
        rows.flatMap { r =>
          if (r.user_id != curUser) { curUser = r.user_id; haveOrder = false }
          if (r.kind == 0) {
            haveOrder = true; bestKey = r.id; bestDate = r.date_us
            Iterator.empty
          } else if (haveOrder) {
            Iterator.single(AsofOut(r.id, bestKey, bestDate))
          } else Iterator.empty
        }
      }
      .toDF()
      .select(col("event_id"), col("asof_orderkey"),
        timestamp_micros(col("asof_orderdate_us"))
          .cast("timestamp_ntz").as("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** TPC-H Q7 shape (nation trade volume): bidirectional revenue matrix
    * between two nations by ship year. Both nation filters are applied
    * to the BROADCAST dimension sides (supplier→nation, customer→nation)
    * before touching the fact table, so the big lineitem⋈orders join
    * only carries rows that can survive — at 100 TB the pair predicate
    * prunes ~(2/25)² of the fact join output on the build inputs, not
    * after the shuffle.
    */
  def nationTrade(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame,
                  n1: String = "NATION_3", n2: String = "NATION_8"): DataFrame = {
    val wanted = nation.filter(col("n_name").isin(n1, n2))
    val supp = broadcast(supplier
      .join(wanted.select(col("n_nationkey"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation")))
    val cust = broadcast(customer
      .join(wanted.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation")))
    lineitem
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(outD(sum(discPrice)).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** TPC-H Q18 shape (large-volume orders): a HAVING-filtered fact
    * aggregate drives a join back to its own dimensions. The per-order
    * quantity aggregate runs FIRST (map-side partial sums shrink the
    * shuffle to one row per order), the >threshold survivors are a tiny
    * set that joins orders/customer, and the final top-k is
    * TakeOrderedAndProject — no global sort at any scale.
    */
  def bigOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                minQty: Double = 300.0, k: Int = 20): DataFrame = {
    val heavy = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), money(col("o_totalprice")).as("tp_dec"), col("sum_qty"))
      .orderBy(col("tp_dec").desc, col("o_orderkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), outD(col("tp_dec")).as("o_totalprice"), col("sum_qty"))
  }

  /** SCD2 interval build (slowly-changing dimension, type 2): each
    * customer's order history becomes validity intervals —
    * effective_from = the order date, effective_to = the NEXT order's
    * date (lead window), is_current marks the open row. One shuffle on
    * the entity key; the window sort is per-key, so the build scales
    * with the largest single history, not the table. The open
    * interval's end is a SENTINEL date, not NULL (a nullable date
    * column can't survive a cross-engine hash compare, and downstream
    * range predicates stay sargable against a real value). The
    * sentinel must stay below 2262-04-11 — the datetime64[ns]
    * ceiling — or any nanosecond-based consumer silently wraps it
    * negative (9999-12-31 does exactly that in pandas).
    */
  def scd2Intervals(orders: DataFrame,
                    sentinel: String = "2200-01-01"): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate"))
      .withColumn("effective_from", col("o_orderdate"))
      .withColumn("effective_to",
        coalesce(lead(col("o_orderdate"), 1).over(w),
          lit(sentinel).cast("timestamp")))
      .withColumn("is_current",
        lead(col("o_orderdate"), 1).over(w).isNull)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("effective_from"), col("effective_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("effective_from"), col("o_orderkey"))
  }

  /** TPC-H Q16 shape (supplier distribution): distinct suppliers and
    * parts per (brand, type), with lineitem as the part↔supplier
    * bridge. The distinct pass shrinks the bridge BEFORE the broadcast
    * part join; count_distinct then shuffles once on the group key.
    */
  def partTypeSuppliers(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
           countDistinct(col("l_partkey")).as("part_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))

  /** Data-quality gate: the constraint checks an ETL engine runs before
    * publishing a table, each as ONE distributed aggregate — FK
    * integrity via anti-join counts, key uniqueness via count vs
    * count-distinct, domain and not-null scans. One row per check;
    * a clean corpus audits to all-zeros, and the operator is the
    * declarative replacement for the reference's pre-update validation
    * gate (O21) generalized to table-level contracts.
    */
  def dataQualityAudit(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame): DataFrame = {
    def check(name: String, violations: Column, from: DataFrame): DataFrame =
      from.agg(violations.cast("long").as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    val fkOrders = check("orders_fk_customer", count(lit(1)),
      orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti"))
    val fkLines = check("lineitem_fk_orders", count(lit(1)),
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti"))
    val uniqueKey = check("orders_pk_unique",
      count(lit(1)) - countDistinct(col("o_orderkey")), orders)
    val notNull = check("customer_name_not_null",
      count(when(col("c_name").isNull, 1)), customer)
    val domain = check("discount_in_unit_interval",
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)), lineitem)
    val positive = check("totalprice_positive",
      count(when(col("o_totalprice") <= 0, 1)), orders)
    fkOrders.unionByName(fkLines).unionByName(uniqueKey)
      .unionByName(notNull).unionByName(domain).unionByName(positive)
      .orderBy(col("check"))
  }

  /** TPC-H Q2 shape (argmin join-back): every (part, supplier) row that
    * achieves its part's minimum price — the correlated
    * `= (SELECT min(...))` pattern, decorrelated into a min-aggregate
    * joined back to the fact. Exact decimal min keeps the equality
    * engine-portable; the min side is tiny (one row per part) so the
    * join-back broadcasts at runtime.
    */
  def cheapestSuppliers(lineitem: DataFrame): DataFrame = {
    val minCost = lineitem.groupBy(col("l_partkey").as("mp"))
      .agg(min(money(col("l_extendedprice"))).as("min_price"))
    lineitem
      .join(minCost, col("l_partkey") === col("mp") &&
        money(col("l_extendedprice")) === col("min_price"))
      .select(col("l_partkey"), col("l_suppkey"),
        outD(col("min_price")).as("min_price"))
      .distinct()
      .orderBy(col("l_partkey"), col("l_suppkey"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join so
    * zero-order customers keep count 0, then a second aggregation over
    * the first's output — the classic two-level agg where level 1
    * shuffles by customer and level 2 by the (tiny-domain) count.
    */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame,
                            excludePriority: String = "1-URGENT"): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q19 shape (disjunctive discounted revenue): a join whose
    * residual predicate is an OR of brand/size/quantity conjunctions.
    * The shape matters to the optimizer: Catalyst extracts the common
    * `p_partkey` equi-condition so the join stays hash-based, and
    * factors the disjunction's part-only conjuncts below the join onto
    * the (broadcast) part side — the fact side never pays a cartesian.
    * One aggregate row of exact-decimal revenue.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50))))
      .agg(outD(sum(discPrice)).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q21 shape (suppliers who kept the order waiting): for 'F'
    * orders with lines from >1 supplier, count per supplier the orders
    * where that supplier's LAST ship date is not beaten by any other
    * supplier's — the classic EXISTS + NOT-EXISTS double correlation.
    * Decorrelated into ONE windowed pass over per-(order, supplier)
    * maxima: supplier s "kept it waiting" iff its per-order max STRICTLY
    * dominates every other supplier's (it holds the order max and is
    * its unique holder). The oracle states the same predicate as
    * correlated EXISTS + NOT EXISTS (no other supplier with
    * my_max >= mine), so the differential check proves the
    * decorrelation. Two shuffles total: (orderkey, suppkey) then
    * orderkey.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, k: Int = 10): DataFrame = {
    val perSupp = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("my_max"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("max1", max(col("my_max")).over(w))
      .withColumn("n_at_max",
        sum(when(col("my_max") === col("max1"), 1).otherwise(0)).over(w))
      .filter(col("n_supp") > 1)
      .filter(col("my_max") === col("max1") && col("n_at_max") === 1)
    flagged
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q22 shape (global-customer analysis): customers whose
    * balance beats the positive-balance average (uncorrelated scalar
    * aggregate — ONE row broadcast into the filter) and who have no
    * RECENT orders (anti join against a date-pruned scan), grouped by
    * nation. The "above average" comparison is cross-multiplied
    * (balance·n > Σbalance) so both engines compare exact decimals —
    * an avg() would put a division-rounding boundary under the filter.
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
                        recentCutoff: String = "2000-01-01"): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg(sum(money(col("c_acctbal"))).as("s_bal"),
        count(lit(1)).as("n_bal"))
    customer
      .join(broadcast(avgBal))
      .filter(money(col("c_acctbal")) * col("n_bal") > col("s_bal"))
      .join(orders
          .filter(col("o_orderdate") >= lit(recentCutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        outD(sum(money(col("c_acctbal")))).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Snapshot diff (CDC delta): classify every key across two versions
    * of a table as insert / delete / update / same — the change feed a
    * downstream incremental pipeline consumes when the source can't
    * emit one. ONE full-outer join on the key; change detection is a
    * null-safe comparison over the tracked columns (`<=>` so NULL
    * transitions count as changes), no per-column joins.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   cols: Seq[String]): DataFrame = {
    val o = oldSnap.select((key +: cols).map(c => col(c).as("o_" + c)): _*)
    val n = newSnap.select((key +: cols).map(c => col(c).as("n_" + c)): _*)
    val changed = cols.map(c => !(col("o_" + c) <=> col("n_" + c)))
      .reduce(_ || _)
    o.join(n, col("o_" + key) === col("n_" + key), "full_outer")
      .select(
        when(col("o_" + key).isNull, "insert")
          .when(col("n_" + key).isNull, "delete")
          .when(changed, "update")
          .otherwise("same").as("op"))
      .groupBy(col("op")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("op"))
  }

  /** Time-series regularization: resample each user's event stream
    * onto a daily grid (gap rows materialized from the user's own
    * [min, max] span) and FORWARD-FILL values across the gaps — the
    * standard prep before feature windows or model training joins, and
    * the canonical "make the time axis dense" operator.
    *
    * Scale shape: the per-user span is two aggregates; the grid is a
    * per-row `sequence` explode (no driver calendar); the fill is one
    * `last(ignoreNulls)` running window — all partitioned by user_id,
    * so the whole operator is TWO hash shuffles on the same key (agg +
    * window) and AQE can chain them. Day sums are exact decimals.
    */
  def resampleFfill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        col("value").cast("decimal(12,2)").as("v"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("v")).as("day_value"), count(lit(1)).as("n_events"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("filled_value").cast("double").as("filled_value"),
        col("day_value").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Linear interpolation across resampled gaps — [[resampleFfill]]'s
    * numeric twin (ffill for state-like series, interp for
    * measurement-like ones). Each gap day takes
    * prev + (next − prev) · Δt/Δspan from the bracketing observations.
    *
    * Scale shape identical to ffill: the bracketing values come from
    * two running windows (last-non-null backward, first-non-null
    * forward) over the SAME (user_id, day) sort — one shuffle, one
    * sort, two window passes. The grid guarantees both brackets exist
    * (its span is [min obs, max obs]), so the interpolation expression
    * is total. Division happens once per row in double — deterministic
    * and mirrored textually by the oracle.
    */
  def resampleInterp(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        col("value").cast("decimal(12,2)").as("v"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("v")).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("day_value"), ignoreNulls = true).over(back))
      .withColumn("pd", last(when(col("day_value").isNotNull, col("day")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("day_value"), ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(col("day_value").isNotNull, col("day")),
        ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("day"),
        when(col("day_value").isNotNull, outD(col("day_value")))
          .otherwise(outD(col("pv")) + (outD(col("nv")) - outD(col("pv")))
            * (datediff(col("day"), col("pd")).cast("double")
               / datediff(col("nd"), col("pd")).cast("double")))
          .as("interp_value"),
        col("day_value").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("day"))
  }
}
