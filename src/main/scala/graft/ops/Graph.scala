package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as DataFrame rounds — the Pregel-style
  * computation family (PageRank here; the dedup family's connected
  * components in [[Dedup.nearDupClusters]] is the same shape). Each
  * round is two hash-partitioned shuffles (join ranks⋈edges on src,
  * re-aggregate on dst); the driver loop only composes plans, it never
  * touches data.
  *
  * Determinism: ranks are FIXED-POINT integers (scaled by 10^12) and
  * every step uses integer multiply / floor division only — no float
  * accumulation order to drift, so a 3-iteration run hash-matches the
  * DuckDB oracle bit-for-bit. (Brin & Page, "The Anatomy of a
  * Large-Scale Hypertextual Web Search Engine", WWW 1998, §2.1.1 for
  * the rank recurrence; damping 0.85 expressed as ×85 div 100.)
  */
object Graph {

  /** Fixed-point scale: 1.0 of rank mass = 10^12. Headroom check:
    * a node's rank never exceeds the total mass 10^12, so the largest
    * intermediate (85 × Σ contribs) stays < 10^14 — comfortably inside
    * signed-64 even before ANSI overflow checks would fire.
    */
  val scale: Long = 1000000000000L

  /** Nation→nation trade edges: customer's nation → supplier's nation
    * for every trade relationship in the fact table, self-loops
    * dropped, deduplicated. Dims broadcast; the only big shuffle is
    * the distinct over (src, dst) — a 2×4-byte key.
    */
  def tradeEdges(lineitem: DataFrame, orders: DataFrame,
                 customer: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** PageRank over (nodes, edges), `iters` synchronous rounds from a
    * uniform start. Per round: contrib(dst) = Σ_in-edges rank(src) div
    * outdeg(src); rank' = (15·scale) div (100·N) + (85·Σ) div 100.
    * Dangling-node mass is dropped (total mass shrinks slightly per
    * round) — the standard simplification, stated so the oracle agrees.
    *
    * Scale shape: NO broadcast of ranks or nodes (both are |V|, which
    * is huge on a real graph — only the one-row count rides a
    * broadcast); edges⋈ranks shuffles on src, the contribution
    * aggregate shuffles on dst, and AQE is free to broadcast when |V|
    * actually fits. The loop builds one composed plan; nothing
    * materializes on the driver.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 3): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val cnt = ids.agg(count(lit(1)).as("n_nodes"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = ids.join(broadcast(cnt))
      .select(col("id"), expr(s"$scale div n_nodes").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(deg, Seq("src"))
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      ranks = ids.join(broadcast(cnt))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (expr(s"(15 * $scale) div (100 * n_nodes)") +
            expr("(85 * coalesce(contrib, 0)) div 100")).as("rank"))
    }
    ranks
  }

  /** Triangle counting by DEGREE ORIENTATION (the "forward" algorithm,
    * Schank & Wagner, "Finding, Counting and Listing All Triangles in
    * Large Graphs", WEA 2005): orient every undirected edge from the
    * lower (degree, id) endpoint to the higher, enumerate wedges only
    * from common SOURCES, and close each wedge with one more edge
    * lookup. Out-degrees under this orientation are O(√m), so the
    * wedge join materializes O(m^1.5) rows instead of the Σ deg² a
    * naive orientation pays — the difference between hours and
    * forever on a power-law web graph.
    *
    * Everything is equi-joins on (deg·2^32 + id) packed keys; counts
    * are exact integers. Each triangle is counted exactly once.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id")).unionAll(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // the packed (deg, id) key is total only while id ∈ [0, 2^32) and
    // deg < 2^31 — generic inputs outside that domain would alias keys
    // and silently mis-orient edges, so the guard fails loudly in-plan
    val key = when(col("id") < 0 || col("id") >= lit(4294967296L)
          || col("deg") >= lit(2147483648L),
        raise_error(lit("triangleStats: node id/degree outside packed-key domain"))
          .cast("long"))
      .otherwise(col("deg") * lit(4294967296L) + col("id"))
    val keyed = deg.select(col("id"), key.as("k"))
    // orient toward the higher (deg, id) endpoint
    val oriented = und
      .join(keyed.select(col("id").as("a"), col("k").as("ka")), Seq("a"))
      .join(keyed.select(col("id").as("b"), col("k").as("kb")), Seq("b"))
      .select(when(col("ka") < col("kb"), col("ka")).otherwise(col("kb")).as("u"),
        when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("v"))
    val wedges = oriented.alias("x")
      .join(oriented.alias("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("p"), col("y.v").as("q"))
    val triangles = wedges
      .join(oriented.alias("z"),
        col("p") === col("z.u") && col("q") === col("z.v"))
    und.agg(count(lit(1)).as("n_edges"))
      .join(wedges.agg(count(lit(1)).as("n_wedges")))
      .join(triangles.agg(count(lit(1)).as("n_triangles")))
  }

  /** Registry shape: triangle census of the nation trade graph. */
  def nationTriangles(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame): DataFrame =
    triangleStats(tradeEdges(lineitem, orders, customer, supplier))

  /** Registry shape: PageRank of the nation trade graph, labeled and
    * rank-ordered. `rank_scaled` is the fixed-point integer — the
    * hash-checkable value; divide by 10^12 for the conventional score.
    */
  def nationPageRank(nation: DataFrame, lineitem: DataFrame,
                     orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, iters: Int = 3): DataFrame = {
    val nodes = nation.select(col("n_nationkey").cast("long").as("id"))
    val edges = tradeEdges(lineitem, orders, customer, supplier)
    pageRank(nodes, edges, iters)
      .join(nation, col("id") === col("n_nationkey").cast("long"))
      .select(col("n_nationkey"), col("n_name"), col("rank").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("n_nationkey"))
  }
}
