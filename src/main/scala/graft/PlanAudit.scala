package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: asserts the plan properties that matter at
  * 100 TB for representative registry queries — predicate pushdown into
  * the parquet scan, column pruning (ReadSchema), broadcast joins for
  * dimension tables, TakeOrderedAndProject for top-k, and whole-stage
  * codegen coverage. Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // audit the STATIC plan shape: with AQE on, codegen spans and
      // ReusedExchange only surface in the final adaptive plan
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0
    def audit(name: String)(checks: (String, String => Boolean)*): Unit = {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      checks.foreach { case (desc, check) =>
        val ok = check(plan)
        if (!ok) failures += 1
        println(f"${if (ok) "PASS" else "FAIL"}  $name%-24s $desc")
        if (!ok) println(plan.linesIterator.take(40).mkString("  | ", "\n  | ", ""))
      }
    }

    // filter pushdown + column pruning reach the scan
    audit("rel_pricing_summary")(
      ("filter pushed to parquet scan", _.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,0.0)]")),
      ("scan reads only needed columns (no l_shipdate)", !_.contains("l_shipdate")),
      ("two-phase hash aggregation", p => "HashAggregate".r.findAllIn(p).size >= 2))

    // star join: dims broadcast, fact not re-shuffled for dims
    audit("rel_revenue_by_region")(
      ("customer/nation/region broadcast", p => "BroadcastHashJoin".r.findAllIn(p).size >= 3),
      ("no cartesian/BNL join", p => !p.contains("CartesianProduct")))

    // top-k must be TakeOrderedAndProject, not global sort
    audit("rel_sort_topk")(
      ("TakeOrderedAndProject", _.contains("TakeOrderedAndProject")))

    // semi/anti joins stay semi/anti
    audit("rel_semi_join")(("LeftSemi join", _.contains("LeftSemi")))
    audit("rel_anti_join")(("LeftAnti join", _.contains("LeftAnti")))

    // bulk update is a pure projection over the scan — no shuffle at all
    audit("bu_broadcast")(
      ("no exchange except final sort", p =>
        "Exchange".r.findAllIn(p).size <= 1),
      ("conditional update stays in codegen", _.contains("*(")))

    // similarity: custom codegen'd expression present, queries broadcast
    audit("sim_cosine_topk")(
      ("native vector_dot expression in plan", _.contains("vector_dot")),
      ("query side broadcast", _.contains("BroadcastExchange")))

    // minhash: signature exchange reused, not recomputed per join side
    audit("dedup_minhash")(
      ("exchange reuse in self-join", _.contains("ReusedExchange")))

    // window top-k: single shuffle on the partition key
    audit("rel_window_topk")(
      ("window rank evaluated (limit-style) in plan",
        p => p.contains("RunningWindowFunction") || p.contains("Window")))

    // jaccard co-occurrence join: no cartesian, shared shingle exchange
    audit("dedup_jaccard")(
      ("no cartesian/BNL pair enumeration", p => !p.contains("CartesianProduct")),
      ("exploded-shingle exchange reused", _.contains("ReusedExchange")))

    // sessionize: window + aggregation share ONE hash shuffle on user_id
    audit("str_session")(
      ("single hash exchange (window partitioning reused by groupBy)",
        p => "Exchange hashpartitioning".r.findAllIn(p).size <= 1))

    // IVF: centroids + probe cells broadcast; corpus shuffles at most once
    audit("sim_ivf_topk")(
      ("centroid/probe sides broadcast", p => "BroadcastExchange".r.findAllIn(p).size >= 2),
      ("no cartesian in cell scoring", p => !p.contains("CartesianProduct")))

    println(s"== plan audit: ${if (failures == 0) "ALL PASS" else s"$failures FAILURES"} ==")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
