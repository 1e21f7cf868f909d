package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Semantics + plan shape for the bloom-filter join-pruning family. */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private def dim = Tables.customer(spark, sf).filter(col("c_nationkey") === 7)
  private def fact = Tables.orders(spark, sf)

  test("bloom filter has NO false negatives (every member passes)") {
    val probed = Bloom.withMembership(fact, col("o_custkey"),
      Bloom.buildFilter(dim, col("c_custkey")))
    val truth = dim.select(col("c_custkey").as("mk")).distinct()
    val missed = probed.join(truth, col("o_custkey") === col("mk"), "left_semi")
      .filter(!col("pass_bloom"))
      .count()
    assert(missed === 0L)
  }

  test("bloom membership matches a scala-side reference bit set") {
    // rebuild the filter's semantics imperatively and compare decisions
    def h32(s: String): Long =
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s).substring(0, 8), 16)
    val keys = dim.select(col("c_custkey")).as[Long].collect()
    val bits = scala.collection.mutable.Set[Long]()
    keys.foreach { k =>
      val v = h32(k.toString)
      Bloom.bloomAB.foreach { case (a, b) =>
        bits += ((a * v + b) % Bloom.P) % Bloom.numBits
      }
    }
    def member(k: Long): Boolean = {
      val v = h32(k.toString)
      Bloom.bloomAB.forall { case (a, b) =>
        bits(((a * v + b) % Bloom.P) % Bloom.numBits)
      }
    }
    val probed = Bloom.withMembership(fact, col("o_custkey"),
        Bloom.buildFilter(dim, col("c_custkey")))
      .select(col("o_custkey"), col("pass_bloom"))
      .as[(Long, Boolean)].collect()
    probed.foreach { case (k, pass) =>
      assert(pass === member(k), s"key $k")
    }
  }

  test("pruneForJoin keeps all true matches and drops most non-matches") {
    val pruned = Bloom.pruneForJoin(fact, col("o_custkey"), dim, col("c_custkey"))
    val exact = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    // every exact-semi-join row survives the bloom prune
    assert(exact.join(pruned, Seq("o_orderkey"), "left_anti").count() === 0L)
    // and the prune actually reduced the probe side
    assert(pruned.count() < fact.count())
  }

  test("probe side is never hash-repartitioned (map-side prune only)") {
    val stats = Bloom.pruneStats(fact, col("o_custkey"), dim, col("c_custkey"))
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(o_custkey"), plan.take(2000))
    // the one-row filter arrives by broadcast
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("engine-native runtime bloom filter injects for a selective join " +
      "(the optimizer twin of ops.Bloom)") {
    // Spark's own runtime filter has driver-tuned thresholds sized for
    // clusters; lower them so the fixture-scale join qualifies, then
    // assert the optimizer injected a BloomFilterMightContain on the
    // probe side — the same semi-join reduction Bloom.pruneForJoin
    // expresses explicitly (and portably).
    val conf = spark.conf
    val key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val enabled = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val old = (conf.getOption(key), conf.getOption(enabled), conf.getOption(bcast))
    try {
      conf.set(enabled, "true")
      conf.set(key, "0")
      // the optimizer only injects for shuffle joins (a broadcast build
      // already ships the exact key set); force the shuffle path
      conf.set(bcast, "-1")
      val q = Tables.lineitem(spark, sf)
        .join(Tables.supplier(spark, sf).filter(col("s_acctbal") > 9000),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilter"), optimized.take(1500))
    } finally {
      old._1.fold(conf.unset(key))(v => conf.set(key, v))
      old._2.fold(conf.unset(enabled))(v => conf.set(enabled, v))
      old._3.fold(conf.unset(bcast))(v => conf.set(bcast, v))
    }
  }

  test("pruneStats accounting is internally consistent") {
    val row = Bloom.pruneStats(fact, col("o_custkey"), dim, col("c_custkey"))
      .as[(Long, Long, Long, Long)].head()
    val (n, pass, members, fp) = row
    assert(members <= pass, "no false negatives implies members <= pass")
    assert(fp === pass - members)
    assert(pass <= n)
  }
}
