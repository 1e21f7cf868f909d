package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench line's apples-to-apples drift field: totals over exactly
  * the 68 queries the round-1 record measured. No SparkSession needed.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("r01Common parses the escaped round-1 record and emits the drift field") {
    // every r01 query still exists in the registry, so a full-board
    // result set must produce the 68-query comparison
    val results = SparkEntry.queries.keys.toSeq.map(_ -> 0.1)
    val s = Bench.r01Common(results)
    assert(s.startsWith(""""r01_common":{"n":68,"""), s)
    // the r01 total over the cleanly-parsed entries is the committed
    // ~30.6s board
    assert(s.contains(""""r01_sec":30."""), s)
    // 68 * 0.1 with float accumulation
    assert(s.contains(""""now_sec":6.8"""), s)
  }

  test("r01Common is empty for subset runs (not comparable)") {
    assert(Bench.r01Common(Seq("rel_union" -> 0.1)) === "")
  }
}
