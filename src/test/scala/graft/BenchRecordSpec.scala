package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench line's apples-to-apples drift field: totals over exactly
  * the 68 queries the round-1 record measured. No SparkSession needed.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("r01Common parses the escaped round-1 record and emits the drift field") {
    // a full-board result set must produce the comparison over the
    // r01-era names that survived the round-7 registry fold (11 were
    // merged into multi-assert entries, so the intersection is ~56)
    val results = SparkEntry.queries.keys.toSeq.map(_ -> 0.1)
    val s = Bench.r01Common(results)
    assert(s.startsWith(""""r01_common":{"n":"""), s)
    val n = """"n":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    assert(n >= 50 && n <= 68, s)
    // the r01 total over the common names stays parsed from the
    // committed record (a nonzero seconds figure)
    assert(""""r01_sec":\d+\.""".r.findFirstIn(s).nonEmpty, s)
    // n * 0.1 with float accumulation
    assert(s.contains("\"now_sec\":" + "%.3f".format(n * 0.1)), s)
  }

  test("r01Common is empty for subset runs (not comparable)") {
    assert(Bench.r01Common(Seq("rel_union" -> 0.1)) === "")
  }
}
