package graft

import org.apache.spark.sql.functions._
import graft.ops.BulkUpdate
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The reference's correctness traps (SURVEY.md §2.1): min-truncation,
  * blank-line drop, two-tier read-only, boolean parse, validation gate.
  */
class BulkUpdateSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"old_$i", i % 3 == 0, i % 4 == 0))
      .toDF("id", "value", "hidden", "ro")

  test("parseLines drops blank lines BEFORE positional assignment (trap #3)") {
    val parsed = BulkUpdate.parseLines("a\n\nb\n   \nc")
    assert(parsed === Seq((0, "a"), (1, "b"), (2, "c")))
  }

  test("broadcastUpdate touches only visible, writable rows") {
    val out = BulkUpdate.broadcastUpdate(docs(12), "value", lit("NEW"),
      visible = !col("hidden"), readOnly = col("ro"))
      .select("id", "value").as[(Long, String)].collect().toMap
    (1 to 12).foreach { i =>
      val expectNew = !(i % 3 == 0) && !(i % 4 == 0)
      assert(out(i.toLong) === (if (expectNew) "NEW" else s"old_$i"),
        s"row $i")
    }
  }

  test("zipUpdate: values exhausted first -> remaining rows keep old values (trap #1)") {
    val out = BulkUpdate.zipUpdate(docs(10), "value", "v1\nv2\nv3",
        orderKeys = Seq("id"), visible = lit(true), readOnly = lit(false))
      .select("id", "value").as[(Long, String)].collect().toMap
    assert(out(1L) === "v1" && out(2L) === "v2" && out(3L) === "v3")
    (4 to 10).foreach(i => assert(out(i.toLong) === s"old_$i"))
  }

  test("zipUpdate: rows exhausted first -> extra values discarded, never padded") {
    val out = BulkUpdate.zipUpdate(docs(2), "value", (1 to 9).map("v" + _).mkString("\n"),
        orderKeys = Seq("id"), visible = lit(true), readOnly = lit(false))
      .select("id", "value").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "v1", 2L -> "v2"))
  }

  test("zipUpdate: read-only row consumes its position but is not written (trap #2)") {
    val out = BulkUpdate.zipUpdate(docs(6), "value", "v1\nv2\nv3\nv4\nv5\nv6",
        orderKeys = Seq("id"), visible = lit(true), readOnly = col("ro"))
      .select("id", "value").as[(Long, String)].collect().toMap
    assert(out(4L) === "old_4") // ro row: skipped, not shifted
    assert(out(5L) === "v5")    // position 5 still gets value 5
  }

  test("zipUpdate: hidden rows neither consume positions nor change") {
    val out = BulkUpdate.zipUpdate(docs(6), "value", "v1\nv2",
        orderKeys = Seq("id"), visible = !col("hidden"), readOnly = lit(false))
      .select("id", "value").as[(Long, String)].collect().toMap
    // visible order: 1,2,4,5 (3,6 hidden) -> v1->1, v2->2
    assert(out(1L) === "v1" && out(2L) === "v2")
    assert(out(3L) === "old_3" && out(4L) === "old_4" && out(6L) === "old_6")
  }

  test("boolean coercion: case-insensitive 'true', everything else false (trap #6)") {
    val got = Seq("true", "TRUE", " True ", "false", "yes", "1", "")
      .toDF("raw")
      .select(BulkUpdate.coerceBoolean(col("raw"))).as[Boolean].collect().toSeq
    assert(got === Seq(true, true, true, false, false, false, false))
  }

  test("validation gate rejects bad inputs before execution (O21)") {
    assert(BulkUpdate.validate(isMultiline = false, "x", "400") === Right(400))
    assert(BulkUpdate.validate(isMultiline = false, "  ", "400").isLeft)
    assert(BulkUpdate.validate(isMultiline = true, "\n  \n", "0").isLeft)
    assert(BulkUpdate.validate(isMultiline = false, "x", "-1").isLeft)
    assert(BulkUpdate.validate(isMultiline = false, "x", "abc").isLeft)
  }

  test("column-level read-only existential check (O4) short-circuits correctly") {
    assert(BulkUpdate.columnHasReadOnly(docs(12), col("ro")))
    assert(!BulkUpdate.columnHasReadOnly(docs(12), lit(false)))
  }

  test("zipUpdateIndexed (large-k scale path) agrees with zipUpdate exactly") {
    val df = docs(25)
    val text = (1 to 40).map("v" + _).mkString("\n")
    val values = BulkUpdate.parseLines(text)
      .toDF("__pos", "__newval")
      .select(col("__pos").cast("long").as("__pos"), col("__newval"))
    val small = BulkUpdate.zipUpdate(df, "value", text,
        Seq("id"), !col("hidden"), col("ro"))
      .select("id", "value").as[(Long, String)].collect().sortBy(_._1).toSeq
    val large = BulkUpdate.zipUpdateIndexed(df, "value", values,
        Seq("id"), !col("hidden"), col("ro"))
      .select("id", "value").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(large === small)
  }

  test("property: broadcast update is idempotent (SURVEY §5.2)") {
    val gen = Gen.choose(1, 25)
    val prop = Prop.forAllNoShrink(gen) { n =>
      val df = docs(n)
      val once = BulkUpdate.broadcastUpdate(df, "value", lit("X"),
        !col("hidden"), col("ro"))
      val twice = BulkUpdate.broadcastUpdate(once, "value", lit("X"),
        !col("hidden"), col("ro"))
      once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: update never touches filtered-out or read-only rows") {
    val gen = Gen.choose(1, 30)
    val prop = Prop.forAllNoShrink(gen) { n =>
      val out = BulkUpdate.broadcastUpdate(docs(n), "value", lit("X"),
          !col("hidden"), col("ro"))
        .select("id", "value").as[(Long, String)].collect()
      out.forall { case (i, v) =>
        val untouched = (i % 3 == 0) || (i % 4 == 0) // hidden or read-only
        if (untouched) v == s"old_$i" else v == "X"
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: zip updates exactly min(values, visibleRows) writable rows") {
    val gen = for {
      n <- Gen.choose(0, 30)
      m <- Gen.choose(0, 30)
    } yield (n, m)
    val prop = Prop.forAllNoShrink(gen) { case (n, m) =>
      val df = (1 to n).map(i => (i.toLong, "old")).toDF("id", "value")
      val text = (1 to m).map("v" + _).mkString("\n")
      val changed =
        if (m == 0 || n == 0) 0L
        else BulkUpdate.zipUpdate(df, "value", text, Seq("id"), lit(true), lit(false))
          .filter(col("value") =!= "old").count()
      changed == math.min(n, m).toLong
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
