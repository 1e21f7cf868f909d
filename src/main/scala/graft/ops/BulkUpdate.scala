package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's core surface: bulk column update over a filtered table
  * (SURVEY.md §2.1, operators O2/O5/O6/O7/O9/O10/O11/O12/O13).
  *
  * Reference semantics preserved (Odoo-Batch-Processing.user.js):
  *  - visibility filter — only "visible" rows are update candidates, hidden
  *    rows keep their values (OBP.js:203, 434);
  *  - two-tier read-only handling — a column-level existential pre-check
  *    that aborts (OBP.js:134-140, 167-188) and a row-level *silent skip*
  *    that touches neither counter (OBP.js:477-480);
  *  - broadcast mode — one literal fanned out to every candidate row
  *    (OBP.js:487-490);
  *  - zip mode — i-th cleaned input line → i-th visible row in document
  *    order, truncated at min(values, rows), never padded (OBP.js:448-452,
  *    484-486);
  *  - blank input lines dropped *before* positional assignment
  *    (OBP.js:297-298).
  *
  * Scale design: none of these operators materialize on the driver or
  * force a single-partition global window over the full table. Zip mode
  * exploits that the value list is user input (small by construction): the
  * positional row set is computed with a top-k plan
  * (`TakeOrderedAndProject`), then broadcast-joined back — the 100 TB fact
  * table is scanned once, never globally sorted.
  */
object BulkUpdate {

  /** O5 — broadcast-constant update: write `value` into `column` for every
    * row passing `visible`, silently skipping rows where `readOnly` holds.
    * Pure `Project` node: no shuffle, fully codegen'd.
    */
  def broadcastUpdate(df: DataFrame, column: String, value: Column,
                      visible: Column, readOnly: Column): DataFrame =
    df.withColumn(column,
      when(visible && !coalesce(readOnly, lit(false)), value)
        .otherwise(col(column)))

  /** O4 — column-level read-only existential check: TRUE if any cell in
    * the column is read-only (OBP.js:167-188 short-circuits on first hit;
    * `isEmpty` plans a LocalLimit(1) with the same early-out).
    */
  def columnHasReadOnly(df: DataFrame, readOnly: Column): Boolean =
    !df.where(readOnly).isEmpty

  /** O4 as a dataflow (for the oracle harness): single-row aggregate. */
  def readOnlyGuard(df: DataFrame, readOnly: Column): DataFrame =
    df.agg(max(when(readOnly, 1).otherwise(0)).as("has_readonly"),
           count(when(readOnly, 1)).as("n_readonly"))

  /** O7 — parse a raw multiline input: split on '\n', drop blank lines,
    * index the survivors. Positions are assigned AFTER the blank-drop
    * (OBP.js:297-298 — correctness trap #3).
    */
  def parseLines(text: String): Seq[(Int, String)] =
    text.split("\n", -1).iterator
      .filter(_.trim.nonEmpty)
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq

  /** O6 — positional zip update: i-th cleaned line of `text` goes to the
    * i-th `visible` row of `df` in `orderKeys` order; rows beyond
    * min(lines, rows) and read-only rows keep their old value.
    *
    * Physical plan at scale: `df.orderBy(keys).limit(k)` is planned as
    * TakeOrderedAndProject — a per-partition top-k + driver merge of k
    * keys, NOT a global sort. The k matched keys are broadcast back, so
    * the only full pass over the fact table is the final projection.
    */
  def zipUpdate(df: DataFrame, column: String, text: String,
                orderKeys: Seq[String], visible: Column,
                readOnly: Column): DataFrame = {
    val spark = df.sparkSession
    val lines = parseLines(text)
    val k = lines.size
    val keyCols = orderKeys.map(col)

    // value list: tiny (user input) → local relation, broadcast below
    import spark.implicits._
    val vals = lines.toDF("__pos", "__newval")

    // first k visible rows in document order; k is small so the window
    // after limit(k) runs over k rows, not the table
    val topk = df.filter(visible).select(keyCols: _*)
      .orderBy(keyCols: _*).limit(k)
      .withColumn("__pos",
        row_number().over(Window.orderBy(keyCols.map(_.asc): _*)) - 1)

    // inner join on position == min-truncation (correctness trap #1)
    val upd = topk.join(vals, "__pos")
      .select(keyCols :+ col("__newval"): _*)

    df.join(broadcast(upd), orderKeys, "left")
      .withColumn(column,
        when(col("__newval").isNotNull && !coalesce(readOnly, lit(false)),
          col("__newval")).otherwise(col(column)))
      .drop("__newval")
  }

  /** O6 at LARGE k — when the value list is itself a distributed
    * dataset (millions of positions), the top-k/broadcast path of
    * `zipUpdate` no longer applies. This variant computes a global
    * ordered row index with `zipWithIndex`: a distributed sort plus one
    * extra count job for per-partition offsets — never a
    * single-partition window — then equi-joins values on position.
    * Same min-truncation / read-only / visibility semantics.
    *
    * `values` must carry (`__pos` long, `__newval` string).
    */
  def zipUpdateIndexed(df: DataFrame, column: String, values: DataFrame,
                       orderKeys: Seq[String], visible: Column,
                       readOnly: Column): DataFrame = {
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val keyCols = orderKeys.map(col)
    val vis = df.filter(visible).select(keyCols: _*).orderBy(keyCols: _*)
    val indexed = spark.createDataFrame(
      vis.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      StructType(vis.schema.fields :+ StructField("__pos", LongType, nullable = false)))
    val upd = indexed.join(values, "__pos")
      .select(keyCols :+ col("__newval"): _*)
    df.join(upd, orderKeys, "left")
      .withColumn(column,
        when(col("__newval").isNotNull && !coalesce(readOnly, lit(false)),
          col("__newval")).otherwise(col(column)))
      .drop("__newval")
  }

  /** O13 — outcome accounting: one row of counters mirroring the final
    * toast (OBP.js:504-513). updated / skipped_readonly (neither success
    * nor error — trap #2) / hidden / total.
    */
  def outcome(df: DataFrame, visible: Column, readOnly: Column): DataFrame =
    df.agg(
      count(when(visible && !readOnly, 1)).as("n_updated"),
      count(when(visible && readOnly, 1)).as("n_skipped_readonly"),
      count(when(!visible, 1)).as("n_hidden"),
      count(lit(1)).as("n_total"))

  /** O9 — checkbox coercion: case-insensitive "true" → true, anything
    * else → false, never an error (OBP.js:586-587, trap #6).
    */
  def coerceBoolean(value: Column): Column =
    lower(trim(value)) === lit("true")

  /** O10 — wait-time parse: integer parse with negative→0 clamp; a
    * non-numeric string yields NULL (the reference rejects it at the
    * validation gate, OBP.js:287-290).
    */
  def parseClampInt(value: Column): Column =
    greatest(lit(0L), floor(value.try_cast(DoubleType)).try_cast(LongType))

  /** O19 — widget/type resolution: the reference resolves the editor
    * widget per cell with a 6-strategy cascade (OBP.js:624-664) and
    * coerces the string value to fit. Engine analog: schema-driven
    * dispatch — the incoming string is coerced to the TARGET COLUMN's
    * type, with the reference's semantics per type (case-insensitive
    * boolean, clamped integer, lossless strings, try-cast numerics that
    * yield NULL rather than fail mid-update).
    */
  def coerce(value: Column, target: DataType): Column = target match {
    case BooleanType           => coerceBoolean(value)
    case IntegerType | LongType => parseClampInt(value).cast(target)
    case DoubleType | FloatType => trim(value).try_cast(target)
    case _: DecimalType        => trim(value).try_cast(target)
    case DateType              => trim(value).try_cast(DateType)
    case TimestampType         => trim(value).try_cast(TimestampType)
    case _                     => value.cast(StringType)
  }

  /** O21 — validation gate: reject empty value / empty list / invalid
    * wait before any execution (OBP.js:277-303). Driver-side check, like
    * Spark's analysis phase.
    */
  def validate(isMultiline: Boolean, value: String, waitMs: String): Either[String, Int] = {
    val wait = waitMs.trim.toIntOption
    if (wait.isEmpty || wait.exists(_ < 0)) Left("invalid wait time")
    else if (!isMultiline && value.trim.isEmpty) Left("empty value")
    else if (isMultiline && parseLines(value).isEmpty) Left("empty value list")
    else Right(wait.get)
  }
}
