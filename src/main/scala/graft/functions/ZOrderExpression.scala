package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing a two-dimensional Z-order
  * (Morton) key: the low `bits` bits of each input interleaved
  * (x → even bit positions, y → odd), producing a single LongType
  * clustering key.
  *
  * Why this matters at 100 TB: parquet min/max footer statistics prune
  * on the SORT order of the data, so a table sorted by `x` skips files
  * only for `x` predicates. Writing the table ordered by `zorder(x, y)`
  * gives every file a tight bounding BOX in (x, y) — point and range
  * predicates on EITHER dimension (or both) skip most files. This is
  * the layout trick behind Delta/Iceberg Z-ORDER clustering, expressed
  * here as a plain expression + `repartitionByRange` write
  * ([[graft.sources.Sources.writeZOrdered]]).
  *
  * Why a custom Expression: the bit-interleave is 5 shift/mask rounds
  * per side in codegen (the classic "bit spreading" sequence) versus a
  * 2·bits-term expression tree for the builtin formulation — this stays
  * a tight straight-line whole-stage-codegen block. The builtin twin
  * ([[ZOrderKey.zorderKeyBuiltin]]) is kept as the oracle-shaped
  * reference; FunctionsSpec asserts bit-identity between the two.
  *
  * Inputs are masked to the low `bits` bits (callers whose domain
  * exceeds 2^bits should range-bucket first); negative inputs are
  * masked the same way (two's complement low bits), keeping the
  * expression total.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")

  private val mask: Long = (1L << bits) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long] & mask) |
      (ZOrderKey.interleave(b.asInstanceOf[Long] & mask) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // 5-round bit spread as a reusable generated helper (one copy per
      // generated class regardless of how many zorder_key calls appear)
      val spread = ctx.addNewFunction("graftZorderSpread",
        s"""
           |private long graftZorderSpread(long v) {
           |  v &= 0xFFFFFFFFL;
           |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
           |  v = (v | (v << 8))  & 0x00FF00FF00FF00FFL;
           |  v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |  v = (v | (v << 2))  & 0x3333333333333333L;
           |  v = (v | (v << 1))  & 0x5555555555555555L;
           |  return v;
           |}
         """.stripMargin)
      s"${ev.value} = $spread($a & ${mask}L) | ($spread($b & ${mask}L) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the low 32 bits of `v` to even bit positions (0, 2, 4, …). */
  def interleave(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column API: z-order key over two integer columns (cast to long). */
  def zorder_key(x: Column, y: Column, bits: Int = 16): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))

  /** Builtin-only twin (2·bits shift/mask terms summed) — the
    * oracle-shaped reference formulation; disjoint bit positions make
    * the sum an OR. Used by the DuckDB oracle generator and the parity
    * spec; the native expression must match it bit for bit.
    */
  def zorderKeyBuiltin(x: Column, y: Column, bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same formulation as DuckDB SQL text (for oracle generation). */
  def zorderSqlDuckDb(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((($x) >> $i) & 1) << ${2 * i})",
          s"(((($y) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
}
