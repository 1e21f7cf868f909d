package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd hashed-linear classifier score: token array in,
  * one BIGINT score out — the sum over every unigram feature
  * `u:<tok>` and bigram feature `b:<tok>_<tok+1>` of the md5-derived
  * integer weight `(md5_32(feature) mod wMod) - wShift`. The hashing
  * trick with the weight table folded into the hash itself, so the
  * whole model evaluates per row in one generated call: no feature
  * explode, no aggregation shuffle, no model broadcast. A TRAINED
  * model swaps the md5-derived weight for a `hash mod D → weight`
  * array lookup carried via `ctx.addReferenceObj` — the plan shape
  * (and this expression's skeleton) is unchanged.
  *
  * BIT-IDENTICAL to the builtin/oracle formulation
  * `sum((conv(substring(md5(feature),1,8),16,10) pmod wMod) - wShift)`:
  * the feature hash is the first 4 bytes of the feature string's MD5
  * read big-endian unsigned (non-negative, so `pmod == %`). Null
  * tokens cannot arise from split(); they are skipped (documented,
  * not oracle-observable).
  */
case class HashedLinearScore(child: Expression, wMod: Int, wShift: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hashed_linear_score"

  override protected def nullSafeEval(tokens: Any): Any =
    HashedLinearScore.compute(tokens.asInstanceOf[ArrayData], wMod, wShift)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedLinearScore.compute($c, $wMod, $wShift);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedLinearScore {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private val UNI: Array[Byte] = "u:".getBytes("UTF-8")
  private val BI: Array[Byte] = "b:".getBytes("UTF-8")
  private val SEP: Byte = '_'.toByte

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, wMod: Int, wShift: Int): Long = {
    val n = tokens.numElements()
    val digest = HashUtil.md5.get()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i).getBytes
        digest.reset()
        digest.update(UNI)
        digest.update(t)
        sum += HashUtil.prefix32(digest.digest()) % wMod - wShift
        if (i + 1 < n && !tokens.isNullAt(i + 1)) {
          digest.reset()
          digest.update(BI)
          digest.update(t)
          digest.update(SEP)
          digest.update(tokens.getUTF8String(i + 1).getBytes)
          sum += HashUtil.prefix32(digest.digest()) % wMod - wShift
        }
      }
      i += 1
    }
    sum
  }

  /** Column API: hashed-linear score of a token-array column. */
  def hashed_linear_score(tokens: Column, wMod: Int, wShift: Int): Column =
    ColumnBridge.column(
      HashedLinearScore(ColumnBridge.expression(tokens), wMod, wShift))
}
