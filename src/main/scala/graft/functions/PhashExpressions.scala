package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd pHash-style fingerprint: one text payload in, the
  * `nBands` 16-bit band longs out as `array<long>` — the whole 64-bit
  * perceptual fingerprint in ONE pass over the payload, per row.
  *
  * Replaces the 64-chunk builtin formulation (64 inlined
  * `conv(substring(md5(substr(text, 1+i*clen, clen)), 1, 1), 16, 10) % 2`
  * trees summed into 4 band columns), whose generated projection method
  * exceeded janino's 64 KB limit — Spark compiled it, FAILED, and
  * silently fell back to INTERPRETED evaluation, so every fingerprint
  * row paid 64 expression-tree walks and 64 substring+hex-string
  * allocations on the corpus-wide scan feeding the multimodal dedup
  * family. This expression is a single generated call into
  * [[PhashBands.compute]] — it stays inside whole-stage codegen (plan-
  * audited) and hashes each chunk straight from the payload bytes with
  * one thread-local MD5 instance, no hex strings, no per-chunk columns.
  *
  * BIT-IDENTICAL to the builtin formulation (and therefore to the
  * DuckDB oracle, which mirrors it): chunk width
  * clen = max(1, numChars div 64); chunk i is the character substring
  * [1 + i·clen, clen] (UTF8String.substringSQL — past-the-end chunks
  * are empty, and md5("") contributes its fixed first-digit parity);
  * bit i = (first hex digit of md5(chunk)) mod 2 = high-nibble parity
  * of digest byte 0; band b = Σ_r bit(b·16+r) · 2^r.
  *
  * Semantics of the underlying fingerprint (chunk-local parity bits so
  * Hamming distance tracks the edited area) are documented at
  * [[graft.ops.Multimodal.phashBandCols]], which remains as the
  * builtin-formulation twin the spec checks this expression against.
  */
case class PhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "phash_bands"

  override protected def nullSafeEval(text: Any): Any =
    PhashBands.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PhashBands.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhashBands {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Fingerprint geometry — the single source of truth for the engine
    * path, the builtin twin, and the oracle generator (all three import
    * these via [[graft.ops.Multimodal]]).
    */
  val nBands = 4
  val bandBits = 16
  val chunks: Int = nBands * bandBits

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val nChars = text.numChars()
    val clen = math.max(1, nChars / chunks)
    val digest = HashUtil.md5.get()
    val bands = new Array[Long](nBands)
    var i = 0
    while (i < chunks) {
      // 1-based char offset; substringSQL clamps past-the-end to ""
      val chunk = text.substringSQL(1 + i * clen, clen)
      digest.reset()
      digest.update(chunk.getBytes)
      val d0 = digest.digest()(0)
      // first hex digit of the md5 = high nibble of byte 0; bit = parity
      val bit = (d0 >>> 4) & 1
      bands(i / bandBits) |= bit.toLong << (i % bandBits)
      i += 1
    }
    new GenericArrayData(bands)
  }

  /** Column API: the 4 band longs of a text payload as one array. */
  def phash_bands(text: Column): Column =
    ColumnBridge.column(PhashBands(ColumnBridge.expression(text)))
}
