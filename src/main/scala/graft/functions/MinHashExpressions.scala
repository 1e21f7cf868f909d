package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd MinHash signature: token array in, `array<long>` of
  * k per-permutation minima out — the whole signature in ONE pass over
  * the document's w-token shingles, per row, with no explode and no
  * aggregation shuffle.
  *
  * Replaces the builtin formulation
  * `explode(shingles) → conv(substring(md5(s),1,8),16,10) → groupBy(min×k)`,
  * which (a) multiplies the row count by the shingle count, (b) allocates
  * a concatenated shingle string plus a 32-char hex string per shingle,
  * and (c) pays a full hash-aggregate exchange just to bring the k minima
  * back to one row per document. At 100 TB the explode+shuffle is the
  * dominant cost of signature computation; this expression makes the
  * signature a narrow map-side projection.
  *
  * BIT-IDENTICAL to the builtin formulation (and therefore to the DuckDB
  * oracle, which mirrors it): the shingle is the concat_ws(" ") of w
  * consecutive tokens (null tokens skipped, exactly like concat_ws), its
  * hash value is the first 4 bytes of its MD5 digest read as a big-endian
  * unsigned int (== conv(substring(md5(s),1,8),16,10)), and slot i is
  * min((a_i·v + b_i) mod p). Shingle distinctness is irrelevant under
  * min, so the array_distinct of the builtin path needs no counterpart.
  *
  * Returns NULL for docs with fewer than w tokens — the same docs the
  * explode formulation drops (zero shingle rows → absent from the agg).
  */
case class MinHashSignature(
    child: Expression,
    w: Int,
    ab: Seq[(Long, Long)],
    p: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr: Array[Long] = ab.map(_._1).toArray
  @transient private lazy val bArr: Array[Long] = ab.map(_._2).toArray

  override protected def nullSafeEval(tokens: Any): Any =
    MinHashSignature.compute(tokens.asInstanceOf[ArrayData], w, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSignature.compute($c, $w, $aRef, $bRef, ${p}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** One MD5 instance per executor thread — digest objects are stateful
    * and not thread-safe, and per-shingle getInstance() would dominate.
    */
  private val md5: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val SPACE: Byte = ' '.toByte

  /** Shared by interpreted eval and generated code (public: generated
    * classes live outside this package). Null iff fewer than w tokens.
    */
  def compute(tokens: ArrayData, w: Int,
              a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return null
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val digest = md5.get()
    var i = 0
    val last = n - w
    while (i <= last) {
      digest.reset()
      // concat_ws(" ") semantics: null tokens contribute neither bytes
      // nor a separator (split() never yields nulls, but the contract
      // must match the builtin exactly for any input)
      var wrote = false
      var j = 0
      while (j < w) {
        if (!tokens.isNullAt(i + j)) {
          if (wrote) digest.update(SPACE)
          digest.update(tokens.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = digest.digest()
      // first 8 hex chars of md5 == first 4 bytes, big-endian unsigned
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var s = 0
      while (s < k) {
        val h = (a(s) * v + b(s)) % p
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Column API: k-slot signature of a token-array column. */
  def minhash_sig(tokens: Column, w: Int, ab: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), w, ab, p))
}
