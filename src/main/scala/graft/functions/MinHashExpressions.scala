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

/** Shared MD5-prefix hashing for the codegen'd dedup expressions. */
private[functions] object HashUtil {
  /** One MD5 instance per executor thread — digest objects are stateful
    * and not thread-safe, and per-shingle getInstance() would dominate.
    */
  val md5: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  val SPACE: Byte = ' '.toByte

  /** First 8 hex chars of the md5 digest as an unsigned 32-bit value —
    * identical to `conv(substring(md5(s),1,8),16,10)::long`.
    */
  def prefix32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
}

object MinHashSignature {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import HashUtil.{md5, SPACE}

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
      // first 8 hex chars of md5 == first 4 bytes, big-endian unsigned
      val v = HashUtil.prefix32(digest.digest())
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

/** Native codegen'd 32-bit SimHash over a token array: every token
  * (duplicates included — SimHash weights by term frequency) votes
  * ±1 on each bit of its md5-prefix hash; output bit b is 1 iff the
  * vote sum is strictly positive. One pass per row — replaces the
  * token explode + 32 conditional-sum aggregates (and their shuffle)
  * of the builtin formulation, which it matches bit for bit
  * (including the null-token case: a null token takes the CaseWhen
  * else branch in the agg formulation, voting −1 on every bit).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(tokens: Any): Any =
    SimHash32.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](32)
    val digest = HashUtil.md5.get()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        var b = 0
        while (b < 32) { votes(b) -= 1; b += 1 }
      } else {
        digest.reset()
        digest.update(tokens.getUTF8String(i).getBytes)
        val v = HashUtil.prefix32(digest.digest())
        var b = 0
        while (b < 32) {
          if (((v >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API. */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))
}

/** All ordered i<j element pairs of an array, as `array<struct<a,b>>` —
  * the market-basket pair enumerator. Replaces the interpreted nested
  * `transform(…, slice(…))` higher-order formulation with one codegen'd
  * pass: no per-element lambda dispatch, no intermediate nested arrays,
  * one allocation for the output. Order follows the input (pass a
  * sorted, deduped array for canonical a<b pairs). Output size is
  * n·(n−1)/2 — like any pair enumeration it presumes bounded basket
  * size; unbounded groups want the co-occurrence-join formulation
  * instead.
  */
case class PairCombos(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "pair_combos"

  override protected def nullSafeEval(arr: Any): Any =
    PairCombos.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairCombos.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCombos {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def pair_combos(arr: Column): Column =
    ColumnBridge.column(PairCombos(ColumnBridge.expression(arr)))
}
