package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the per-row text-hash expressions.
  *
  * MessageDigest is not thread-safe and expression instances are shared
  * across an executor's task threads (whole-stage codegen keeps them in
  * the plan's references array), so digests live in a ThreadLocal.
  */
private[expressions] object TextHash {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** A reset, thread-confined MD5 instance. */
  def md5(): MessageDigest = { val d = digests.get(); d.reset(); d }

  private val hexDigits = "0123456789abcdef".getBytes

  /** Lowercase hex of a digest, as UTF8String. Hex encoding is
    * order-preserving, so comparisons can run on the raw digest bytes
    * and only the winners need encoding.
    */
  def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of equal-length byte arrays —
    * identical ordering to comparing their lowercase-hex strings.
    */
  def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** MinHash signature of a token array, computed in one pass per row.
  *
  * Semantics match the SQL form the DuckDB oracle uses: signature i is
  * `min(md5('<i>|' || shingle))` (lowercase hex, lexicographic min)
  * over the doc's word 2-shingles. Duplicate shingles cannot change a
  * min, so no distinct pass is needed. Rows with fewer than two tokens
  * have no shingles and yield an EMPTY array — callers filter
  * `size(...) > 0` to reproduce the explode+groupBy behavior of
  * dropping such docs.
  *
  * Exists because the compositional plan (HOF shingle transform →
  * explode → 8-way min/md5 hash aggregate) allocates an exploded row
  * per shingle and a per-doc aggregation buffer — at corpus scale that
  * is GC pressure and a shuffle for what is per-row arithmetic. Here
  * the whole signature is a narrow projection: no explode, no shuffle,
  * and min tracking on raw 16-byte digests (hex encoding is
  * order-preserving, applied only to the winners).
  *
  * Reference behavior: minhash over shingles with k salted hash
  * functions (reference: src/combiners/distinct.rs zero-seeded hashing
  * stance; LSH pipeline in SURVEY §2 pipeline tier).
  */
case class MinHashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[Array[Byte]](numHashes)
    // a null token yields null shingles (concat-with-null semantics in
    // the composed form), which min() ignores — skip them here too
    var prev = if (input.isNullAt(0)) null else input.getUTF8String(0).getBytes
    var k = 1
    while (k < n) {
      val cur = if (input.isNullAt(k)) null else input.getUTF8String(k).getBytes
      if (prev != null && cur != null) {
        var i = 0
        while (i < numHashes) {
          val d = TextHash.md5()
          d.update(salts(i))
          d.update(prev)
          d.update(' '.toByte)
          d.update(cur)
          val dig = d.digest()
          if (mins(i) == null || TextHash.unsignedLess(dig, mins(i))) mins(i) = dig
          i += 1
        }
      }
      prev = cur
      k += 1
    }
    // all shingles null -> no signature; treat like a <2-token doc
    if (mins(0) == null) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = TextHash.hex(mins(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignatures].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash fingerprint of a token array, computed in one pass per row.
  *
  * Bit j of the fingerprint is set iff, summing +1/-1 per token
  * according to whether hex digit j of the token's md5 is in 8..f
  * (i.e. nibble >= 8), the sum is >= 0 — exactly the SQL the DuckDB
  * oracle runs (`substr(md5(tok), j+1, 1) IN ('8'..'f')`). Every token
  * occurrence counts (no dedup), matching explode-then-sum semantics.
  *
  * Replaces an explode + 16-column conditional-sum hash aggregate
  * (one exploded row and 16 string substrings per token, plus a
  * shuffle) with a narrow projection doing nibble math on the raw
  * digest bytes.
  */
case class SimHashFingerprint(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 32, s"simhash bits must be in 1..32, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash"

  def compute(input: ArrayData): Int = {
    val counts = new Array[Int](bits)
    val n = input.numElements()
    var k = 0
    while (k < n) {
      if (input.isNullAt(k)) {
        // composed form: md5(null) -> null nibble test -> otherwise(-1)
        var j = 0
        while (j < bits) { counts(j) -= 1; j += 1 }
      } else {
        val d = TextHash.md5()
        d.update(input.getUTF8String(k).getBytes)
        val dig = d.digest()
        var j = 0
        while (j < bits) {
          val nib = if ((j & 1) == 0) (dig(j >> 1) >> 4) & 0xF else dig(j >> 1) & 0xF
          counts(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      k += 1
    }
    var fp = 0
    var j = 0
    while (j < bits) {
      if (counts(j) >= 0) fp |= 1 << j
      j += 1
    }
    fp
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
