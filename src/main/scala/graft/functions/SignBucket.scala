package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sign-LSH bucket: all `nBits` hyperplane sign bits of one
  * vector in a single pass, value-identical to the column composition
  * `concat(when(dotDecimal(vec, planes_i) >= 0, "1").otherwise("0"))`
  * it replaces (SimilaritySpec asserts byte equality on real data).
  *
  * Why a custom Expression (builder-prompt tier (b)) instead of the
  * composition: the planes are ±1 vectors, so every element product is
  * `± vec(j)` — and the double→DECIMAL(30,12) cast Spark uses
  * (`Decimal(double)`, a `Double.toString`-based construction, HALF_UP)
  * is SIGN-SYMMETRIC (`toString(-x) = "-" + toString(x)`, HALF_UP
  * rounds away from zero), so `cast(±vec(j)) = ±cast(vec(j))` exactly.
  * The composition re-cast every element under every plane —
  * nBits × dim string-parse conversions per row, measured as ~85% of
  * the ANN audit's runtime at 64 planes — where one cast per element
  * plus exact BigDecimal adds/subtracts computes the identical bits.
  * It also collapses the nBits × dim literal-array expression trees
  * (4096 nodes for a 64-bit family) that bloated analysis and codegen.
  *
  * Null semantics replicate the composition exactly: a NULL vector, a
  * NULL element, a length ≠ `dim` (zip_with null padding), or an
  * element whose cast overflows DECIMAL(30,12) all null every per-bit
  * dot — |±x| is sign-invariant, so overflow is bit-independent — and
  * `when(null >= 0, "1").otherwise("0")` emits '0': the bucket
  * degrades to all-zeros, never to NULL.
  */
case class SignBucket(child: Expression, offset: Int, nBits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  /** `compute` reads elements via `ArrayData.getFloat` — 4-byte
    * offsets on unsafe arrays — so any other element width would read
    * garbage silently. Fail analysis instead (the HOF composition this
    * replaces would have cast; callers feed `array<float>` embeddings). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val signs: Array[Array[Boolean]] =
    SignBucket.signMatrix(offset, nBits, dim)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SignBucket.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], signs, dim)
  }

  /** Stays inside whole-stage codegen (one static call per row, like
    * [[DecimalDot]]); the null-input case yields the all-zeros bucket,
    * so the result is never null and isNull is the literal false. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signBucketSigns", signs, "boolean[][]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |UTF8String ${ev.value} = graft.functions.SignBucket.compute(
        |  ${childGen.isNull} ? null : ${childGen.value}, $signsRef, $dim);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sign_bucket"
}

object SignBucket {

  /** signs(i)(j) = the md5-seeded ±1 plane entry for bit `offset + i`,
    * dimension j+1 — [[graft.operators.Similarity.planeSign]]'s
    * convention, computed once per (offset, nBits, dim) per JVM. */
  def signMatrix(offset: Int, nBits: Int, dim: Int): Array[Array[Boolean]] =
    Array.tabulate(nBits, dim)((i, j) => planeSignPositive(offset + i, j + 1))

  /** +1 iff the first hex nibble of md5("bit:dim") is odd (dim
    * 1-based) — the single source of truth for the plane stream; the
    * Column-level [[graft.operators.Similarity.planeSign]] delegates
    * here and the DuckDB oracle embeds the identical literals. */
  def planeSignPositive(bit: Int, dim1: Int): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$bit:$dim1".getBytes("UTF-8"))
    ((d(0) >> 4) & 1) == 1
  }

  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData, signs: Array[Array[Boolean]], dim: Int): UTF8String = {
    val nBits = signs.length
    val out = new Array[Byte](nBits)
    java.util.Arrays.fill(out, '0'.toByte)
    if (v == null || v.numElements() != dim) return UTF8String.fromBytes(out)
    // one double→DECIMAL(30,12) cast per element (the composition paid
    // one per element PER PLANE); any null/overflow nulls every bit's
    // dot, which the when() maps to the '0' already filled in
    //
    // Fast accumulation (round 14): every cast element is an exact
    // scale-12 decimal, and adding/subtracting same-scale decimals is
    // exact with no scale change — so when every element's unscaled
    // value fits a long AND dim·max|unscaled| cannot overflow a long,
    // the per-plane BigDecimal fold collapses to long adds with the
    // IDENTICAL sign (both folds are exact over the same values;
    // SimilaritySpec asserts byte equality vs the HOF composition).
    // nBits × dim BigDecimal allocations/row → nBits × dim long adds.
    val unscaled = new Array[Long](dim)
    var fast = true
    var maxAbs = 0L
    var j = 0
    while (fast && j < dim) {
      if (v.isNullAt(j)) return UTF8String.fromBytes(out)
      val d = Decimal(v.getFloat(j).toDouble)
      // changePrecision(18, 12) rounds to the SAME scale-12 value as
      // the (30, 12) cast (rounding depends on scale only) but leaves
      // the Decimal COMPACT, so toUnscaledLong is a field read — no
      // BigInteger allocation. A value needing 19..30 digits fast-bails
      // to the BigDecimal fold below; a (30, 12) overflow is detected
      // there and degrades to all-zeros exactly as before.
      if (d.changePrecision(18, 12)) {
        val l = d.toUnscaledLong
        unscaled(j) = l
        val a = math.abs(l)
        if (a > maxAbs) maxAbs = a
      } else fast = false
      j += 1
    }
    if (fast && (dim == 0 || maxAbs <= Long.MaxValue / dim)) {
      var i = 0
      while (i < nBits) {
        var acc = 0L
        val row = signs(i)
        var k = 0
        while (k < dim) {
          acc = if (row(k)) acc + unscaled(k) else acc - unscaled(k)
          k += 1
        }
        if (acc >= 0) out(i) = '1'.toByte
        i += 1
      }
      return UTF8String.fromBytes(out)
    }
    // overflow-risk fallback: the ORIGINAL exact BigDecimal fold from
    // scratch, including the null/overflow-→-all-zeros checks the fast
    // scan may not have reached (it stops at the first bail; this path
    // needs |element| ≥ ~4.6e5, unreachable for real embeddings)
    val dec = new Array[java.math.BigDecimal](dim)
    j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return UTF8String.fromBytes(out)
      val d = Decimal(v.getFloat(j).toDouble)
      if (!d.changePrecision(30, 12)) return UTF8String.fromBytes(out)
      dec(j) = d.toJavaBigDecimal
      j += 1
    }
    var i = 0
    while (i < nBits) {
      var acc = java.math.BigDecimal.ZERO
      val row = signs(i)
      var k = 0
      while (k < dim) {
        acc = if (row(k)) acc.add(dec(k)) else acc.subtract(dec(k))
        k += 1
      }
      if (acc.signum() >= 0) out(i) = '1'.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
