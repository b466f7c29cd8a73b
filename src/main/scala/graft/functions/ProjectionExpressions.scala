package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen kernels for the two plane-matrix projections — the fourth
  * and fifth members of the `addReferenceObj` kernel family
  * ([[PqAssignExpr]], [[IvfProbesExpr]], [[IvfBestScoreExpr]]). Both
  * replaced forms inlined a LITERAL plane matrix into the generated
  * stage method and therefore grew bytecode with model size:
  *
  *  - the JL projection unrolled outDim × inDim `element_at` terms —
  *    54.7 KB of stage method at 16×64 (measured by
  *    `tools/CodegenLint`), one model bump from the silent-interpreted
  *    64 KB cliff;
  *  - the SRP signature summed [[graft.ops.Dedup.CosineBits]]
  *    `when(vec_dot(v, litVec(plane)) >= 0, 1L<<b, 0)` columns —
  *    13.3 KB, past HotSpot's 8 KB DontCompileHugeMethods ceiling, so
  *    the stage ran as un-JIT'd bytecode.
  *
  * Each kernel carries its plane matrix as a primitive `double[][]` /
  * `byte[][]` reference object, so the generated method is
  * CONSTANT-SIZE at any model shape and the per-row work is a tight
  * primitive loop. Values are bit-identical to the replaced forms
  * (spec-pinned): identical index-order folds, identical `>= 0` sign
  * test (NaN-false on both paths), identical floor-quantize-then-sum
  * integer arithmetic. */
object ProjectionExpressions {

  private[functions] def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def checkVec(t: DataType, who: String) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$who needs array<float|double> input, got $other")
  }
}

/** Johnson–Lindenstrauss ±1 projection kernel: out[j] = Σᵢ signs(j)(i) ·
  * ⌊xᵢ·10⁶⌋ — the quantize-FIRST integer-exact discipline of
  * [[VectorFunctions.randomProjection]], whose literal-unrolled form
  * this replaces. Signs are ±1 bytes; sums are exact long arithmetic
  * (order-free), so the kernel is bit-identical to the unrolled
  * `element_at` sum at any partitioning.
  *
  * Deviations from the literal form, both unreachable on real corpora
  * and documented here: a null vec returns null (the literal form
  * produced an array of `outDim` nulls), and a vec SHORTER than
  * `inDim` returns null (the literal form null-poisoned each
  * component via out-of-range `element_at`). */
case class JlProjectExpr(vecExpr: Expression, signs: Array[Array[Byte]])
    extends UnaryExpression {

  override def child: Expression = vecExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"
  // null even for non-null input (short vec) — keep isNull a variable
  override def nullable: Boolean = true

  private def isFloat: Boolean = ProjectionExpressions.isFloatArray(vecExpr.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ProjectionExpressions.checkVec(vecExpr.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    JlProjectExpr.project(v.asInstanceOf[ArrayData], signs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("jlSigns", signs, "byte[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.JlProjectExpr.project($v, $signsRef, $isFloat);\n" +
        s"if (${ev.value} == null) { ${ev.isNull} = true; }")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vecExpr = newChild)
}

object JlProjectExpr {
  /** Shared by interpreted eval and codegen. Returns null when the vec
    * is shorter than the plane width (the literal form's null-poisoned
    * components, collapsed to a null array). */
  def project(vec: ArrayData, signs: Array[Array[Byte]], isFloat: Boolean): ArrayData = {
    val inDim = if (signs.length == 0) 0 else signs(0).length
    if (vec.numElements() < inDim) return null
    // quantize once: ⌊x·10⁶⌋ exactly as floor(cast(x as double)*1e6)::long
    val q = new Array[Long](inDim)
    var i = 0
    if (isFloat) while (i < inDim) { q(i) = math.floor(vec.getFloat(i).toDouble * 1000000.0).toLong; i += 1 }
    else while (i < inDim) { q(i) = math.floor(vec.getDouble(i) * 1000000.0).toLong; i += 1 }
    val out = new Array[Long](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      var acc = 0L
      var k = 0
      while (k < inDim) { acc += (if (row(k) > 0) q(k) else -q(k)); k += 1 }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column form over a sign matrix (`signs(j)(i)` ∈ {+1, −1}). */
  def jlProject(vec: Column, signs: Seq[Seq[Long]]): Column = {
    require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
      "sign matrix must be rectangular and non-empty")
    val bytes = signs.map(_.map(s => if (s > 0) 1.toByte else -1.toByte).toArray).toArray
    GraftColumnBridge.column(JlProjectExpr(GraftColumnBridge.expression(vec), bytes))
  }
}

/** Signed-random-projection (random-hyperplane LSH) signature kernel:
  * bit b of the result is set iff dot(v, plane_b) ≥ 0, dots folded in
  * index order exactly like [[VecDot]] — bit-identical to the
  * `Σ_b when(vec_dot(v, litVec(p_b)) >= 0, 1L<<b, 0)` column stack it
  * replaces (distinct powers of two sum = bitwise OR; `>= 0` is
  * NaN-false on both paths). Null vec → null; an empty or short vec
  * folds the shorter prefix per VecDot's contract (dot 0.0 → bit SET,
  * matching the replaced form's `0.0 >= 0`). */
case class SrpSignExpr(vecExpr: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def child: Expression = vecExpr
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sign"

  private def isFloat: Boolean = ProjectionExpressions.isFloatArray(vecExpr.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ProjectionExpressions.checkVec(vecExpr.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    SrpSignExpr.sign(v.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpSignExpr.sign($v, $planesRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vecExpr = newChild)
}

object SrpSignExpr {
  def sign(vec: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(vec.numElements(), p.length)
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) { acc += vec.getFloat(i).toDouble * p(i); i += 1 }
      else while (i < n) { acc += vec.getDouble(i) * p(i); i += 1 }
      if (acc >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column form over hyperplane rows (bit b ← planes(b)). */
  def srpSign(vec: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.length <= 63, s"need 1..63 planes, got ${planes.length}")
    GraftColumnBridge.column(SrpSignExpr(
      GraftColumnBridge.expression(vec), planes.map(_.toArray).toArray))
  }
}

/** Majority-sign signature assembly: bit b of the result is set iff
  * 2·sums(b) > n — i.e. the per-bit ±1 token sum (recovered as
  * 2·Σbit − n) is positive. Replaces the 60-term
  * `when(b_i * 2 > n, 1L<<i, 0)` sum in [[graft.ops.Dedup.simhash]]'s
  * reassembly projection, which fused with the final 60-sum aggregate
  * merge into an 11.5 KB stage method (tools/CodegenLint: past
  * HotSpot's 8 KB JIT ceiling). Here each bit costs one compare+or of
  * generated code, so the assembly adds ~1.5 KB at 60 bits.
  *
  * Null discipline mirrors the replaced form: a null sum or null n
  * contributes bit 0 (`when` was null-false); the result itself is
  * never null. */
case class SignBitsExpr(nExpr: Expression, sums: Seq[Expression])
    extends Expression {

  override def children: Seq[Expression] = nExpr +: sums
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_bits"
  override def foldable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType) && sums.length <= 63)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sign_bits needs long n and 1..63 long sums, got " +
        children.map(_.dataType).mkString(","))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val nv = nExpr.eval(input)
    if (nv == null) return 0L
    val n = nv.asInstanceOf[Long]
    var sig = 0L
    var b = 0
    while (b < sums.length) {
      val sv = sums(b).eval(input)
      if (sv != null && 2L * sv.asInstanceOf[Long] > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val nCode = nExpr.genCode(ctx)
    val sumCodes = sums.map(_.genCode(ctx))
    val sig = ctx.freshName("sig")
    val checks = sumCodes.zipWithIndex.map { case (s, b) =>
      s"${s.code}\n" +
        s"if (!${s.isNull} && 2L * ${s.value} > ${nCode.value}) { $sig |= ${1L << b}L; }"
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${nCode.code}
        long $sig = 0L;
        if (!${nCode.isNull}) {
          $checks
        }""",
      isNull = FalseLiteral,
      value = JavaCode.variable(sig, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(nExpr = newChildren.head, sums = newChildren.tail)
}

object SignBitsExpr {
  /** Column form: bit b of the result ⟺ 2·sums(b) > n. */
  def signBits(n: Column, sums: Seq[Column]): Column =
    GraftColumnBridge.column(SignBitsExpr(
      GraftColumnBridge.expression(n), sums.map(GraftColumnBridge.expression)))
}
