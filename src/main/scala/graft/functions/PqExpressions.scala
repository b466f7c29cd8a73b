package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd product-quantization nearest-centroid assignment.
  *
  * The literal-inlined formulation (a per-subspace CASE over
  * `least(struct(d, code), ...)` with m·k·subDim inlined terms — 512
  * at the catalog's 4×8×16 shape) exceeds the JVM's 64 KB method
  * limit once wrapped in a real plan: Janino refuses, Spark silently
  * falls back to INTERPRETED per-row evaluation, and encode/train/ADC
  * all pay boxed tree-walking on the hot path (measured 11.4 s for an
  * 80 K-row encode at sf1 that runs in ~0.4 s compiled). This kernel
  * is the [[VecDot]] treatment for the PQ argmin: the codebooks ride
  * along as primitive `long[][]`/`int[][]` fields of the expression
  * (serialized with the plan to executors; surfaced to generated code
  * via `addReferenceObj`), and the per-row work is one tight
  * two-level loop — constant bytecode size at ANY m/k/subDim.
  *
  * Semantics are bit-identical to the literal form: exact integer L2²
  * over the e6-quantized subvector against subspace `s`'s live
  * centroids, argmin with ties to the SMALLER code (codebooks are
  * code-ascending, strict `<` comparison). Null s or qv → null; qv
  * components must be non-null and at least subDim long (guaranteed
  * by the e6 subvector slicer that feeds it).
  */
case class PqAssignExpr(sExpr: Expression, qvExpr: Expression,
                        cents: Array[Array[Long]], codes: Array[Array[Int]])
    extends BinaryExpression {

  override def left: Expression = sExpr
  override def right: Expression = qvExpr
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_assign"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (sExpr.dataType, qvExpr.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_assign needs (int subspace, array<bigint> qv), got $other")
    }

  override def nullSafeEval(s: Any, qv: Any): Any =
    PqAssignExpr.argmin(s.asInstanceOf[Int], qv.asInstanceOf[ArrayData], cents, codes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "long[][]")
    val codesRef = ctx.addReferenceObj("pqCodes", codes, "int[][]")
    nullSafeCodeGen(ctx, ev, (s, qv) =>
      s"${ev.value} = graft.functions.PqAssignExpr.argmin($s, $qv, $centsRef, $codesRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(sExpr = newLeft, qvExpr = newRight)
}

object PqAssignExpr {
  /** Exact-integer argmin over subspace `s`'s codebook: L2² between
    * the e6 subvector and each flattened centroid row, first (strict
    * `<`) minimum wins — code-ascending storage makes that the
    * smaller-code tie rule. Shared by interpreted eval and codegen. */
  def argmin(s: Int, qv: ArrayData, cents: Array[Array[Long]],
             codes: Array[Array[Int]]): Int = {
    val cs = cents(s)
    val cd = codes(s)
    val k = cd.length
    val subDim = if (k == 0) 0 else cs.length / k
    var best = Long.MaxValue
    var bestC = -1
    var j = 0
    while (j < k) {
      val base = j * subDim
      var d = 0L
      var i = 0
      while (i < subDim) {
        val diff = cs(base + i) - qv.getLong(i)
        d += diff * diff
        i += 1
      }
      if (d < best) { best = d; bestC = cd(j) }
      j += 1
    }
    bestC
  }

  /** Column form of the kernel for a [[PqModel]]: flattens the
    * codebooks once (row-major per subspace, code-ascending) and
    * wraps the expression via the column bridge — no function
    * registry, the model ships inside the expression tree. */
  def pqAssign(s: Column, qv: Column, model: PqModel): Column = {
    val cents = model.codebooks.map(cb =>
      cb.iterator.flatMap(_._2).toArray).toArray
    val codes = model.codebooks.map(cb => cb.map(_._1).toArray).toArray
    GraftColumnBridge.column(PqAssignExpr(
      GraftColumnBridge.expression(s), GraftColumnBridge.expression(qv),
      cents, codes))
  }
}
