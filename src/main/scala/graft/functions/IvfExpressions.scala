package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd coarse-quantizer probe assignment — the [[PqAssignExpr]]
  * treatment applied to the centroid model.
  *
  * The literal-inlined formulation (`sort_array` / `greatest` over an
  * array of C structs, each wrapping a [[VecDot]] against a 64-element
  * literal) exceeds the JVM 64 KB method limit as C grows: at the
  * sf10 drill's C = 64 Janino refuses, Spark silently interprets, and
  * every member of the coarse family — `assignBuckets`, `assignProbes`,
  * `ivfTopK` tagging, EVERY Lloyd's iteration of `kmeansCentroids`,
  * SemDeDup clustering — pays boxed struct sorting per row (measured:
  * kmeans C=64 train 125 s, one IVFADC probe pass 70 s at sf10; both
  * collapse ~50× compiled). This kernel carries the centroid matrix as
  * primitive `double[][]` via `addReferenceObj`, so the bytecode is
  * constant-size at ANY C, and the per-row work is a tight
  * dot/norm + bounded insertion pass.
  *
  * Bit-parity with the literal form (spec-pinned): scores are
  * `vecDot(vec, cv) / norm(cv)` with the identical index-order double
  * fold and the identical driver-side norm fold; ranking is score
  * DESC, centroid id ASC on ties (centroids are processed id-ascending
  * and insertion uses strict `>`, so the first-seen — smallest — id
  * wins equal scores, exactly `sort_array(struct(s, negid), desc)`).
  * Output: the first min(nprobe, C) centroid ids. Null vec → null.
  *
  * NaN deviation (documented, not parity): a NaN score — reachable only
  * from NaN vector COMPONENTS, since the constructors require every
  * centroid norm > 0 and finite — is skipped by the strict-`>` insertion
  * pass, whereas `sort_array`/`greatest` order NaN as largest. Models
  * with zero-norm or non-finite centroids are rejected at construction
  * so the 0/0 path is unreachable. */
case class IvfProbesExpr(vecExpr: Expression, cents: Array[Array[Double]],
                         norms: Array[Double], ids: Array[Int], nprobe: Int)
    extends UnaryExpression {

  override def child: Expression = vecExpr
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probes"

  private def isFloat: Boolean = vecExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vecExpr.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ivf_probes needs array<float|double> input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    IvfProbesExpr.probes(v.asInstanceOf[ArrayData], cents, norms, ids, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("ivfIds", ids, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfProbesExpr.probes($v, $centsRef, $normsRef, " +
        s"$idsRef, $nprobe, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vecExpr = newChild)
}

object IvfProbesExpr {
  /** Top-`nprobe` centroid ids by (dot/norm DESC, id ASC). Shared by
    * interpreted eval and codegen. The insertion pass is O(C·nprobe)
    * with nprobe small — cheaper and allocation-free vs sorting all C. */
  def probes(vec: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
             ids: Array[Int], nprobe: Int, isFloat: Boolean): ArrayData = {
    val c = cents.length
    val take = math.min(nprobe, c)
    val bestS = new Array[Double](take)
    val bestId = new Array[Int](take)
    var filled = 0
    var j = 0
    while (j < c) {
      val cv = cents(j)
      val n = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) { acc += vec.getFloat(i).toDouble * cv(i); i += 1 }
      else while (i < n) { acc += vec.getDouble(i) * cv(i); i += 1 }
      val s = acc / norms(j)
      // insertion position: after every kept entry with score >= s
      // (strict > inserts; id-ascending processing makes ties id-asc)
      var p = filled
      while (p > 0 && s > bestS(p - 1)) p -= 1
      if (p < take) {
        var q = math.min(filled, take - 1)
        while (q > p) { bestS(q) = bestS(q - 1); bestId(q) = bestId(q - 1); q -= 1 }
        bestS(p) = s; bestId(p) = ids(j)
        if (filled < take) filled += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(bestId, filled))
  }

  /** Column form over a driver-collected centroid model (id-sorted
    * (id, vector) pairs — [[VectorFunctions.collectCentroids]]' shape).
    * Norm folds match `centroidScore`'s driver-side fold exactly. */
  def ivfProbes(vec: Column, model: Seq[(Int, Seq[Double])], nprobe: Int): Column = {
    require(model.nonEmpty, "empty centroid model")
    val cents = model.map(_._2.toArray).toArray
    val norms = model.map { case (_, cv) =>
      math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)) }.toArray
    require(norms.forall(n => n > 0.0 && !n.isInfinite),
      "ivf_probes model must have finite, non-zero centroid norms (0/0 → NaN scores)")
    val ids = model.map(_._1).toArray
    GraftColumnBridge.column(IvfProbesExpr(
      GraftColumnBridge.expression(vec), cents, norms, ids, nprobe))
  }
}

/** Best (maximum) centroid score dot(vec, c)/||c|| over the model — the
  * SCORE sibling of [[IvfProbesExpr]] for consumers that need the
  * assigned centroid's similarity, not its id (SemDeDup's own-centroid
  * cosine). Same kernel discipline: primitive model via
  * addReferenceObj, constant bytecode at any C — the
  * `greatest(score_1, ..., score_C)` form it replaces leaves codegen
  * past a few dozen centroids and was inlined UNCONDITIONALLY (no
  * broadcast fallback) in semDedup's corpus scan. Division by the
  * row's own norm is left to the caller (constant per row, so
  * max-then-divide ≡ divide-then-max bitwise for positive norms —
  * IEEE division is monotone). Null/empty vec → null. Same NaN
  * discipline as [[IvfProbesExpr]]: centroid norms are guarded > 0 and
  * finite at construction; a NaN score from NaN vector components is
  * skipped (deviation from `greatest`'s NaN-is-largest, documented).
  * An empty vec yields score 0.0 against every centroid — the same
  * value the `greatest` form produced, not null. */
case class IvfBestScoreExpr(vecExpr: Expression, cents: Array[Array[Double]],
                            norms: Array[Double]) extends UnaryExpression {
  override def child: Expression = vecExpr
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ivf_best_score"

  private def isFloat: Boolean = vecExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vecExpr.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ivf_best_score needs array<float|double> input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    IvfBestScoreExpr.best(v.asInstanceOf[ArrayData], cents, norms, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfBestScoreExpr.best($v, $centsRef, $normsRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vecExpr = newChild)
}

object IvfBestScoreExpr {
  def best(vec: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
           isFloat: Boolean): Double = {
    var bestS = Double.NegativeInfinity
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      val n = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) { acc += vec.getFloat(i).toDouble * cv(i); i += 1 }
      else while (i < n) { acc += vec.getDouble(i) * cv(i); i += 1 }
      val s = acc / norms(j)
      if (s > bestS) bestS = s
      j += 1
    }
    bestS
  }

  def ivfBestScore(vec: Column, model: Seq[(Int, Seq[Double])]): Column = {
    require(model.nonEmpty, "empty centroid model")
    val cents = model.map(_._2.toArray).toArray
    val norms = model.map { case (_, cv) =>
      math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)) }.toArray
    require(norms.forall(n => n > 0.0 && !n.isInfinite),
      "ivf_best_score model must have finite, non-zero centroid norms (0/0 → NaN scores)")
    GraftColumnBridge.column(IvfBestScoreExpr(
      GraftColumnBridge.expression(vec), cents, norms))
  }
}

/** Per-cell residual in e6 quanta — the IVFADC residual-encoding
  * primitive (Jégou 2011 §IV): out(i) = ⌊xᵢ·10⁶⌋ − c_e6(bucket)(i),
  * where `c_e6` is the bucket centroid's EXACT integer e6 mean
  * ([[VectorFunctions.centroidMeansE6]]). Quantize-first integer
  * subtraction keeps residuals bit-portable (the DuckDB oracle replays
  * them with list arithmetic); same `addReferenceObj` kernel
  * discipline as its siblings — constant bytecode at any C or dim.
  * Null vec → null; an unknown bucket id or a vec shorter than the
  * centroid → null (nothing in the model to subtract). */
case class ResidualE6Expr(vecExpr: Expression, bucketExpr: Expression,
                          cents: Array[Array[Long]], ids: Array[Int])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = vecExpr
  override def right: Expression = bucketExpr
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "residual_e6"
  override def nullable: Boolean = true

  private def isFloat: Boolean = ProjectionExpressions.isFloatArray(vecExpr.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vecExpr.dataType, bucketExpr.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"residual_e6 needs (array<float|double>, int), got $other")
    }

  override def nullSafeEval(v: Any, b: Any): Any =
    ResidualE6Expr.residual(v.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      cents, ids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("resCents", cents, "long[][]")
    val idsRef = ctx.addReferenceObj("resIds", ids, "int[]")
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.functions.ResidualE6Expr.residual($v, $b, $centsRef, " +
        s"$idsRef, $isFloat);\n" +
        s"if (${ev.value} == null) { ${ev.isNull} = true; }")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(vecExpr = newLeft, bucketExpr = newRight)
}

object ResidualE6Expr {
  /** Shared by interpreted eval and codegen; `ids` must be sorted
    * ascending (binary-searched per row). */
  def residual(vec: ArrayData, bucket: Int, cents: Array[Array[Long]],
               ids: Array[Int], isFloat: Boolean): ArrayData = {
    val idx = java.util.Arrays.binarySearch(ids, bucket)
    if (idx < 0) return null
    val c = cents(idx)
    if (vec.numElements() < c.length) return null
    val out = new Array[Long](c.length)
    var i = 0
    if (isFloat)
      while (i < c.length) { out(i) = math.floor(vec.getFloat(i).toDouble * 1000000.0).toLong - c(i); i += 1 }
    else
      while (i < c.length) { out(i) = math.floor(vec.getDouble(i) * 1000000.0).toLong - c(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column form over driver-exact e6 centroid means (id-sorted). */
  def residualE6(vec: Column, bucket: Column,
                 means: Seq[(Int, Seq[Long])]): Column = {
    require(means.nonEmpty, "empty centroid-mean model")
    val sorted = means.sortBy(_._1)
    GraftColumnBridge.column(ResidualE6Expr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(bucket),
      sorted.map(_._2.toArray).toArray, sorted.map(_._1).toArray))
  }
}
