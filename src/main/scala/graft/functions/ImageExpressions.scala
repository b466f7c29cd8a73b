package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Difference-hash (dHash) perceptual fingerprint for image payloads.
  *
  * Classic dHash: decode + grayscale + resize to a (rows+? cols) grid,
  * then emit one bit per horizontally adjacent cell pair — bit set iff
  * the right cell is brighter. Near-identical images flip few bits, so
  * Hamming distance over the fingerprint is the near-dup metric
  * (bucketed at scale by [[graft.ops.Dedup.hammingNearDups]]'s
  * pigeonhole blocks — never an all-pairs scan).
  *
  * The real decoder is NOT in this container (same stub boundary as
  * [[graft.ops.Multimodal.decodeKernel]]): the "grayscale grid" here is
  * a deterministic integer fold of the payload bytes — cell k sums the
  * bytes at positions p ≡ k (mod 66). Swap `DHashKernel.hash` for a
  * real decode+resize and every plan, schema and the blocking machinery
  * stays identical. Everything is integer-exact, so the DuckDB oracle
  * reproduces the hash bit-for-bit with no transcendental hazard.
  *
  * Grid is 6 rows × 11 cols = 66 cells → 6 × 10 = 60 gradient bits,
  * exactly the [[graft.ops.Dedup.SimhashBits]] envelope (non-negative
  * long), so image fingerprints ride the same 30-bit-key combination
  * blocks as text simhash.
  */
object DHashKernel {
  final val GridRows = 6
  final val GridCols = 11 // 10 gradient bits per row
  final val Cells = GridRows * GridCols

  /** Static JVM kernel shared by interpreted eval and generated code. */
  def hash(payload: Array[Byte]): Long = {
    val gray = new Array[Long](Cells)
    var i = 0
    while (i < payload.length) {
      gray(i % Cells) += (payload(i) & 0xff)
      i += 1
    }
    var h = 0L
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < GridCols - 1) {
        if (gray(r * GridCols + c + 1) > gray(r * GridCols + c))
          h |= 1L << (r * (GridCols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }
}

case class ImageDHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dhash needs a binary payload, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    DHashKernel.hash(input.asInstanceOf[Array[Byte]])

  // a single static call keeps the expression inside whole-stage
  // codegen (primitive in/out, no boxing, no interpreted fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, bytes => s"graft.functions.DHashKernel.hash($bytes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageExpressions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_dhash", exprs => ImageDHash(exprs.head), "built-in")

  def imageDHash(c: Column): Column = call_function("image_dhash", c)
}
