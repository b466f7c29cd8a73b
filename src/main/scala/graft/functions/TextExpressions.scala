package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step of public corpus-cleaning recipes (C4/Dolma
  * normalize before tokenizing/fingerprinting, so "é" composed and
  * "e"+U+0301 decomposed dedup identically). Spark has no built-in
  * normalizer; a Scala UDF would box and serialize per row, while this
  * expression stays inside whole-stage codegen — the SQL-function
  * preference order of SURVEY §2.10 applied at the Expression tier.
  *
  * NFC (not NFKC) deliberately: canonical composition is
  * round-trippable and engine-standard (DuckDB's `nfc_normalize`
  * oracle-checks it), while compatibility folding is lossy and
  * corpus-policy-specific.
  *
  * Cost note: the fast path `Normalizer.isNormalized` check makes the
  * common (already-NFC ASCII) case a scan without allocation.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Deflate-compressed byte length of a string's UTF-8 bytes — the
  * kernel behind compression-ratio quality filtering (the
  * Gopher/RefinedWeb-family signal: highly repetitive or templated
  * text compresses far below prose, random noise barely at all).
  * Level 6, no dictionary, one Deflater per eval via the static
  * kernel; deterministic for a given input on any JVM shipping
  * standard zlib semantics — but NOT reproducible in SQL engines, so
  * this stays SPEC-gated (the HMAC precedent), never oracle-gated.
  * Codegen'd like [[NormalizeNfc]]: stays inside whole-stage codegen,
  * no UDF boxing. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  // ended flag lives beside the Deflater: the completion listener
  // normally runs on the task's own thread (remove() then suffices),
  // but if Spark ever fires it elsewhere the flag still marks this
  // holder dead so the owning thread re-creates instead of calling
  // reset() on an end()ed native handle
  private final class Holder {
    val d = new java.util.zip.Deflater(6, true)
    @volatile var ended = false
  }

  // one native Deflater per task thread, reset() per row — a fresh
  // Deflater would deflateInit a ~256 KB native workspace per ROW.
  // The workspace is released at TASK completion (end() + remove()):
  // one deflateInit per task instead of per row, and no unbounded
  // native retention on large or recycled executor thread pools.
  // Driver-side use (no TaskContext: local eval in tests) keeps the
  // JVM-lifetime deflater — driver threads are few and bounded.
  private val local: ThreadLocal[Holder] = new ThreadLocal[Holder] {
    override def initialValue(): Holder = {
      val h = new Holder
      val tc = org.apache.spark.TaskContext.get()
      // An already-completed TaskContext fires a new listener
      // synchronously, which would end() the fresh Deflater before
      // first use and push the ended-retry into reset()-on-end()ed;
      // a holder created post-completion gets the driver-style
      // JVM-lifetime deflater instead (bounded: such threads are
      // stragglers, not the task pool).
      if (tc != null && !tc.isCompleted()) tc.addTaskCompletionListener[Unit] { _ =>
        h.ended = true; h.d.end(); local.remove()
      }
      h
    }
  }

  /** Static kernel shared by eval and generated code. */
  def deflatedLength(s: UTF8String): Int = {
    var h = local.get()
    if (h.ended) { local.remove(); h = local.get() }
    val d = h.d
    d.reset()
    d.setInput(s.getBytes); d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** (deflated ×1000) div raw bytes, or null for empty input — ONE
    * kernel call per row (both lengths known inside it), exact
    * integer division. */
  def ratioE3(s: UTF8String): java.lang.Long = {
    val raw = s.numBytes()
    if (raw == 0) null
    else java.lang.Long.valueOf(deflatedLength(s).toLong * 1000L / raw)
  }
}

/** Milli-ratio form of [[DeflateLen]] in a single kernel call (the
  * Column-level quotient would deflate twice without CSE). Null for
  * empty strings — no ratio is defined. */
case class DeflateRatioE3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio_e3"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio_e3 needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    DeflateLen.ratioE3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("ratio")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $v = graft.functions.DeflateLen.ratioE3($c);
      if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Register `nfc_normalize`/`deflate_len` for call_function access
    * (same pattern as [[VecExpressions.register]]). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NormalizeNfc(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", exprs => DeflateLen(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_ratio_e3", exprs => DeflateRatioE3(exprs.head), "built-in")
  }

  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)

  /** Compression quality signal: (deflated_bytes ×1000) div raw_bytes
    * — integer milli-ratio; low = templated/repetitive, ~1000+ =
    * incompressible. Null-safe; empty strings yield null (no ratio).
    * One kernel call per row ([[DeflateRatioE3]]). */
  def compressionRatioE3(c: Column): Column = call_function("deflate_ratio_e3", c)
}
