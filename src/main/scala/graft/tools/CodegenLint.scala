package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenFallback}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

import scala.collection.mutable

/** Catalog-wide codegen-fallback lint — the guard for the one defect
  * class that has recurred three times in this repo's history (the
  * JVM-64KB / Janino-refusal silent interpreted fallback: semDedup's
  * own-centroid literal, the PQ argmin, the IVF coarse family). Spark
  * hides that failure completely: `spark.sql.codegen.fallback` (default
  * true) catches the compile error at EXECUTION time and runs the stage
  * interpreted with no warning and no change in `.explain`, so a 10-50×
  * slowdown is invisible until a drill stumbles over it. Per-kernel spec
  * pins (IvfExpressionsSpec) protect the kernels they pin — this tool
  * protects the other ~190 gated plans.
  *
  * What it checks, per `SparkEntry.queries` entry, on the EXECUTED
  * (AQE-final) plan:
  *
  *  1. **Stage compile** — every `WholeStageCodegenExec`'s generated
  *     source is re-generated (`doCodeGen`) and force-compiled through
  *     `CodeGenerator.compile`. A Janino refusal (the 64KB class) is a
  *     hard finding; so is a max method bytecode size past
  *     `spark.sql.codegen.hugeMethodLimit` (Spark silently interprets
  *     the stage above it regardless of the fallback conf).
  *  2. **JIT ceiling** — max method size past 8000 bytecode bytes
  *     (HotSpot's `-XX:-DontCompileHugeMethods` ceiling: the stage still
  *     runs compiled-by-Janino but is never JIT'd) is a warning-grade
  *     finding, exemptable with a reason.
  *  3. **Codegen gaps** — any plan node that claims codegen support
  *     (`CodegenSupport.supportCodegen`) yet sits OUTSIDE every
  *     WholeStageCodegen span. `CollapseCodegenStages` leaves a
  *     supporting node out only for a reason (a `CodegenFallback`
  *     expression inside it, > `spark.sql.codegen.maxFields` output
  *     columns, …) — each gap must be exempted with that reason or it
  *     fails the lint.
  *  4. **Fallback expressions** — any `CodegenFallback` expression
  *     anywhere in the plan (these force their operator out of
  *     whole-stage codegen and evaluate boxed). Spark built-ins that are
  *     fallback BY DESIGN (`from_json`, …) are exempt-listed with
  *     reasons; anything else fails.
  *
  * The lint session also arms Spark's own tripwires so even paths this
  * walker cannot see fail loudly instead of silently interpreting:
  * `spark.sql.codegen.fallback=false` (WSCG compile errors throw) and
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (non-WSCG projection /
  * predicate / ordering generators throw instead of interpreting).
  *
  * Usage: `./run_local.sh graft.tools.CodegenLint [sfDir] [queryRegex]
  * [reportPath]` — defaults sf0.01, all queries, CODEGEN_LINT.json.
  * Exit 1 on any non-exempt finding. */
object CodegenLint {

  final case class Finding(query: String, kind: String, where: String,
                           detail: String, exempt: Option[String]) {
    def render: String =
      s"[${exempt.map(_ => "exempt").getOrElse("FAIL")}] $query $kind @ $where — $detail" +
        exempt.map(r => s" (exempt: $r)").getOrElse("")
  }

  /** HotSpot refuses to JIT methods past this many bytecode bytes
    * (DontCompileHugeMethods default); Janino-compiled stage code past
    * it runs in the bytecode interpreter — a perf cliff worth flagging
    * even though the stage is formally "compiled". */
  val JitMethodCeiling = 8000

  // ----------------------------------------------------------------------
  // Exemption registry — every entry carries its reason; the lint's
  // contract is "zero findings without a written reason".
  // ----------------------------------------------------------------------

  /** `CodegenFallback` expressions that are fallback BY DESIGN in stock
    * Spark (no codegen implementation exists upstream). Keyed by
    * simple class name. */
  val exemptFallbackExprs: Map[String, String] = Map(
    "JsonToStructs" -> ("stock Spark from_json is CodegenFallback by design; " +
      "model-size-independent, used map-side on small REST/webhook payloads"),
    "StructsToJson" -> "stock Spark to_json is CodegenFallback by design",
    "SchemaOfJson" -> "stock Spark schema_of_json — driver-side constant fold",
    "XPathBoolean" -> "stock Spark xpath family is CodegenFallback by design",
    "CurrentTimestamp" -> "driver-side constant, folded before execution",
    "ScalaUDF" -> ("ScalaUDF codegen wraps a boxed function call either way; " +
      "flagged only when it forces a gap — see gap exemptions"),
    // TypedImperativeAggregates: object-buffer aggregates with NO
    // codegen upstream — they run under ObjectHashAggregateExec by
    // design and are visible in the plan (nothing silent). Per-group
    // object state is the point (lists, sketches); the per-row update
    // is a method call either way.
    "CollectList" -> "stock collect_list is a TypedImperativeAggregate (object buffer) by design",
    "CollectSet" -> "stock collect_set is a TypedImperativeAggregate (object buffer) by design",
    "Percentile" -> "stock percentile is a TypedImperativeAggregate (counts map) by design",
    "PivotFirst" -> ("stock PIVOT rewrite aggregate — ImperativeAggregate by design; " +
      "row width is the pivoted key count, query-bound"),
    "ScalaAggregator" -> ("typed Dataset Aggregator (KMV sketch / bounded top-k family) — " +
      "object-buffer aggregate by design; a sorted bounded buffer cannot be a codegen'd " +
      "row buffer, and the map-side-combine win is exactly why the Aggregator exists"),
    // INTERSECT ALL / EXCEPT ALL rewrite generator — no codegen upstream
    "ReplicateRows" -> "stock bag-setop ReplicateRows generator is CodegenFallback by design")

  /** Higher-order functions (`transform`/`aggregate`/`zip_with`/…) and
    * their lambda plumbing have NO codegen implementation upstream —
    * they are interpreted by design and VISIBLE in the plan, unlike the
    * silent 64KB class this lint exists for. House rule: hot-path
    * vector math goes through the codegen'd VecDot/kernel family; HOF
    * use is confined to model-sized or per-query relations. */
  def byDesignFallbackReason(f: CodegenFallback): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    f match {
      case _: HigherOrderFunction | _: LambdaFunction | _: NamedLambdaVariable =>
        Some("Spark higher-order function family — interpreted by design upstream, " +
          "visible in plan; hot paths use codegen'd kernels (VecDot/IvfProbes/PqAssign)")
      case _ => exemptFallbackExprs.get(f.getClass.getSimpleName)
    }
  }

  /** Plan-node gap exemptions: nodes that legitimately sit outside
    * whole-stage codegen. Keyed by simple class name; the reason must
    * say WHY the gap is structural rather than a silent fallback. */
  val exemptGapNodes: Map[String, String] = Map(
    // RowDataSourceScanExec supports codegen but CollapseCodegenStages
    // only fuses it when it is not the top node of an isolated scan
    // stage; REST/JDBC-style row scans are I/O-bound single passes.
    "RowDataSourceScanExec" -> "row-source scan stage; I/O-bound, no expression work to fuse",
    "LocalTableScanExec" -> ("driver-local literal relation (model/config-sized rows); " +
      "CollapseCodegenStages never wraps a lone local scan — nothing per-row to fuse"),
    "EmptyRelationExec" -> "AQE-propagated empty relation — zero rows, nothing to execute",
    // DeserializeToObject's output is a single ObjectType attribute;
    // upstream CollapseCodegenStages explicitly skips object-typed
    // outputs (they cannot cross a row-batch codegen boundary), so the
    // typed-Dataset seam (mapGroups/mapPartitions codecs) always sits
    // outside whole-stage codegen.
    "DeserializeToObjectExec" -> ("typed-Dataset object boundary — ObjectType output is " +
      "excluded from whole-stage codegen upstream by rule"))

  /** Per-query exemptions for gaps the walker attributes to a cause it
    * can name (fallback expr inside, wide schema). Applied when the
    * gap diagnosis matches the predicate string. */
  def gapReason(node: SparkPlan, maxFields: Int): Option[String] = {
    val fallbacks = nodeFallbackExprs(node)
    val design = fallbacks.filter(f => byDesignFallbackReason(f).isDefined)
    if (design.nonEmpty)
      Some(s"contains by-design fallback expr(s) ${design.map(_.getClass.getSimpleName).distinct.mkString(",")} — " +
        "CollapseCodegenStages correctly leaves the operator interpreted")
    else if ((node.output.length > maxFields) ||
             node.children.exists(_.output.length > maxFields))
      Some(s"schema wider than spark.sql.codegen.maxFields=$maxFields — " +
        "Spark's own wide-schema guard, not a silent compile failure")
    else None
  }

  private def nodeFallbackExprs(node: SparkPlan): Seq[CodegenFallback] = {
    val out = mutable.ArrayBuffer[CodegenFallback]()
    node.expressions.foreach(_.foreach {
      case f: CodegenFallback => out += f
      case _ =>
    })
    out.toSeq.distinctBy(_.getClass)
  }

  // ----------------------------------------------------------------------
  // The walker
  // ----------------------------------------------------------------------

  /** Execute `df` (finalizing its AQE plan) and lint the executed plan. */
  def lintDf(name: String, df: DataFrame): Seq[Finding] = {
    df.collect()
    lintExecuted(name, df.queryExecution.executedPlan, df.sparkSession)
  }

  /** Lint an already-executed physical plan. */
  def lintExecuted(name: String, root: SparkPlan, spark: SparkSession): Seq[Finding] = {
    val findings = mutable.ArrayBuffer[Finding]()
    val maxFields = spark.conf.get("spark.sql.codegen.maxFields", "100").toInt
    val hugeLimit = spark.conf.get("spark.sql.codegen.hugeMethodLimit", "65535").toInt
    val seenSubqueries = mutable.Set[Int]() // by identity hash, reused subqueries repeat

    def walk(p: SparkPlan, inCodegen: Boolean): Unit = {
      // subquery plans hang off expressions, not children
      p.expressions.foreach(_.foreach {
        case s: ExecSubqueryExpression =>
          if (seenSubqueries.add(System.identityHashCode(s.plan)))
            walk(s.plan, inCodegen = false)
        case _ =>
      })
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.finalPhysicalPlan, inCodegen = false)
        case q: QueryStageExec => walk(q.plan, inCodegen = false)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child, inCodegen = false)
        case m: InMemoryTableScanExec => walk(m.relation.cachedPlan, inCodegen = false)
        case w: WholeStageCodegenExec =>
          try {
            val (_, source) = w.doCodeGen()
            val (_, stats) = CodeGenerator.compile(source)
            def stageDesc: String = w.child.collect { case n => n.nodeName }
              .take(6).mkString(" <- ")
            if (stats.maxMethodCodeSize > hugeLimit)
              findings += Finding(name, "huge-method", w.nodeName + s"#${w.codegenStageId}",
                s"max method ${stats.maxMethodCodeSize} B > hugeMethodLimit=$hugeLimit — " +
                  s"Spark interprets this stage silently [$stageDesc]", None)
            else if (stats.maxMethodCodeSize > JitMethodCeiling)
              findings += Finding(name, "jit-ceiling", w.nodeName + s"#${w.codegenStageId}",
                s"max method ${stats.maxMethodCodeSize} B > $JitMethodCeiling — " +
                  s"compiled but never JIT'd (HotSpot DontCompileHugeMethods) [$stageDesc]", None)
          } catch {
            case e: Throwable =>
              findings += Finding(name, "compile-fail", w.nodeName + s"#${w.codegenStageId}",
                s"generated stage source does not compile: ${String.valueOf(e.getMessage).take(300)}",
                None)
          }
          walk(w.child, inCodegen = true)
        case i: InputAdapter =>
          walk(i.child, inCodegen = false)
        case other =>
          val supports = other match {
            case c: CodegenSupport => c.supportCodegen
            case _ => false
          }
          if (!inCodegen && supports) {
            val cls = other.getClass.getSimpleName
            val exempt = exemptGapNodes.get(cls).orElse(gapReason(other, maxFields))
            findings += Finding(name, "gap", cls,
              s"codegen-capable node outside every WholeStageCodegen span " +
                s"(output ${other.output.length} cols)", exempt)
          }
          // a CodegenFallback expression anywhere forces boxed eval of
          // its operator; report it wherever it sits
          nodeFallbackExprs(other).foreach { f =>
            findings += Finding(name, "fallback-expr",
              s"${other.getClass.getSimpleName}/${f.getClass.getSimpleName}",
              "CodegenFallback expression in plan", byDesignFallbackReason(f))
          }
          // stay "inside" only while the chain is still codegen-capable
          val childIn = inCodegen && supports
          other.children.foreach(walk(_, childIn))
      }
    }

    walk(root, inCodegen = false)
    // the same stage/expr can be reached twice (partial+final agg pairs,
    // reused subtrees rendered in both the final plan and a query stage)
    findings.toSeq.distinctBy(f => (f.query, f.kind, f.where, f.detail))
  }

  // ----------------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nameRe = args.lift(1).getOrElse(".*").r
    val reportPath = args.lift(2).getOrElse("CODEGEN_LINT.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tripwires: make every interpreted fallback LOUD during the run
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameRe.findFirstIn(n).isDefined)
    val all = mutable.ArrayBuffer[Finding]()
    var ran = 0
    names.foreach { n =>
      val t0 = System.nanoTime()
      val fs =
        try lintDf(n, graft.SparkEntry.queries(n)(spark, sfDir))
        catch { case e: Throwable =>
          Seq(Finding(n, "run-fail", "query",
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}", None))
        }
      ran += 1
      all ++= fs
      val secs = (System.nanoTime() - t0) / 1e9
      val bad = fs.count(_.exempt.isEmpty)
      println(f"$n%-34s ${if (bad > 0) "FAIL" else "ok"}%-4s findings=${fs.size} unexempt=$bad $secs%.1fs")
      fs.foreach(f => println("    " + f.render))
    }

    val unexempt = all.filter(_.exempt.isEmpty)
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val json = new StringBuilder
    json ++= s"""{"sf_dir": ${js(sfDir)}, "queries_run": $ran, "findings": ["""
    json ++= all.map(f =>
      s"""{"query": ${js(f.query)}, "kind": ${js(f.kind)}, "where": ${js(f.where)}, """ +
        s""""detail": ${js(f.detail)}, "exempt": ${f.exempt.map(js).getOrElse("null")}}""")
      .mkString(", ")
    json ++= s"""], "unexempt_count": ${unexempt.size}, "verdict": ${js(if (unexempt.isEmpty) "PASS" else "FAIL")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(reportPath), json.toString + "\n")

    println(s"\ncodegen-lint: $ran queries, ${all.size} findings " +
      s"(${all.size - unexempt.size} exempt, ${unexempt.size} UNEXEMPT) -> $reportPath")
    spark.stop()
    if (unexempt.nonEmpty) sys.exit(1)
  }
}
