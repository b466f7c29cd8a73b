package graft.tools

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the catalog-wide codegen lint itself: it must DETECT the
  * silent-interpreted disease class (a stage method past the JVM limit
  * compiles nowhere but Spark executes it interpreted with no warning)
  * and must stay GREEN on representative healthy plans — the kernels
  * that were cured of exactly this disease in r13/r14. The full-catalog
  * run (`./run_local.sh graft.tools.CodegenLint` → CODEGEN_LINT.json)
  * is part of the round-close recipe; this spec keeps the machinery
  * honest between runs. */
class CodegenLintSpec extends SparkSpecBase {
  import spark.implicits._

  private def bigWhenChain(terms: Int) = {
    // the literal-inlined shape: one expression tree whose generated
    // code grows linearly with "model size" (here: term count).
    // Balanced reduction keeps the TREE depth O(log n) — a left fold
    // would StackOverflow the Column->Expression conversion before the
    // codegen size limit is even reached.
    def bal(cs: IndexedSeq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.length == 1) cs.head
      else bal(cs.grouped(2).map(g => if (g.length == 2) g(0) + g(1) else g(0)).toIndexedSeq)
    bal((0 until terms).map(i => when(col("x") > i, lit(i.toLong)).otherwise(lit(0L))))
  }

  test("lint detects a stage method past the JVM 64KB limit (compile-fail or huge-method)") {
    val df = (0L until 50L).toDF("x").repartition(2)
      .select(bigWhenChain(2400).as("y"))
    val findings = CodegenLint.lintDf("disease", df)
    val sizeClass = findings.filter(f =>
      f.kind == "compile-fail" || f.kind == "huge-method")
    assert(sizeClass.nonEmpty,
      s"expected the 64KB class to be detected, got: ${findings.map(_.render).mkString("; ")}")
    assert(sizeClass.forall(_.exempt.isEmpty), "the 64KB class must never be exempt")
  }

  test("lint flags the JIT ceiling band (compiled but never JIT'd)") {
    val df = (0L until 50L).toDF("x").repartition(2)
      .select(bigWhenChain(400).as("y"))
    val findings = CodegenLint.lintDf("jitband", df)
    assert(findings.exists(f => f.kind == "jit-ceiling" || f.kind == "huge-method" ||
      f.kind == "compile-fail"),
      s"expected a size-class finding, got: ${findings.map(_.render).mkString("; ")}")
  }

  test("lint reports CodegenFallback expressions and exempts only the by-design list") {
    val df = Seq(("""{"a": 1}""")).toDF("j").repartition(2)
      .select(from_json(col("j"), org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.IntegerType)))).as("s"))
    val findings = CodegenLint.lintDf("fromjson", df)
    val fb = findings.filter(_.kind == "fallback-expr")
    assert(fb.exists(_.where.endsWith("JsonToStructs")))
    assert(fb.filter(_.where.endsWith("JsonToStructs")).forall(_.exempt.isDefined),
      "from_json is by-design fallback and must be exempt with a reason")
  }

  test("cured kernel plans lint clean (the r13/r14 disease sites)") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q75_kmeans_assign", "q94_sliding_windows", "q167_random_projection",
                  "q28_simhash_neardups")) {
      val findings = CodegenLint.lintDf(q, graft.SparkEntry.queries(q)(spark, sf))
      val bad = findings.filter(_.exempt.isEmpty)
      assert(bad.isEmpty, s"$q: ${bad.map(_.render).mkString("; ")}")
    }
  }
}
