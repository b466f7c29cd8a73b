package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped estimation statistics under the house integer-exactness
  * rule: inputs are integral quanta (the caller picks the unit — cents,
  * milli-tokens, epoch days), every aggregate is an exact decimal sum,
  * and every reported figure is a floored rational with BOTH floor legs
  * written the sign-safe way (subtract the positive mod, then divide —
  * Spark's DIV and DuckDB's // both truncate toward zero, the q170
  * lesson), so grouped fits hash-match any engine. */
object Stats {

  private val dec = DecimalType(38, 0)

  /** Sign-safe exact floor(a / b) for decimal columns, b > 0. */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Trimmed mean: drop the lowest and highest ⌊trimMilli·n/1000⌋ rows
    * per group under the total order (value, tieCol) and report the
    * exact milli-mean of the rest — the outlier-robust sibling of
    * q110's winsorize (clamping keeps mass at the fence; trimming
    * removes it). `value` must be integral. Output:
    * (group…, n_kept, mean_milli); a fully-trimmed group (trim ≥ half)
    * emits nothing. Windows are group-partitioned — the q110 shape. */
  def trimmedMean(df: DataFrame, groupCols: Seq[String], value: Column,
                  tieCol: Column, trimMilli: Int): DataFrame = {
    require(trimMilli >= 0 && trimMilli < 500,
      s"trimMilli must be in [0, 500), got $trimMilli")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(value.asc, tieCol.asc)
    val wn = Window.partitionBy(grp: _*)
    df.filter(value.isNotNull)
      .withColumn("__v", value.cast(dec))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn).cast("long"))
      .withColumn("__t", expr(s"(__n * $trimMilli) DIV 1000")) // n ≥ 0: DIV == floor
      .filter(col("__rn") > col("__t") && col("__rn") <= col("__n") - col("__t"))
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n_kept"), sum(col("__v")).as("__s"))
      .select(grp ++ Seq(col("n_kept"),
        floorDiv(col("__s") * lit(1000L).cast(dec), col("n_kept").cast(dec))
          .as("mean_milli")): _*)
  }

  /** Grouped simple linear regression y = a + b·x with Pearson r² —
    * closed-form OLS over the five exact sums (n, Σx, Σy, Σxy, Σx²,
    * Σy²), one map-side-combined aggregate per group (the only
    * shuffle). With D = n·Σx² − (Σx)² and N = n·Σxy − Σx·Σy:
    *
    *   slope_e6     = ⌊10⁶·N / D⌋
    *   intercept_e6 = ⌊10⁶·(Σy·Σx² − Σx·Σxy) / D⌋
    *   r2_e6        = ⌊10⁶·N² / (D·(n·Σy² − (Σy)²))⌋
    *
    * All floors are the sign-safe mathematical floor. Groups with zero
    * x-variance emit NULL fit columns; zero y-variance (on nonzero D)
    * emits slope/intercept with NULL r². `x`/`y` must be integral
    * quanta. Exact while 10⁶·N² < 10³⁸ (|N| ≲ 3·10¹⁵ — e.g. 10⁸ rows
    * of e4-quantized data); beyond that, quantize coarser or
    * stratify. Output: (group…, n, slope_e6, intercept_e6, r2_e6). */
  def linearFit(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val grp = groupCols.map(col)
    val agg = df.filter(x.isNotNull && y.isNotNull)
      .select(grp ++ Seq(x.cast(dec).as("__x"), y.cast(dec).as("__y")): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val d = agg("__n") * agg("__sxx") - agg("__sx") * agg("__sx")
    val dy = agg("__n") * agg("__syy") - agg("__sy") * agg("__sy")
    val nn = agg("__n") * agg("__sxy") - agg("__sx") * agg("__sy")
    val e6 = lit(1000000L).cast(dec)
    agg.select(grp ++ Seq(
      col("__n").cast("long").as("n"),
      when(d > 0, floorDiv(e6 * nn, d)).as("slope_e6"),
      when(d > 0, floorDiv(e6 * (col("__sy") * col("__sxx") - col("__sx") * col("__sxy")), d))
        .as("intercept_e6"),
      when(d > 0 && dy > 0, floorDiv(e6 * nn * nn, d * dy)).as("r2_e6")): _*)
  }

  /** Pairwise Pearson correlation matrix over k integral columns in
    * ONE corpus scan: each row fans out to k(k−1)/2 narrow (pid, x, y)
    * structs, map-side partial aggregation collapses them immediately,
    * and a constant-width six-sum hash agg per pair yields every Σx,
    * Σx², Σxᵢxⱼ; each pair's r² and sign come from the [[linearFit]]
    * closed form. (The fan-out keeps the generated agg-update method
    * CONSTANT-SIZE at any k — see the in-body comment.) An empty or
    * all-null-filtered input yields zero rows (no n=0 grid — consumers
    * watching for degenerate inputs check emptiness, not n).
    * Rows with a NULL in ANY profiled column are dropped (the
    * complete-cases convention, so every pair shares one n and the
    * matrix is consistent). Output per unordered pair (i < j by the
    * caller's order): (col_a, col_b, n, r2_e6, r_sign) with r_sign ∈
    * {−1, 0, 1} (0 when either variance is zero — r undefined, r2_e6
    * NULL). r itself needs a square root; consumers needing it take
    * ±√(r2_e6·10⁻⁶), which keeps the stored figures exact. */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got ${cols.size}")
    require(cols.map(_._1).distinct.size == cols.size, "column names must be unique")
    val names = cols.map(_._1)
    val base = df
      .filter(cols.map(_._2.isNotNull).reduce(_ && _))
      .select(cols.map { case (n, c) => c.cast(dec).as(s"__$n") }: _*)
    // Per row, one NARROW (pid, x, y) struct per pair, then a hash agg
    // keyed by pid with a CONSTANT six aggregates — so the generated
    // agg-update method is the same size at any column count. The
    // previous single-wide-agg form (k + k + k(k−1)/2 decimal sums in
    // one update method) measured 18 KB of bytecode at k=4
    // (tools/CodegenLint: past HotSpot's 8 KB JIT ceiling) and grew
    // O(k²) toward the silent-interpreted 64 KB cliff near k≈8. The
    // explode multiplies rows by k(k−1)/2 BEFORE map-side partial
    // aggregation, which collapses them to k(k−1)/2 rows per partition
    // — the shuffle stays k²-rows-per-partition tiny at any corpus
    // size, and every sum is the identical decimal arithmetic, so
    // results are bit-identical to the wide form.
    val pairSeq = names.combinations(2).toSeq
    val pairStructs = pairSeq.zipWithIndex.map { case (Seq(a, b), i) =>
      struct(lit(i).as("pid"), col(s"__$a").as("x"), col(s"__$b").as("y"))
    }
    val moments = base
      .select(explode(array(pairStructs: _*)).as("__p"))
      .select(col("__p.pid").as("__pid"), col("__p.x").as("__x"), col("__p.y").as("__y"))
      .groupBy(col("__pid"))
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__qx"),
        sum(col("__y") * col("__y")).as("__qy"),
        sum(col("__x") * col("__y")).as("__pxy"))
    val e6 = lit(1000000L).cast(dec)
    val aNames = array(pairSeq.map { case Seq(a, _) => lit(a) }: _*)
    val bNames = array(pairSeq.map { case Seq(_, b) => lit(b) }: _*)
    val d = col("__n") * col("__qx") - col("__sx") * col("__sx")
    val dy = col("__n") * col("__qy") - col("__sy") * col("__sy")
    val nn = col("__n") * col("__pxy") - col("__sx") * col("__sy")
    moments.select(
      element_at(aNames, col("__pid") + 1).as("col_a"),
      element_at(bNames, col("__pid") + 1).as("col_b"),
      col("__n").cast("long").as("n"),
      when(d > 0 && dy > 0, floorDiv(e6 * nn * nn, d * dy)).as("r2_e6"),
      when(d > 0 && dy > 0, signum(nn).cast("int")).otherwise(lit(0)).as("r_sign"))
  }

  /** χ² critical values at α = 0.05 for dof 1..10, in e6 quanta —
    * public-table constants inlined as literals on BOTH engine sides
    * (the linearCountTable discipline: no engine ever evaluates an
    * inverse-χ²). */
  val chi2Crit05E6: IndexedSeq[Long] = IndexedSeq(
    3841459L, 5991465L, 7814728L, 9487729L, 11070498L,
    12591587L, 14067140L, 15507313L, 16918978L, 18307038L)

  /** Benford's-law first-digit proportions log₁₀(1 + 1/d), d = 1..9,
    * in e9 quanta — evaluated ONCE in this JVM and inlined as literals
    * on both engine sides (the linearCountTable discipline; no engine
    * ever evaluates a log). */
  val benfordPropE9: IndexedSeq[Long] =
    (1 to 9).map(d => Math.round(1e9 * math.log10(1.0 + 1.0 / d)))

  /** Benford's-law first-significant-digit audit — the fraud/synthetic-
    * data screen: naturally-scaled positive quantities follow
    * P(d) = log₁₀(1+1/d); fabricated ones rarely do. Per digit:
    * observed count, expected_e6 = ⌊n·p₉/10³⌋ (an e6-scaled count),
    * and the goodness-of-fit χ² contribution
    * contrib_e6 = ⌊10⁶·(O·10⁹ − n·p₉)² / (10⁹·n·p₉)⌋ — exact integers
    * throughout (the (O−E)²/E term cleared of the e9 proportion
    * denominators). Digits with zero observations still appear (the
    * 9-row grid is fixed). The audited domain is value ≥ 1: NULLs,
    * non-positives AND fractional magnitudes in (0,1) are excluded —
    * the first digit here is the leading digit of the integer part,
    * NOT the normalized first significant digit of a sub-unit value
    * (a documented deviation; normalizing 0.0042 → 4 would need a
    * float-hazardous log₁₀/multiplication ladder on both engines).
    * Restricting BEFORE counting keeps n equal to the digit-grid
    * total, so observed sums to n exactly. 128-bit envelope:
    * (O·10⁹)²·10⁶ < 10³⁸ → n ≲ 3·10⁷ rows. */
  def benfordCells(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = benfordPropE9.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "__p_e9")
    val obs = df.filter(value.isNotNull && value >= 1)
      .select(substring(floor(value).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).cast(dec).as("__o"))
    val tot = obs.agg(sum(col("__o")).as("__n"))
    val e6 = lit(1000000L).cast(dec)
    val e9 = lit(1000000000L).cast(dec)
    val diff = col("__o") * e9 - col("__n") * col("__p_e9").cast(dec)
    // broadcast the OBSERVED side: a left-outer join can only build
    // (broadcast) its non-preserved right side — hinting the 9-row
    // digit table instead is silently unsupported (HintErrorLogger
    // WARN) and fell back to a shuffle join. `obs` is ≤ 9 rows per
    // category set, as broadcast-safe as the digit table.
    digits.join(broadcast(obs), Seq("digit"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L).cast(dec)))
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        col("__o").cast("long").as("observed"),
        floorDiv(col("__n") * col("__p_e9").cast(dec), lit(1000L).cast(dec))
          .as("expected_e6"),
        floorDiv(e6 * diff * diff, e9 * col("__n") * col("__p_e9").cast(dec))
          .as("contrib_e6"))
  }

  /** The one-row Benford decision: χ² = Σ floored contributions vs the
    * dof-8 critical value from [[chi2Crit05E6]] (9 digits − 1). */
  def benfordTest(df: DataFrame, value: Column): DataFrame =
    benfordCells(df, value)
      .agg(sum(col("observed")).as("n"), sum(col("contrib_e6")).as("chi2_e6"))
      .select(col("n"), col("chi2_e6"),
        when(col("chi2_e6") > lit(chi2Crit05E6(7)), 1).otherwise(0)
          .as("nonconforming_05"))

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    * two categorical labelings of the same rows: the label-quality
    * audit for training data (gold vs classifier, two labeling
    * functions, annotator pairs). κ = (p_o − p_e)/(1 − p_e) computed
    * entirely in exact integers: with cell counts c_ab, diagonal
    * d = Σc_aa, marginals r_a/s_b and chance mass E = Σ_a r_a·s_a,
    *
    *   kappa_e6 = ⌊10⁶·(n·d − E) / (n² − E)⌋   (sign-safe — κ < 0 is
    *   worse-than-chance agreement and must floor toward −∞)
    *
    * plus po_e6 = ⌊10⁶·d/n⌋ and pe_e6 = ⌊10⁶·E/n²⌋ for the report.
    * Both raters constant-and-equal makes p_e = 1 (κ undefined): NULL
    * kappa, the zero-variance contract of [[linearFit]]. Rows with a
    * NULL label on either side are excluded (neither agreement nor
    * disagreement). DECIMAL(38,0) throughout — 10⁶·n·d is exact to
    * n ≈ 10¹⁵ rows.
    *
    * Scale shape: ONE corpus hash aggregate to the (a, b) cell table
    * (bounded by the label-domain square); diagonal, marginals, and
    * the chance term all run on that bounded table. Output one row:
    * (n, n_agree, po_e6, pe_e6, kappa_e6). */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.cast("string").as("__a"), bCol.cast("string").as("__b"))
      .agg(count(lit(1)).cast(dec).as("__c"))
    val tot = cells.agg(sum(col("__c")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(lit(0L).cast(dec)))
        .as("__d"))
    val r = cells.groupBy(col("__a").as("__k")).agg(sum(col("__c")).as("__r"))
    val s = cells.groupBy(col("__b").as("__k")).agg(sum(col("__c")).as("__s"))
    val e = r.join(s, "__k")
      .agg(coalesce(sum(col("__r") * col("__s")), lit(0L).cast(dec)).as("__e"))
    val e6 = lit(1000000L).cast(dec)
    tot.crossJoin(e)
      .select(
        col("__n").cast("long").as("n"),
        col("__d").cast("long").as("n_agree"),
        floorDiv(e6 * col("__d"), col("__n")).as("po_e6"),
        floorDiv(e6 * col("__e"), col("__n") * col("__n")).as("pe_e6"),
        when(col("__n") * col("__n") =!= col("__e"),
          floorDiv(e6 * (col("__n") * col("__d") - col("__e")),
            col("__n") * col("__n") - col("__e"))).as("kappa_e6"))
  }

  /** Simpson diversity per group (Simpson 1949, unbiased form): the
    * probability that two rows drawn WITHOUT replacement carry
    * different category values —
    *
    *   simpson_e6 = ⌊10⁶·(n(n−1) − Σᵢ nᵢ(nᵢ−1)) / (n(n−1))⌋
    *
    * 0 = one category owns the group, → 1 = all distinct. The corpus
    * health metric for source/domain mix per language that Shannon
    * entropy would force a transcendental for; Simpson is a pure
    * rational of counts, exact on any engine. Groups with n < 2 have
    * no pair to draw: NULL index. NULL category values are excluded.
    *
    * Scale shape: one hash aggregate to (group, value) counts, one to
    * the group row — both map-side combined; nothing else touches the
    * corpus. Output: (group…, n, n_values, simpson_e6). */
  def simpsonDiversity(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val grp = groupCols.map(col)
    val e6 = lit(1000000L).cast(dec)
    df.filter(value.isNotNull)
      .groupBy(grp :+ value.cast("string").as("__v"): _*)
      .agg(count(lit(1)).cast(dec).as("__c"))
      .groupBy(grp: _*)
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("n_values"),
        sum(col("__c") * (col("__c") - 1)).as("__same"))
      .select(grp ++ Seq(
        col("__n").cast("long").as("n"), col("n_values"),
        when(col("__n") >= 2,
          floorDiv(e6 * (col("__n") * (col("__n") - 1) - col("__same")),
            col("__n") * (col("__n") - 1))).as("simpson_e6")): _*)
  }

  /** The full contingency table of two categorical columns with exact
    * per-cell χ² legs: observed count (ZERO cells included — the
    * category grid is the cross of the observed row/column marginals),
    * expected_e6 = ⌊10⁶·r·c/n⌋ and contrib_e6 = ⌊10⁶·(O·n − r·c)²/(n·r·c)⌋
    * — the (O−E)²/E term cleared of fractions, every quantity an exact
    * non-negative integer. One count aggregate over the corpus; the
    * grid build is a cross join of the two marginal relations (bounded
    * by category cardinalities, broadcast). Output:
    * (a, b, observed, expected_e6, contrib_e6). */
  def chiSquareCells(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val obs = df.filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).cast(dec).as("__o"))
    val rt = obs.groupBy(col("a")).agg(sum(col("__o")).as("__ra"))
    val ct = obs.groupBy(col("b")).agg(sum(col("__o")).as("__cb"))
    val tot = obs.agg(sum(col("__o")).as("__n"))
    val e6 = lit(1000000L).cast(dec)
    rt.crossJoin(ct).join(obs, Seq("a", "b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L).cast(dec)))
      .crossJoin(broadcast(tot))
      .withColumn("__diff", col("__o") * col("__n") - col("__ra") * col("__cb"))
      .select(col("a"), col("b"), col("__o").cast("long").as("observed"),
        floorDiv(e6 * col("__ra") * col("__cb"), col("__n")).as("expected_e6"),
        floorDiv(e6 * col("__diff") * col("__diff"),
          col("__n") * col("__ra") * col("__cb")).as("contrib_e6"))
  }

  /** Pearson's χ² test of independence as ONE row: n, dof =
    * (r−1)(c−1), chi2_e6 = Σ of the per-cell floored contributions
    * (the documented convention — each engine floors cells the same
    * way, so the sum is bit-portable; the aggregate underestimates
    * true χ² by < cells·10⁻⁶), significant_05 = 1 iff chi2_e6 exceeds
    * the inlined [[chi2Crit05E6]] critical value (NULL when dof = 0 or
    * dof > 10 — extend the table before testing wider grids). */
  def chiSquareTest(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val crit = array(chi2Crit05E6.map(lit): _*)
    chiSquareCells(df, aCol, bCol)
      .agg(sum(col("observed")).as("n"),
        countDistinct(col("a")).as("__r"), countDistinct(col("b")).as("__c"),
        sum(col("contrib_e6")).as("chi2_e6"))
      .withColumn("dof", ((col("__r") - 1) * (col("__c") - 1)).cast("long"))
      .select(col("n"), col("dof"), col("chi2_e6"),
        when(col("dof") >= 1 && col("dof") <= chi2Crit05E6.length,
          when(col("chi2_e6") > element_at(crit, col("dof").cast("int")), 1).otherwise(0))
          .as("significant_05"))
  }
}
