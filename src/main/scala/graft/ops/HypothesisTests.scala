package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-comparison tests over unaggregated corpora — the A/B
  * adjudication layer above the engine's experiment plumbing (the q54
  * hash split assigns arms; this decides them). Everything follows the
  * house integer-exactness rule: rank statistics are exact integers in
  * doubled units (so tie midpoints never leave ℤ), the normal
  * approximation's z² is reported in 10⁻⁶ quanta computed by exact
  * decimal floor-division, and the α = 0.05 decision is an integer
  * cross-multiplication — bit-reproducible on any engine, which is what
  * makes the gate a hash match rather than a tolerance check. */
object HypothesisTests {

  private val dec = DecimalType(38, 0)

  /** Mann–Whitney U (Wilcoxon rank-sum) with the standard tie
    * treatment: pooled average ranks (midrank of each tie run) and the
    * tie-corrected variance. Returns ONE row:
    *
    *   n1, n2          — group sizes (isA true / false)
    *   u1_x2, u2_x2    — 2·U₁, 2·U₂ (doubled so tie midranks stay
    *                     integral; u1_x2 + u2_x2 = 2·n1·n2)
    *   tie_term        — Σ(t³ − t) over tie runs
    *   z2_e6           — ⌊10⁶·z²⌋ of the normal approximation
    *                     z² = (U₁ − μ)²/Var, μ = n1n2/2,
    *                     Var = n1n2[(n+1)n(n−1) − Σ(t³−t)]/(12n(n−1))
    *   significant_05  — 1 iff z² > 3.8416 (= 1.96², the two-sided
    *                     α = 0.05 convention), decided by the exact
    *                     cross-multiplication 1875·d²·n(n−1) >
    *                     2401·n1·n2·T with d = 2U₁ − n1n2 — no float
    *                     ever enters the decision.
    *
    * Degenerate inputs (an empty arm, or every value identical → zero
    * variance) report z2_e6 = 0, significant_05 = 0.
    *
    * Scale shape: one map-side-combined aggregate to the VALUE level
    * (rank arithmetic needs only each distinct value's multiplicity and
    * group-A multiplicity), tie ranges from [[Sampling.globalCumsum]]'s
    * chunked prefix sum (no single-reducer window even when the value
    * domain is row-sized), one scalar aggregate. Envelope: the z² legs
    * need 3·10⁶·d²·n(n−1) < 10³⁸ (DECIMAL(38,0); DuckDB's HUGEINT has
    * the same 128-bit ceiling, so no portable wider path exists). With
    * d = 2U₁ − n1n2 ~ z·n^1.5 under a near-null effect this holds past
    * 10⁶ pooled rows; a huge-n strong-effect pair saturates to NULL
    * (Spark decimal overflow) — strata-sample the arms below the
    * envelope rather than trusting a half-exact wide division. The
    * rank legs themselves (u1_x2/u2_x2/tie_term) are exact to n ~ 10⁹. */
  def mannWhitneyU(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val lvl = df.filter(value.isNotNull && isA.isNotNull)
      .groupBy(value.as("__v"))
      .agg(count(lit(1)).cast(dec).as("__cnt"),
        sum(when(isA, 1L).otherwise(0L)).cast(dec).as("__ca"))
    val cum = Sampling.globalCumsum(lvl, Seq(col("__v")), col("__cnt"), "__hi")
    val agg = cum
      .withColumn("__lo", col("__hi") - col("__cnt") + lit(1L).cast(dec))
      .agg(
        sum(col("__ca")).cast(dec).as("n1d"),
        sum(col("__cnt") - col("__ca")).cast(dec).as("n2d"),
        // group-A pooled rank sum, doubled: each of the ca rows at this
        // value carries midrank (lo+hi)/2
        sum(col("__ca") * (col("__lo") + col("__hi"))).cast(dec).as("r1_x2"),
        sum(col("__cnt") * col("__cnt") * col("__cnt") - col("__cnt"))
          .cast(dec).as("tie_term"))
    val n = col("n1d") + col("n2d")
    val u1 = col("r1_x2") - col("n1d") * (col("n1d") + lit(1).cast(dec))
    val d = col("__u1_x2") - col("n1d") * col("n2d")
    val bigT = (n + lit(1).cast(dec)) * n * (n - lit(1).cast(dec)) - col("tie_term")
    val zNum = (lit(3000000L).cast(dec) * d * d * n * (n - lit(1).cast(dec)))
    val zDen = col("n1d") * col("n2d") * bigT
    agg
      .withColumn("__u1_x2", u1)
      .withColumn("__t", bigT)
      .select(
        col("n1d").cast("long").as("n1"),
        col("n2d").cast("long").as("n2"),
        col("__u1_x2").cast("long").as("u1_x2"),
        (lit(2).cast(dec) * col("n1d") * col("n2d") - col("__u1_x2"))
          .cast("long").as("u2_x2"),
        col("tie_term").cast("long").as("tie_term"),
        when(col("n1d") > 0 && col("n2d") > 0 && col("__t") > 0,
          ((zNum - pmod(zNum, zDen)) / zDen).cast("long"))
          .otherwise(lit(0L)).as("z2_e6"),
        when(col("n1d") > 0 && col("n2d") > 0 && col("__t") > 0 &&
          lit(1875).cast(dec) * d * d * n * (n - lit(1).cast(dec)) >
            lit(2401).cast(dec) * zDen, 1).otherwise(0).as("significant_05"))
  }

  /** Spearman rank correlation in the classic d² form with pooled
    * midranks: ρ = 1 − 6Σd²/(n(n²−1)), d = midrank(x) − midrank(y),
    * every quantity an exact integer in doubled-rank units (Σd² rides
    * as 4·Σd², cleared by the denominator's 4). The d² form without
    * the tie adjustment is the documented contract — under heavy ties
    * it differs from Pearson-of-ranks (use [[Stats.correlationMatrix]]
    * on explicit ranks when that matters); both engines replay this
    * form verbatim. Midranks come from one value-level histogram +
    * chunked prefix pass PER VARIABLE (the [[mannWhitneyU]] machinery),
    * joined back by value — rank assignment never windows the corpus.
    * Envelope: 6·10⁶·4Σd² with Σd² ≤ 4n³ holds to n ~ 10⁹. Output one
    * row: (n, rho_e6) — rho_e6 = 10⁶ − ⌊6·10⁶·4Σd² / (4n(n²−1))⌋,
    * NULL when n < 2. */
  def spearmanD2(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(x.cast(dec).as("__x"), y.cast(dec).as("__y"))
    def midranks(c: String): DataFrame =
      Sampling.globalCumsum(
          base.groupBy(col(c)).agg(count(lit(1)).cast(dec).as("__cnt")),
          Seq(col(c)), col("__cnt"), s"__hi_$c")
        .select(col(c),
          (lit(2).cast(dec) * col(s"__hi_$c") - col("__cnt") + lit(1).cast(dec))
            .as(s"__r2_$c")) // lo + hi = 2·hi − cnt + 1
    val ranked = base
      .join(midranks("__x"), Seq("__x"))
      .join(midranks("__y"), Seq("__y"))
    val agg = ranked.agg(count(lit(1)).cast(dec).as("__n"),
      sum((col("__r2___x") - col("__r2___y")) * (col("__r2___x") - col("__r2___y")))
        .as("__sd2x4"))
    val den = lit(4).cast(dec) * col("__n") *
      (col("__n") * col("__n") - lit(1).cast(dec))
    val num = lit(6000000L).cast(dec) * col("__sd2x4")
    agg.select(col("__n").cast("long").as("n"),
      when(col("__n") >= 2,
        (lit(1000000L).cast(dec) - (num - pmod(num, den)) / den).cast("long"))
        .as("rho_e6"))
  }

  /** Kruskal–Wallis H test — [[mannWhitneyU]] generalized to k groups
    * (one-way ANOVA on pooled midranks). Exact-integer legs via the
    * same value-level histogram + chunked-prefix tie spans; the H
    * statistic follows the staged-floor convention ([[Stats.chiSquareTest]]'s
    * summed-floored-cells rule — each engine floors the same way, so
    * the figure is bit-portable, understating true H by < k·10⁻⁶):
    *
    *   S       = Σⱼ ⌊10⁶·3·r_j² / (n_j·n·(n+1))⌋   (r_j = doubled rank sum)
    *   h_e6    = S − 3·(n+1)·10⁶
    *   hc_e6   = ⌊h_e6·(n³−n) / (n³−n−T)⌋          (tie correction; T = Σ(t³−t))
    *   significant_05 = hc_e6 > [[Stats.chi2Crit05E6]](k−1), dof ≤ 10
    *
    * H is asymptotically χ²(k−1), which is why the same inlined
    * critical table decides. All-tied inputs (n³−n = T) and k < 2
    * report zeros. Output: (n, n_groups, dof, hc_e6, significant_05). */
  def kruskalWallis(df: DataFrame, value: Column, groupCol: Column): DataFrame = {
    val gv = df.filter(value.isNotNull && groupCol.isNotNull)
      .groupBy(value.as("__v"), groupCol.as("__g"))
      .agg(count(lit(1)).cast(dec).as("__cgv"))
    val lvl = gv.groupBy(col("__v")).agg(sum(col("__cgv")).as("__cnt"))
    val cum = Sampling.globalCumsum(lvl, Seq(col("__v")), col("__cnt"), "__hi")
      .withColumn("__lo", col("__hi") - col("__cnt") + lit(1L).cast(dec))
    val perGroup = gv.join(cum.select(col("__v"), col("__lo"), col("__hi")), Seq("__v"))
      .groupBy(col("__g"))
      .agg(sum(col("__cgv")).as("__nj"),
        sum(col("__cgv") * (col("__lo") + col("__hi"))).as("__rj_x2"))
    val ties = cum.agg(
      sum(col("__cnt")).cast(dec).as("__n"),
      sum(col("__cnt") * col("__cnt") * col("__cnt") - col("__cnt")).cast(dec).as("__t"))
    val e6 = lit(1000000L).cast(dec)
    val termDen = col("__nj") * col("__n") * (col("__n") + lit(1).cast(dec))
    val termNum = lit(3L).cast(dec) * e6 * col("__rj_x2") * col("__rj_x2")
    val stat = perGroup.crossJoin(broadcast(ties))
      .select(col("__n"), col("__t"),
        ((termNum - pmod(termNum, termDen)) / termDen).cast(dec).as("__term"))
      .groupBy(col("__n"), col("__t"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__term")).as("__s"))
    val n3n = col("__n") * col("__n") * col("__n") - col("__n")
    val hE6 = col("__s") - lit(3).cast(dec) * (col("__n") + lit(1).cast(dec)) * e6
    val corrDen = n3n - col("__t")
    val hcNum = hE6 * n3n
    val crit = array(Stats.chi2Crit05E6.map(lit): _*)
    stat
      .withColumn("dof", (col("n_groups") - 1).cast("long"))
      .withColumn("__hc",
        when(col("n_groups") >= 2 && corrDen > 0,
          ((hcNum - pmod(hcNum, corrDen)) / corrDen).cast("long")).otherwise(lit(0L)))
      .select(col("__n").cast("long").as("n"), col("n_groups"), col("dof"),
        col("__hc").as("hc_e6"),
        when(col("dof") >= 1 && col("dof") <= Stats.chi2Crit05E6.length,
          when(col("__hc") > element_at(crit, col("dof").cast("int")), 1).otherwise(0))
          .as("significant_05"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the shape-sensitive sibling
    * of [[mannWhitneyU]] (a location shift moves U; ANY CDF divergence
    * moves D). D = sup|F₁ − F₂| is a rational with denominator n1·n2,
    * so the supremum is taken over the exact integers
    * |c1·n2 − c2·n1| at each distinct value (c = cumulative counts —
    * the same value-level histogram + [[Sampling.globalCumsums]]
    * chunked prefix pass as the rank test, both CDFs in one shot).
    * Returns ONE row: n1, n2, d_num (= D·n1·n2, exact),
    * d_e6 = ⌊10⁶·D⌋, significant_05 = 1 iff D exceeds the asymptotic
    * two-sided α = 0.05 bound 1.358·√((n1+n2)/(n1·n2)) (the Smirnov
    * c(α) = 1.358 convention), decided exactly by
    * 10⁶·d_num² > 1844164·n1·n2·(n1+n2). Ties need no correction — a
    * tie run is one CDF step evaluated after the run, which is exactly
    * what the value-level cumulative gives. Degenerate (empty-arm)
    * inputs report zeros. Exact while 10⁶·d_num² < 10³⁸
    * (n up to ~4·10⁷ pooled). */
  def ksTest(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val lvl = df.filter(value.isNotNull && isA.isNotNull)
      .groupBy(value.as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).cast(dec).as("__a"),
        sum(when(isA, 0L).otherwise(1L)).cast(dec).as("__b"))
    val cum = Sampling.globalCumsums(lvl, Seq(col("__v")),
      Seq(col("__a") -> "__c1", col("__b") -> "__c2"))
    val totals = lvl.agg(sum(col("__a")).cast(dec).as("__n1"),
      sum(col("__b")).cast(dec).as("__n2"))
    val dNum = abs(col("__c1") * col("__n2") - col("__c2") * col("__n1"))
    val stat = cum.crossJoin(broadcast(totals))
      .agg(max(dNum).cast(dec).as("d_num_d"),
        max(col("__n1")).as("n1d"), max(col("__n2")).as("n2d"))
    val b = col("n1d") * col("n2d")
    val e6 = col("d_num_d") * lit(1000000L).cast(dec)
    stat.select(
      coalesce(col("n1d").cast("long"), lit(0L)).as("n1"),
      coalesce(col("n2d").cast("long"), lit(0L)).as("n2"),
      coalesce(col("d_num_d").cast("long"), lit(0L)).as("d_num"),
      when(col("n1d") > 0 && col("n2d") > 0,
        ((e6 - pmod(e6, b)) / b).cast("long")).otherwise(lit(0L)).as("d_e6"),
      when(col("n1d") > 0 && col("n2d") > 0 &&
        lit(1000000L).cast(dec) * col("d_num_d") * col("d_num_d") >
          lit(1844164L).cast(dec) * b * (col("n1d") + col("n2d")), 1)
        .otherwise(0).as("significant_05"))
  }

  /** CUPED variance-reduced arm means (Deng, Xu, Kohavi & Walker,
    * WSDM 2013): adjust each unit's experiment metric y by the pooled
    * linear fit on a pre-experiment covariate x —
    * y′ = y − θ(x − x̄), θ = Cov(x,y)/Var(x) — so arm means keep their
    * expectation but shed the variance x explains (the standard
    * sensitivity lever for online A/B tests; the pooled θ keeps the
    * adjustment unbiased under randomized assignment).
    *
    * Entirely exact integers: with pooled sums over BOTH arms,
    * N = n·Σxy − Σx·Σy and D = n·Σx² − (Σx)² (θ = N/D), an arm's
    * adjusted mean clears to the single rational
    *
    *   mean_adj_e3 = ⌊10³·(Syₐ·n·D − N·(n·Sxₐ − nₐ·Σx)) / (nₐ·n·D)⌋
    *
    * — one sign-safe floor, no staged rounding. A zero-variance
    * covariate (D = 0) leaves θ and the adjustment NULL (the
    * [[graft.ops.Stats.linearFit]] contract); raw means still report.
    * Units with a NULL x or y are excluded. Input is ONE ROW PER UNIT
    * (caller aggregates raw events to units first — assignment is
    * per-unit, so the covariate must be too). Output one row per arm:
    * (is_treatment, n_units, mean_y_e3, theta_e6, mean_adj_e3).
    *
    * Envelope (DECIMAL(38,0), same 128-bit ceiling as the oracle's
    * HUGEINT): the big leg is 10³·Syₐ·n·D ≤ 2·10³·n⁴·X²·Y for |x| ≤ X,
    * |y| ≤ Y — holds to ~10⁵ units of 10⁴-unit metrics; quantize
    * coarser or stratify beyond.
    *
    * Scale shape: one map-side-combined pooled aggregate + one per-arm
    * aggregate over the units table, cross-joined through a broadcast
    * 1-row frame — the corpus is touched by neither. */
  def cupedMeans(units: DataFrame, isTreatment: Column, x: Column, y: Column): DataFrame = {
    val base = units.filter(x.isNotNull && y.isNotNull)
      .select(isTreatment.as("is_treatment"), x.cast(dec).as("__x"), y.cast(dec).as("__y"))
    val pooled = base.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val arms = base.groupBy(col("is_treatment"))
      .agg(count(lit(1)).cast(dec).as("__na"),
        sum(col("__x")).as("__sxa"), sum(col("__y")).as("__sya"))
    def floorDiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val e3 = lit(1000L).cast(dec)
    val e6 = lit(1000000L).cast(dec)
    arms.crossJoin(broadcast(pooled))
      // NOT "__N"/"__D": the default case-insensitive resolver makes
      // withColumn("__N", …) REPLACE the pooled count "__n" (a silent
      // column clobber this function shipped with for one commit)
      .withColumn("__cn", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__cd", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .select(col("is_treatment"),
        col("__na").cast("long").as("n_units"),
        floorDiv(e3 * col("__sya"), col("__na")).as("mean_y_e3"),
        when(col("__cd") =!= 0, floorDiv(e6 * col("__cn"), col("__cd"))).as("theta_e6"),
        when(col("__cd") =!= 0,
          floorDiv(e3 * (col("__sya") * col("__n") * col("__cd") -
              col("__cn") * (col("__n") * col("__sxa") - col("__na") * col("__sx"))),
            col("__na") * col("__n") * col("__cd"))).as("mean_adj_e3"))
  }
}
