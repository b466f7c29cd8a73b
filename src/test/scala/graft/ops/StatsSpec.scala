package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpecBase {

  // ---- trimmed mean -----------------------------------------------------------

  test("trimmedMean drops exactly the rank fences and floors the milli-mean") {
    import spark.implicits._
    // group g: values 1..10 → trim 100‰ drops rank 1 and rank 10;
    // mean of 2..9 = 5.5 → 5500 milli
    val df = (1L to 10L).map(v => ("g", v, v)).toDF("g", "v", "id")
    val got = Stats.trimmedMean(df, Seq("g"), col("v"), col("id"), trimMilli = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("g", 8L, 5500L)))
  }

  test("trimmedMean: replica across tie-breaks, trims, negatives, partitionings") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"g${i % 3}", ((i * 37) % 21).toLong - 10L, i.toLong))
    def replica(trim: Int) = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val t = (sorted.size.toLong * trim / 1000).toInt
      val kept = sorted.slice(t, sorted.size - t)
      val s = kept.map(r => BigInt(r._2)).sum * 1000
      val n = BigInt(kept.size)
      (g, kept.size.toLong, ((s - s.mod(n)) / n).toLong)
    }.toSet
    for (trim <- Seq(0, 50, 250); parts <- Seq(1, 17)) {
      val got = Stats.trimmedMean(rows.toDF("g", "v", "id").repartition(parts),
        Seq("g"), col("v"), col("id"), trim)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == replica(trim), s"trim=$trim parts=$parts")
    }
  }

  // ---- linear fit -------------------------------------------------------------

  test("linearFit recovers an exact line with r² = 1") {
    import spark.implicits._
    val df = (1L to 50L).map(x => ("g", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = Stats.linearFit(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getLong(1) == 50L)
    assert(r.getLong(2) == 3000000L && r.getLong(3) == 7000000L && r.getLong(4) == 1000000L)
  }

  test("linearFit floors negative slopes toward -inf (sign-safe)") {
    import spark.implicits._
    // points (0,0),(1,-1),(2,-2),(2,-3): Σxy = -11 → N = 4·(-11) − 5·(-6)
    // = -14, D = 4·9 − 25 = 11 → slope = -14/11 = -1.2727… — the floor
    // is -1272728 (toward -inf), where truncation would give -1272727
    val df = Seq((0L, 0L), (1L, -1L), (2L, -2L), (2L, -3L)).map { case (x, y) => ("g", x, y) }
      .toDF("g", "x", "y")
    val r = Stats.linearFit(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getLong(2) == -1272728L, s"slope_e6 = ${r.getLong(2)}")
  }

  test("linearFit: BigInt replica on grouped data, any partitioning") {
    import spark.implicits._
    val rows = (1 to 300).map { i =>
      (s"g${i % 4}", (i % 37).toLong, ((i * 13) % 101).toLong - 50L)
    }
    def replica = rows.groupBy(_._1).map { case (g, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._2)).sum; val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      val d = n * sxx - sx * sx; val dy = n * syy - sy * sy; val nn = n * sxy - sx * sy
      def fd(a: BigInt, b: BigInt) = ((a - a.mod(b)) / b).toLong
      (g, rs.size.toLong,
        if (d > 0) Some(fd(nn * 1000000, d)) else None,
        if (d > 0) Some(fd((sy * sxx - sx * sxy) * 1000000, d)) else None,
        if (d > 0 && dy > 0) Some(fd(nn * nn * 1000000, d * dy)) else None)
    }.toSet
    for (parts <- Seq(1, 23)) {
      val got = Stats.linearFit(rows.toDF("g", "x", "y").repartition(parts),
        Seq("g"), col("x"), col("y"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
      assert(got == replica, s"parts=$parts")
    }
  }

  // ---- correlation matrix -------------------------------------------------------

  test("correlationMatrix: one pass reproduces per-pair linearFit r² with signs") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      val x = (i % 37).toLong
      (x, 3 * x + 7, -2 * x + ((i * 13) % 11), (i % 5).toLong)
    }
    val df = rows.toDF("x", "y_exact", "y_neg", "noise")
    val cols = Seq("x" -> col("x"), "y_exact" -> col("y_exact"),
      "y_neg" -> col("y_neg"), "noise" -> col("noise"))
    val got = Stats.correlationMatrix(df, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))).toMap
    assert(got.size == 6)
    // exact line: r² = 1, positive
    assert(got(("x", "y_exact")) == ((200L, Some(1000000L), 1)))
    // strongly negative relation keeps the sign
    assert(got(("x", "y_neg"))._3 == -1)
    // each pair equals the two-column fit's r² (same closed form)
    for (Seq((na, ca), (nb, cb)) <- cols.combinations(2)) {
      val fit = Stats.linearFit(df, Seq.empty, ca, cb).head()
      val r2 = Option(fit.get(3)).map(_.asInstanceOf[Long])
      assert(got((na, nb))._2 == r2, s"$na/$nb")
    }
    // partition independence
    val again = Stats.correlationMatrix(df.repartition(23), cols)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))).toMap
    assert(again == got)
  }

  test("correlationMatrix: complete-cases rows and zero-variance pairs") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2L), Some(9L)), (Some(2L), Some(4L), Some(9L)),
      (Some(3L), None, Some(9L)), (Some(4L), Some(8L), Some(9L))
    ).toDF("a", "b", "c")
    val got = Stats.correlationMatrix(df,
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.isNullAt(3), r.getInt(4)))).toMap
    // the row with a NULL b is dropped for EVERY pair (shared n = 3)
    assert(got.values.forall(_._1 == 3L))
    assert(got(("a", "b")) == ((3L, false, 1)))
    // constant column: r undefined -> null r², sign 0
    assert(got(("a", "c")) == ((3L, true, 0)))
  }

  // ---- Benford ------------------------------------------------------------------

  test("benford: log-uniform magnitudes conform, uniform ones do not") {
    import spark.implicits._
    // log-uniform over 3 decades -> first digits follow Benford closely
    val logu = (0 until 3000).map(i => math.pow(10.0, 1.0 + 3.0 * i / 3000.0))
    val c = Stats.benfordTest(logu.toDF("v"), col("v")).head()
    assert(c.getInt(2) == 0, s"chi2_e6=${c.getLong(1)}")
    // uniform 1..9000 -> digit 1 hugely over-represented at the top decade
    val uni = (1 to 9000).map(_.toDouble)
    val u = Stats.benfordTest(uni.toDF("v"), col("v")).head()
    assert(u.getInt(2) == 1, s"chi2_e6=${u.getLong(1)}")
  }

  test("benford: sub-unit fractions are excluded from BOTH observed and n") {
    import spark.implicits._
    // 0.42 floors to first-digit '0' — pre-fix it was dropped from the
    // 9-digit grid but still inflated n, diverging from the oracle's
    // digit-restricted total. The domain is value >= 1: 0.42 and 0.9
    // must not appear in observed OR in the n behind expected_e6.
    val df = Seq(1.0, 2.0, 0.42, 0.9, 3.0).toDF("v")
    val got = Stats.benfordCells(df, col("v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.values.map(_._1).sum == 3L) // only 1.0, 2.0, 3.0 counted
    // expected_e6 for digit 1 = floor(n * p_e9 / 1e3) with n = 3, not 5
    assert(got(1)._2 == 3L * Stats.benfordPropE9(0) / 1000L)
    val t = Stats.benfordTest(df, col("v")).head()
    assert(t.getLong(0) == 3L, s"n must be the restricted total, got ${t.getLong(0)}")
  }

  test("benford cells: BigInt replica, fixed 9-row grid, non-positive excluded") {
    import spark.implicits._
    val vals = Seq(1.5, 19.0, 23.0, 2.0, 31.0, 0.0, -5.0) // digits 1,1,2,2,3; 0/-5 dropped
    val df = vals.toDF("v")
    val got = Stats.benfordCells(df, col("v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 9 && got.keySet == (1 to 9).toSet)
    val n = BigInt(5)
    def fd(a: BigInt, b: BigInt) = ((a - a.mod(b)) / b).toLong
    (1 to 9).foreach { d =>
      val o = BigInt(Map(1 -> 2, 2 -> 2, 3 -> 1).getOrElse(d, 0))
      val p = BigInt(Stats.benfordPropE9(d - 1))
      val diff = o * BigInt(1000000000) - n * p
      assert(got(d) == ((o.toLong,
        fd(n * p, BigInt(1000)),
        fd(BigInt(1000000) * diff * diff, BigInt(1000000000) * n * p))), s"digit $d")
    }
  }

  // ---- chi-square ---------------------------------------------------------------

  test("chiSquare: hand-traced 2×2 with equal marginals") {
    import spark.implicits._
    // O = [[10,20],[20,10]]: every E = 15, every cell contributes
    // floor(1e6·(O·60 − 30·30)²/(60·900)) = floor(1e6·25/15) = 1666666
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(10)(("y", "v"))
    val df = rows.toDF("a", "b")
    val cells = Stats.chiSquareCells(df, col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cells(("x", "u")) == ((10L, 15000000L, 1666666L)))
    assert(cells(("y", "u")) == ((20L, 15000000L, 1666666L)))
    val t = Stats.chiSquareTest(df, col("a"), col("b")).head()
    // χ² = 6.67 > 3.84 (dof 1) → dependent
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getInt(3)) ==
      ((60L, 1L, 4 * 1666666L, 1)))
  }

  test("chiSquare: an independent grid stays under the critical value") {
    import spark.implicits._
    // perfectly independent: O(a,b) = ra·cb/n exactly
    val rows = for (a <- 1 to 3; b <- 1 to 4; _ <- 1 to a * b) yield (s"a$a", s"b$b")
    val t = Stats.chiSquareTest(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(t.getLong(2) == 0L && t.getInt(3) == 0 && t.getLong(1) == 6L)
  }

  test("chiSquare: absent category pairs appear as zero cells with contrib == expected") {
    import spark.implicits._
    val rows = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"), ("x", "v"))
    val cells = Stats.chiSquareCells(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cells.size == 4) // full 2×2 grid despite ("y","u") never occurring
    val zu = cells(("y", "u"))
    assert(zu._1 == 0L && zu._3 == zu._2) // (0·n − rc)²/(n·rc) = rc/n = E
  }

  test("chiSquare is partition-independent and matches a BigInt replica") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"a${i % 4}", s"b${(i * 7) % 3}"))
    def replica = {
      val o = rows.groupBy(identity).view.mapValues(_.size).toMap
      val ra = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val cb = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val n = BigInt(rows.size)
      // keys are Sets — materialize to Seq or the yielded contributions
      // dedup by VALUE before the sum
      (for (a <- ra.keys.toSeq; b <- cb.keys.toSeq) yield {
        val ob = BigInt(o.getOrElse((a, b), 0))
        val d = ob * n - BigInt(ra(a)) * cb(b)
        val den = n * ra(a) * cb(b)
        val x = d * d * 1000000
        ((x - x.mod(den)) / den).toLong
      }).sum
    }
    for (parts <- Seq(1, 19)) {
      val t = Stats.chiSquareTest(rows.toDF("a", "b").repartition(parts),
        col("a"), col("b")).head()
      assert(t.getLong(2) == replica && t.getLong(1) == 6L, s"parts=$parts")
    }
  }

  test("linearFit degenerate groups: constant x gives null fit, constant y gives null r²") {
    import spark.implicits._
    val df = (Seq.fill(5)(("cx", 2L, 0L)).zipWithIndex.map { case ((g, x, _), i) => (g, x, i.toLong) } ++
      (1 to 5).map(i => ("cy", i.toLong, 9L))).toDF("g", "x", "y")
    val got = Stats.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(2), r.isNullAt(3), r.isNullAt(4)))).toMap
    assert(got("cx") == ((true, true, true)))
    assert(got("cy") == ((false, false, true)))
  }

  test("cohenKappa: hand-traced κ, nulls excluded, partition independence") {
    import spark.implicits._
    // cells: (a,a)×4 (b,b)×2 (a,b)×1 (b,a)×1 → n=8 d=6 E=5·5+3·3=34
    // κ = (8·6−34)/(64−34) = 14/30 → 466666; po = 6/8 → 750000; pe = 34/64 → 531250
    val rows = Seq.fill(4)(("a", "a")) ++ Seq.fill(2)(("b", "b")) ++
      Seq(("a", "b"), ("b", "a"), (null, "a"), ("a", null))
    val df = rows.toDF("ra", "rb")
    def run(parts: Int) = {
      val r = Stats.cohenKappa(df.repartition(parts), col("ra"), col("rb")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    assert(run(1) == ((8L, 6L, 750000L, 531250L, 466666L)))
    assert(run(7) == run(1))
  }

  test("cohenKappa: perfect disagreement floors to exactly −1; constant raters give null κ") {
    import spark.implicits._
    val anti = (Seq.fill(4)(("a", "b")) ++ Seq.fill(4)(("b", "a"))).toDF("ra", "rb")
    assert(Stats.cohenKappa(anti, col("ra"), col("rb")).head().getLong(4) == -1000000L)
    val const = Seq.fill(5)(("a", "a")).toDF("ra", "rb")
    val r = Stats.cohenKappa(const, col("ra"), col("rb")).head()
    assert(r.getLong(2) == 1000000L && r.isNullAt(4), "p_e = 1 leaves κ undefined")
  }

  test("simpsonDiversity: hand rational, extremes, n<2 null, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some("x")), ("g1", Some("x")), ("g1", Some("y")),  // (6−2)/6 → 666666
      ("g2", Some("x")), ("g2", Some("y")), ("g2", Some("z")),  // all distinct → 1000000
      ("g3", Some("x")), ("g3", Some("x")),                     // monoculture → 0
      ("g4", Some("x")), ("g4", None)                           // null excluded → n=1 → NULL
    ).toDF("g", "v")
    def run(parts: Int) = Stats.simpsonDiversity(df.repartition(parts), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    val got = run(1)
    assert(got("g1") == ((3L, 2L, Some(666666L))))
    assert(got("g2") == ((3L, 3L, Some(1000000L))))
    assert(got("g3") == ((2L, 1L, Some(0L))))
    assert(got("g4") == ((1L, 1L, None)))
    assert(run(5) == got)
  }
}
