package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HypothesisTestsSpec extends SparkSpecBase {

  private def run(vals: Seq[(Double, Boolean)], parts: Int = 4) = {
    import spark.implicits._
    val df = vals.toDF("v", "a").repartition(parts)
    HypothesisTests.mannWhitneyU(df, col("v"), col("a")).head()
  }

  /** First-principles BigInt replica of the documented contract. */
  private def replica(vals: Seq[(Double, Boolean)]): (Long, Long, Long, Long, Long, Long, Int) = {
    val n1 = vals.count(_._2).toLong
    val n2 = vals.size - n1
    val runs = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var lo = 1L
    var r1x2 = 0L
    var tie = BigInt(0)
    runs.foreach { case (_, g) =>
      val t = g.size.toLong
      val hi = lo + t - 1
      r1x2 += g.count(_._2).toLong * (lo + hi)
      tie += BigInt(t) * t * t - t
      lo += t
    }
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val u2x2 = 2L * n1 * n2 - u1x2
    val n = BigInt(vals.size)
    val d = BigInt(u1x2) - BigInt(n1) * n2
    val bigT = (n + 1) * n * (n - 1) - tie
    val ok = n1 > 0 && n2 > 0 && bigT > 0
    val z2e6 = if (ok) (BigInt(3000000) * d * d * n * (n - 1) / (BigInt(n1) * n2 * bigT)).toLong else 0L
    val sig = if (ok && BigInt(1875) * d * d * n * (n - 1) > BigInt(2401) * BigInt(n1) * n2 * bigT) 1 else 0
    (n1, n2, u1x2, u2x2, tie.toLong, z2e6, sig)
  }

  private def asTuple(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getInt(6))

  test("hand-traced no-tie example: complete separation") {
    // A = {1,2,3}, B = {4,5,6}: R1 = 6 → U1 = 0, U2 = 9; z² = 3e6·81·30
    // / (9·210) µ = 3.857142 — a hair over 1.96², so the flag trips
    val r = run(Seq(1.0 -> true, 2.0 -> true, 3.0 -> true,
      4.0 -> false, 5.0 -> false, 6.0 -> false))
    assert(asTuple(r) == ((3L, 3L, 0L, 18L, 0L, 3857142L, 1)))
  }

  test("hand-traced midranks: the 2-run spans ranks 2..4, midrank 3") {
    // A = {1,2,2}, B = {2,3}: R1 = 1 + 3 + 3 = 7 → u1_x2 = 14 − 12 = 2
    val r = run(Seq(1.0 -> true, 2.0 -> true, 2.0 -> true, 2.0 -> false, 3.0 -> false))
    assert(r.getLong(2) == 2L) // u1_x2
    assert(r.getLong(3) == 2L * 3 * 2 - 2L) // u2_x2 = 10
    assert(r.getLong(4) == 24L) // tie_term = 3³ − 3
  }

  test("matches the BigInt replica on a mixed tied dataset, any partitioning") {
    val vals = (1 to 400).map { i =>
      val v = ((i * 2654435761L) % 37).toDouble // heavy ties
      val a = (i * 40503L) % 3 == 0
      (if (a) v else v + ((i % 5) - 2) * 0.5, a)
    }
    val expect = replica(vals)
    assert(asTuple(run(vals, parts = 1)) == expect)
    assert(asTuple(run(vals, parts = 32)) == expect)
  }

  test("u1_x2 + u2_x2 == 2·n1·n2 and group swap mirrors U") {
    val vals = (1 to 100).map(i => (((i * 7) % 23).toDouble, i % 4 == 0))
    val r = run(vals)
    assert(r.getLong(2) + r.getLong(3) == 2 * r.getLong(0) * r.getLong(1))
    val swapped = run(vals.map { case (v, a) => (v, !a) })
    assert(swapped.getLong(2) == r.getLong(3) && swapped.getLong(3) == r.getLong(2))
    assert(swapped.getLong(5) == r.getLong(5) &&
      swapped.getInt(6) == r.getInt(6)) // z², significance invariant
  }

  test("degenerate inputs: constant values and one-armed samples report zero") {
    val const = run(Seq.fill(20)(5.0).zipWithIndex.map { case (v, i) => (v, i % 2 == 0) })
    assert(const.getLong(5) == 0L && const.getInt(6) == 0)
    val oneArm = run((1 to 10).map(i => (i.toDouble, true)))
    assert(oneArm.getLong(5) == 0L && oneArm.getInt(6) == 0)
  }

  test("decision: shifted distributions flag, identical ones do not") {
    val shifted = (1 to 80).map(i => ((i % 20).toDouble, true)) ++
      (1 to 80).map(i => ((i % 20).toDouble + 10, false))
    assert(run(shifted).getInt(6) == 1)
    val same = (1 to 80).flatMap(i => Seq(((i % 20).toDouble, true), ((i % 20).toDouble, false)))
    assert(run(same).getInt(6) == 0)
  }

  // ---- Kolmogorov–Smirnov -----------------------------------------------------

  private def runKs(vals: Seq[(Double, Boolean)], parts: Int = 4) = {
    import spark.implicits._
    val df = vals.toDF("v", "a").repartition(parts)
    HypothesisTests.ksTest(df, col("v"), col("a")).head()
  }

  private def ksReplica(vals: Seq[(Double, Boolean)]): (Long, Long, Long, Long, Int) = {
    val n1 = vals.count(_._2).toLong
    val n2 = vals.size - n1
    var c1 = 0L; var c2 = 0L; var dNum = 0L
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      c1 += g.count(_._2); c2 += g.count(!_._2)
      dNum = math.max(dNum, math.abs(c1 * n2 - c2 * n1))
    }
    val dE6 = if (n1 > 0 && n2 > 0) (BigInt(dNum) * 1000000 / (BigInt(n1) * n2)).toLong else 0L
    val sig = if (n1 > 0 && n2 > 0 &&
      BigInt(1000000) * dNum * dNum > BigInt(1844164) * n1 * n2 * (n1 + n2)) 1 else 0
    (n1, n2, dNum, dE6, sig)
  }

  private def ksTuple(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))

  test("KS: hand-traced supremum with ties") {
    // A = {1,2,2,5}, B = {2,3,3}: after v=2 c=(3,1): |3·3−1·4| = 5;
    // after v=3 c=(3,3): |9−12| = 3; after v=5 c=(4,3): |12−12| = 0
    val r = runKs(Seq(1.0 -> true, 2.0 -> true, 2.0 -> true, 5.0 -> true,
      2.0 -> false, 3.0 -> false, 3.0 -> false))
    assert(ksTuple(r) == ((4L, 3L, 5L, 416666L, 0)))
  }

  test("KS matches the replica on mixed data, any partitioning") {
    val vals = (1 to 300).map { i =>
      val a = i % 3 == 0
      (((i * 2654435761L) % 41).toDouble + (if (a) 0.0 else 1.5), a)
    }
    val expect = ksReplica(vals)
    assert(ksTuple(runKs(vals, 1)) == expect)
    assert(ksTuple(runKs(vals, 32)) == expect)
  }

  test("KS decision: disjoint supports flag (D = 1), identical samples do not") {
    val disjoint = (1 to 40).map(i => (i.toDouble, true)) ++
      (1 to 40).map(i => (i.toDouble + 100, false))
    val r = runKs(disjoint)
    assert(r.getLong(2) == 40L * 40L && r.getLong(3) == 1000000L && r.getInt(4) == 1)
    val same = (1 to 50).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
    val s = runKs(same)
    assert(s.getLong(2) == 0L && s.getInt(4) == 0)
  }

  test("KS degenerate: one-armed and empty inputs report zeros") {
    assert(ksTuple(runKs((1 to 10).map(i => (i.toDouble, true)))) == ((10L, 0L, 0L, 0L, 0)))
    assert(ksTuple(runKs(Seq.empty)) == ((0L, 0L, 0L, 0L, 0)))
  }

  // ---- Spearman -------------------------------------------------------------------

  private def runSp(vals: Seq[(Long, Long)], parts: Int = 4) = {
    import spark.implicits._
    HypothesisTests.spearmanD2(vals.toDF("x", "y").repartition(parts),
      col("x"), col("y")).head()
  }

  test("Spearman: perfect monotone is exactly ±1e6") {
    val up = (1L to 40L).map(i => (i, i * 3 + 5))
    assert(runSp(up).getLong(1) == 1000000L)
    val down = (1L to 40L).map(i => (i, -2 * i))
    assert(runSp(down).getLong(1) == -1000000L)
  }

  test("Spearman matches the BigInt midrank replica with ties, any partitioning") {
    val vals = (1 to 300).map(i => (((i * 37) % 21).toLong, ((i * 13) % 17).toLong))
    def replica: Long = {
      val n = BigInt(vals.size)
      def r2(sel: ((Long, Long)) => Long): Map[Long, BigInt] = {
        var lo = 1L
        vals.groupBy(sel).toSeq.sortBy(_._1).map { case (v, g) =>
          val t = g.size; val hi = lo + t - 1; val m = BigInt(lo) + hi; lo += t
          v -> m
        }.toMap
      }
      val rx = r2(_._1); val ry = r2(_._2)
      val sd2x4 = vals.map { case (a, b) => val d = rx(a) - ry(b); d * d }.sum
      val num = BigInt(6000000) * sd2x4
      val den = BigInt(4) * n * (n * n - 1)
      (BigInt(1000000) - (num - num.mod(den)) / den).toLong
    }
    assert(runSp(vals, 1).getLong(1) == replica)
    assert(runSp(vals, 32).getLong(1) == replica)
  }

  test("Spearman degenerate: single-row input reports null rho") {
    val r = runSp(Seq((5L, 9L)))
    assert(r.getLong(0) == 1L && r.isNullAt(1))
  }

  // ---- Kruskal–Wallis -----------------------------------------------------------

  private def runKw(vals: Seq[(Double, String)], parts: Int = 4) = {
    import spark.implicits._
    HypothesisTests.kruskalWallis(vals.toDF("v", "g").repartition(parts),
      col("v"), col("g")).head()
  }

  private def kwReplica(vals: Seq[(Double, String)]): (Long, Long, Long, Long, Int) = {
    val n = BigInt(vals.size)
    val runs = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var lo = 1L
    var tie = BigInt(0)
    val rx2 = scala.collection.mutable.Map[String, BigInt]().withDefaultValue(BigInt(0))
    val nj = scala.collection.mutable.Map[String, BigInt]().withDefaultValue(BigInt(0))
    runs.foreach { case (_, g) =>
      val t = g.size.toLong; val hi = lo + t - 1
      g.groupBy(_._2).foreach { case (grp, m) =>
        rx2(grp) += BigInt(m.size) * (lo + hi); nj(grp) += m.size
      }
      tie += BigInt(t) * t * t - t; lo += t
    }
    val k = nj.size.toLong
    def fd(a: BigInt, b: BigInt) = (a - a.mod(b)) / b
    val s = nj.keys.map { g =>
      fd(BigInt(3000000) * rx2(g) * rx2(g), nj(g) * n * (n + 1))
    }.sum
    val hE6 = s - 3 * (n + 1) * 1000000
    val n3n = n * n * n - n
    val corr = n3n - tie
    val hc = if (k >= 2 && corr > 0) fd(hE6 * n3n, corr).toLong else 0L
    val dof = k - 1
    val sig = if (dof >= 1 && dof <= 10 &&
      hc > Stats.chi2Crit05E6(dof.toInt - 1)) 1 else 0
    (n.toLong, k, dof, hc, sig)
  }

  private def kwTuple(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))

  test("KW: hand-traced three separated triples give H = 7.2, dependent at dof 2") {
    val vals = Seq(1.0 -> "a", 2.0 -> "a", 3.0 -> "a",
      4.0 -> "b", 5.0 -> "b", 6.0 -> "b",
      7.0 -> "c", 8.0 -> "c", 9.0 -> "c")
    assert(kwTuple(runKw(vals)) == ((9L, 3L, 2L, 7200000L, 1)))
  }

  test("KW matches the replica on tied grouped data, any partitioning") {
    val vals = (1 to 360).map { i =>
      (((i * 2654435761L) % 23).toDouble + (i % 3) * 0.5, s"g${i % 4}")
    }
    val expect = kwReplica(vals)
    assert(kwTuple(runKw(vals, 1)) == expect)
    assert(kwTuple(runKw(vals, 32)) == expect)
  }

  test("KW: identical group distributions stay under the critical value; all-tied is zero") {
    val same = (1 to 60).flatMap(i => Seq("a", "b", "c").map(g => ((i % 12).toDouble, g)))
    val r = runKw(same)
    assert(r.getInt(4) == 0)
    val allTied = (1 to 30).map(i => (5.0, s"g${i % 3}"))
    val t = runKw(allTied)
    assert(t.getLong(3) == 0L && t.getInt(4) == 0)
  }

  test("cupedMeans: hand-traced θ and adjusted means; covariate absorbs the arm gap") {
    import spark.implicits._
    // units: T(1,2),(2,5)  C(3,7),(4,9) → n=4 sx=10 sy=23 sxx=30 sxy=69
    // N=46 D=20 θ=2.3; raw means 3.5 vs 8.0 → adjusted 5.8 vs 5.7
    val units = Seq((true, 1L, 2L), (true, 2L, 5L), (false, 3L, 7L), (false, 4L, 9L))
      .toDF("arm", "x", "y")
    def run(parts: Int) = HypothesisTests.cupedMeans(units.repartition(parts),
        col("arm"), col("x"), col("y"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = run(1)
    assert(got(true) == ((2L, 3500L, 2300000L, 5800L)))
    assert(got(false) == ((2L, 8000L, 2300000L, 5700L)))
    assert(run(3) == got, "partition-independent")
  }

  test("cupedMeans: zero-variance covariate leaves θ and adjustment NULL; raw means stay") {
    import spark.implicits._
    val units = Seq((true, 5L, 2L), (true, 5L, 6L), (false, 5L, 10L))
      .toDF("arm", "x", "y")
    val got = HypothesisTests.cupedMeans(units, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(2), r.isNullAt(3), r.isNullAt(4)))).toMap
    assert(got(true) == ((4000L, true, true)))
    assert(got(false) == ((10000L, true, true)))
  }

  test("cupedMeans: BigInt replica on pseudo-random units, nulls excluded") {
    import spark.implicits._
    val rows = (1L to 97L).map { i =>
      val x = (i * 7919) % 101; val y = 3 * x + (i * 104729) % 13
      (i % 2 == 0, x, y)
    }
    val units = rows.toDF("arm", "x", "y")
      .unionByName(Seq((true, Option.empty[Long], Option(1L))).toDF("arm", "x", "y"))
    val got = HypothesisTests.cupedMeans(units, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // BigInt reference
    val n = BigInt(rows.size)
    val sx = rows.map(r => BigInt(r._2)).sum; val sy = rows.map(r => BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._2) * r._2).sum
    val sxy = rows.map(r => BigInt(r._2) * r._3).sum
    val nn = n * sxy - sx * sy; val d = n * sxx - sx * sx
    def fd(a: BigInt, b: BigInt) = { val q = a / b; if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q }
    rows.groupBy(_._1).foreach { case (arm, rs) =>
      val na = BigInt(rs.size); val sxa = rs.map(r => BigInt(r._2)).sum
      val sya = rs.map(r => BigInt(r._3)).sum
      val exp = (na.toLong, fd(1000 * sya, na).toLong, fd(1000000 * nn, d).toLong,
        fd(1000 * (sya * n * d - nn * (n * sxa - na * sx)), na * n * d).toLong)
      assert(got(arm) == exp, s"arm=$arm")
    }
  }
}
