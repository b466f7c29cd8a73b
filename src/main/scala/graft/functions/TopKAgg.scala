package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k (score, id) aggregator — the map-side-combining form
  * of the per-query rank window every ANN search ends with.
  *
  * A `row_number() OVER (PARTITION BY query ORDER BY score DESC, id)`
  * top-k must SHUFFLE EVERY SCORED CANDIDATE to the query's partition
  * and sort it there: at brute-force scale that is |queries|·|corpus|
  * rows through the exchange for an answer of size |queries|·k. This
  * aggregator keeps the k best pairs as its buffer, so each map
  * partition forwards at most k rows per query and the exchange
  * carries |queries|·k·partitions worst case — row-count independent,
  * the [[KmvAgg]] argument applied to ranking (that one keeps the k
  * SMALLEST hashes; this one keeps the k best (score desc, id asc)
  * pairs, which no built-in bounded aggregate maintains).
  *
  * Ordering parity with the window it replaces (spec-pinned): scores
  * compare like Spark SQL doubles — NaN sorts largest, −0.0 is
  * normalized to 0.0 on insert so the two zeros tie (Spark comparisons
  * treat them as equal; `java.lang.Double.compare` alone would not) —
  * and exact ties break to the SMALLEST id. A null score or id
  * contributes nothing (the candidate generators never emit one; a
  * window would rank null scores below all non-null and could surface
  * them only when a query has fewer than k candidates).
  *
  * Buffer: parallel arrays sorted by (score desc, id asc), length ≤ k.
  * A full buffer rejects a candidate no better than its last element
  * in O(1) — the steady-state path once the k best stabilize. */
case class TopKAgg(k: Int)
    extends Aggregator[(java.lang.Double, java.lang.Long),
                       (Array[Double], Array[Long]), Array[(Double, Long)]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  /** (s1, i1) strictly better than (s2, i2): higher score first, then
    * smaller id; NaN counts as the largest score (Spark sort order). */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c > 0 else i1 < i2
  }

  override def reduce(b: (Array[Double], Array[Long]),
                      a: (java.lang.Double, java.lang.Long)): (Array[Double], Array[Long]) = {
    if (a._1 == null || a._2 == null) return b
    // -0.0 == 0.0 is true, so this folds -0.0 into +0.0 (Spark parity)
    val s = if (a._1.doubleValue == 0.0d) 0.0d else a._1.doubleValue
    val id = a._2.longValue
    val (bs, bi) = b
    val n = bs.length
    if (n >= k && !better(s, id, bs(n - 1), bi(n - 1))) return b
    // insertion point: first existing element the candidate beats
    var ip = 0
    while (ip < n && better(bs(ip), bi(ip), s, id)) ip += 1
    val m = math.min(n + 1, k)
    val os = new Array[Double](m); val oi = new Array[Long](m)
    System.arraycopy(bs, 0, os, 0, ip); System.arraycopy(bi, 0, oi, 0, ip)
    os(ip) = s; oi(ip) = id
    System.arraycopy(bs, ip, os, ip + 1, m - ip - 1)
    System.arraycopy(bi, ip, oi, ip + 1, m - ip - 1)
    (os, oi)
  }

  override def merge(x: (Array[Double], Array[Long]),
                     y: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val m = math.min(x._1.length + y._1.length, k)
    val os = new Array[Double](m); val oi = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y._1.length ||
        (i < x._1.length && better(x._1(i), x._2(i), y._1(j), y._2(j)))
      if (takeX) { os(o) = x._1(i); oi(o) = x._2(i); i += 1 }
      else { os(o) = y._1(j); oi(o) = y._2(j); j += 1 }
      o += 1
    }
    (os, oi)
  }

  override def finish(b: (Array[Double], Array[Long])): Array[(Double, Long)] =
    b._1.indices.map(i => (b._1(i), b._2(i))).toArray

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}

/** [[TopKAgg]] with a third slot: each kept (score, id) pair carries an
  * opaque long payload through the bounded aggregation — the column a
  * downstream consumer needs per neighbor (hard-negative mining's label)
  * that the two-array buffer couldn't hold, which forced that one site
  * back onto the shuffle-everything rank window. The payload NEVER
  * participates in ordering: ranking parity with [[TopKAgg]] (and the
  * window) is exactly the (score desc, id asc) order, payload along for
  * the ride. A null score or id still contributes nothing; a null
  * payload also skips the row — the buffer arrays are primitive, and no
  * current caller can produce one (hardNegatives' label-inequality join
  * is null-rejecting), so a sentinel would be an invented value.
  *
  * Payload is a LONG: every integral label casts in and back out
  * losslessly, and the buffer stays three primitive arrays (no
  * per-element object serialization on the combine path). Non-integral
  * payloads keep the window form — same policy as [[TopKAgg]]'s
  * long-id gate. */
case class TopKPayloadAgg(k: Int)
    extends Aggregator[(java.lang.Double, java.lang.Long, java.lang.Long),
                       (Array[Double], Array[Long], Array[Long]),
                       Array[(Double, Long, Long)]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def zero: (Array[Double], Array[Long], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray, Array.emptyLongArray)

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c > 0 else i1 < i2
  }

  override def reduce(b: (Array[Double], Array[Long], Array[Long]),
                      a: (java.lang.Double, java.lang.Long, java.lang.Long))
      : (Array[Double], Array[Long], Array[Long]) = {
    if (a._1 == null || a._2 == null || a._3 == null) return b
    val s = if (a._1.doubleValue == 0.0d) 0.0d else a._1.doubleValue
    val id = a._2.longValue
    val pl = a._3.longValue
    val (bs, bi, bp) = b
    val n = bs.length
    if (n >= k && !better(s, id, bs(n - 1), bi(n - 1))) return b
    var ip = 0
    while (ip < n && better(bs(ip), bi(ip), s, id)) ip += 1
    val m = math.min(n + 1, k)
    val os = new Array[Double](m); val oi = new Array[Long](m); val op = new Array[Long](m)
    System.arraycopy(bs, 0, os, 0, ip); System.arraycopy(bi, 0, oi, 0, ip)
    System.arraycopy(bp, 0, op, 0, ip)
    os(ip) = s; oi(ip) = id; op(ip) = pl
    System.arraycopy(bs, ip, os, ip + 1, m - ip - 1)
    System.arraycopy(bi, ip, oi, ip + 1, m - ip - 1)
    System.arraycopy(bp, ip, op, ip + 1, m - ip - 1)
    (os, oi, op)
  }

  override def merge(x: (Array[Double], Array[Long], Array[Long]),
                     y: (Array[Double], Array[Long], Array[Long]))
      : (Array[Double], Array[Long], Array[Long]) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val m = math.min(x._1.length + y._1.length, k)
    val os = new Array[Double](m); val oi = new Array[Long](m); val op = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y._1.length ||
        (i < x._1.length && better(x._1(i), x._2(i), y._1(j), y._2(j)))
      if (takeX) { os(o) = x._1(i); oi(o) = x._2(i); op(o) = x._3(i); i += 1 }
      else { os(o) = y._1(j); oi(o) = y._2(j); op(o) = y._3(j); j += 1 }
      o += 1
    }
    (os, oi, op)
  }

  override def finish(b: (Array[Double], Array[Long], Array[Long])): Array[(Double, Long, Long)] =
    b._1.indices.map(i => (b._1(i), b._2(i), b._3(i))).toArray

  override def bufferEncoder: Encoder[(Array[Double], Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long], Array[Long])]()
  override def outputEncoder: Encoder[Array[(Double, Long, Long)]] =
    ExpressionEncoder[Array[(Double, Long, Long)]]()
}

object TopKAgg {
  /** The aggregate as a Column function: `topk(k)(score, id)` returns
    * the ranked array<struct<_1: score, _2: id>> — position + 1 IS the
    * row_number the window form would have assigned. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(TopKAgg(k),
      Encoders.tuple(Encoders.DOUBLE, Encoders.LONG))

  /** `topkWithPayload(k)(score, id, payload)` — [[TopKPayloadAgg]] as a
    * Column function; array<struct<_1: score, _2: id, _3: payload>>. */
  def topkWithPayload(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(TopKPayloadAgg(k),
      Encoders.tuple(Encoders.DOUBLE, Encoders.LONG, Encoders.LONG))
}
