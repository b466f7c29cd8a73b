package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer et
  * al. SIGMOD 2007): keep the k smallest DISTINCT 60-bit hashes of a
  * column; `(k−1)·2⁶⁰ / h₍ₖ₎` estimates the distinct count, and two
  * sketches union by "k smallest of the merged sets", which makes the
  * family closed under set union — the property [[graft.ops.Sketches]]
  * exploits for cross-corpus overlap estimates that HLL registers
  * cannot give (HLL unions, but an intersection needs
  * inclusion-exclusion over already-noisy terms; KMV reads the Jaccard
  * straight off the union sketch, Beyer's θ-sketch construction).
  *
  * Engine-portable like the rest of the sketch toolbox: the input is
  * the shared [[graft.functions.TextFunctions.md5Long]] 60-bit hash
  * family, the state is "k smallest distinct longs" — a pure function
  * of the input SET, so the result is independent of partitioning,
  * arrival order, and duplication (spec-pinned), and an oracle replays
  * it with `row_number() OVER (ORDER BY h) <= k`.
  *
  * This is the one typed `Aggregator` in the codebase (§2.10): the
  * sketch needs a bounded ORDERED buffer, which no built-in aggregate
  * maintains — `collect_set` holds the whole value set (unbounded
  * state, the thing a sketch exists to avoid). As an Aggregator it
  * map-side combines like any hash aggregate, so the shuffle carries
  * at most k longs per partition per group — O(k), row-count
  * independent, the 100 TB shape.
  *
  * Buffer: ascending sorted distinct Array[Long], length ≤ k. A full
  * buffer rejects v ≥ max in O(log k) (binary search, no allocation) —
  * the steady-state path once the k smallest stabilize. */
case class KmvAgg(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2 (k=1 cannot estimate), got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: java.lang.Long): Array[Long] =
    if (a == null) b else insert(b, a.longValue)

  private def insert(b: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, v)
    if (pos >= 0) return b // already present
    val ip = -pos - 1 // insertion point
    if (b.length >= k && ip >= k) return b // not among the k smallest
    val n = math.min(b.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(b, 0, out, 0, ip)
    out(ip) = v
    System.arraycopy(b, ip, out, ip + 1, n - ip - 1)
    out
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvAgg {
  /** The sketch as an aggregate Column function over a LongType hash
    * column (NULL hashes contribute nothing, countDistinct semantics).
    * Result: ascending distinct Array[Long], length min(k, ndv). */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(KmvAgg(k), Encoders.LONG)
}
