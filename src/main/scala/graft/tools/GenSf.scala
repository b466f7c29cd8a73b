package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Deterministic fixture generator — the r11 directive #4 "true sf1"
  * path: reproduce the driver fixture's schemas, logical parquet types
  * (naive µs timestamps), value domains, and statistical shape at ANY
  * scale factor, so the full 150-query catalog + its DuckDB oracles
  * run unchanged on `<out>/` exactly as they do on
  * `/root/testdata/sf*`.
  *
  * Shape calibrated against the driver ladder (measured at
  * sf0.001/0.01/0.1, see PLANS.md):
  *  - lineitem rows are INDEPENDENT of orders (random l_orderkey,
  *    (orderkey, linenumber) non-unique, l_shipdate decoupled from
  *    o_orderdate — min/max deltas −2383..+2478 days in the real
  *    fixture), 600000·sf rows exactly; lines/order ~ Binomial≈Poisson(4).
  *  - orders: o_totalprice uniform [1000, 500000), o_orderdate
  *    uniform over 1995-01-01..2001-08-01 (2404 days).
  *  - events: 30-day span from 2024-01-01, ts monotone in event_id
  *    with sub-slot jitter, value ~ Exponential(mean 50) rounded to
  *    cents, users = customers/10.
  *  - documents: Zipf token ranks over a vocabulary scaling with sf
  *    (V = max(31, 310·sf) — 31 at the ladder's sf0.1, like the driver
  *    fixture; real corpora grow vocabulary with size and a fixed one
  *    saturates the shingle space), 10..100 words, ~1/625 rows are
  *    an exact clone of the previous row's text (sf0.1 real: 8 dup
  *    groups / 5000 docs), lang 41/15/15/15/14 en/zh/fr/es/de,
  *    20 sources; count max(500, 50000·sf).
  *  - embeddings: 64-dim float, i.i.d. ≈N(0, 0.125²) per element
  *    (Irwin-Hall sum of 6 uniforms — matches the real fixture's
  *    ±4.2σ extremes), labels 0..9; count max(500, 20000·sf).
  *
  * Determinism: every value is a pure function of (table tag, row id)
  * through xxhash64 — no RNG state, no partition sensitivity, same
  * bytes on every run and every executor layout. (The ORACLE never
  * re-generates anything — both engines read the same parquet — so
  * only within-Spark determinism matters, and xxhash64 is fixed-seed.
  * The one transcendental, ln for the exponential event values, is
  * generation-only: gated queries read the materialized parquet.)
  *
  * Scale shape of the generator itself: `spark.range` + map-only
  * column expressions — zero shuffles. Tables land as SINGLE parquet
  * files (the fixture layout the DuckDB views expect): computed
  * distributed, pinned with localCheckpoint, then streamed through a
  * coalesce(1) write and the lone part file moved to
  * `<out>/<table>.parquet`.
  *
  * Usage: GenSf <outDir> [sf]   (sf=1.0 → 6M lineitem / 1.5M orders /
  * 1M events / 50K docs / 20K embeddings; row counts scale linearly
  * with sf, matching the driver's 0.001/0.01/0.1 ladder.)
  */
object GenSf {

  private def h(tag: String, id: Column): Column = xxhash64(lit(tag), id)
  /** Non-negative hash in [0, m). */
  private def hm(tag: String, id: Column, m: Long): Column =
    pmod(h(tag, id), lit(m))

  private val MktSegments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val PAdjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val PNouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val DocVocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
    "dup", "fast", "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")

  private def pick(values: Seq[String], tag: String, id: Column): Column =
    element_at(array(values.map(lit): _*), (hm(tag, id, values.size.toLong) + 1).cast("int"))

  /** Naive (NTZ) timestamp from epoch-µs — the fixture's parquet
    * logical type (isAdjustedToUTC=false); session TZ is pinned UTC by
    * Tables.tune so the cast chain is value-preserving. */
  private def ntz(us: Column): Column = timestamp_micros(us).cast(TimestampNTZType)

  private val Day = 86400000000L // µs
  private val Epoch1995 = 788918400000000L // 1995-01-01T00:00:00Z in µs
  private val Epoch2024 = 1704067200000000L // 2024-01-01T00:00:00Z in µs

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GenSf <outDir> [sf]")
    val out = args(0)
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, out, sf)
    spark.stop()
  }

  def writeAll(spark: SparkSession, out: String, sf: Double): Unit = {
    val nCust = math.max(1, (150000 * sf).toLong)
    val nSupp = math.max(1, (10000 * sf).toLong)
    val nPart = math.max(1, (200000 * sf).toLong)
    val nOrders = math.max(1, (1500000 * sf).toLong)
    val nLine = math.max(1, (6000000 * sf).toLong)
    val nEvents = math.max(1, (1000000 * sf).toLong)
    val nDocs = math.max(500, (50000 * sf).toLong)
    val nEmb = math.max(500, (20000 * sf).toLong)
    val nUsers = math.max(1, nCust / 10) // fixture: 1500 users at 15000 customers

    write(out, "region", spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST").map(lit): _*),
        col("id").cast("int") + 1).as("r_name")))

    write(out, "nation", spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")))

    write(out, "customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      hm("c_nat", col("id"), 25).cast("int").as("c_nationkey"),
      ((hm("c_bal", col("id"), 1100000L) - 100000L) / 100.0).as("c_acctbal"),
      pick(MktSegments, "c_seg", col("id")).as("c_mktsegment")))

    write(out, "supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      hm("s_nat", col("id"), 25).cast("int").as("s_nationkey"),
      ((hm("s_bal", col("id"), 1100000L) - 100000L) / 100.0).as("s_acctbal")))

    write(out, "part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(PAdjs, "p_adj", col("id")), lit(" "),
        pick(PNouns, "p_noun", col("id"))).as("p_name"),
      concat(lit("Brand#"), hm("p_brand", col("id"), 25)).as("p_brand"),
      pick(PTypes, "p_type", col("id")).as("p_type"),
      (hm("p_size", col("id"), 50) + 1).cast("int").as("p_size"),
      (lit(900.0) + (col("id") % 1000) / 10.0).as("p_retailprice")))

    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      hm("o_cust", col("id"), nCust).as("o_custkey"),
      pick(Seq("F", "O", "P"), "o_stat", col("id")).as("o_orderstatus"),
      ((hm("o_total", col("id"), 49900000L) + 100000L) / 100.0).as("o_totalprice"),
      ntz(lit(Epoch1995) + hm("o_date", col("id"), 2404) * Day).as("o_orderdate"),
      pick(Priorities, "o_prio", col("id")).as("o_orderpriority"))
    write(out, "orders", orders)

    // lineitem is generated INDEPENDENTLY of orders, exactly like the
    // driver fixture: l_orderkey is a hash into [0, nOrders) (so
    // lines/order ~ Binomial(nLine, 1/nOrders) ≈ Poisson(4),
    // (orderkey, linenumber) is NOT unique, and l_shipdate does not
    // depend on the order's date — the real fixture has shipdate
    // BEFORE orderdate on ~half the joined rows). Shipdate domain =
    // orderdate domain shifted +1..+95 days (measured envelope
    // 1995-01-02..2001-11-04).
    write(out, "lineitem", spark.range(nLine).select(
      hm("l_ord", col("id"), nOrders).as("l_orderkey"),
      hm("l_part", col("id"), nPart).as("l_partkey"),
      hm("l_supp", col("id"), nSupp).as("l_suppkey"),
      (hm("l_n", col("id"), 7) + 1).cast("int").as("l_linenumber"),
      (hm("l_qty", col("id"), 50) + 1).cast("double").as("l_quantity"),
      ((hm("l_ext", col("id"), 10410000L) + 90000L) / 100.0).as("l_extendedprice"),
      (hm("l_disc", col("id"), 11) / 100.0).as("l_discount"),
      (hm("l_tax", col("id"), 9) / 100.0).as("l_tax"),
      pick(Seq("A", "N", "R"), "l_rf", col("id")).as("l_returnflag"),
      pick(Seq("F", "O"), "l_ls", col("id")).as("l_linestatus"),
      ntz(lit(Epoch1995) + (hm("l_day", col("id"), 2404) + 1 + hm("l_ship", col("id"), 95))
        * Day).as("l_shipdate")))

    // events: 30-day span, ts monotone in event_id with sub-slot
    // jitter (the real fixture has ZERO ts inversions by id); value ~
    // Exponential(mean 50) rounded to cents (measured avg 49.9–50.1,
    // max ~5.6 × mean ≈ the e⁻¹¹ tail at 1e6 draws). ln here is
    // generation-only — both engines read the materialized parquet.
    val spanUs = 30L * Day
    val u = (hm("e_val", col("id"), 1000000L) + 1L) / 1000001.0
    write(out, "events", spark.range(nEvents).select(
      col("id").as("event_id"),
      ntz(lit(Epoch2024) + col("id") * (spanUs / nEvents) +
        hm("e_jit", col("id"), math.max(1L, spanUs / nEvents))).as("ts"),
      hm("e_user", col("id"), nUsers).as("user_id"),
      pick(EventTypes, "e_type", col("id")).as("event_type"),
      greatest(lit(0.01), round(-log(u) * 50.0, 2)).as("value"),
      concat(lit("{\"k\": "), hm("e_k", col("id"), 100), lit("}")).as("props")))

    // documents: Zipf-distributed token ranks over a vocabulary that
    // SCALES with the corpus (r13 verdict #2): a fixed 31-word vocab
    // exhausts the 31³ 3-gram space once the corpus outgrows it, so
    // per-shingle df grows linearly and the dedup-family invariant
    // Σ min(df,cap)² quadratically — unlike any real Zipf corpus. Here
    // V = max(31, 310·sf) (31 at the driver ladder's sf0.1) and token
    // rank r = ⌊V^u⌋, the inverse-CDF draw for P(r) ∝ 1/r; ranks ≤ 31
    // keep the original word list (Zipf puts them most-frequent), the
    // tail renders as "w<rank>". pow is generation-only, like the
    // events table's ln. 8..100 words; ~1/625 rows still clone the
    // previous row's text (the planted exact-dup pairs) — the text is
    // a pure function of a SEED id, so the clone re-derives its
    // neighbor's words without a cross-row join.
    val vocabSize = math.max(31L, (310 * sf).toLong)
    val seed = when(hm("d_dup", col("id"), 625) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val nWords = (hm("d_len", seed, 91) + 10).cast("int")
    val text = array_join(transform(sequence(lit(1), nWords),
      i => {
        val u = (pmod(xxhash64(lit("d_w"), seed, i), lit(1000000L)) + 1L) / 1000001.0
        val rank = least(lit(vocabSize),
          greatest(lit(1L), floor(pow(lit(vocabSize.toDouble), u)).cast("long")))
        when(rank <= DocVocab.size,
            element_at(array(DocVocab.map(lit): _*), rank.cast("int")))
          .otherwise(concat(lit("w"), rank))
      }), " ")
    write(out, "documents", spark.range(nDocs).select(
      col("id").as("doc_id"),
      text.as("text"),
      when(hm("d_lang", col("id"), 100) < 41, "en")
        .when(hm("d_lang", col("id"), 100) < 56, "zh")
        .when(hm("d_lang", col("id"), 100) < 71, "fr")
        .when(hm("d_lang", col("id"), 100) < 86, "es")
        .otherwise("de").as("lang"),
      concat(lit("src"), col("id") % 20).as("source"),
      length(text).cast("long").as("n_chars")))

    // embeddings: 64-dim float vectors, per-element ≈N(0, 0.125²) via
    // an Irwin-Hall sum of 6 unit uniforms (std √(6/12), rescaled;
    // support ±4.24σ — matches the real fixture's measured ±4.2σ
    // extremes and 0.125 per-element std), labels 0..9
    val gauss = (d: Column) => {
      val s = (1 to 6).map(j =>
        pmod(xxhash64(lit(s"v$j"), col("id"), d), lit(1000000L)) / 1000000.0)
        .reduce(_ + _)
      (((s - 3.0) / math.sqrt(0.5)) * 0.125).cast("float")
    }
    write(out, "embeddings", spark.range(nEmb).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), d => gauss(d)).as("embedding"),
      hm("e_lbl", col("id"), 10).cast("int").as("label")))
  }

  /** Compute distributed, land as ONE parquet file at
    * `<out>/<name>.parquet` (the layout both Tables and the DuckDB
    * oracle views read). */
  private def write(out: String, name: String, df: DataFrame): Unit = {
    val spark = df.sparkSession
    val tmp = s"$out/.__gen_$name"
    df.localCheckpoint().coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    require(part.length == 1, s"expected one part file for $name, got ${part.length}")
    val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
    fs.delete(dest, false)
    fs.rename(part.head, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    println(s"[gensf] $name -> $dest")
  }
}
