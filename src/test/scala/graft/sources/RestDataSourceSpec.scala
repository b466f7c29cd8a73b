package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

class RestDataSourceSpec extends SparkSpecBase {

  /** 5 pages × 2 orders; records every request's params. */
  private def fixtureTransport(calls: ConcurrentLinkedQueue[Map[String, String]]) =
    new RestPager.Transport {
      def get(url: String, params: Map[String, String]): RestPager.Response = {
        calls.add(params)
        val page = params("page").toInt
        val after = params.get("modified_after")
        val rows = (1 to 2).map { i =>
          val id = (page - 1) * 2 + i
          s"""{"id": $id, "status": "ok", "modified": "2026-0$page-01"}"""
        }
        // watermark pushdown simulation: API returns only matching rows
        val filtered = after match {
          case Some(a) => rows.filter(_ => s"2026-0$page-01" >= a)
          case None => rows
        }
        RestPager.Response(200, filtered.mkString("[", ",", "]"),
          headers = Map("X-WP-TotalPages" -> "5"))
      }
    }

  test("partition-parallel page scan with filter pushdown to query params") {
    val calls = new ConcurrentLinkedQueue[Map[String, String]]()
    RestDataSource.register("fixture1", fixtureTransport(calls))

    val df = spark.read.format("graft.sources.RestDataSource")
      .schema("id LONG, status STRING, modified STRING")
      .option("url", "http://api/orders")
      .option("transport", "fixture1")
      .option("perPage", "2")
      .option("pagesPerPartition", "2")
      .load()
      .filter(col("modified") >= "2026-03-01")

    val rows = df.collect()
    // pages 3,4,5 qualify -> 6 rows; API-side filtering happened
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(5L, 6L, 7L, 8L, 9L, 10L))

    // the watermark predicate travelled to the API on data requests
    val dataCalls = calls.asScala.toSeq
    assert(dataCalls.count(_.contains("modified_after")) >= 5)

    // partition planning: 5 pages / 2 per partition = 3 partitions
    assert(df.rdd.getNumPartitions == 3)

    // pushed filter visible in the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RestScan") || plan.contains("BatchScan"))
  }

  test("EqualTo filter stays a residual: an API that ignores the param cannot leak rows") {
    val calls = new ConcurrentLinkedQueue[Map[String, String]]()
    // transport that IGNORES the status param entirely (returns all rows)
    RestDataSource.register("fixture-ignoring", fixtureTransport(calls))

    val df = spark.read.format("graft.sources.RestDataSource")
      .schema("id LONG, status STRING, modified STRING")
      .option("url", "http://api/orders")
      .option("transport", "fixture-ignoring")
      .option("perPage", "2")
      .load()
      .filter(col("status") === "missing-status")

    // the fixture returns status "ok" everywhere and ignores ?status=...;
    // Spark must re-apply the EqualTo above the scan -> zero rows
    assert(df.count() == 0)
    // ...but the param still travelled to the API as an optimization
    assert(calls.asScala.exists(_.get("status").contains("missing-status")))
  }

  test("timestamp decode keeps microsecond precision and accepts ISO offsets") {
    RestDataSource.register("fixture-ts", new RestPager.Transport {
      def get(url: String, params: Map[String, String]): RestPager.Response =
        RestPager.Response(200,
          """[{"id": 1, "ts": "2026-01-02T03:04:05.123456Z"},
            | {"id": 2, "ts": "2026-01-02T03:04:05.123456+02:00"},
            | {"id": 3, "ts": null}]""".stripMargin,
          headers = Map("X-WP-TotalPages" -> "1"))
    })
    val rows = spark.read.format("graft.sources.RestDataSource")
      .schema("id LONG, ts TIMESTAMP")
      .option("url", "http://api/runs").option("transport", "fixture-ts")
      .load()
      .select(col("id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val zuluUs = java.time.Instant.parse("2026-01-02T03:04:05.123456Z")
    assert(rows(1L).contains(zuluUs.getEpochSecond * 1000000L + zuluUs.getNano / 1000L))
    // +02:00 offset = two hours earlier in UTC, sub-ms digits preserved
    assert(rows(2L).contains(rows(1L).get - 2L * 3600L * 1000000L))
    assert(rows(3L).isEmpty)
  }

  test("schema is required (reference schemas are explicit)") {
    intercept[Exception] {
      spark.read.format("graft.sources.RestDataSource")
        .option("url", "u").option("transport", "missing").load()
    }
  }
}
