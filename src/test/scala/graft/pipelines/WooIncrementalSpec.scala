package graft.pipelines

import graft.SparkSpecBase
import graft.sources.RestPager
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.mutable

class WooIncrementalSpec extends SparkSpecBase {

  private def order(id: Int, modified: String, total: String) =
    s"""{"id": $id, "order_key": "wc_$id", "status": "completed", "currency": "USD",
        "date_created": "2026-06-01T10:00:00", "date_modified": "$modified",
        "date_paid": "2026-06-01T10:05:00",
        "total": "$total", "total_tax": "1.00", "shipping_total": "2.00",
        "customer_id": ${id * 10},
        "billing": {"city": "C$id", "country": "US", "email": "b@x"},
        "shipping": {"city": "S$id", "country": "US"},
        "cru_data": {"agent": {"email": "a@x", "name": "A"},
                      "ordered_by": {"email": "o@x"},
                      "shipping": {"date_shipped": "0000-00-00 00:00:00"},
                      "customer_role": "retail",
                      "discounts": []},
        "meta_data": [{"key": "event_code", "value": "E$id"}],
        "line_items": [{"id": ${id}01, "product_id": 9, "name": "P", "sku": "S",
                         "price": "5.00", "quantity": 2, "total_tax": "0.10"}]}"""
      .replaceAll("\n\\s*", " ")

  /** Serves orders modified after the param; records requests. */
  private class Api(orders: Seq[(Int, String, String)]) extends RestPager.Transport {
    val calls = mutable.Buffer[Map[String, String]]()
    def get(url: String, params: Map[String, String]): RestPager.Response = {
      calls += params
      val after = params.get("modified_after")
      val live = orders.filter { case (_, m, _) => after.forall(m > _) }
      RestPager.Response(200, live.map((order _).tupled).mkString("[", ",", "]"),
        headers = Map("X-WP-TotalPages" -> "1"))
    }
  }

  test("incremental sync: full extract then watermark-pushed delta, versioned append") {
    val root = Files.createTempDirectory("graft-woo").toString
    val api = new Api(Seq(
      (1, "2026-06-02T00:00:00", "10.00"),
      (2, "2026-06-03T00:00:00", "20.00")))

    // first sync: no watermark, everything extracted
    val r1 = WooIncremental.sync(spark, api, "http://api/orders", root, "2026-06-04T00:00:00")
    assert(r1.watermark.isEmpty && r1.ordersAppended == 2 && r1.itemsAppended == 2)
    assert(!api.calls.head.contains("modified_after"))

    // second sync: order 2 re-modified + new order 3; watermark t1 pushed
    val api2 = new Api(Seq(
      (2, "2026-06-05T00:00:00", "25.00"),
      (3, "2026-06-06T00:00:00", "30.00")))
    val r2 = WooIncremental.sync(spark, api2, "http://api/orders", root, "2026-06-07T00:00:00")
    assert(r2.watermark.contains("2026-06-04T00:00:00"))
    assert(api2.calls.head("modified_after") == "2026-06-04T00:00:00") // P5 pushdown
    assert(r2.ordersAppended == 2)

    // versioned append: 4 physical rows, latest-view resolves to 3
    val all = spark.read.parquet(s"$root/orders")
    assert(all.count() == 4)
    val latest = WooIncremental.latestOrders(all)
    assert(latest.count() == 3)
    val o2 = latest.filter(col("order_id") === 2L).head()
    assert(o2.getAs[java.math.BigDecimal]("total").doubleValue() == 25.0) // new version wins
    assert(o2.getAs[String]("sync_timestamp") == "2026-06-07T00:00:00")

    // completion events emitted per sync (T7)
    assert(new java.io.File(s"$root/_events").list().length == 2)
  }
}
