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

    // completion events emitted per sync (T7; ignore local-FS .crc sidecars)
    assert(new java.io.File(s"$root/_events").list()
      .count(f => f.startsWith("done-") && f.endsWith(".json")) == 2)
  }

  test("watermark is found through the Hadoop FS API on a scheme-qualified target") {
    // a `file:`-scheme root is invisible to java.io.File (the old probe),
    // which would silently degrade every sync to a full extract on any
    // non-local filesystem; the Hadoop FileSystem probe must find it
    val root = "file:" + Files.createTempDirectory("graft-woo-fs").toString
    val api = new Api(Seq((1, "2026-06-02T00:00:00", "10.00")))
    val r1 = WooIncremental.sync(spark, api, "http://api/orders", root, "2026-06-03T00:00:00")
    assert(r1.watermark.isEmpty && r1.ordersAppended == 1)

    val api2 = new Api(Seq((2, "2026-06-04T00:00:00", "20.00")))
    val r2 = WooIncremental.sync(spark, api2, "http://api/orders", root, "2026-06-05T00:00:00")
    assert(r2.watermark.contains("2026-06-03T00:00:00")) // found, not None
    assert(api2.calls.head("modified_after") == "2026-06-03T00:00:00")
  }

  /** Static one-page transport for the full-scan product/refund syncs. */
  private class FullApi(body: String) extends RestPager.Transport {
    def get(url: String, params: Map[String, String]): RestPager.Response =
      RestPager.Response(200, body, headers = Map("X-WP-TotalPages" -> "1"))
  }

  test("product sync lands all four tables; ragged pages without child arrays land zero child rows") {
    val root = Files.createTempDirectory("graft-woo-prod").toString
    val withChildren =
      """{"id": 1, "name": "Bundle", "short_description": "b", "status": "publish",
          "type": "bundle", "price": "30.00", "regular_price": "30.00", "sku": "B-1",
          "weight": "", "stock_quantity": 5,
          "date_created": "2026-06-01T00:00:00", "date_modified": "2026-06-01T00:00:00",
          "meta_data": [{"key": "gift_card", "value": "1"},
                         {"key": "case_qty", "value": "6"}],
          "bundled_items": [{"bundled_item_id": 7, "product_id": 9, "quantity_default": 1}],
          "categories": [{"id": 4, "name": "Kits", "slug": "kits"}],
          "attributes": [{"id": 2, "name": "Color", "slug": "color", "options": ["Red"]}]}"""
        .replaceAll("\n\\s*", " ")
    val r1 = WooIncremental.syncProducts(spark, new FullApi(s"[$withChildren]"),
      "http://api/products", root, "2026-06-02T00:00:00")
    assert(r1 == WooIncremental.ProductSyncResult(1, 1, 1, 1))
    val p = spark.read.parquet(s"$root/products").head()
    assert(p.getAs[Boolean]("gift_card") && p.getAs[Long]("case_qty") == 6L)

    // second sync: a page whose ONLY product has no child arrays at all
    // (columns absent from the inferred schema, not just empty)
    val bare =
      """{"id": 1, "name": "Bundle v2", "short_description": "b", "status": "draft",
          "type": "bundle", "price": "35.00", "regular_price": "35.00", "sku": "B-1",
          "weight": "", "stock_quantity": 3,
          "date_created": "2026-06-01T00:00:00", "date_modified": "2026-06-03T00:00:00",
          "meta_data": [{"key": "gift_card", "value": "1"}]}""".replaceAll("\n\\s*", " ")
    val r2 = WooIncremental.syncProducts(spark, new FullApi(s"[$bare]"),
      "http://api/products", root, "2026-06-04T00:00:00")
    assert(r2 == WooIncremental.ProductSyncResult(1, 0, 0, 0))

    // versioned append + latest view resolves to the re-synced product
    val latest = WooIncremental.latestProducts(spark.read.parquet(s"$root/products"))
    assert(latest.count() == 1)
    assert(latest.head().getAs[String]("status") == "Draft") // str.title()
    assert(spark.read.parquet(s"$root/product_bundles").count() == 1) // v1's child rows remain
  }

  test("fullSync gates refund+product scans to UTC hours 11 and 17 (T6)") {
    // url-recording transport: every endpoint returns an empty page, so
    // the assertion is purely about WHICH scans the hour gate triggered
    class RecordingApi extends RestPager.Transport {
      val urls = mutable.Buffer[String]()
      def get(url: String, params: Map[String, String]): RestPager.Response = {
        urls += url
        RestPager.Response(200, "[]", headers = Map("X-WP-TotalPages" -> "1"))
      }
    }
    def run(hour: Int): (WooIncremental.FullSyncResult, Seq[String]) = {
      val root = Files.createTempDirectory(s"graft-woo-full-$hour").toString
      val api = new RecordingApi
      val r = WooIncremental.fullSync(spark, api, "http://api/orders",
        "http://api/refunds", "http://api/products", root,
        "2026-07-02T00:00:00", nowUtcHour = () => hour)
      (r, api.urls.toSeq)
    }

    val (r12, urls12) = run(12) // off-slot: orders only
    assert(r12.refunds.isEmpty && r12.products.isEmpty)
    assert(urls12 == Seq("http://api/orders"))

    for (hour <- Seq(11, 17)) { // on-slot: refunds + products fan out too
      val (r, urls) = run(hour)
      assert(r.refunds.contains(WooIncremental.RefundSyncResult(0, 0)))
      assert(r.products.contains(WooIncremental.ProductSyncResult(0, 0, 0, 0)))
      assert(urls == Seq("http://api/orders", "http://api/refunds", "http://api/products"))
    }
  }

  test("refund sync lands headers and exploded items with negated totals") {
    val root = Files.createTempDirectory("graft-woo-ref").toString
    val refund =
      """{"id": 9001, "parent_id": 777, "amount": "25.00",
          "date_created": "2026-07-01T09:00:00",
          "cru_data": {"agent_email": "a@x", "agent_name": "A",
                        "subtotal": "20.00", "subtotal_tax": "1.20"},
          "shipping_lines": [{"total": "3.80", "total_tax": "0.20"}],
          "line_items": [{"id": 501, "product_id": 55, "name": "Book", "sku": "BK-1",
                           "price": "9.99", "quantity": 2, "total_tax": "0.40",
                           "meta_data": [{"key": "_refunded_item_id", "value": "81"}]}]}"""
        .replaceAll("\n\\s*", " ")
    val r = WooIncremental.syncRefunds(spark, new FullApi(s"[$refund]"),
      "http://api/refunds", root, "2026-07-02T00:00:00")
    assert(r == WooIncremental.RefundSyncResult(1, 1))
    val head = spark.read.parquet(s"$root/refunds").head()
    assert(head.getAs[java.math.BigDecimal]("total").doubleValue() == -25.0)
    val item = spark.read.parquet(s"$root/refund_items").head()
    assert(item.getAs[Long]("order_item_id") == 81L)
    assert(item.getAs[String]("sync_timestamp") == "2026-07-02T00:00:00")
  }
}
