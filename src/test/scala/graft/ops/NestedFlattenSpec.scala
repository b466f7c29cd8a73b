package graft.ops

import graft.SparkSpecBase

class NestedFlattenSpec extends SparkSpecBase {
  import spark.implicits._

  /** Fixture order shaped on FIXTURES.md §2 / woo order JSON. */
  private val orderJson =
    """{"id": 1001, "order_key": "wc_abc", "status": "completed",
       "currency": "USD",
       "date_created": "2026-06-01T10:00:00", "date_modified": "2026-06-02T11:30:00",
       "date_paid": "2026-06-01T10:05:00",
       "total": "27.33", "total_tax": "1.33", "shipping_total": "5.00",
       "customer_id": 42,
       "billing": {"city": "Orlando", "country": "US", "email": "b@x.org"},
       "shipping": {"city": "Miami", "country": "US"},
       "cru_data": {
         "agent": {"email": "agent@x.org", "name": "A"},
         "ordered_by": {"email": "ob@x.org"},
         "shipping": {"date_shipped": "0000-00-00 00:00:00"},
         "customer_role": "wholesale customer",
         "discounts": [{"amount": "2.00", "code": "SAVE"}, {"amount": "9.99", "code": "LATER"}]},
       "meta_data": [{"key": "event_code", "value": "E1"},
                      {"key": "other", "value": "x"},
                      {"key": "event_code", "value": "E2"}],
       "line_items": [
         {"id": 7001, "product_id": 555, "name": "Book", "sku": "BK-1",
          "price": "9.99", "quantity": 2, "total_tax": "0.40"},
         {"id": 7002, "product_id": 556, "name": "Pen", "sku": "PN-9",
          "price": "", "quantity": 1, "total_tax": "0.00"}]}""".replaceAll("\n\\s*", " ")

  private lazy val orders = spark.read.json(Seq(orderJson).toDS)

  test("flattenOrders: nested paths, EAV last-match, sentinel dates, money decimals") {
    val r = NestedFlatten.flattenOrders(orders).head()
    assert(r.getAs[Long]("order_id") == 1001L)
    assert(r.getAs[String]("billing_city") == "Orlando")
    assert(r.getAs[String]("agent_email") == "agent@x.org")
    assert(r.getAs[String]("event_code") == "E2")        // LAST match wins
    assert(r.getAs[String]("order_origin") == "WEB")     // default applied
    assert(r.getAs[String]("customer_role") == "Wholesale Customer") // initcap
    assert(r.getAs[java.sql.Timestamp]("date_shipped") == null)      // sentinel -> null
    assert(r.getAs[java.math.BigDecimal]("total").doubleValue() == 27.33)
    assert(r.getAs[String]("discount_amount") == "2.00") // first discount wins
  }

  test("explodeLineItems: one row per item, money coercion with garbage->0") {
    val items = NestedFlatten.explodeLineItems(orders).collect()
    assert(items.length == 2)
    val pen = items.find(_.getAs[Long]("line_item_id") == 7002L).get
    assert(pen.getAs[java.math.BigDecimal]("price").doubleValue() == 0.0) // "" -> 0
    assert(pen.getAs[String]("product_name") == "Pen")
  }

  test("negateMoney flips refund amounts") {
    val df = Seq("12.50").toDF("amount")
    assert(df.select(NestedFlatten.negateMoney($"amount").as("a"))
      .head().getAs[java.math.BigDecimal]("a").doubleValue() == -12.5)
  }
}
