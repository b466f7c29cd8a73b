package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, StringType, StructType}

/** Nested-JSON flattening + EAV lookup operators, shaped on the
  * reference's order pipeline (SURVEY.md §2 P1/P2/P4):
  *
  *  - struct-path projection of deeply nested order documents
  *    (reference: woo-sync/main.py:570-677 pulls ~70 scalars like
  *    o['billing']['city'], o['cru_data']['agent']['email']);
  *  - EAV lookup over `meta_data: [{key, value}]` arrays with
  *    first/last-match and defaulting semantics
  *    (woo-sync/main.py:608-641);
  *  - money values as exact decimals, sentinel dates to null
  *    (woo-sync/main.py:267-273, 726-730);
  *  - line-item explosion (woo-sync/main.py:679-819).
  *
  * Everything is a single `select` over codegen'd higher-order
  * functions: on parquet/JSON sources Catalyst prunes unused struct
  * fields into the reader, so flattening 70 of 500 fields reads 70.
  */
object NestedFlatten {

  /** Money columns: BIGNUMERIC(76,38) in the reference narrowed to
    * Spark's max DecimalType(38,18) — documented deviation
    * (SURVEY.md §1.2): real money values are far below 38 digits. */
  val Money: DecimalType = DecimalType(38, 18)

  /** EAV last-match with default: the reference scans meta_data
    * sequentially keeping the last hit (event_code, main.py:629-633).
    * `element_at(filter(...), -1)` = last match, coalesce = default. */
  def eavLast(meta: Column, key: String, default: Column): Column =
    coalesce(try_element_at(filter(meta, m => m.getField("key") === key), lit(-1)).getField("value"), default)

  /** EAV first-match with default (discounts reversed-scan semantics,
    * main.py:608-622 — effectively the first array element wins). */
  def eavFirst(meta: Column, key: String, default: Column): Column =
    coalesce(try_element_at(filter(meta, m => m.getField("key") === key), lit(1)).getField("value"), default)

  /** Sentinel "0000-00-00 00:00:00" (and malformed values) -> null
    * timestamp; `try_to_timestamp` mirrors pandas errors='coerce'. */
  def coercedTimestamp(c: Column): Column =
    try_to_timestamp(when(c === "0000-00-00 00:00:00", lit(null)).otherwise(c))

  /** Money string -> exact decimal, empty/garbage -> 0 (the reference
    * wraps Decimal(str(x)) in try/except -> 0, main.py:726-730).
    * try_cast never throws under ANSI mode. */
  def money(c: Column): Column = coalesce(c.try_cast(Money), lit(0).cast(Money))

  /** Resolve a dotted path against the schema; None when absent. */
  private def pathType(schema: StructType, path: String): Option[DataType] =
    path.split('.').foldLeft(Option(schema: DataType)) {
      case (Some(st: StructType), name) => st.fields.find(_.name == name).map(_.dataType)
      case _ => None
    }

  /** Nested path column that degrades to a typed null when the path is
    * absent from this batch — API pages are ragged (the reference's
    * .get() chains default to None); a batch where every order lacks a
    * subtree must still conform. */
  private def optPath(df: DataFrame, path: String): Column =
    if (pathType(df.schema, path).isDefined) col(path) else lit(null).cast(StringType)

  /** First discount amount, tolerating both the absent-path case and
    * json inference collapsing an all-empty array to array<string>. */
  private def firstDiscountAmount(df: DataFrame): Column =
    pathType(df.schema, "cru_data.discounts") match {
      case Some(ArrayType(et: StructType, _)) if et.fieldNames.contains("amount") =>
        try_element_at(col("cru_data.discounts"), lit(1)).getField("amount")
      case _ => lit(null).cast(StringType)
    }

  /** Flatten an order document to the reference's scalar projection
    * shape: nested paths, EAV lookups, typed money/dates. Input is the
    * result of spark.read.json on order bodies. */
  def flattenOrders(orders: DataFrame): DataFrame =
    orders.select(
      col("id").cast("long").as("order_id"),
      optPath(orders, "order_key").as("order_key"),
      optPath(orders, "status").as("status"),
      optPath(orders, "currency").as("currency"),
      coercedTimestamp(optPath(orders, "date_created")).as("date_created"),
      coercedTimestamp(optPath(orders, "date_modified")).as("date_modified"),
      coercedTimestamp(optPath(orders, "date_paid")).as("date_paid"),
      money(optPath(orders, "total")).as("total"),
      money(optPath(orders, "total_tax")).as("total_tax"),
      money(optPath(orders, "shipping_total")).as("shipping_total"),
      optPath(orders, "customer_id").cast("long").as("customer_id"),
      optPath(orders, "billing.city").as("billing_city"),
      optPath(orders, "billing.country").as("billing_country"),
      optPath(orders, "billing.email").as("billing_email"),
      optPath(orders, "shipping.city").as("shipping_city"),
      optPath(orders, "shipping.country").as("shipping_country"),
      optPath(orders, "cru_data.agent.email").as("agent_email"),
      optPath(orders, "cru_data.ordered_by.email").as("ordered_by_email"),
      coercedTimestamp(optPath(orders, "cru_data.shipping.date_shipped")).as("date_shipped"),
      initcap(optPath(orders, "cru_data.customer_role")).as("customer_role"),
      eavLast(col("meta_data"), "event_code", lit("")).as("event_code"),
      eavLast(col("meta_data"), "cru_order_origin", lit("WEB")).as("order_origin"),
      firstDiscountAmount(orders).as("discount_amount"))

  /** Explode order line items, carrying the order key — the generator/
    * UDTF surface of the reference (woo-sync/main.py:679-819) realised
    * with the built-in explode (SURVEY.md §2.10). */
  def explodeLineItems(orders: DataFrame): DataFrame =
    orders.select(
      col("id").cast("long").as("order_id"),
      explode(col("line_items")).as("li"))
      .select(
        col("order_id"),
        col("li.id").cast("long").as("line_item_id"),
        col("li.product_id").cast("long").as("product_id"),
        col("li.name").as("product_name"),
        col("li.sku").as("sku"),
        money(col("li.price")).as("price"),
        col("li.quantity").cast("long").as("quantity"),
        money(col("li.total_tax")).as("total_tax"))

  /** Refund amounts are negated on load (woo-sync/main.py:1078-1079). */
  def negateMoney(c: Column): Column = -money(c)
}
