package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SchemaConform
import graft.ops.{Relational, TableSwap}
import graft.sources.RestPager

/** The reference's densest operator chain, composed end-to-end
  * (SURVEY.md §3.2, okta-sync/main.py:846-955 + :587-671):
  *
  *   cursor-paginated entity scan (S2, ragged pages)
  *     -> schema conformance per batch (P3)
  *     -> union of the DEPROVISIONED second scan (P6)
  *     -> keyed dedup keep-latest by window (A4)
  *     -> staging write + swap publish with empty-truncate guard (K2/K3)
  *
  * In the reference this spans a Python driver plus four BigQuery
  * round-trips; here it is one declarative Spark plan ending in a
  * single shuffle on the dedup key.
  */
object OktaRefresh {

  /** okta_users schema (FIXTURES.md §1; nested objects stay JSON
    * strings per the reference's schema files). */
  val UsersSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("created", TimestampType),
    StructField("activated", TimestampType),
    StructField("statusChanged", TimestampType),
    StructField("lastLogin", TimestampType),
    StructField("lastUpdated", TimestampType),
    StructField("passwordChanged", TimestampType),
    StructField("type", StringType),
    StructField("profile", StringType),
    StructField("credentials", StringType),
    StructField("_links", StringType),
    StructField("transitioningToStatus", StringType)))

  /** Dedup key config per table (okta-sync/main.py:24-30): users by id,
    * membership tables by composite key. */
  val DedupKeys: Map[String, Seq[String]] = Map(
    "users" -> Seq("id"),
    "groups" -> Seq("id"),
    "apps" -> Seq("id"),
    "group_members" -> Seq("group_id", "id"),
    "app_users" -> Seq("app_id", "id"))

  /** Conform raw page rows and dedup keep-latest. */
  def conformAndDedup(raw: DataFrame, schema: StructType, keys: Seq[String]): DataFrame =
    Relational.keepLatest(
      SchemaConform.conformToSchema(raw, schema),
      keys, Seq(col("lastUpdated").desc_nulls_last, col("created").desc_nulls_last))

  /** Full refresh: active pages + deprovisioned pages -> conform ->
    * union -> dedup -> swap into `root/users`. Returns false when the
    * empty-input guard refused the publish. */
  def refreshUsers(spark: SparkSession,
                   activePages: Seq[String],
                   deprovisionedPages: Seq[String],
                   root: String): Boolean = {
    val active = RestPager.toDf(spark, activePages)
    val deprov = RestPager.toDf(spark, deprovisionedPages)
    val unioned = active.unionByName(deprov, allowMissingColumns = true)
    val deduped = conformAndDedup(unioned, UsersSchema, DedupKeys("users"))
    TableSwap.stageAndSwap(spark, deduped, root, "users")
  }
}
