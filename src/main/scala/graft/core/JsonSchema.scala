package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Loader for warehouse-style JSON schema files → StructType — the
  * equivalent of the reference's `SchemaField.from_api_repr` path
  * (SURVEY.md §1.2; reference: okta-sync/main.py:513-541 loads the
  * files under okta-sync/schemas/, entries like
  * {"name": "id", "type": "STRING", "mode": "NULLABLE"}).
  *
  * Type tokens cover what the reference's schemas use; nested objects
  * are declared STRING there (JSON kept as text), so no RECORD
  * recursion is required — but it is supported for completeness.
  */
object JsonSchema {

  def sparkType(token: String): DataType = token.toUpperCase match {
    case "STRING" => StringType
    case "INTEGER" | "INT64" => LongType
    case "FLOAT" | "FLOAT64" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "TIMESTAMP" => TimestampType
    case "DATETIME" => TimestampNTZType
    case "DATE" => DateType
    case "NUMERIC" => DecimalType(38, 9)
    case "BIGNUMERIC" => DecimalType(38, 18) // narrowed from (76,38); SURVEY §1.2
    case "BYTES" => BinaryType
    case other => throw new IllegalArgumentException(s"unknown schema type: $other")
  }

  /** Parse a JSON array of {name, type, mode, fields?} into StructType.
    * mode REQUIRED -> non-nullable; REPEATED -> ArrayType; RECORD
    * recurses into fields. */
  def fromJson(json: String): StructType = {
    val mapper = new ObjectMapper()
    def convert(node: com.fasterxml.jackson.databind.JsonNode): StructField = {
      val name = node.get("name").asText()
      val mode = Option(node.get("mode")).map(_.asText().toUpperCase).getOrElse("NULLABLE")
      val typeToken = node.get("type").asText().toUpperCase
      val base: DataType =
        if (typeToken == "RECORD" || typeToken == "STRUCT")
          StructType(node.get("fields").elements().asScala.map(convert).toSeq)
        else sparkType(typeToken)
      val dt = if (mode == "REPEATED") ArrayType(base) else base
      StructField(name, dt, nullable = mode != "REQUIRED")
    }
    StructType(mapper.readTree(json).elements().asScala.map(convert).toSeq)
  }

  def fromFile(path: String): StructType =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
}
