package graft.sources.v2

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.GraftArray

/** `spark.read.format("graftarray").option("path", uri)` entry point.
  * Options: `path` (required), `asOfTimestamp` (time travel, S7),
  * `sinceTimestamp` (window start — incremental reads over
  * `[sinceTimestamp, asOfTimestamp]`, both inclusive).
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftarray"

  private def uriOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graftarray requires option 'path'"))

  private def asOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("asOfTimestamp")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    GraftArray.store(spark, uriOf(options)).loadSchema(asOf(options)).toStruct
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftTable(SparkSession.active, uriOf(opts), asOf(opts),
      since = Option(opts.get("sinceTimestamp")).map(_.toLong))
  }

  override def supportsExternalMetadata(): Boolean = false
}
