package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** [[ParquetWriteSupport]] is package-private to Spark; this shim
  * re-exposes exactly what graft's fragment writer needs: an
  * InternalRow→parquet write support producing the SAME physical
  * format Spark's own parquet sink writes (standard lists, decimal
  * int32/int64/fixed by precision, µs timestamps), so both graft write
  * paths emit identical files and the row-by-row Group assembly
  * disappears from the DSv2 INSERT path. */
object GraftParquetWriteShim {
  def newWriteSupport(): WriteSupport[InternalRow] = new ParquetWriteSupport

  /** Schema + every conf key ParquetWriteSupport.init and
    * SparkToParquetSchemaConverter read without defaults (Spark's
    * FileFormatWriter normally plants these per task). */
  def configure(schema: StructType, conf: Configuration): Unit = {
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    // the graft fragment readers speak INT64-micros only — never INT96
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.defaultValueString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString)
  }
}
