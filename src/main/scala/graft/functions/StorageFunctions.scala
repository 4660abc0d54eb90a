package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.StorageTypes

/** µs-edge conversions for the storage types Spark cannot represent
  * natively (SURVEY §1.2; reference epoch conversions mytile.cc:475–548,
  * TIME handling mytile.cc:1013–1095). All are plain column arithmetic
  * — codegen'd, no UDFs:
  *
  *  - TIME_* unit counts ⇄ the µs-of-day surface the engine stores
  *  - DATETIME_{NS..AS} raw int64 counts → µs TimestampType (truncating
  *    toward zero for the 2024-era positive epochs, matching the
  *    reference's MariaDB TIMESTAMP(6) truncation)
  */
object StorageFunctions {

  /** Exact integer division — `/` on longs promotes to double, whose
    * 53-bit mantissa corrupts 2024-era ns epochs (~1.7e18). */
  private def idiv(a: Column, b: Long): Column =
    call_function("div", a, lit(b))

  /** A TIME_<unit> count → the stored µs-of-day long.
    * e.g. `timeToMicros(col, "TIME_SEC")` for seconds-of-day. */
  def timeToMicros(count: Column, storageType: String): Column = {
    val unit = storageType.stripPrefix("TIME_")
    StorageTypes.unitMicros.get(unit) match {
      case Some(m) => (count * lit(m)).cast("long")
      case None => idiv(count, StorageTypes.unitsPerMicro(unit)) // truncates
    }
  }

  /** Stored µs-of-day long → count in the declared TIME unit
    * (sub-µs units multiply back; coarser units truncate). */
  def microsToTime(micros: Column, storageType: String): Column = {
    val unit = storageType.stripPrefix("TIME_")
    StorageTypes.unitMicros.get(unit) match {
      case Some(m) => idiv(micros, m)
      case None => (micros * lit(StorageTypes.unitsPerMicro(unit)))
        .cast("long")
    }
  }

  /** A DATETIME_<unit> raw int64 count since epoch → µs TimestampType
    * (the read edge for NS/PS/FS/AS columns; SEC/MS multiply up). */
  def datetimeToTimestamp(count: Column, storageType: String): Column = {
    val unit = storageType.stripPrefix("DATETIME_")
    StorageTypes.unitMicros.get(unit) match {
      case Some(m) => timestamp_micros((count * lit(m)).cast("long"))
      case None => timestamp_micros(
        idiv(count, StorageTypes.unitsPerMicro(unit)))
    }
  }

  /** µs TimestampType → DATETIME_<unit> raw count (write edge). */
  def timestampToDatetime(ts: Column, storageType: String): Column = {
    val unit = storageType.stripPrefix("DATETIME_")
    StorageTypes.unitMicros.get(unit) match {
      case Some(m) => idiv(unix_micros(ts), m)
      case None =>
        (unix_micros(ts) * lit(StorageTypes.unitsPerMicro(unit))).cast("long")
    }
  }

  /** StringType surface → the declared charset's byte representation —
    * the interchange edge for STRING_UTF16/UTF32 and UCS2/UCS4
    * attributes (the reference charset-converts these to TEXT,
    * mytile.cc:218–224, 896–923). Built-in `encode` — codegen'd. */
  def stringToStorageBytes(s: Column, storageType: String): Column =
    encode(s, StorageTypes.charsetOf(storageType.toUpperCase))

  /** Declared-charset bytes → the StringType surface (ingest edge for
    * external systems handing over UTF-16/UTF-32/UCS bytes). */
  def storageBytesToString(b: Column, storageType: String): Column =
    decode(b, StorageTypes.charsetOf(storageType.toUpperCase))
}
