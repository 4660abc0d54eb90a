package graft.sources.v2

import java.util
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration
import graft.core._
import graft.sources.GraftArray
import scala.jdk.CollectionConverters._

/** DSv2 `Table` for a graft array: batch read with the three pushdown
  * channels (GraftScanBuilder) + batch append writes that commit one
  * immutable fragment per job (reference write path §3.3).
  */
class GraftTable(
    spark: SparkSession,
    val uri: String,
    val asOf: Option[Long] = None,
    /** Subset registration (reference S14,
      * t/create_allow_subset_existing_array.test): when set, this
      * table surfaces only these columns of the underlying array.
      * Dims are always included (they are the key); subset tables are
      * read-only — writes go through the full table. */
    val projection: Option[Seq[String]] = None) extends Table
  with SupportsRead with SupportsWrite {

  private lazy val store = GraftArray.store(spark, uri)

  private def project(s: ArraySchema): ArraySchema = projection match {
    case Some(cols) =>
      s.copy(attrs = s.attrs.filter(a => cols.contains(a.name)))
    case None => s
  }

  lazy val arraySchema: ArraySchema = project(store.loadSchema(asOf))

  override def name(): String = uri + asOf.map("@" + _).getOrElse("")
  override def schema(): StructType = arraySchema.toStruct
  override def capabilities(): util.Set[TableCapability] =
    (if (projection.isDefined) Set(TableCapability.BATCH_READ)
     else Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val scanAsOf = Option(options.get("asOfTimestamp")).map(_.toLong)
      .orElse(asOf)
    new GraftScanBuilder(spark, uri, project(store.loadSchema(scanAsOf)),
      store.listFragments(scanAsOf), scanAsOf)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty, "cannot write to a time-travel view")
    require(projection.isEmpty,
      "subset tables are read-only; write through the full table")
    new GraftWriteBuilder(spark, uri, arraySchema, info)
  }
}

class GraftWriteBuilder(
    spark: SparkSession,
    uri: String,
    schema: ArraySchema,
    info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      // column-name/type sanity against the array schema
      val in = info.schema().fieldNames.toSeq
      require(in.sorted == schema.columnNames.sorted,
        s"schema mismatch: $in vs ${schema.columnNames}")
      new GraftBatchWrite(spark, uri, schema, info.schema())
    }
  }
}

case class GraftCommitMessage(
    file: String, rows: Long,
    stats: Map[String, ColumnStats]) extends WriterCommitMessage

/** One fragment per commit; every task writes one parquet part file and
  * reports exact column stats gathered in-stream (rows are seen once —
  * the same trick the reference uses to buffer columns during
  * `write_row` [ha_mytile.cc:3158–3193]). */
class GraftBatchWrite(
    spark: SparkSession,
    uri: String,
    schema: ArraySchema,
    writeSchema: StructType) extends BatchWrite {

  private val fragId = java.util.UUID.randomUUID.toString.take(12)

  // key resolved driver-side from the session conf and shipped with the
  // task closure — the same trust boundary as the reference passing
  // encryption_key over the client connection [ha_mytile.cc:792–795]
  private val keyHex: Option[String] =
    if (!schema.encrypted) None
    else Some(spark.conf.getOption(EncryptionKeys.ConfKey).getOrElse(
      throw new IllegalArgumentException(
        s"array is encrypted; set ${EncryptionKeys.ConfKey}")))

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new GraftDataWriterFactory(uri, fragId, schema, writeSchema,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
      keyHex)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[GraftCommitMessage])
      .filter(_.rows > 0)
    val ord = TypedValue.ordering
    val merged: Map[String, ColumnStats] =
      schema.columnNames.map { c =>
        val per = msgs.flatMap(_.stats.get(c))
        def opt(vs: Seq[String], min: Boolean): Option[String] = {
          val dt = schema.dataTypeOf(c)
          val parsed = vs.map(TypedValue.parse(dt, _))
          if (parsed.isEmpty) None
          else Some(TypedValue.show(
            if (min) parsed.min(ord) else parsed.max(ord)))
        }
        c -> ColumnStats(
          opt(per.flatMap(_.min).toSeq, min = true),
          opt(per.flatMap(_.max).toSeq, min = false),
          per.map(_.nullCount).sum,
          if (per.nonEmpty && per.forall(_.sumLong.isDefined))
            // exact addition: cross-task overflow drops the stat rather
            // than recording a wrapped sum
            try Some(per.flatMap(_.sumLong).foldLeft(0L)(Math.addExact))
            catch { case _: ArithmeticException => None }
          else None,
          if (per.nonEmpty && per.forall(_.sumDouble.isDefined))
            Some(per.flatMap(_.sumDouble).sum) else None)
      }.toMap
    GraftArray.store(spark, uri).commitFragment(FragmentMeta(
      fragId, GraftArray.now(), msgs.map(_.file).toSeq,
      msgs.map(_.rows).sum, merged,
      msgs.map(m => m.file -> m.stats).toMap))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(uri).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(uri, s"frag_$fragId"), true)
  }
}

class GraftDataWriterFactory(
    uri: String, fragId: String, schema: ArraySchema,
    writeSchema: StructType, conf: SerializableConfiguration,
    keyHex: Option[String] = None)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftDataWriter(uri, fragId, partitionId, schema, writeSchema,
      conf.value, keyHex)
}

/** Columnar fragment writer: InternalRow → parquet Group, accumulating
  * min/max/nullCount/sum per column for the fragment manifest. */
class GraftDataWriter(
    uri: String, fragId: String, partitionId: Int,
    schema: ArraySchema, writeSchema: StructType,
    conf: org.apache.hadoop.conf.Configuration,
    keyHex: Option[String] = None)
  extends DataWriter[InternalRow] {

  import GraftParquet._

  private val relFile = f"frag_$fragId/part-$partitionId%05d.parquet"
  private val path = new Path(uri, relFile)
  private val messageType = toParquetSchema(schema, writeSchema)
  private val factory = new SimpleGroupFactory(messageType)
  private val writer = {
    GroupWriteSupport.setSchema(messageType, conf)
    val b = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .withType(messageType)
      // graft.codec[.col] table property; parquet-mr applies one codec
      // per file — see ArraySchema.effectiveCodec for the resolution
      .withCompressionCodec(CompressionCodecName.valueOf(
        schema.effectiveCodec match {
          case "NONE" => "UNCOMPRESSED"
          case c => c
        }))
    // parquet modular encryption: AES-GCM, footer + every column
    // [reference AES-256-GCM whole-array encryption, ha_mytile.cc:3440]
    keyHex.foreach { k =>
      // no explicit column list → parquet encrypts EVERY column (and
      // the footer) with the footer key — whole-file encryption
      b.withEncryption(
        org.apache.parquet.crypto.FileEncryptionProperties
          .builder(EncryptionKeys.parse(k))
          .build())
    }
    b.build()
  }

  private val fields = writeSchema.fields
  private val dimSet = schema.dimNames.toSet
  // declared storage-type value domains (unsigned/TIME — SURVEY §1.2);
  // lo/hi are longs except UINT64's BigDecimal bounds
  private val guards: Array[Option[(String, Any, Any)]] = fields.map { f =>
    schema.storageTyped.find(_._1 == f.name).flatMap { case (_, st) =>
      for (lo <- st.guardLo; hi <- st.guardHi) yield f.dataType match {
        case _: DecimalType =>
          (st.name, new java.math.BigDecimal(lo), new java.math.BigDecimal(hi))
        case _ => (st.name, lo.toLong, hi.toLong)
      }
    }
  }
  // enum-domain guards: declared enumeration attrs only accept their
  // values [ref: ENUM ⇄ TileDB Enumeration, ha_mytile.cc:1330–1351]
  private val enums: Array[Set[String]] = fields.map(f =>
    schema.attrs.find(_.name == f.name)
      .map(_.enumValues.toSet).getOrElse(Set.empty))
  private def checkGuard(i: Int, row: InternalRow): Unit =
    guards(i).foreach { case (tn, lo, hi) =>
      val bad = fields(i).dataType match {
        case dt: DecimalType =>
          val d = row.getDecimal(i, dt.precision, dt.scale).toJavaBigDecimal
          d.compareTo(lo.asInstanceOf[java.math.BigDecimal]) < 0 ||
            d.compareTo(hi.asInstanceOf[java.math.BigDecimal]) > 0
        case dt =>
          val v = dt match {
            case ByteType => row.getByte(i).toLong
            case ShortType => row.getShort(i).toLong
            case IntegerType => row.getInt(i).toLong
            case _ => row.getLong(i)
          }
          v < lo.asInstanceOf[Long] || v > hi.asInstanceOf[Long]
      }
      if (bad) throw new IllegalArgumentException(
        s"value out of $tn domain for ${fields(i).name}")
    }
  private var rows = 0L
  private val mins = new Array[Any](fields.length)
  private val maxs = new Array[Any](fields.length)
  private val nulls = new Array[Long](fields.length)
  private val sumsL = new Array[Long](fields.length)
  // a wrapped Long sum would silently diverge from Spark's decimal sum
  // (which has +10 digits of headroom) — on overflow the stat is
  // dropped so the aggregate pushdown falls back to a real scan
  private val sumLOverflow = new Array[Boolean](fields.length)
  private val sumsD = new Array[Double](fields.length)
  private val ord = TypedValue.ordering

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      if (row.isNullAt(i)) {
        if (dimSet(f.name)) throw new IllegalArgumentException(
          s"null value in dimension ${f.name}") // [ha_mytile.cc:3166]
        nulls(i) += 1
      } else {
        checkGuard(i, row)
        val storage: Any = f.dataType match {
          case ByteType => g.add(i, row.getByte(i).toInt); row.getByte(i).toLong
          case ShortType => g.add(i, row.getShort(i).toInt); row.getShort(i).toLong
          case IntegerType | DateType =>
            g.add(i, row.getInt(i)); row.getInt(i).toLong
          case LongType | TimestampType =>
            g.add(i, row.getLong(i)); row.getLong(i)
          case FloatType => g.add(i, row.getFloat(i)); row.getFloat(i).toDouble
          case DoubleType => g.add(i, row.getDouble(i)); row.getDouble(i)
          case StringType =>
            val s = row.getUTF8String(i).toString
            if (enums(i).nonEmpty && !enums(i).contains(s))
              throw new IllegalArgumentException(
                s"value not in enum ${fields(i).name}: $s")
            g.add(i, Binary.fromString(s)); s
          case BinaryType =>
            val b = row.getBinary(i)
            g.add(i, Binary.fromConstantByteArray(b)); b
          case BooleanType => g.add(i, row.getBoolean(i)); row.getBoolean(i)
          case dt: DecimalType if dt.precision <= 18 =>
            // stats domain for decimals = the unscaled long (same fixed
            // scale ⇒ ordering and sums carry over)
            val u = row.getDecimal(i, dt.precision, dt.scale).toUnscaledLong
            g.add(i, u); u
          case dt: DecimalType => // 19–38: fixed-width unscaled bytes
            g.add(i, Binary.fromConstantByteArray(GraftParquet.toFixedBytes(
              row.getDecimal(i, dt.precision, dt.scale)
                .toJavaBigDecimal.unscaledValue(),
              GraftParquet.minBytesForPrecision(dt.precision))))
            null // wide decimals carry no scalar stats
          case ArrayType(elem, _) =>
            val arr = row.getArray(i)
            val listG = g.addGroup(i)
            var j = 0
            while (j < arr.numElements()) {
              val el = listG.addGroup("list")
              if (!arr.isNullAt(j)) elem match {
                case IntegerType => el.add("element", arr.getInt(j))
                case LongType => el.add("element", arr.getLong(j))
                case FloatType => el.add("element", arr.getFloat(j))
                case DoubleType => el.add("element", arr.getDouble(j))
                case StringType => el.add("element",
                  Binary.fromString(arr.getUTF8String(j).toString))
                case other => throw new UnsupportedOperationException(
                  s"array element type $other")
              }
              j += 1
            }
            null // arrays carry no scalar stats
          case dt => throw new UnsupportedOperationException(s"type $dt")
        }
        storage match {
          case l: Long =>
            if (!sumLOverflow(i))
              try sumsL(i) = Math.addExact(sumsL(i), l)
              catch { case _: ArithmeticException => sumLOverflow(i) = true }
          case d: Double => sumsD(i) += d
          case _ => ()
        }
        if (storage != null && !storage.isInstanceOf[Array[Byte]]) {
          if (mins(i) == null || ord.compare(storage, mins(i)) < 0)
            mins(i) = storage
          if (maxs(i) == null || ord.compare(storage, maxs(i)) > 0)
            maxs(i) = storage
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val stats = fields.zipWithIndex.map { case (f, i) =>
      val isNum = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => Some(true)
        case dt: DecimalType if dt.precision <= 18 => Some(true)
        case FloatType | DoubleType => Some(false)
        case _ => None
      }
      f.name -> ColumnStats(
        Option(mins(i)).map(TypedValue.show),
        Option(maxs(i)).map(TypedValue.show),
        nulls(i),
        if (isNum.contains(true) && !sumLOverflow(i)) Some(sumsL(i)) else None,
        if (isNum.contains(false)) Some(sumsD(i)) else None)
    }.toMap
    GraftCommitMessage(relFile, rows, stats)
  }

  override def abort(): Unit = {
    writer.close()
    path.getFileSystem(conf).delete(path, false)
  }

  override def close(): Unit = ()
}

object GraftParquet {
  /** Smallest byte width whose two's-complement range covers 10^p. */
  def minBytesForPrecision(p: Int): Int =
    (1 to 16).find(n => BigInt(2).pow(8 * n - 1) > BigInt(10).pow(p)).get

  /** Unscaled value → fixed-width sign-extended two's complement. */
  def toFixedBytes(unscaled: java.math.BigInteger, width: Int): Array[Byte] = {
    val raw = unscaled.toByteArray
    val out = new Array[Byte](width)
    val sign: Byte = if (unscaled.signum() < 0) -1 else 0
    java.util.Arrays.fill(out, 0, width - raw.length, sign)
    System.arraycopy(raw, 0, out, width - raw.length, raw.length)
    out
  }

  private def repetitionOf(required: Boolean) =
    if (required) org.apache.parquet.schema.Type.Repetition.REQUIRED
    else org.apache.parquet.schema.Type.Repetition.OPTIONAL

  /** StructType → parquet MessageType for the supported storage types. */
  def toParquetSchema(schema: ArraySchema, st: StructType): MessageType = {
    val b = Types.buildMessage()
    st.fields.foreach { f =>
      val required = schema.dimNames.contains(f.name) || !f.nullable
      def prim(t: PrimitiveTypeName) =
        if (required) Types.required(t) else Types.optional(t)
      val built = f.dataType match {
        case ByteType => prim(PrimitiveTypeName.INT32)
          .as(LTA.intType(8, true)).named(f.name)
        case ShortType => prim(PrimitiveTypeName.INT32)
          .as(LTA.intType(16, true)).named(f.name)
        case IntegerType => prim(PrimitiveTypeName.INT32).named(f.name)
        case LongType => prim(PrimitiveTypeName.INT64).named(f.name)
        case FloatType => prim(PrimitiveTypeName.FLOAT).named(f.name)
        case DoubleType => prim(PrimitiveTypeName.DOUBLE).named(f.name)
        case BooleanType => prim(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType => prim(PrimitiveTypeName.BINARY)
          .as(LTA.stringType()).named(f.name)
        case BinaryType => prim(PrimitiveTypeName.BINARY).named(f.name)
        case DateType => prim(PrimitiveTypeName.INT32)
          .as(LTA.dateType()).named(f.name)
        case TimestampType => prim(PrimitiveTypeName.INT64)
          .as(LTA.timestampType(true, LTA.TimeUnit.MICROS)).named(f.name)
        // lossless DECIMAL (the reference lossy-maps to FLOAT64,
        // mytile.cc:21–23 — deliberate divergence, SURVEY §7.4.7)
        case dt: DecimalType if dt.precision <= 18 =>
          prim(PrimitiveTypeName.INT64)
            .as(LTA.decimalType(dt.scale, dt.precision)).named(f.name)
        // precision 19–38 (incl. UINT64's Decimal(20,0)): fixed-width
        // two's-complement unscaled bytes, parquet's standard layout
        case dt: DecimalType =>
          prim(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY)
            .length(minBytesForPrecision(dt.precision))
            .as(LTA.decimalType(dt.scale, dt.precision)).named(f.name)
        // multi-value attribute (reference cell_val_num>1 → ArrayType,
        // SURVEY §1.2) — standard 3-level parquet LIST layout
        case ArrayType(elem, containsNull) =>
          val lb = if (required) Types.requiredList() else Types.optionalList()
          val el = elem match {
            case IntegerType => Types.primitive(PrimitiveTypeName.INT32,
              repetitionOf(!containsNull))
            case LongType => Types.primitive(PrimitiveTypeName.INT64,
              repetitionOf(!containsNull))
            case FloatType => Types.primitive(PrimitiveTypeName.FLOAT,
              repetitionOf(!containsNull))
            case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE,
              repetitionOf(!containsNull))
            case StringType => Types.primitive(PrimitiveTypeName.BINARY,
              repetitionOf(!containsNull)).as(LTA.stringType())
            case other => throw new UnsupportedOperationException(
              s"array element type $other")
          }
          lb.element(el.named("element")).named(f.name)
        case dt => throw new UnsupportedOperationException(s"type $dt")
      }
      b.addField(built)
    }
    b.named("graft")
  }
}
