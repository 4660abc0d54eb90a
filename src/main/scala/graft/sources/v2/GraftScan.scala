package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import graft.core.TypedValue
import graft.sources.v2.PredicateSupport.Pred
import scala.jdk.CollectionConverters._

/** DSv2 batch scan over array fragments (reference scan path S1–S4).
  *
  * Partitioning: fragments whose dim-MBRs overlap (and need latest-wins
  * merge) are split into first-dimension range slabs driven by per-file
  * MBRs — each slab merges only its own coordinate range, so merge
  * state is bounded by slab width, not fragment size (SURVEY §7.4.4).
  * Disjoint fragments split per-file for maximal parallelism. Pushed
  * predicates are evaluated inside the reader (QueryCondition analog);
  * pruning already happened fragment-level in the ScanBuilder.
  */
case class GraftInputPartition(
    files: Seq[(String, Long)], // (absolute file path, fragment ts)
    needDedup: Boolean,
    limit: Int = -1, // per-partition row cap
    /** Half-open slab [slabLo, slabHi) on the FIRST dimension (storage
      * domain). Rows outside are owned by a sibling slab partition; the
      * dedup key (full dim tuple) shares dim0, so equal coordinates
      * always land in the same slab and latest-wins stays exact. */
    slabLo: Option[Any] = None,
    slabHi: Option[Any] = None,
    /** Hash-ownership fallback when no range structure exists to cut
      * slabs on (files without dim0 MBRs, or fully-coincident string
      * MBRs): this partition owns rows with
      * `pmod(stableDimHash(dim tuple), hashMod) == hashIdx`. Every
      * sibling reads the same files (hashMod× read amplification) but
      * holds only ~1/hashMod of the merge state. 0 = disabled. Equal
      * coordinates hash identically, so latest-wins stays exact. */
    hashMod: Int = 0,
    hashIdx: Int = 0,
    /** Bucket id under the array's `graft.buckets` layout — set only
      * when the scan reports KeyGroupedPartitioning (storage-
      * partitioned joins); Spark groups partitions sharing a key. */
    bucket: Option[Int] = None)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket.getOrElse(throw new IllegalStateException(
        "partitionKey requested on a non-bucketed partition"))))
}

/** One visible delete marker shipped to the readers: either a
  * delete-condition predicate (DELETE FROM / commitTombstone) or
  * coordinate files (row-level MERGE/UPDATE/DELETE). Both mask
  * matching cells of fragments committed STRICTLY BEFORE `ts`. */
case class TombstoneSpec(
    ts: Long,
    pred: Option[Pred],
    /** absolute paths of parquet files holding deleted dim tuples */
    coordFiles: Seq[String])

/** Deterministic, JVM-stable hash of a dim coordinate tuple in the
  * storage domain (the spec'd hashCodes of Long/Double/String/Boolean
  * plus BigInteger for decimals — never identity hashes). */
object DimHash {
  def of(vals: Array[Any], dimIdx: Array[Int]): Int = {
    var h = 17
    var i = 0
    while (i < dimIdx.length) {
      val x = vals(dimIdx(i)) match {
        case null => 0
        case l: java.lang.Long => java.lang.Long.hashCode(l)
        case d: java.lang.Double => java.lang.Double.hashCode(d)
        case s: String => s.hashCode
        case b: java.lang.Boolean => java.lang.Boolean.hashCode(b)
        case dec: org.apache.spark.sql.types.Decimal =>
          dec.toJavaBigDecimal.unscaledValue().hashCode()
        case b: Array[Byte] => java.util.Arrays.hashCode(b)
        case other => other.hashCode()
      }
      h = h * 31 + x
      i += 1
    }
    h
  }

  def pmod(h: Int, m: Int): Int = ((h % m) + m) % m
}

/** Fill partition for a dense array: one dim0 slab of the coordinate
  * grid. The reader builds the set of WRITTEN coordinates from the
  * listed files' dim columns, then emits every grid cell in `ranges`
  * that was never written, with attribute fill values — the reference's
  * dense fill semantics [ha_mytile.cc:1088–1164] as a partition-local
  * anti-join (memory = one slab's coordinate set, never the array). */
case class GraftFillPartition(
    ranges: Seq[(Long, Long)], // inclusive per-dim coordinate ranges
    files: Seq[(String, Long)]) extends InputPartition

class GraftReaderFactory(
    readSchema: StructType,
    dimNames: Seq[String],
    preds: Seq[Pred],
    conf: SerializableConfiguration,
    keyHex: Option[String] = None,
    /** Dense-fill context: when set, fill partitions may appear in the
      * scan, so every partition must report row-based (Spark rejects
      * mixed columnar/row partition sets). */
    fillSchema: Option[graft.core.ArraySchema] = None,
    /** Scan-wide columnar eligibility, decided on the DRIVER over the
      * full planned partition set (GraftScanImpl.columnarEligible).
      * Spark requires every partition of a scan to agree on
      * row-vs-columnar ("Cannot mix row-based and columnar input
      * partitions"), so a per-partition answer would crash any scan
      * that plans simple partitions next to slab/hash merge partitions
      * — e.g. a sparse array with one disjoint fragment plus an
      * overlapping pair. */
    columnar: Boolean = false,
    /** Requested metadata columns that are NOT shadowed by user
      * columns — the only names the readers synthesize. */
    metaCols: Set[String] = Set.empty,
    /** Visible delete markers: cells of fragments OLDER than a
      * tombstone that match its predicate / coordinate set are masked
      * in-reader. */
    tombstones: Seq[TombstoneSpec] = Nil,
    /** Dimension columns in array order with their types — needed to
      * decode coordinate-tombstone files. */
    dimStruct: StructType = new StructType(),
    /** storage-domain fill per evolved attr declaring one (applied
      * per file only where the column is physically absent). */
    evoFills: Map[String, Any] = Map.empty)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case f: GraftFillPartition =>
        new GraftFillPartitionReader(f, readSchema, fillSchema.get,
          preds, conf.value, keyHex, tombstones, dimStruct)
      case g: GraftInputPartition =>
        new GraftPartitionReader(g, readSchema, dimNames, preds,
          conf.value, keyHex, metaCols, tombstones, dimStruct, evoFills)
    }

  /** All-or-nothing per scan; see `columnar` above. When true, EVERY
    * planned partition is a simple local-file partition (no latest-wins
    * merge, no slab/hash ownership, no fill, no decryption) with
    * atomic column types, and streams ColumnarBatches through Spark's
    * vectorized parquet reader — several× faster than the row-at-a-time
    * Group path, which remains only where per-row merge logic is
    * genuinely needed. Pushed predicates are re-applied by Spark's
    * codegen Filter (pushPredicates returns everything as residual),
    * so the columnar path needs no row filtering. */
  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarPartitionReader(
      p.asInstanceOf[GraftInputPartition], readSchema, conf.value, metaCols,
      evoFills)
}

object GraftColumnarPartitionReader {
  /** Types the vectorized fast path handles (everything the fragment
    * writer emits except LIST columns, which stay on the row path). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType | BinaryType | DateType |
         TimestampType | _: DecimalType => true
    case _ => false
  }
}

/** ColumnarBatch reader over one partition's fragment files using
  * Spark's VectorizedParquetRecordReader (the engine the built-in
  * parquet source runs on). Files open through the session Hadoop
  * configuration (GraftParquetReadShim), so the vectorized path works
  * on any Hadoop filesystem, not just `file:`. Columns are permuted to
  * the requested order; columns a file predates (schema evolution)
  * surface as all-null constant vectors — same semantics as the row
  * path. */
class GraftColumnarPartitionReader(
    part: GraftInputPartition,
    readSchema: StructType,
    conf: Configuration,
    metaCols: Set[String] = Set.empty,
    /** storage-domain fill per evolved attr declaring one — applied
      * ONLY to files that physically lack the column (same semantics
      * as the merge path and GraftArray.load). */
    evoFills: Map[String, Any] = Map.empty)
  extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.datasources.parquet.{GraftParquetReadShim, VectorizedParquetRecordReader}
  import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val Capacity = 4096
  private val files = part.files.iterator // (path, fragment ts)
  private var reader: VectorizedParquetRecordReader = _
  private var inner: ColumnarBatch = _ // reader-owned, wanted-col order
  private var out: ColumnarBatch = _ // permuted to readSchema order
  private var constVectors: Seq[ConstantColumnVector] = Nil
  // projection-less scan of a file (readSchema empty after evolution/
  // count-style pruning): emit the footer row count as empty rows
  private var pendingNullRows = 0L

  private def closeCurrent(): Unit = {
    if (reader != null) { reader.close(); reader = null }
    constVectors.foreach(_.close())
    constVectors = Nil
    inner = null
  }

  /** Constant vector for a non-file column: fragment-provenance
    * metadata (file-constant by construction), the attr's declared
    * fill value when one exists (schema evolution — the file predates
    * the column), or null. */
  private def constFor(f: StructField, path: String,
      ts: Long): ConstantColumnVector = {
    val c = new ConstantColumnVector(Capacity, f.dataType)
    f.name match {
      case GraftMetaCols.FragId if metaCols.contains(f.name) =>
        c.setUtf8String(UTF8String.fromString(GraftMetaCols.fragIdOf(path)))
      case GraftMetaCols.CommitTs if metaCols.contains(f.name) =>
        c.setLong(ts)
      case n if evoFills.contains(n) =>
        (evoFills(n), f.dataType) match {
          case (l: Long, ByteType) => c.setByte(l.toByte)
          case (l: Long, ShortType) => c.setShort(l.toShort)
          case (l: Long, IntegerType | DateType) => c.setInt(l.toInt)
          case (l: Long, LongType | TimestampType) => c.setLong(l)
          case (d: Double, FloatType) => c.setFloat(d.toFloat)
          case (d: Double, DoubleType) => c.setDouble(d)
          case (s: String, StringType) =>
            c.setUtf8String(UTF8String.fromString(s))
          case (b: Boolean, BooleanType) => c.setBoolean(b)
          case _ => c.setNull() // exotic fill types stay null
        }
      case _ => c.setNull()
    }
    constVectors = constVectors :+ c
    c
  }

  private def openNext(): Boolean =
    if (!files.hasNext) false
    else {
      val (path, fragTs) = files.next()
      val fr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(path), conf))
      val md = fr.getFooter
      val fileSchema = md.getFileMetaData.getSchema
      val fileFields = fileSchema.getFields.asScala.map(_.getName).toSet
      val fileRows = md.getBlocks.asScala.map(_.getRowCount).sum
      val wanted = readSchema.fields.filter(f => fileFields.contains(f.name))
      if (wanted.isEmpty) {
        // nothing to decode; rows still count (constant vectors carry
        // any requested provenance metadata)
        fr.close()
        pendingNullRows = fileRows
        val cs = readSchema.fields.map(constFor(_, path, fragTs))
        out = new ColumnarBatch(cs.toArray[ColumnVector])
        true
      } else {
        reader = new VectorizedParquetRecordReader(
          null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, Capacity)
        val byName = fileSchema.getFields.asScala.map(t => t.getName -> t).toMap
        val requested = new org.apache.parquet.schema.MessageType(
          fileSchema.getName, wanted.map(f => byName(f.name)): _*)
        // hands fr's ownership to the vectorized reader (closes it);
        // until that succeeds the file reader is still ours to close
        try GraftParquetReadShim.initVectorized(
          reader, fileSchema, requested, fr, fileRows)
        catch { case e: Throwable => fr.close(); reader = null; throw e }
        inner = reader.resultBatch()
        val vectors: Array[ColumnVector] = readSchema.fields.map { f =>
          val i = wanted.indexWhere(_.name == f.name)
          if (i >= 0) {
            val v = inner.column(i)
            require(v.dataType() == f.dataType,
              s"columnar type mismatch for ${f.name}: " +
                s"file ${v.dataType()} vs schema ${f.dataType}")
            v
          } else constFor(f, path, fragTs)
        }.toArray
        out = new ColumnarBatch(vectors)
        true
      }
    }

  override def next(): Boolean = {
    while (true) {
      if (pendingNullRows > 0) {
        out.setNumRows(math.min(pendingNullRows, Capacity.toLong).toInt)
        pendingNullRows -= out.numRows()
        return true
      }
      if (out == null) { // nothing open yet
        if (!openNext()) return false
      } else if (reader == null) { // projection-less file exhausted
        closeCurrent(); out = null
      } else if (reader.nextBatch()) {
        out.setNumRows(inner.numRows())
        return true
      } else { // data file exhausted
        closeCurrent(); out = null
      }
    }
    false // unreachable
  }

  override def get(): ColumnarBatch = out

  override def close(): Unit = closeCurrent()
}

/** Per-reader decode-path counters, exposed for plan/path assertions
  * in specs (which run in-process on local[n]). Cheap LongAdders —
  * incremented once per FILE, not per row. */
object GraftScanMetrics {
  val vectorizedFiles = new java.util.concurrent.atomic.LongAdder
  val groupFiles = new java.util.concurrent.atomic.LongAdder
  def reset(): Unit = { vectorizedFiles.reset(); groupFiles.reset() }
}

/** Row-path reader over fragment parquet. Decoding is vectorized:
  * each file streams through Spark's VectorizedParquetRecordReader
  * (page-level columnar decode) and batch rows are surfaced as
  * storage-domain value arrays — the same contract the old Group
  * decode had, so all merge machinery downstream is untouched, at a
  * fraction of the per-row cost. The parquet-hadoop Group API remains
  * only as the fallback for what the vectorized reader cannot decode
  * (LIST columns in the projection, encrypted files).
  * Latest-wins merge: files arrive ts-ascending; a hash map keyed by
  * the dim tuple keeps the last (newest) row [SURVEY §1.1].
  */
class GraftPartitionReader(
    part: GraftInputPartition,
    readSchema: StructType,
    dimNames: Seq[String],
    preds: Seq[Pred],
    conf: Configuration,
    keyHex: Option[String] = None,
    metaCols: Set[String] = Set.empty,
    tombstones: Seq[TombstoneSpec] = Nil,
    dimStruct: StructType = new StructType(),
    /** storage-domain fill per evolved attr declaring one — applied
      * ONLY where a file physically lacks the column, so explicit
      * NULLs in post-evolution fragments stay null (mirrors
      * GraftArray.load's per-fragment fill). */
    evoFills: Map[String, Any] = Map.empty)
  extends PartitionReader[InternalRow] {

  /** (readCols index, storage fill) for the columns `fileSchema`
    * lacks that declare fills. */
  private def evoFillIdx(
      hasField: String => Boolean): Seq[(Int, Any)] =
    readCols.zipWithIndex.collect {
      case (f0, i) if !hasField(f0.name) && evoFills.contains(f0.name) =>
        (i, evoFills(f0.name))
    }

  private def hasSlab: Boolean = part.slabLo.isDefined || part.slabHi.isDefined
  private def hasHash: Boolean = part.hashMod > 0

  // columns physically read = requested ∪ merge dims ∪ predicate refs
  // ∪ tombstone refs (masking evaluates predicates per cell and
  // coordinate deletes need the dim tuple)
  // (reference always reads dims, ha_mytile.cc:3013–3021)
  private val readCols: Seq[StructField] = {
    val extra =
      (if (part.needDedup || hasSlab || hasHash) dimNames else Nil) ++
        preds.flatMap(_.refs) ++
        tombstones.flatMap(_.pred.map(_.refs).getOrElse(Set.empty)) ++
        (if (tombstones.exists(_.coordFiles.nonEmpty)) dimNames else Nil)
    readSchema.fields.toSeq ++
      extra.distinct.filterNot(readSchema.fieldNames.contains)
        .map(n => StructField(n, NullType)) // type resolved from file
  }

  private val outIdx: Array[Int] =
    readSchema.fields.map(f => readCols.indexWhere(_.name == f.name))
  private val dimIdx: Array[Int] =
    dimNames.map(n => readCols.indexWhere(_.name == n)).toArray
  private val colIdx: Map[String, Int] =
    readCols.map(_.name).zipWithIndex.toMap

  // fragment-provenance metadata columns: injected per source file
  // BEFORE the latest-wins merge, so a merged row reports the fragment
  // its winning version came from. `metaCols` holds only names that
  // are NOT user columns (a user column of the same name shadows the
  // metadata column and must never be overwritten).
  private val metaFragIdx =
    if (metaCols.contains(GraftMetaCols.FragId))
      colIdx.get(GraftMetaCols.FragId) else None
  private val metaTsIdx =
    if (metaCols.contains(GraftMetaCols.CommitTs))
      colIdx.get(GraftMetaCols.CommitTs) else None

  /** Coordinate-delete sets (storage domain), loaded once per
    * partition and shared across its files. Bounded by the number of
    * row-level-deleted coordinates still unreclaimed by consolidation. */
  private lazy val coordSets: Seq[(Long, java.util.HashSet[Seq[Any]])] =
    tombstones.filter(_.coordFiles.nonEmpty).map { t =>
      val set = new java.util.HashSet[Seq[Any]]()
      val inner = new GraftPartitionReader(
        GraftInputPartition(t.coordFiles.map((_, t.ts)), needDedup = false),
        dimStruct, dimNames, Nil, conf, keyHex)
      while (inner.next()) {
        val r = inner.get()
        set.add((0 until dimStruct.length).map(i => catalystToStorage(
          r.get(i, dimStruct(i).dataType), dimStruct(i).dataType)))
      }
      inner.close()
      (t.ts, set)
    }

  /** Inverse of toCatalyst for dim values (coordinate-set keys must
    * live in the storage domain the decoded rows use). */
  private def catalystToStorage(v: Any, dt: DataType): Any = v match {
    case null => null
    case b: java.lang.Byte => b.longValue()
    case s: java.lang.Short => s.longValue()
    case i: java.lang.Integer => i.longValue()
    case f: java.lang.Float => f.doubleValue()
    case u: UTF8String => u.toString
    case other => other // Long, Double, String, Boolean, Decimal
  }

  private val iter: Iterator[Array[Any]] = {
    val raw = part.files.sortBy(_._2).iterator.flatMap {
      case (file, ts) =>
        val base0 = readFile(file)
        // delete masking BEFORE the latest-wins merge: a tombstone
        // masks matching cells of strictly older fragments only
        // (versions written at/after it are untouched)
        val activePred = tombstones.collect {
          case t if t.ts > ts && t.pred.isDefined => t.pred.get }
        val activeCoord = coordSets.collect {
          case (tts, set) if tts > ts => set }
        val base =
          if (activePred.isEmpty && activeCoord.isEmpty) base0
          else base0.filter { r =>
            !activePred.exists(_.eval(n => r(colIdx(n)))) && {
              activeCoord.isEmpty || {
                val key = dimIdx.map(r(_)).toSeq
                !activeCoord.exists(_.contains(key))
              }
            }
          }
        if (metaFragIdx.isEmpty && metaTsIdx.isEmpty) base
        else {
          val fid = GraftMetaCols.fragIdOf(file)
          base.map { r =>
            metaFragIdx.foreach(i => r(i) = fid)
            metaTsIdx.foreach(i => r(i) = ts)
            r
          }
        }
    }
    // slab ownership: keep only rows whose dim0 falls in [slabLo, slabHi)
    // — a file spanning several slabs is read by each, but every row is
    // emitted by exactly one
    val rows =
      if (!hasSlab) raw
      else {
        val ord = TypedValue.ordering
        val d0 = dimIdx(0)
        raw.filter { r =>
          // slab bounds live in the manifest stats domain, where a
          // decimal dim is its unscaled long (TypedValue.parse) — the
          // decoded row carries a Decimal object, so normalize before
          // comparing (scale is fixed per column ⇒ order carries over)
          val v = r(d0) match {
            case dec: org.apache.spark.sql.types.Decimal => dec.toUnscaledLong
            case other => other
          }
          part.slabLo.forall(lo => ord.compare(v, lo) >= 0) &&
            part.slabHi.forall(hi => ord.compare(v, hi) < 0)
        }
      }
    // hash ownership: this partition emits only its share of the
    // coordinate space (siblings read the same files and emit theirs)
    val owned =
      if (!hasHash) rows
      else rows.filter(r =>
        DimHash.pmod(DimHash.of(r, dimIdx), part.hashMod) == part.hashIdx)
    if (!part.needDedup) owned
    else {
      // newest fragment wins per coordinate (files are ts-ascending);
      // map size is bounded by the slab's coordinate range, not the
      // whole overlap group
      val m = new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
      owned.foreach { r => m.put(dimIdx.map(r(_)).toSeq, r) }
      m.values.asScala.iterator
    }
  }

  private val filtered: Iterator[Array[Any]] = {
    val f =
      if (preds.isEmpty) iter
      else iter.filter(r => preds.forall(_.eval(n => r(colIdx(n)))))
    // pushed LIMIT: applied after merge+filter, so always exact —
    // each partition yields at most `limit` rows, Spark takes the rest
    if (part.limit >= 0) f.take(part.limit) else f
  }

  private var current: Array[Any] = _

  /** The reader of the file currently being streamed (files decode
    * strictly sequentially) — closed here if the scan is abandoned
    * early (pushed LIMIT, cancelled task) before the iterator drains. */
  private var openReader: AutoCloseable = _

  override def next(): Boolean =
    if (filtered.hasNext) { current = filtered.next(); true } else false

  override def get(): InternalRow = {
    val out = new Array[Any](readSchema.length)
    var i = 0
    while (i < out.length) {
      out(i) = toCatalyst(current(outIdx(i)), readSchema.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = {
    if (openReader != null) { openReader.close(); openReader = null }
  }

  /** storage-domain → catalyst value. */
  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, ByteType) => l.toByte
    case (l: Long, ShortType) => l.toShort
    case (l: Long, IntegerType | DateType) => l.toInt
    case (l: Long, LongType | TimestampType) => l
    case (d: Double, FloatType) => d.toFloat
    case (d: Double, DoubleType) => d
    case (s: String, StringType) => UTF8String.fromString(s)
    case (b: Array[Byte], BinaryType) => b
    case (b: Boolean, BooleanType) => b
    case (other, _) => other
  }

  /** Stream one parquet file as storage-domain value arrays aligned to
    * `readCols`; columns missing from the file (schema evolution) are
    * null. Vectorized decode unless the file is encrypted or the
    * projection needs a LIST column. */
  private def readFile(file: String): Iterator[Array[Any]] =
    (if (keyHex.isEmpty) readFileVectorized(file) else None).getOrElse {
      GraftScanMetrics.groupFiles.increment()
      readFileGroup(file)
    }

  /** Vectorized decode of one file: Spark's VectorizedParquetRecordReader
    * streams ColumnarBatches; per-column extractors (dispatched once on
    * the decoded vector types) convert batch cells to the storage
    * domain readFileGroup produces, so merge/slab/tombstone logic and
    * predicate eval downstream are byte-identical. None → Group path
    * (LIST column in the projection, INT96, or >2^31-row part file). */
  private def readFileVectorized(file: String): Option[Iterator[Array[Any]]] = {
    import org.apache.spark.sql.execution.datasources.parquet.{GraftParquetReadShim, VectorizedParquetRecordReader}
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    val md = fr.getFooter
    val fileSchema = md.getFileMetaData.getSchema
    val wanted = readCols.map(_.name).filter(fileSchema.containsField)
    val fillsForFile = evoFillIdx(fileSchema.containsField)
    val parquetFields = wanted.map(n =>
      fileSchema.getType(Array(n): _*))
    val fileRows = md.getBlocks.asScala.map(_.getRowCount).sum
    val vectorizable = wanted.nonEmpty && fileRows <= Int.MaxValue &&
      parquetFields.forall(t => t.isPrimitive &&
        t.asPrimitiveType().getPrimitiveTypeName != PrimitiveTypeName.INT96)
    if (!vectorizable) { fr.close(); return None }
    GraftScanMetrics.vectorizedFiles.increment()
    val requested = new MessageType(fileSchema.getName, parquetFields: _*)
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    // reader takes ownership of fr on success; until then it is ours
    try GraftParquetReadShim.initVectorized(
      reader, fileSchema, requested, fr, fileRows)
    catch { case e: Throwable => fr.close(); throw e }
    openReader = reader
    val batch = reader.resultBatch()
    val target: Array[Int] = wanted.map(colIdx).toArray
    val extract: Array[Int => Any] = Array.tabulate(wanted.size) { c =>
      val v = batch.column(c)
      val targetType = readCols(target(c)).dataType
      v.dataType() match {
        case ByteType => i => if (v.isNullAt(i)) null else v.getByte(i).toLong
        case ShortType => i => if (v.isNullAt(i)) null else v.getShort(i).toLong
        case IntegerType | DateType =>
          i => if (v.isNullAt(i)) null else v.getInt(i).toLong
        case LongType | TimestampType =>
          i => if (v.isNullAt(i)) null else v.getLong(i)
        case FloatType =>
          i => if (v.isNullAt(i)) null else v.getFloat(i).toDouble
        case DoubleType => i => if (v.isNullAt(i)) null else v.getDouble(i)
        case BooleanType => i => if (v.isNullAt(i)) null else v.getBoolean(i)
        case StringType =>
          i => if (v.isNullAt(i)) null else v.getUTF8String(i).toString
        case BinaryType => targetType match {
          // mirror the Group path: unannotated binary read into a
          // string/untyped slot surfaces as UTF-8 text
          case StringType | NullType => i =>
            if (v.isNullAt(i)) null
            else new String(v.getBinary(i), java.nio.charset.StandardCharsets.UTF_8)
          case _ => i => if (v.isNullAt(i)) null else v.getBinary(i)
        }
        case dt: DecimalType =>
          i => if (v.isNullAt(i)) null else v.getDecimal(i, dt.precision, dt.scale)
        case other => throw new UnsupportedOperationException(
          s"vectorized extractor for $other")
      }
    }
    Some(new Iterator[Array[Any]] {
      private var rows = 0
      private var i = 0
      private var done = false
      private def advance(): Unit =
        while (i >= rows && !done) {
          if (reader.nextBatch()) { rows = batch.numRows(); i = 0 }
          else { done = true; reader.close(); openReader = null }
        }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): Array[Any] = {
        if (!hasNext) throw new NoSuchElementException
        val out = new Array[Any](readCols.size)
        var c = 0
        while (c < target.length) { out(target(c)) = extract(c)(i); c += 1 }
        fillsForFile.foreach { case (fi, fv) => out(fi) = fv }
        i += 1
        out
      }
    })
  }

  private def readFileGroup(file: String): Iterator[Array[Any]] = {
    val inputFile = HadoopInputFile.fromPath(new Path(file), conf)
    val reader = keyHex match {
      case Some(k) => ParquetFileReader.open(inputFile,
        org.apache.parquet.HadoopReadOptions
          .builder(conf, new Path(file))
          .withDecryption(org.apache.parquet.crypto.FileDecryptionProperties
            .builder().withFooterKey(graft.core.EncryptionKeys.parse(k))
            .build())
          .build())
      case None => ParquetFileReader.open(inputFile)
    }
    openReader = reader
    val fileSchema = reader.getFooter.getFileMetaData.getSchema
    val wanted = readCols.map(_.name).filter(fileSchema.containsField)
    val fillsForFile = evoFillIdx(fileSchema.containsField)
    val fieldByName = fileSchema.getFields.asScala
      .map(t => t.getName -> t).toMap
    val requested = new MessageType("requested",
      wanted.map(fieldByName): _*)
    reader.setRequestedSchema(requested)

    new Iterator[Array[Any]] {
      private var pages = reader.readNextRowGroup()
      private var recordReader =
        if (pages == null) null
        else new ColumnIOFactory().getColumnIO(requested)
          .getRecordReader(pages, new GroupRecordConverter(requested))
      private var remaining = if (pages == null) 0L else pages.getRowCount
      advanceIfNeeded()

      private def advanceIfNeeded(): Unit = {
        while (remaining == 0L && pages != null) {
          pages = reader.readNextRowGroup()
          if (pages == null) {
            recordReader = null; reader.close(); openReader = null
          }
          else {
            recordReader = new ColumnIOFactory().getColumnIO(requested)
              .getRecordReader(pages, new GroupRecordConverter(requested))
            remaining = pages.getRowCount
          }
        }
        if (pages == null && recordReader == null && remaining == 0L) ()
      }

      override def hasNext: Boolean = remaining > 0L

      override def next(): Array[Any] = {
        val g = recordReader.read()
        remaining -= 1
        if (remaining == 0L) advanceIfNeeded()
        val row = decode(g)
        fillsForFile.foreach { case (fi, fv) => row(fi) = fv }
        row
      }
    }
  }

  private def decode(g: Group): Array[Any] = {
    val out = new Array[Any](readCols.size)
    var w = 0
    val gt: GroupType = g.getType
    while (w < gt.getFieldCount) {
      val name = gt.getFieldName(w)
      val target = colIdx(name)
      out(target) =
        if (g.getFieldRepetitionCount(w) == 0) null
        else if (!gt.getType(w).isPrimitive)
          decodeList(g.getGroup(w, 0), readCols(target).dataType)
        else gt.getType(w).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 =>
            gt.getType(w).getLogicalTypeAnnotation match {
              // Spark's standard layout stores precision ≤ 9 decimals
              // as INT32 — surface them as Decimal, not a bare long
              case d: org.apache.parquet.schema.LogicalTypeAnnotation
                  .DecimalLogicalTypeAnnotation =>
                org.apache.spark.sql.types.Decimal(
                  g.getInteger(w, 0).toLong, d.getPrecision, d.getScale)
              case _ => g.getInteger(w, 0).toLong
            }
          case PrimitiveTypeName.INT64 =>
            gt.getType(w).getLogicalTypeAnnotation match {
              case d: org.apache.parquet.schema.LogicalTypeAnnotation
                  .DecimalLogicalTypeAnnotation =>
                org.apache.spark.sql.types.Decimal(
                  g.getLong(w, 0), d.getPrecision, d.getScale)
              case _ => g.getLong(w, 0)
            }
          case PrimitiveTypeName.FLOAT => g.getFloat(w, 0).toDouble
          case PrimitiveTypeName.DOUBLE => g.getDouble(w, 0)
          case PrimitiveTypeName.BOOLEAN => g.getBoolean(w, 0)
          case PrimitiveTypeName.BINARY |
               PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
            readCols(target).dataType match {
              case StringType | NullType => g.getBinary(w, 0).toStringUsingUTF8
              case dt: org.apache.spark.sql.types.DecimalType =>
                // wide decimal: fixed-width two's-complement unscaled
                org.apache.spark.sql.types.Decimal(
                  new java.math.BigDecimal(
                    new java.math.BigInteger(g.getBinary(w, 0).getBytes),
                    dt.scale), dt.precision, dt.scale)
              case _ => g.getBinary(w, 0).getBytes
            }
          case PrimitiveTypeName.INT96 =>
            throw new UnsupportedOperationException(
              "INT96 timestamps not supported; write with TIMESTAMP_MICROS")
        }
      w += 1
    }
    out
  }

  /** parquet 3-level LIST group → catalyst ArrayData (multi-value
    * attributes; never referenced by pushed predicates). */
  private def decodeList(listGroup: Group, dt: DataType): Any = {
    val elemType = dt match {
      case ArrayType(e, _) => e
      case _ => NullType
    }
    val n = listGroup.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val el = listGroup.getGroup(0, k)
      out(k) =
        if (el.getFieldRepetitionCount(0) == 0) null
        else el.getType.getType(0).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 => el.getInteger(0, 0)
          case PrimitiveTypeName.INT64 => el.getLong(0, 0)
          case PrimitiveTypeName.FLOAT =>
            if (elemType == DoubleType) el.getFloat(0, 0).toDouble
            else el.getFloat(0, 0)
          case PrimitiveTypeName.DOUBLE => el.getDouble(0, 0)
          case PrimitiveTypeName.BOOLEAN => el.getBoolean(0, 0)
          case PrimitiveTypeName.BINARY =>
            UTF8String.fromString(el.getBinary(0, 0).toStringUsingUTF8)
          case other => throw new UnsupportedOperationException(s"$other")
        }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Reader for one dense-fill grid slab: written coordinates are
  * collected from the slab's files (dim columns only, via the row
  * reader), then the grid is walked with an odometer and unwritten
  * cells are emitted with attribute fill values. Pushed predicates are
  * evaluated on the synthesized rows exactly as on data rows. */
class GraftFillPartitionReader(
    part: GraftFillPartition,
    readSchema: StructType,
    schema: graft.core.ArraySchema,
    preds: Seq[Pred],
    conf: Configuration,
    keyHex: Option[String],
    /** Delete tombstones: a deleted written cell reverts to FILL (it
      * leaves the seen-set, so this partition re-emits it). */
    tombstones: Seq[TombstoneSpec] = Nil,
    dimStruct: StructType = new StructType())
  extends PartitionReader[InternalRow] {

  private val dims = schema.dims
  private val nDims = dims.size

  private def coordLong(r: InternalRow, i: Int): Long =
    dims(i).dataType match {
      case ByteType => r.getByte(i).toLong
      case ShortType => r.getShort(i).toLong
      case IntegerType | DateType => r.getInt(i).toLong
      case _ => r.getLong(i)
    }

  // written coordinates within this slab (files listed may span
  // neighboring slabs — only our range is recorded, so memory is
  // bounded by slab size and each cell is owned by exactly one slab)
  private val seen: java.util.HashSet[Seq[Long]] = {
    val s = new java.util.HashSet[Seq[Long]]()
    if (part.files.nonEmpty) {
      val dimStruct0 = StructType(dims.map(d => StructField(d.name, d.dataType)))
      val inner = new GraftPartitionReader(
        GraftInputPartition(part.files, needDedup = false),
        dimStruct0, schema.dimNames, Nil, conf, keyHex,
        tombstones = tombstones, dimStruct = dimStruct0)
      while (inner.next()) {
        val r = inner.get()
        val coords = (0 until nDims).map(coordLong(r, _))
        val inRange = (0 until nDims).forall(i =>
          coords(i) >= part.ranges(i)._1 && coords(i) <= part.ranges(i)._2)
        if (inRange) s.add(coords)
      }
      inner.close()
    }
    s
  }

  // fill values: storage domain (for predicate eval) + catalyst form
  private val attrStorage: Map[String, Any] = schema.attrs.map(a =>
    a.name -> a.fillValue.map(TypedValue.parse(a.dataType, _)).orNull).toMap
  private val dimIndexOf: Map[String, Int] =
    schema.dimNames.zipWithIndex.toMap

  private val odo = part.ranges.map(_._1).toArray
  private var exhausted = part.ranges.exists(r => r._1 > r._2)
  private var current: Seq[Long] = _

  private def advance(): Unit = {
    var i = nDims - 1
    while (i >= 0) {
      odo(i) += 1
      if (odo(i) <= part.ranges(i)._2) return
      odo(i) = part.ranges(i)._1
      i -= 1
    }
    exhausted = true
  }

  private def storageValueAt(coords: Seq[Long])(name: String): Any =
    dimIndexOf.get(name) match {
      case Some(i) => coords(i)
      case None => attrStorage.getOrElse(name, null)
    }

  override def next(): Boolean = {
    while (!exhausted) {
      val coords = odo.toSeq
      advance()
      if (!seen.contains(coords) &&
        (preds.isEmpty || preds.forall(_.eval(storageValueAt(coords))))) {
        current = coords
        return true
      }
    }
    false
  }

  override def get(): InternalRow = {
    val out = new Array[Any](readSchema.length)
    var i = 0
    while (i < out.length) {
      val f = readSchema.fields(i)
      out(i) = dimIndexOf.get(f.name) match {
        case Some(d) => f.dataType match {
          case ByteType => current(d).toByte
          case ShortType => current(d).toShort
          case IntegerType | DateType => current(d).toInt
          case _ => current(d)
        }
        case None => (attrStorage.getOrElse(f.name, null), f.dataType) match {
          case (null, _) => null
          case (s: String, StringType) => UTF8String.fromString(s)
          // storage forms that differ from catalyst: manifest decimals
          // are unscaled longs at the column's scale; binary fill
          // values are base64 text (TypedValue.parse/show)
          case (s: String, BinaryType) =>
            java.util.Base64.getDecoder.decode(s)
          case (l: Long, dt: DecimalType) =>
            org.apache.spark.sql.types.Decimal(
              java.math.BigDecimal.valueOf(l, dt.scale), dt.precision, dt.scale)
          case (l: Long, ByteType) => l.toByte
          case (l: Long, ShortType) => l.toShort
          case (l: Long, IntegerType | DateType) => l.toInt
          case (d: Double, FloatType) => d.toFloat
          case (v, _) => v
        }
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}

/** Pushed-aggregate scan: the whole result was computed driver-side
  * from fragment statistics (A1–A7 fast path) — a single one-row
  * partition, zero data I/O. */
case class GraftAggPartition(values: Seq[Any]) extends InputPartition

class GraftAggBatch(values: Seq[Any], schema: StructType) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    GraftAggReaderFactory(schema)
}

case class GraftAggReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = p.asInstanceOf[GraftAggPartition].values
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(vals.zip(schema.fields).map {
          case (v, f) => (v, f.dataType) match {
            case (null, _) => null
            case (s: String, StringType) => UTF8String.fromString(s)
            case (l: Long, ByteType) => l.toByte
            case (l: Long, ShortType) => l.toShort
            case (l: Long, IntegerType | DateType) => l.toInt
            case (d: Double, FloatType) => d.toFloat
            // manifest decimals are unscaled longs at the column's scale
            case (l: Long, dt: DecimalType) =>
              org.apache.spark.sql.types.Decimal(
                java.math.BigDecimal.valueOf(l, dt.scale), dt.precision, dt.scale)
            case (other, _) => other
          }
        }.toArray)
      override def close(): Unit = ()
    }
}
