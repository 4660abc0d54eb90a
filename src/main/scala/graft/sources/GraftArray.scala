package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** User-facing array-table API — the Spark rebuild of the reference's
  * handler surface: CREATE (S10), INSERT-as-fragment (S8/S9), scan with
  * fragment semantics (S1), time travel (S7), metadata table (S6),
  * schema evolution (S12), DROP (S11).
  *
  * Reads are plain declarative DataFrame plans over the fragment
  * parquet, so Catalyst drives pushdown/pruning; fragment-level pruning
  * and latest-wins dedup are the two pieces the reference implements in
  * its storage layer and we add on top:
  *
  *  - **latest-wins** [SURVEY §1.1 fragments]: newer fragment overwrites
  *    older at equal coordinates when `allowsDups=false`. When fragment
  *    MBRs are pairwise disjoint over the dims this is a no-op and the
  *    scan stays shuffle-free; only overlapping fragments pay a
  *    window-dedup — the 100 TB design is tile-aligned writes so
  *    overlap is rare (SURVEY §7.4.4).
  *  - **dense fill values**: unwritten cells of a dense array's domain
  *    materialize as fill values [ha_mytile.cc:1088–1164], via a
  *    generated coordinate grid left-joined to written cells.
  */
object GraftArray {

  // ---- DDL ----------------------------------------------------------

  def create(spark: SparkSession, uri: String, schema: ArraySchema): Unit =
    store(spark, uri).createTable(schema, now())

  def drop(spark: SparkSession, uri: String, deleteArrays: Boolean = true): Unit =
    // honors the reference's mytile_delete_arrays gate [ha_mytile.cc:2903]
    if (deleteArrays) store(spark, uri).dropTable()

  def exists(spark: SparkSession, uri: String): Boolean =
    store(spark, uri).exists()

  /** ALTER TABLE ADD COLUMN (schema evolution, S12). Existing fragments
    * keep their files; reads reconcile via fill value / null. */
  def addColumn(spark: SparkSession, uri: String, attr: AttributeSpec): Unit = {
    val st = store(spark, uri)
    val s = st.loadSchema()
    require(!s.columnNames.contains(attr.name), s"column ${attr.name} exists")
    st.evolveSchema(s.copy(attrs = s.attrs :+ attr), now())
  }

  /** ALTER TABLE DROP COLUMN (attributes only — dims are the key). */
  def dropColumn(spark: SparkSession, uri: String, name: String): Unit = {
    val st = store(spark, uri)
    val s = st.loadSchema()
    require(s.attrs.exists(_.name == name), s"no attribute $name")
    st.evolveSchema(s.copy(attrs = s.attrs.filterNot(_.name == name)), now())
  }

  // ---- write (INSERT → new immutable fragment) ----------------------

  /** Append `df` as one fragment. Null dimension values are rejected
    * (dims are the coordinate key [ha_mytile.cc:3166–3171]). Returns
    * the fragment timestamp (time-travel handle). */
  def write(spark: SparkSession, uri: String, df: DataFrame,
      origin: Option[String] = None,
      /** Explicit file/partition count for the clustered layout —
        * preferred over the `spark.graft.write.partitions` conf when a
        * caller needs a specific granularity (session-conf mutation is
        * a read-modify-write race under concurrent query building). */
      partitions: Option[Int] = None): Long =
    writeFragment(spark, uri, df, origin, None, Nil, partitions)

  /** Write only when the input has rows; an empty input leaves the
    * array untouched and returns None. Emptiness is decided from the
    * written files' parquet footers INSIDE the one write pass — the
    * streaming sink previously ran a separate `isEmpty` Spark job per
    * micro-batch before every write (one extra job per batch on
    * st9/st17/st18); an empty batch now pays one empty write + rollback
    * instead, and a non-empty batch pays nothing extra. */
  private[graft] def writeNonEmpty(spark: SparkSession, uri: String,
      df: DataFrame, origin: Option[String]): Option[Long] =
    writeFragmentImpl(spark, uri, df, origin, None, Nil, None,
      skipIfEmpty = true)

  /** Full write path; `commitTs`/`replaces` are consolidation's hooks
    * (commit the merged fragment at the originals' max timestamp so
    * the time-travel axis is preserved). */
  private[graft] def writeFragment(spark: SparkSession, uri: String,
      df: DataFrame, origin: Option[String],
      commitTs: Option[Long], replaces: Seq[String],
      partitions: Option[Int] = None): Long =
    writeFragmentImpl(spark, uri, df, origin, commitTs, replaces,
      partitions, skipIfEmpty = false).get

  private def writeFragmentImpl(spark: SparkSession, uri: String,
      df: DataFrame, origin: Option[String],
      commitTs: Option[Long], replaces: Seq[String],
      partitions: Option[Int],
      skipIfEmpty: Boolean): Option[Long] = {
    val st = store(spark, uri)
    val schema = st.loadSchema()
    require(!schema.encrypted, "encrypted arrays write through the DSv2 " +
      "path only (INSERT INTO via the graft catalog)")
    val cols = schema.columnNames
    require(df.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: ${df.columns.toSeq.sorted} vs ${cols.sorted}")

    val fragId = java.util.UUID.randomUUID.toString.take(12)
    val dataDir = st.fragmentDataDir(fragId)

    // conform input to the array's column types (parquet physical type
    // must match the schema exactly for the readers); sameType skips
    // nullability-only differences, which cast refuses to tighten
    val inTypes = df.schema.map(f => f.name -> f.dataType).toMap
    val typed = df.select(cols.map { c =>
      val want = schema.dataTypeOf(c)
      if (org.apache.spark.sql.graftshim.ColumnBridge.sameType(
        inTypes(c), want)) col(c)
      else col(c).cast(want).as(c)
    }: _*)
    // null-dim + enum-domain guards computed inside the same write pass
    val nullGuarded = schema.dims.foldLeft(typed) {
      (d, dim) =>
        d.withColumn(dim.name,
          when(col(dim.name).isNull,
            raise_error(lit(s"null value in dimension ${dim.name}")))
            .otherwise(col(dim.name)))
    }
    // enumerated attrs only accept their declared values
    // [ref: ENUM ⇄ TileDB Enumeration, ha_mytile.cc:1330–1351]
    val enumGuarded = schema.attrs.filter(_.enumValues.nonEmpty)
      .foldLeft(nullGuarded) { (d, a) =>
        d.withColumn(a.name,
          when(col(a.name).isNotNull &&
            !col(a.name).isInCollection(a.enumValues),
            raise_error(concat(lit(s"value not in enum ${a.name}: "),
              col(a.name).cast("string"))))
            .otherwise(col(a.name)))
      }
    // declared storage types (unsigned, TIME) enforce their value
    // domain — a UINT16 column rejects 70000 exactly as the reference's
    // unsigned columns do [mytile.cc:385–398; SURVEY §1.2]
    val guarded = schema.storageTyped.foldLeft(enumGuarded) {
      case (d, (n, st)) => (st.guardLo, st.guardHi) match {
        case (Some(lo), Some(hi)) =>
          val dt = schema.dataTypeOf(n)
          val (loL, hiL) = (lit(lo).cast(dt), lit(hi).cast(dt))
          d.withColumn(n,
            when(col(n).isNotNull && (col(n) < loL || col(n) > hiL),
              raise_error(concat(
                lit(s"value out of ${st.name} domain for $n: "),
                col(n).cast("string"))))
              .otherwise(col(n)))
        case _ => d
      }
    }
    // charset-limited string types reject characters outside their
    // repertoire, like the reference's ascii/ucs2 columns
    // [mytile.cc:218–224, 896–923]: ASCII iff UTF-8 octets == chars;
    // UCS-2 (fixed 2-byte, BMP-only) rejects supplementary planes
    val strGuarded = schema.storageTyped.foldLeft(guarded) {
      case (d, (n, st)) if graft.core.StorageTypes.asciiOnly(st.name) =>
        d.withColumn(n,
          when(col(n).isNotNull &&
            octet_length(col(n)) =!= length(col(n)),
            raise_error(concat(
              lit(s"non-ASCII value in ${st.name} $n: "), col(n))))
            .otherwise(col(n)))
      case (d, (n, st)) if graft.core.StorageTypes.bmpOnly(st.name) =>
        d.withColumn(n,
          when(col(n).isNotNull &&
            col(n).rlike("[\\x{10000}-\\x{10FFFF}]"),
            raise_error(concat(
              lit(s"supplementary character in ${st.name} $n: "),
              col(n))))
            .otherwise(col(n)))
      case (d, _) => d
    }
    // sums for the aggregate-pushdown fast path ride the write pass as
    // an Observation — the data is seen exactly once (the round-1
    // implementation re-read the fragment it had just written)
    val struct = schema.toStruct
    val numeric = struct.fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    })
    val obs = org.apache.spark.sql.Observation(s"graft_write_$fragId")
    val clustered = schema.buckets match {
      // bucketed layout: task i holds exactly bucket i (identity
      // partitioner — `repartition(n, expr)` would re-hash the bucket
      // id and mix buckets per task), rows sorted by dims within. The
      // file written by task i is bucket i, recorded in the manifest.
      case Some(n) => bucketByDim0(schema, strGuarded, n)
      case None => clusterByCellOrder(schema, strGuarded, partitions)
    }
    val observed =
      if (numeric.isEmpty) clustered
      else clustered.observe(obs,
        sum(col(numeric.head.name)).as(numeric.head.name),
        numeric.tail.map(f => sum(col(f.name)).as(f.name)): _*)
    // the fragment readers speak INT64-micros only — never INT96. The
    // conf is scoped to this write and RESTORED: setting it
    // permanently silently changed every later non-graft parquet write
    // in a session configured for INT96 interop.
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.getOption(tsTypeKey)
    spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
    try observed.write.mode("errorifexists")
      .option("compression", schema.effectiveCodec.toLowerCase)
      .parquet(dataDir.toString)
    finally prevTsType match {
      case Some(v) => spark.conf.set(tsTypeKey, v)
      case None => spark.conf.unset(tsTypeKey)
    }

    // min/max/nullCount from parquet footers (no data re-read)
    val fs = st.fileSystem
    val files = fs.listStatus(dataDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    val perFile = ParquetStats.collectPerFile(files, struct,
      spark.sparkContext.hadoopConfiguration)
    val rows = perFile.map(_._2).sum
    if (skipIfEmpty && rows == 0) {
      // roll back the empty fragment: no manifest was committed, so the
      // orphan data dir is invisible to every reader — remove it and
      // report "nothing written"
      fs.delete(dataDir, true)
      return None
    }
    // fragment stats = pure fold of the footers read ONCE above
    val (_, footerStats) = ParquetStats.merge(perFile, struct)
    val sums: Map[String, (Option[Long], Option[Double])] =
      if (numeric.isEmpty || rows == 0) Map.empty
      else {
        val row = obs.get
        numeric.map { f =>
          f.name -> (f.dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              (row.get(f.name).collect { case n: Number => n.longValue() }, None)
            case dt: DecimalType =>
              // decimal sums live in the manifest as unscaled longs
              (row.get(f.name).flatMap {
                case d: java.math.BigDecimal => try
                  Some(d.setScale(dt.scale).unscaledValue().longValueExact())
                catch { case _: ArithmeticException => None }
                case _ => None
              }, None)
            case _ =>
              (None, row.get(f.name).collect { case n: Number => n.doubleValue() })
          })
        }.toMap
      }
    val stats = footerStats.map { case (c, s0) =>
      val (sl, sd) = sums.getOrElse(c, (None, None))
      c -> s0.copy(sumLong = sl, sumDouble = sd)
    }
    val ts = commitTs.getOrElse(now())
    // bucketed fragments record file→bucket from the task index in the
    // part file name (probe-routed repartition ⇒ task index == bucket)
    val fileBuckets: Map[String, Int] = schema.buckets match {
      case Some(_) => files.flatMap { f =>
        "part-(\\d{5})".r.findFirstMatchIn(f.getName)
          .map(m => s"frag_$fragId/${f.getName}" -> m.group(1).toInt)
      }.toMap
      case None => Map.empty
    }
    st.commitFragment(FragmentMeta(fragId, ts,
      files.map(f => s"frag_$fragId/${f.getName}"), rows, stats,
      perFile.map { case (p, _, st0) =>
        s"frag_$fragId/${p.getName}" -> st0 }.toMap,
      perFile.map { case (p, n, _) =>
        s"frag_$fragId/${p.getName}" -> n }.toMap,
      buckets = schema.buckets.filter(_ =>
        fileBuckets.size == files.size),
      fileBuckets = fileBuckets,
      origin = origin, replaces = replaces,
      sortedBy = sortedByOf(schema)))
    Some(ts)
  }

  /** The column order this write path physically sorts each file by —
    * must mirror [[clusterByCellOrder]]/[[bucketByDim0]] exactly (a
    * HILBERT declaration that fails its preconditions falls back to
    * the ROW_MAJOR sort, so it IS dim-sorted). Recorded per fragment;
    * the scan reports it as output ordering when every visible
    * fragment agrees [ha_mytile.cc:3501–3519]. */
  private[graft] def sortedByOf(schema: ArraySchema): Seq[String] =
    schema.buckets match {
      case Some(_) => schema.dimNames
      case None => schema.cellOrder match {
        case "UNORDERED" => Nil
        case "HILBERT" if schema.dims.size >= 2 && schema.dims.size <= 63 &&
          schema.dims.forall(d => TypedValue.isIntegral(d.dataType) &&
            d.lowerBound.isDefined) => Nil
        case "COL_MAJOR" | "COLUMN_MAJOR" => schema.dimNames.reverse
        case _ => schema.dimNames
      }
    }

  /** Bucketed physical layout: `pmod(hash(dim0), n)` (Spark murmur3,
    * seed 42) routed so partition i — and therefore part file i —
    * holds exactly bucket i; rows sort by the dim tuple within each
    * bucket. The same hash is exposed as the catalog SQL function
    * `bucket(n, key)`, which the scan reports in its
    * KeyGroupedPartitioning so Spark can plan storage-partitioned
    * (shuffle-free) joins between co-bucketed arrays.
    *
    * Identity routing WITHOUT an RDD round-trip (which paid full row
    * ser/deser per bucketed write): `repartition(n, expr)` places a
    * row at `pmod(murmur3(expr), n)`, so route bucket b through a
    * PROBE integer chosen (on the driver, against the same
    * Murmur3_x86_32 Spark's hash() uses) to land exactly on partition
    * b. The probe lookup is a literal-array element_at — the whole
    * write stays a columnar plan-level shuffle. */
  private def bucketByDim0(schema: ArraySchema, df: DataFrame,
      n: Int): DataFrame = {
    val d0 = schema.dims.head.name
    require(TypedValue.isIntegral(schema.dims.head.dataType),
      s"graft.buckets requires an integral first dimension, got ${schema.dims.head.dataType}")
    // probes(b) = smallest int i with pmod(hashInt(i, 42), n) == b
    val probes = new Array[Int](n)
    val seen = new Array[Boolean](n)
    var found = 0
    var i = 0
    while (found < n) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, 42)
      val b = ((h % n) + n) % n
      if (!seen(b)) { seen(b) = true; probes(b) = i; found += 1 }
      i += 1
    }
    val bCol = "_graft_bucket"
    val rCol = "_graft_route"
    df.withColumn(bCol, pmod(hash(col(d0).cast("long")), lit(n)))
      .withColumn(rCol,
        element_at(array(probes.map(lit).toSeq: _*), col(bCol) + 1))
      .repartition(n, col(rCol))
      .sortWithinPartitions(schema.dimNames.map(col): _*)
      .drop(bCol, rCol)
  }

  /** Physical clustering per the array's `cell_order` before a fragment
    * is written [ref: cell/tile order ha_mytile.cc:71–73, 1380–1395]:
    * ROW_MAJOR / COL_MAJOR range-partition + sort by the dims (giving
    * files tight, near-disjoint MBRs → file-level scan pruning);
    * HILBERT clusters ANY number (≥2) of bounded integral dims along a
    * Hilbert curve [t/hilbert.test; TileDB's Hilbert order is n-D] —
    * 2-D keeps the rot-and-fold kernel, d-D uses the Skilling
    * transpose with bits = min(20, 63/d); UNORDERED writes as-is. */
  private def clusterByCellOrder(schema: ArraySchema, df: DataFrame,
      partitions: Option[Int] = None): DataFrame = {
    val dims = schema.dims
    // explicit partition count — AQE would otherwise coalesce the range
    // shuffle and collapse the per-file MBR granularity. Settable via
    // spark.graft.write.partitions (skips the extra physical-plan
    // conversion df.rdd costs); defaults to the input's partitioning.
    def parts: Int = partitions.orElse(df.sparkSession.conf
      .getOption("spark.graft.write.partitions").map(_.toInt))
      .getOrElse(math.max(df.rdd.getNumPartitions, 1))
    schema.cellOrder match {
      case "UNORDERED" => df
      case "HILBERT" if dims.size >= 2 && dims.size <= 63 &&
        dims.forall(d => TypedValue.isIntegral(d.dataType) &&
          d.lowerBound.isDefined) =>
        val bits = math.min(20, 63 / dims.size)
        def off(i: Int) =
          (col(dims(i).name).cast("long") - dims(i).lowerBound.get.toLong)
            .bitwiseAND(lit((1L << bits) - 1))
        val h =
          if (dims.size == 2)
            graft.functions.expressions.Kernels.hilbert2d(
              off(0), off(1), bits)
          else graft.functions.expressions.Kernels.hilbertNd(
            array(dims.indices.map(off): _*), bits)
        df.withColumn("_graft_h", h)
          .repartitionByRange(parts, col("_graft_h"))
          .sortWithinPartitions("_graft_h")
          .drop("_graft_h")
      case "COL_MAJOR" | "COLUMN_MAJOR" =>
        val order = dims.reverse.map(d => col(d.name))
        df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
      case _ => // ROW_MAJOR default
        val order = dims.map(d => col(d.name))
        df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
    }
  }

  // ---- read ---------------------------------------------------------

  /** Scan the array as a DataFrame.
    *
    * @param asOf   time-travel timestamp (millis); fragments committed
    *               after it are invisible [open_at semantics]
    * @param materializeFills dense arrays: generate unwritten cells of
    *               the bounded domain with attribute fill values
    * @param since  window start (millis, inclusive) — incremental view
    *               of fragments committed in `[since, asOf]`
    */
  def load(spark: SparkSession, uri: String, asOf: Option[Long] = None,
      materializeFills: Boolean = false,
      since: Option[Long] = None): DataFrame = {
    val st = store(spark, uri)
    val schema = st.loadSchema(asOf)
    require(!schema.encrypted, "encrypted arrays read through the DSv2 " +
      "path only (spark.read.format(\"graftarray\") or the graft catalog)")
    val frags = st.listFragments(asOf, since)
    // delete tombstones need per-cell masking — that lives in the
    // DSv2 readers, so tombstone-bearing arrays route there
    if (frags.exists(f =>
      f.deletePred.isDefined || f.deleteCoordFiles.nonEmpty)) {
      var r = spark.read.format("graftarray").option("path", uri)
      asOf.foreach(t => r = r.option("asOfTimestamp", t.toString))
      since.foreach(t => r = r.option("sinceTimestamp", t.toString))
      if (!materializeFills && schema.kind == ArrayKind.Dense)
        r = r.option("graft.internal.raw_cells", "true")
      return r.load()
    }
    val deduped = mergedView(spark, uri, schema, frags)
    if (materializeFills && schema.kind == ArrayKind.Dense)
      materializeDense(spark, schema, deduped)
    else deduped
  }

  /** Latest-wins merged view of an explicit fragment set (the
    * building block of `load` and of consolidation). */
  private def mergedView(spark: SparkSession, uri: String,
      schema: ArraySchema, frags: Seq[FragmentMeta]): DataFrame = {
    val struct = schema.toStruct
    if (frags.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], struct)

    val paths = frags.flatMap(f => f.files.map(rel => s"$uri/$rel"))
    // explicit schema → old fragments lacking evolved columns read null,
    // dropped columns are simply not requested
    var df = spark.read.schema(struct).parquet(paths: _*)

    // evolved-column fill values — ONLY for fragments that physically
    // lack the column (pre-evolution: no stats entry, the manifest
    // records stats for every written column incl. all-null ones). An
    // unconditional coalesce would also rewrite EXPLICITLY-written
    // NULLs in post-evolution fragments to the fill, silently altering
    // data and diverging from the DSv2 read path, which leaves them
    // null.
    schema.attrs.foreach { a =>
      a.fillValue.foreach { fv =>
        if (frags.exists(!_.stats.contains(a.name))) {
          // per-fragment "lacks this column" flag, keyed off the file
          // path like _frag_ts below — no extra column storage
          val perFrag = map(frags.flatMap { f =>
            Seq(lit(f.id), lit(!f.stats.contains(a.name)))
          }: _*)
          df = df.withColumn(a.name,
            when(element_at(perFrag,
                regexp_extract(input_file_name(), "frag_([^/]+)/", 1)) &&
                col(a.name).isNull,
              lit(TypedValue.parse(a.dataType, fv)).cast(a.dataType))
              .otherwise(col(a.name)))
        }
      }
    }

    if (schema.allowsDups || frags.size <= 1 ||
      FragmentPruning.pairwiseDisjoint(frags, schema)) df
    else {
      // latest-wins: newer fragment overwrites equal coordinates.
      // _frag_ts derived from the file path → no extra column storage.
      val tsById = frags.map(f => (f.id, f.timestamp))
      val tsMap = map(tsById.flatMap {
        case (id, ts) => Seq(lit(id), lit(ts)) }: _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(schema.dimNames.map(col): _*)
        .orderBy(col("_frag_ts").desc)
      df.withColumn("_frag_id",
          regexp_extract(input_file_name(), "frag_([^/]+)/", 1))
        .withColumn("_frag_ts", element_at(tsMap, col("_frag_id")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_frag_id", "_frag_ts", "_rn")
    }
  }

  // ---- consolidation & vacuum ---------------------------------------
  // Fragment-count growth is the dominant metadata hazard at scale
  // (every write is a fragment; object stores hate small files). The
  // reference declares the OPTIMIZE TABLE capability for this
  // [HA_CONCURRENT_OPTIMIZE, ha_mytile.cc:2948]; the underlying array
  // storage model maintains arrays with consolidate-then-vacuum, which
  // is what these implement Spark-side: one distributed merge job, one
  // atomic manifest commit.

  /** Merge the fragments visible in `[since, asOf]` into ONE new
    * fragment committed at their max timestamp, superseding them
    * (`replaces`). Readers atomically switch to the consolidated
    * fragment; time travel to any instant before that max timestamp
    * still sees the originals (until vacuum). Latest-wins against
    * fragments outside the window is unchanged: within-window versions
    * collapse to the window's winner at the window's max timestamp.
    * The merge is a single distributed job (one shuffle on the dim
    * key), and the rewrite re-clusters cells, restoring per-file MBR
    * pruning that many small interleaved fragments had destroyed.
    * Returns the consolidated fragment's timestamp, or None if fewer
    * than two fragments were eligible. */
  def consolidate(spark: SparkSession, uri: String,
      since: Option[Long] = None, asOf: Option[Long] = None,
      /** Rewrite even a single already-merged data fragment — the
        * rebucket path needs the rewrite for its LAYOUT, not for a
        * merge. Full consolidation only. */
      force: Boolean = false): Option[Long] = {
    val st = store(spark, uri)
    val schema = st.loadSchema(asOf)
    val frags = st.listFragments(asOf, since)
    def isTomb(f: FragmentMeta) =
      f.deletePred.isDefined || f.deleteCoordFiles.nonEmpty
    val dataN = frags.count(!isTomb(_))
    // worth doing iff there is a merge (≥2 data fragments), a delete
    // to apply physically, or (full only) pure tombstones to reclaim
    val anyTomb = frags.exists(isTomb)
    if (frags.isEmpty || (!force && dataN < 2 && !anyTomb)) return None
    if (dataN == 0 && since.isDefined) return None // tombstone-only window
    // a windowed merge cannot absorb a fragment that carries BOTH
    // data and a delete marker (row-level MERGE coordinate files,
    // INSERT OVERWRITE predicate): its tombstone masks pre-window
    // rows, but leaving it out of the merge would surface its DATA
    // files twice — full consolidation handles these
    if (since.isDefined && frags.exists(f =>
      f.deleteCoordFiles.nonEmpty ||
        (f.deletePred.isDefined && f.files.nonEmpty)))
      return None
    val maxTs = frags.map(_.timestamp).max
    // Windowed consolidation must NOT absorb tombstones: an in-window
    // tombstone also masks PRE-window fragments, and hiding it would
    // unmask them. Full consolidation (no since) replaces every
    // visible fragment, so nothing older remains to unmask — this is
    // also the ONLY reclamation path for tombstones, so windowed-only
    // maintenance regimes should run a periodic full consolidation.
    // The merged fragment commits at maxTs ≥ every in-window
    // tombstone's timestamp, so surviving tombstones never re-mask it.
    val replaced =
      if (since.isDefined) frags.filterNot(isTomb) else frags
    val merged =
      if (!schema.encrypted && !anyTomb)
        // tombstone-free: Spark's vectorized parquet read (mergedView)
        // — several× faster than the row-path DSv2 readers on the
        // scan-bound part of a large consolidation
        mergedView(spark, uri, schema, frags)
      else {
        // the DSv2 scan applies latest-wins AND tombstone masking;
        // raw_cells keeps dense fills virtual (written cells only)
        var r = spark.read.format("graftarray").option("path", uri)
          .option("graft.internal.raw_cells", "true")
        since.foreach(t => r = r.option("sinceTimestamp", t.toString))
        asOf.foreach(t => r = r.option("asOfTimestamp", t.toString))
        r.load()
      }
    val origin = s"consolidate:${replaced.size}"
    if (schema.encrypted) {
      // encrypted data round-trips through the DSv2 writer only (it
      // re-encrypts); the consolidation hooks ride as internal write
      // options inside the maintenance window — rejected on ordinary
      // user writes. The session must hold the key for both halves.
      spark.conf.set(graft.sources.v2.GraftMaintenance.ConfFlag, "true")
      try
        merged.write.format("graftarray").option("path", uri)
          .option("graft.internal.commit_ts", maxTs.toString)
          .option("graft.internal.replaces", replaced.map(_.id).mkString(","))
          .option("graft.internal.origin", origin)
          .mode("append").save()
      finally spark.conf.unset(graft.sources.v2.GraftMaintenance.ConfFlag)
    } else {
      // the convenience writer re-clusters cells (restoring per-file
      // MBR pruning), which the DSv2 INSERT path does not
      writeFragment(spark, uri, merged, origin = Some(origin),
        commitTs = Some(maxTs), replaces = replaced.map(_.id))
    }
    carryStreamLedger(spark, uri, replaced)
    Some(maxTs)
  }

  /** `CALL cat.rollback('t', ts)` — point-in-time restore as a NEW
    * immutable commit (never a history rewrite): the latest-wins view
    * AS OF `ts` (tombstones applied, dense fills kept virtual) is
    * rewritten as one fragment that `replaces` EVERYTHING currently
    * visible, committing at now(). Post-rollback reads see exactly the
    * `ts` content; the bad period stays time-travelable until vacuum
    * reclaims it — the undo-a-bad-ingest admin verb with the same
    * history-for-space trade as consolidation. Rolling back to before
    * the first fragment empties the table (documented; the view is
    * legitimately empty there). Returns the restore fragment's
    * timestamp, or None when nothing newer than `ts` exists. */
  /** Physically delete the fragments committed in `[lo, hi]` — the
    * storage model's history-surgery verb (TileDB's
    * `Array::delete_fragments`, the TTL-expiry / bad-ingest-removal
    * API). Unlike rollback (which ADDS a commit and preserves
    * history), this removes the window's commits outright: versions
    * the window shadowed resurface under latest-wins, and time travel
    * into the window no longer sees its writes. Safety rules:
    *  1. an in-window CONSOLIDATED fragment whose absorbed originals
    *     are already vacuumed is refused — it carries content
    *     committed OUTSIDE the window, and the originals no longer
    *     exist to resurface;
    *  2. out-of-window fragments are never touched — including
    *     consolidated ones replacing in-window originals (those
    *     originals die here, which is exactly the cleanup vacuum
    *     would have done).
    * Deletion is post-order (the vacuum rule): a consolidated victim
    * outlives the victims it replaces, so every intermediate state a
    * crash could leave behind is still a readable timeline. Returns
    * the number of fragments removed.
    *
    * Superseded-victim caveat (spec-pinned): an in-window fragment
    * that an OUT-of-window consolidated fragment already absorbed is
    * removed from history, but its content lives on inside the
    * consolidated fragment — the current read is unchanged. That is
    * the storage model's contract too: consolidation bakes the
    * window's writes into a later commit, so "remove the bad wave"
    * must run BEFORE full consolidation (or target the consolidated
    * fragment's own window, pre-vacuum). Callers removing bad data
    * should check the visible read afterwards, not the removed
    * count. */
  def deleteFragments(spark: SparkSession, uri: String,
      lo: Long, hi: Long): Int = {
    val st = store(spark, uri)
    val all = st.listFragmentsRaw()
    val existing = all.map(_.id).toSet
    val victims = all.filter(f => f.timestamp >= lo && f.timestamp <= hi)
    victims.foreach { f =>
      val missing = f.replaces.filterNot(existing.contains)
      require(missing.isEmpty,
        s"delete_fragments: fragment ${f.id} absorbed already-vacuumed " +
          s"fragments ${missing.mkString(",")} — deleting it would destroy " +
          "data committed outside [" + lo + ", " + hi + "]")
    }
    val byId = victims.map(f => f.id -> f).toMap
    val done = scala.collection.mutable.Set.empty[String]
    def rm(f: FragmentMeta): Unit = if (!done.contains(f.id)) {
      done += f.id
      f.replaces.flatMap(byId.get).foreach(rm)
      st.removeFragment(f)
    }
    victims.foreach(rm)
    victims.size
  }

  /** Size-tiered SMALL-fragment compaction — the policy form of
    * consolidation the reference's storage engine runs as incremental
    * "consolidation steps" over adjacent small fragments (TileDB's
    * step_min/max_frags + size-ratio policy behind the plugin's
    * OPTIMIZE TABLE hook, ha_mytile.cc:2948): streaming ingest leaves
    * trails of tiny fragments whose per-fragment planning cost
    * eventually dominates, but FULL consolidation would rewrite the
    * big fragments too. Walks the visible timeline and
    * windowed-consolidates each maximal run of >= 2 CONSECUTIVE data
    * fragments with rows <= maxRows — rewrite cost is O(small data),
    * never O(table); large fragments are never touched. Tombstone-
    * carrying fragments break runs (windowed consolidation's own
    * safety rule), and a run whose [first, last] timestamp window
    * would capture a fragment OUTSIDE the run (timestamp tie with a
    * neighbor) is skipped conservatively — the id-set check makes the
    * window exact, not heuristic. Returns (runs compacted, fragments
    * absorbed). */
  def consolidateSmall(spark: SparkSession, uri: String,
      maxRows: Long): (Int, Int) = {
    val st = store(spark, uri)
    def isTomb(f: FragmentMeta) =
      f.deletePred.isDefined || f.deleteCoordFiles.nonEmpty
    val frags = st.listFragments()
    val runs = scala.collection.mutable.ArrayBuffer[Seq[FragmentMeta]]()
    val cur = scala.collection.mutable.ArrayBuffer[FragmentMeta]()
    frags.foreach { f =>
      if (!isTomb(f) && f.rows <= maxRows) cur += f
      else { if (cur.size >= 2) runs += cur.toSeq; cur.clear() }
    }
    if (cur.size >= 2) runs += cur.toSeq
    var done = 0
    var absorbed = 0
    runs.foreach { run =>
      val lo = run.head.timestamp
      val hi = run.last.timestamp
      val window = st.listFragments(asOf = Some(hi), since = Some(lo))
      if (window.map(_.id) == run.map(_.id) &&
          consolidate(spark, uri, since = Some(lo), asOf = Some(hi))
            .isDefined) {
        done += 1
        absorbed += run.size
      }
    }
    (done, absorbed)
  }

  def rollback(spark: SparkSession, uri: String, asOfTs: Long)
      : Option[Long] = {
    val st = store(spark, uri)
    val schema = st.loadSchema()
    val frags = st.listFragments(None)
    if (!frags.exists(_.timestamp > asOfTs)) return None
    val view = spark.read.format("graftarray").option("path", uri)
      .option("graft.internal.raw_cells", "true")
      .option("asOfTimestamp", asOfTs.toString).load()
    val origin = s"rollback:$asOfTs"
    val ts =
      if (schema.encrypted) {
        // encrypted content round-trips through the DSv2 writer only
        // (it re-encrypts); maintenance hooks ride as internal options
        val commitAt = now()
        spark.conf.set(graft.sources.v2.GraftMaintenance.ConfFlag, "true")
        try
          view.write.format("graftarray").option("path", uri)
            .option("graft.internal.commit_ts", commitAt.toString)
            .option("graft.internal.replaces",
              frags.map(_.id).mkString(","))
            .option("graft.internal.origin", origin)
            .mode("append").save()
        finally
          spark.conf.unset(graft.sources.v2.GraftMaintenance.ConfFlag)
        commitAt
      } else
        writeFragment(spark, uri, view, origin = Some(origin),
          commitTs = None, replaces = frags.map(_.id))
    carryStreamLedger(spark, uri, frags)
    Some(ts)
  }

  /** `CALL cat.rebucket('t', n)` — change the storage bucket count:
    * evolve the schema (a NEW version; time travel keeps the old one)
    * and rewrite the visible content as ONE consolidated fragment laid
    * out bucket-complete under the new count. The scan's
    * KeyGroupedPartitioning gate requires EVERY visible fragment to
    * match the schema's count, so this rewrite is what (re-)arms
    * shuffle-free storage-partitioned joins / GROUP BY after the
    * count changes — or after DSv2/DML fragments (never
    * bucket-complete) degraded the layout. `n <= 0` removes
    * bucketing. Pre-rebucket time-travel reads degrade safely to
    * UnknownPartitioning (old schema count vs. new fragment count
    * fails the gate): correct rows, conservative layout. Returns the
    * rewritten fragment's timestamp; None when nothing was rewritten
    * (empty array — the schema still evolves). */
  def rebucket(spark: SparkSession, uri: String, n: Int): Option[Long] = {
    val st = store(spark, uri)
    val s = st.loadSchema()
    require(!s.encrypted,
      "rebucket is unsupported on encrypted arrays: their consolidation " +
        "rides the DSv2 writer, which does not produce bucket-complete " +
        "files, so the rewrite could never re-arm the layout")
    val nb = if (n > 0) Some(n) else None
    if (s.buckets == nb) return None
    st.evolveSchema(s.copy(buckets = nb), now())
    consolidate(spark, uri, force = true)
  }

  /** Consolidation absorbs fragments whose origin tags are the
    * streaming sink's replay ledger; before vacuum can delete those
    * manifests, promote each sink's max committed batchId into array
    * metadata so a post-vacuum replay still recognizes it
    * (EventPipeline.commitStreamBatch checks both layers). */
  private def carryStreamLedger(spark: SparkSession, uri: String,
      replaced: Seq[FragmentMeta]): Unit = {
    val tags = replaced.flatMap(_.origin).flatMap { o =>
      if (!o.startsWith("stream:")) None
      else {
        val rest = o.stripPrefix("stream:")
        val cut = rest.lastIndexOf(':') // sinkId may itself contain ':'
        if (cut < 0) None
        else scala.util.Try(rest.take(cut) -> rest.drop(cut + 1).toLong)
          .toOption
      }
    }
    if (tags.nonEmpty) {
      val st = store(spark, uri)
      val cur = st.loadMetadata()
      val updates = tags.groupBy(_._1).flatMap { case (sink, xs) =>
        val hi = xs.map(_._2).max
        val key = s"graft.stream.$sink.last_batch"
        if (cur.get(key).exists(_.toLong >= hi)) None
        else Some(key -> hi.toString)
      }
      if (updates.nonEmpty) putMetadata(spark, uri, updates)
    }
  }

  /** Reclaim fragments superseded by consolidation: delete their
    * manifests and data directories. Irreversible — time travel to
    * pre-consolidation instants afterwards sees the consolidated
    * content only (the same history-for-space trade the storage
    * model's vacuum makes). Returns the number removed. */
  def vacuum(spark: SparkSession, uri: String): Int = {
    val st = store(spark, uri)
    val all = st.listFragmentsRaw()
    val replaced = all.flatMap(_.replaces).toSet
    val victims = all.filter(f => replaced.contains(f.id))
    // deletion order matters under nested consolidation: a victim that
    // itself replaces other victims (an intermediate consolidated
    // fragment) must outlive them — if it were deleted first and
    // vacuum crashed, its orphans would resurface next to the final
    // consolidated fragment as duplicates. Post-order keeps every
    // intermediate state readable.
    val byId = victims.map(f => f.id -> f).toMap
    val done = scala.collection.mutable.Set.empty[String]
    def rm(f: FragmentMeta): Unit = if (!done.contains(f.id)) {
      done += f.id // mark first: replaces cycles are malformed, not loops
      f.replaces.flatMap(byId.get).foreach(rm)
      st.removeFragment(f)
    }
    victims.foreach(rm)
    victims.size
  }

  /** `uri@metadata` — key/value metadata as a 2-column table
    * [ref: mytile-metadata.cc:40–105, discovery 475–583]. */
  def metadata(spark: SparkSession, uri: String,
      asOf: Option[Long] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val kv = store(spark, uri).loadMetadata(asOf)
    spark.createDataFrame(
      kv.toSeq.sortBy(_._1)
        .map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      StructType(Seq(StructField("key", StringType, nullable = false),
        StructField("value", StringType))))
  }

  def putMetadata(spark: SparkSession, uri: String,
      kv: Map[String, String]): Unit =
    store(spark, uri).putMetadata(kv, now())

  /** Dense-domain fill materialization: bounded integral dims →
    * generated grid left-joined with written cells; unwritten cells get
    * attribute fill values. Grid generation is `spark.range`-based on
    * the first dim (partitioned, scales linearly) × sequence-explode on
    * the rest. */
  private def materializeDense(spark: SparkSession, schema: ArraySchema,
      cells: DataFrame): DataFrame = {
    val bounded = schema.dims.forall(d =>
      d.lowerBound.isDefined && d.upperBound.isDefined &&
        TypedValue.isIntegral(d.dataType))
    require(bounded, "materializeFills requires bounded integral dims")
    val d0 = schema.dims.head
    var grid: DataFrame = spark.range(
      d0.lowerBound.get.toLong, d0.upperBound.get.toLong + 1)
      .select(col("id").cast(d0.dataType).as(d0.name))
    schema.dims.tail.foreach { d =>
      grid = grid
        .withColumn(d.name, explode(sequence(lit(d.lowerBound.get.toLong),
          lit(d.upperBound.get.toLong))))
        .withColumn(d.name, col(d.name).cast(d.dataType))
    }
    val joined = grid.join(cells, schema.dimNames, "left")
    schema.attrs.foldLeft(joined) { (df, a) =>
      a.fillValue match {
        case Some(fv) => df.withColumn(a.name,
          coalesce(col(a.name),
            lit(TypedValue.parse(a.dataType, fv)).cast(a.dataType)))
        case None => df
      }
    }
  }

  // ---- helpers ------------------------------------------------------

  /** Visible fragment manifests (driver-side, manifest-sized — never
    * touches data files). */
  def fragments(spark: SparkSession, uri: String): Seq[FragmentMeta] =
    store(spark, uri).listFragments()

  /** Commit a delete-condition tombstone: CELLS (stored versions) of
    * every EARLIER fragment matching `pred` are masked from reads
    * at/after this commit (time travel below it is untouched). This is
    * the storage model's per-version delete condition — an attribute
    * predicate can mask a coordinate's visible version while an older
    * version survives and becomes visible again. SQL DELETE restricts
    * itself to dimension predicates for exact row semantics; this API
    * offers the full surface. Manifest-only — no data I/O;
    * consolidation+vacuum later reclaims masked rows physically. */
  def commitTombstone(spark: SparkSession, uri: String,
      pred: graft.sources.v2.PredicateSupport.Pred): Long = {
    val st = store(spark, uri)
    val schema = st.loadSchema()
    // TrueP (TRUNCATE) carries no values, so the plaintext leak that
    // blocks value-bearing predicates does not apply to it
    require(!schema.encrypted ||
        pred == graft.sources.v2.PredicateSupport.TrueP,
      "delete conditions on encrypted arrays are not supported (the " +
        "predicate would persist in plaintext next to encrypted files)")
    val unknown = pred.refs.diff(schema.columnNames.toSet)
    require(unknown.isEmpty,
      s"delete predicate references unknown columns: ${unknown.mkString(", ")}")
    val ts = now()
    st.commitFragment(FragmentMeta(
      java.util.UUID.randomUUID.toString.take(12), ts, Nil, 0L, Map.empty,
      deletePred = Some(graft.sources.v2.PredJson.toJson(pred))))
    ts
  }

  private[graft] def store(spark: SparkSession, uri: String): FragmentStore =
    new FragmentStore(uri, spark.sparkContext.hadoopConfiguration)

  private val lastTs = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Strictly increasing commit timestamp (millis). */
  private[graft] def now(): Long =
    lastTs.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))
}

/** Fragment pruning: pushed dim ranges ∩ fragment MBRs (P10) and the
  * disjointness test that lets scans skip latest-wins dedup. */
object FragmentPruning {

  /** Can any row of a file with per-column stats `st` satisfy every
    * constraint in `cons`? The ONE file-level stats test shared by
    * partition planning (GraftScanImpl.selectFiles) and the aggregate
    * consumption proof (GraftScanBuilder.survivingFiles) — keeping
    * the two callers in lockstep is what makes predicate consumption
    * sound. Missing stats keep the file conservatively. */
  def fileOverlaps(schema: ArraySchema, st: Map[String, ColumnStats],
      cons: Map[String, graft.core.RangeAlgebra.DimConstraint]): Boolean =
    cons.forall { case (colName, c) =>
      val dt = schema.dataTypeOf(colName)
      st.get(colName) match {
        case Some(cs) => (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) => c.overlapsMbr(
            TypedValue.parse(dt, mn), TypedValue.parse(dt, mx))
          case _ => true
        }
        case None => true
      }
    }

  /** Parsed dim MBRs, one per fragment; `None` bound = unknown stats
    * (conservatively overlaps everything on that side). Parsed ONCE —
    * overlap analysis runs over these, never re-reading manifests. */
  type Box = IndexedSeq[(Option[Any], Option[Any])]

  def parseBoxes(frags: Seq[FragmentMeta],
      schema: ArraySchema): IndexedSeq[Box] =
    frags.map { f =>
      schema.dims.map { d =>
        val st = f.stats.get(d.name)
        (st.flatMap(_.min).map(TypedValue.parse(d.dataType, _)),
          st.flatMap(_.max).map(TypedValue.parse(d.dataType, _)))
      }.toIndexedSeq
    }.toIndexedSeq

  /** Do boxes `a` and `b` overlap in every dim from index `from` on?
    * A dim separates iff a KNOWN max lies strictly below a KNOWN min —
    * an unknown bound on the other side cannot undo that separation
    * (a recorded max is the actual max), so partially-known stats
    * still prune; fully-unknown dims overlap conservatively. */
  private def boxesOverlap(a: Box, b: Box, from: Int,
      ord: Ordering[Any]): Boolean =
    !(from until a.size).exists { d =>
      val ((mn1, mx1), (mn2, mx2)) = (a(d), b(d))
      (for (x <- mx1; n <- mn2) yield ord.compare(x, n) < 0)
        .getOrElse(false) ||
        (for (x <- mx2; n <- mn1) yield ord.compare(x, n) < 0)
          .getOrElse(false)
    }

  /** Visit every overlapping fragment pair via a dim0 sweep: sort by
    * dim0 lower bound, keep an active set pruned by dim0 upper bound,
    * and full-check only dim0-overlapping candidates. O(n log n + k·d)
    * for k true overlap pairs — a streaming-ingested table with tens
    * of thousands of time/key-ordered fragments plans in linear-ish
    * driver time instead of the naive O(n²·d) with per-pair stat
    * re-parsing. Worst case (all fragments mutually overlapping in
    * dim0) degrades to O(n²) CHEAP comparisons, no parsing.
    * `onPair` returns false to stop the sweep early. */
  def forEachOverlappingPair(boxes: IndexedSeq[Box],
      onPair: (Int, Int) => Boolean): Unit = {
    if (boxes.size < 2) return
    val ord = TypedValue.ordering
    // None lower bound = -inf → sorts first
    val order = boxes.indices.sortWith { (i, j) =>
      (boxes(i).head._1, boxes(j).head._1) match {
        case (None, None) => i < j
        case (None, _) => true
        case (_, None) => false
        case (Some(a), Some(b)) =>
          val c = ord.compare(a, b); if (c != 0) c < 0 else i < j
      }
    }
    val active = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- order) {
      val lo = boxes(i).head._1
      // evict actives whose dim0 max is strictly below i's dim0 min
      // (None max = +inf, never evicted; None lo = -inf, evicts none)
      lo.foreach { l =>
        var w = 0
        var r = 0
        while (r < active.size) {
          val keep = boxes(active(r)).head._2 match {
            case Some(mx) => ord.compare(mx, l) >= 0
            case None => true
          }
          if (keep) { active(w) = active(r); w += 1 }
          r += 1
        }
        active.takeInPlace(w)
      }
      // actives have dim0 lower ≤ lo and dim0 upper ≥ lo → dim0
      // overlaps; check the remaining dims only
      var a = 0
      while (a < active.size) {
        val j = active(a)
        if (boxesOverlap(boxes(i), boxes(j), 1, ord) &&
          !onPair(math.min(i, j), math.max(i, j))) return
        a += 1
      }
      active += i
    }
  }

  /** Do any two fragments overlap in dim-MBR space? Sweep-based over
    * fragment *metadata* (manifest-sized, not data-sized). */
  def pairwiseDisjoint(frags: Seq[FragmentMeta], schema: ArraySchema): Boolean = {
    var disjoint = true
    forEachOverlappingPair(parseBoxes(frags, schema),
      (_, _) => { disjoint = false; false })
    disjoint
  }

  /** Fragments whose MBR intersects every pushed dim constraint. */
  def select(frags: Seq[FragmentMeta], schema: ArraySchema,
      constraints: Map[String, RangeAlgebra.DimConstraint]): Seq[FragmentMeta] =
    frags.filter { f =>
      constraints.forall { case (dim, c) =>
        val dt = schema.dataTypeOf(dim)
        f.stats.get(dim) match {
          case Some(st) => (st.min, st.max) match {
            case (Some(mn), Some(mx)) =>
              c.overlapsMbr(TypedValue.parse(dt, mn), TypedValue.parse(dt, mx))
            case _ => true // no stats → can't prune
          }
          case None => true
        }
      }
    }
}
