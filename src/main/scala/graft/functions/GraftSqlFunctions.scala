package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's kernels as DSv2 catalog functions — `SELECT
  * cat.cosine(a, b)` works for pure-SQL users with no Scala imports
  * (the reference has no engine-level functions, SURVEY §2.7; this is
  * additive surface for the LLM-pipeline operators). Every function
  * is a per-row replica of the corresponding Column builder in
  * [[TextFunctions]] / [[VectorFunctions]] — `FunctionsSpec` asserts
  * equality on real data, and the md5-derived ones (`hash60`,
  * `simhash`, `fingerprint`) replay bit-exactly in DuckDB like their
  * Column counterparts. Each bound function carries a magic `invoke`
  * method (ScalarFunction.MAGIC_METHOD_NAME), so calls compile to a
  * direct method call instead of reflective `produceResult`. */
object GraftSqlFunctions {

  val all: Seq[UnboundFunction] = Seq(
    DotFn, CosineFn, Hash60Fn, TokenCountFn, SimhashFn, FingerprintFn,
    Hilbert2dFn, HilbertNdFn, Sq8Fn, Sq8DotFn, HashedFeaturesFn,
    BucketFn, StPointFn, StGeomFromWkbFn, StIntersectsFn, StWithinFn,
    StEqualsFn, StOverlapsFn, UnicodeNormalizeFn, CompressionRatioFn,
    CharNgramsFn, XorAggFn)

  def byName(name: String): Option[UnboundFunction] =
    all.find(_.name == name.toLowerCase)

  // ---- xor64: a V2 AGGREGATE through the FunctionCatalog ------------
  // Order-independent 64-bit XOR digest — the content-addressable
  // corpus checksum (`SELECT cat.xor64(cat.hash60(cat.fingerprint(
  // text))) GROUP BY source`): XOR is commutative/associative, so the
  // digest is identical under any partitioning, task order, or merge
  // tree — exactly the property a distributed checksum needs — and it
  // replays in DuckDB as bit_xor over the same md5-derived hashes.
  object XorAggFn extends UnboundFunction {
    override def name(): String = "xor64"
    override def description(): String =
      "xor64(bigint): order-independent 64-bit XOR digest aggregate"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == LongType,
        "xor64 expects one BIGINT argument")
      XorAggBound
    }
  }

  object XorAggBound
    extends AggregateFunction[java.lang.Long, java.lang.Long] {
    override def name(): String = "xor64"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def newAggregationState(): java.lang.Long = 0L
    override def update(s: java.lang.Long, in: InternalRow): java.lang.Long =
      if (in.isNullAt(0)) s else s ^ in.getLong(0)
    override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
      a ^ b
    override def produceResult(s: java.lang.Long): java.lang.Long = s
  }

  // ---- shared per-row kernels ---------------------------------------

  private[functions] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** 15 hex chars of md5 parsed base-16 — TextFunctions.hash60. */
  private[functions] def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  /** Whitespace tokens of trimmed text; split(re, -1) matches Spark's
    * StringSplit limit (-1 keeps trailing empties — none post-trim). */
  private[functions] def tokens(s: String): Array[String] =
    s.trim.split("\\s+", -1)

  private[functions] def normText(s: String): String =
    s.trim.replaceAll("\\s+", " ").toLowerCase

  private def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  // ---- dot ----------------------------------------------------------

  private val FloatArray = ArrayType(FloatType)

  abstract class VecVecFn(val name: String) extends UnboundFunction {
    def bound: BoundFunction
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 && inputType.forall(f =>
        f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType == FloatType),
        s"$name expects (array<float>, array<float>), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      bound
    }
  }

  object DotFn extends VecVecFn("dot") {
    override def description: String =
      "dot(a array<float>, b array<float>) -> double: Σ aᵢ·bᵢ in " +
        "double precision, sequential (bit-identical to the oracle)"
    override def bound: BoundFunction = DotBound
  }

  object DotBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] = Array(FloatArray, FloatArray)
    override def resultType(): DataType = DoubleType
    override def name(): String = "dot"
    def invoke(a: ArrayData, b: ArrayData): Double = dotFF(a, b)
    override def produceResult(input: InternalRow): java.lang.Double =
      dotFF(input.getArray(0), input.getArray(1))
  }

  // ---- cosine -------------------------------------------------------

  object CosineFn extends VecVecFn("cosine") {
    override def description: String =
      "cosine(a array<float>, b array<float>) -> double: cosine " +
        "similarity; 0 for zero-norm inputs"
    override def bound: BoundFunction = CosineBound
  }

  object CosineBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] = Array(FloatArray, FloatArray)
    override def resultType(): DataType = DoubleType
    override def name(): String = "cosine"
    def invoke(a: ArrayData, b: ArrayData): Double = {
      // same operation order as VectorFunctions.cosine: d / (√aa·√bb)
      val d = dotFF(a, b)
      val nn = math.sqrt(dotFF(a, a)) * math.sqrt(dotFF(b, b))
      if (nn == 0.0) 0.0 else d / nn
    }
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(input.getArray(0), input.getArray(1))
  }

  // ---- string functions ---------------------------------------------

  abstract class StrFn(val name: String) extends UnboundFunction {
    def bound: BoundFunction
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == StringType,
        s"$name expects (string), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      bound
    }
  }

  object Hash60Fn extends StrFn("hash60") {
    override def description: String =
      "hash60(s string) -> bigint: 60-bit md5-derived hash " +
        "(DuckDB-replicable: ('0x'||substr(md5(s),1,15))::bigint)"
    override def bound: BoundFunction = Hash60Bound
  }

  object Hash60Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def name(): String = "hash60"
    def invoke(s: UTF8String): Long = hash60(s.toString)
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getUTF8String(0))
  }

  object TokenCountFn extends StrFn("token_count") {
    override def description: String =
      "token_count(s string) -> int: whitespace token count"
    override def bound: BoundFunction = TokenCountBound
  }

  object TokenCountBound extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "token_count"
    def invoke(s: UTF8String): Int = tokens(s.toString).length
    override def produceResult(input: InternalRow): java.lang.Integer =
      invoke(input.getUTF8String(0))
  }

  object SimhashFn extends StrFn("simhash") {
    override def description: String =
      "simhash(s string) -> bigint: 60-bit SimHash over whitespace " +
        "tokens (hash60 per token, majority vote per bit)"
    override def bound: BoundFunction = SimhashBound
  }

  object SimhashBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def name(): String = "simhash"
    def invoke(s: UTF8String): Long = {
      val counts = new Array[Int](60)
      tokens(s.toString).foreach { t =>
        val h = hash60(t)
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < 60) { if (counts(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getUTF8String(0))
  }

  object FingerprintFn extends StrFn("fingerprint") {
    override def description: String =
      "fingerprint(s string) -> string: md5 of whitespace-normalized " +
        "lowercase text (exact-dedup key)"
    override def bound: BoundFunction = FingerprintBound
  }

  object FingerprintBound extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "fingerprint"
    def invoke(s: UTF8String): UTF8String =
      UTF8String.fromString(md5Hex(normText(s.toString)))
    override def produceResult(input: InternalRow): UTF8String =
      invoke(input.getUTF8String(0))
  }

  // ---- hilbert2d ----------------------------------------------------

  object Hilbert2dFn extends UnboundFunction {
    override def name: String = "hilbert2d"
    override def description: String =
      "hilbert2d(x bigint, y bigint, bits int) -> bigint: Hilbert " +
        "curve index of (x, y) on a 2^bits grid (cell-order clustering)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 3 &&
        inputType.take(2).forall(_.dataType == LongType) &&
        inputType(2).dataType == IntegerType,
        s"hilbert2d expects (bigint, bigint, int), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      Hilbert2dBound
    }
  }

  object Hilbert2dBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] =
      Array(LongType, LongType, IntegerType)
    override def resultType(): DataType = LongType
    override def name(): String = "hilbert2d"
    def invoke(x: Long, y: Long, bits: Int): Long =
      graft.functions.expressions.Hilbert2D.xy2d(x, y, bits)
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0), input.getLong(1), input.getInt(2))
  }

  // ---- hilbert_nd ---------------------------------------------------

  object HilbertNdFn extends UnboundFunction {
    override def name: String = "hilbert_nd"
    override def description: String =
      "hilbert_nd(coords array<bigint>, bits int) -> bigint: Hilbert " +
        "curve index of a d-dimensional coordinate on a 2^bits grid " +
        "(n-D cell-order clustering; d*bits <= 63)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType.isInstanceOf[ArrayType] &&
        inputType(0).dataType.asInstanceOf[ArrayType]
          .elementType == LongType &&
        inputType(1).dataType == IntegerType,
        s"hilbert_nd expects (array<bigint>, int), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      HilbertNdBound
    }
  }

  object HilbertNdBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(LongType), IntegerType)
    override def resultType(): DataType = LongType
    override def name(): String = "hilbert_nd"
    override def produceResult(input: InternalRow): java.lang.Long =
      graft.functions.expressions.HilbertNd.compute(
        input.getArray(0), input.getInt(1))
  }

  // ---- sq8 quantization ---------------------------------------------

  object Sq8Fn extends UnboundFunction {
    override def name: String = "sq8"
    override def description: String =
      "sq8(v array<float>) -> binary: symmetric int8 scalar " +
        "quantization (scale = maxabs/127) — 4x smaller embedding scans"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 &&
        inputType(0).dataType.isInstanceOf[ArrayType] &&
        inputType(0).dataType.asInstanceOf[ArrayType]
          .elementType == FloatType,
        s"sq8 expects (array<float>), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      Sq8Bound
    }
  }

  object Sq8Bound extends ScalarFunction[Array[Byte]] {
    override def inputTypes(): Array[DataType] = Array(ArrayType(FloatType))
    override def resultType(): DataType = BinaryType
    override def name(): String = "sq8"
    override def produceResult(input: InternalRow): Array[Byte] =
      graft.functions.expressions.Sq8Quantize.compute(input.getArray(0))
  }

  object Sq8DotFn extends UnboundFunction {
    override def name: String = "sq8_dot"
    override def description: String =
      "sq8_dot(f array<float>, q binary) -> double: dot product of a " +
        "float vector against an sq8-quantized one (ANN scoring kernel)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType.isInstanceOf[ArrayType] &&
        inputType(0).dataType.asInstanceOf[ArrayType]
          .elementType == FloatType &&
        inputType(1).dataType == BinaryType,
        s"sq8_dot expects (array<float>, binary), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      Sq8DotBound
    }
  }

  object Sq8DotBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), BinaryType)
    override def resultType(): DataType = DoubleType
    override def name(): String = "sq8_dot"
    override def produceResult(input: InternalRow): java.lang.Double =
      graft.functions.expressions.DotFB.compute(
        input.getArray(0), input.getBinary(1))
  }

  // ---- hashed_features ----------------------------------------------

  object HashedFeaturesFn extends UnboundFunction {
    override def name: String = "hashed_features"
    override def description: String =
      "hashed_features(text string, dim int) -> array<bigint>: " +
        "hashing-trick token-count vector, bucket = 52-bit md5 prefix " +
        "mod dim (the t11 featurizer as pure SQL; DuckDB-replayable)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType == StringType &&
        inputType(1).dataType == IntegerType,
        s"hashed_features expects (string, int), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      HashedFeaturesBound
    }
  }

  object HashedFeaturesBound extends ScalarFunction[ArrayData] {
    override def inputTypes(): Array[DataType] =
      Array(StringType, IntegerType)
    override def resultType(): DataType =
      ArrayType(LongType, containsNull = false)
    override def name(): String = "hashed_features"
    def invoke(s: UTF8String, dim: Int): ArrayData = {
      require(dim > 0, s"hashed_features dim must be positive, got $dim")
      val counts = new Array[Long](dim)
      tokens(s.toString).foreach { t =>
        val b = java.lang.Long.parseLong(
          md5Hex(t).substring(0, 13), 16) % dim
        counts(b.toInt) += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
    }
    override def produceResult(input: InternalRow): ArrayData =
      invoke(input.getUTF8String(0), input.getInt(1))
  }

  // ---- char_ngrams --------------------------------------------------

  object CharNgramsFn extends UnboundFunction {
    override def name: String = "char_ngrams"
    override def description: String =
      "char_ngrams(s string, k int) -> array<string>: distinct " +
        "character k-grams in first-occurrence order (code-point " +
        "windows — the d9 tokenizer-free dedup shingle as pure SQL; " +
        "pair with lower()/regexp_replace to normalize first)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType == StringType &&
        inputType(1).dataType == IntegerType,
        s"char_ngrams expects (string, int), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      CharNgramsBound
    }
  }

  object CharNgramsBound extends ScalarFunction[ArrayData] {
    override def inputTypes(): Array[DataType] =
      Array(StringType, IntegerType)
    override def resultType(): DataType =
      ArrayType(StringType, containsNull = false)
    override def name(): String = "char_ngrams"
    def invoke(s: UTF8String, k: Int): ArrayData = {
      require(k > 0, s"char_ngrams k must be positive, got $k")
      expressions.CharGramsExpr.compute(s, k)
    }
    override def produceResult(input: InternalRow): ArrayData =
      invoke(input.getUTF8String(0), input.getInt(1))
  }

  // ---- bucket (storage-partitioned-join transform) ------------------
  // The `graft.buckets` layout function: file i of a bucketed fragment
  // holds exactly the rows with bucket(n, dim0) == i. The scan reports
  // KeyGroupedPartitioning over this transform; Spark resolves it
  // through this catalog, so two co-bucketed arrays join with no
  // shuffle (storage-partitioned joins, spark.sql.sources.v2.bucketing).

  object BucketFn extends UnboundFunction {
    override def name: String = "bucket"
    override def description: String =
      "bucket(n int, key bigint) -> int: pmod(murmur3(key, seed 42), n) " +
        "— the graft.buckets layout transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType == IntegerType &&
        (inputType(1).dataType == LongType ||
          inputType(1).dataType == IntegerType),
        s"bucket expects (int, bigint), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      BucketBound
    }
  }

  object BucketBound extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    /** MUST match the write path exactly: pmod(hash(cast(dim0 as
      * bigint)), n) — Spark murmur3 of the long value, seed 42. */
    def invoke(n: Int, key: Long): Int =
      Math.floorMod(org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(key, 42), n)
    override def produceResult(input: InternalRow): java.lang.Integer =
      invoke(input.getInt(0), input.getLong(1))
  }

  // ---- spatial (reference P7, ha_mytile.cc:2312–2507) ---------------
  // Geometry values are WKB binary. The predicate functions define
  // intersection/containment on geometry MBRs — exact for points and
  // axis-aligned boxes, and precisely the region the reference's
  // storage pushdown answers. Constant-geometry calls over dimension
  // columns are additionally rewritten to dim ranges at pushdown time
  // (PredicateSupport.convert), so they prune fragments/files like any
  // BETWEEN.

  object StPointFn extends UnboundFunction {
    override def name: String = "st_point"
    override def description: String =
      "st_point(x double, y double) -> binary: WKB point"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType.forall(_.dataType == DoubleType),
        s"st_point expects (double, double), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      StPointBound
    }
  }

  object StPointBound extends ScalarFunction[Array[Byte]] {
    override def inputTypes(): Array[DataType] = Array(DoubleType, DoubleType)
    override def resultType(): DataType = BinaryType
    override def name(): String = "st_point"
    def invoke(x: Double, y: Double): Array[Byte] = Wkb.point(x, y)
    override def produceResult(input: InternalRow): Array[Byte] =
      invoke(input.getDouble(0), input.getDouble(1))
  }

  abstract class BinFn(val name: String, arity: Int) extends UnboundFunction {
    def bound: BoundFunction
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == arity &&
        inputType.forall(_.dataType == BinaryType),
        s"$name expects $arity WKB binary argument(s), got " +
          inputType.map(_.dataType.simpleString).mkString(", "))
      bound
    }
  }

  object StGeomFromWkbFn extends BinFn("st_geomfromwkb", 1) {
    override def description: String =
      "st_geomfromwkb(wkb binary) -> binary: validates and returns the " +
        "WKB geometry (graft's geometry representation IS WKB)"
    override def bound: BoundFunction = StGeomFromWkbBound
  }

  object StGeomFromWkbBound extends ScalarFunction[Array[Byte]] {
    override def inputTypes(): Array[DataType] = Array(BinaryType)
    override def resultType(): DataType = BinaryType
    override def name(): String = "st_geomfromwkb"
    def invoke(wkb: Array[Byte]): Array[Byte] = { Wkb.mbr(wkb); wkb }
    override def produceResult(input: InternalRow): Array[Byte] =
      invoke(input.getBinary(0))
  }

  object StIntersectsFn extends BinFn("st_intersects", 2) {
    override def description: String =
      "st_intersects(a binary, b binary) -> boolean: MBR overlap of " +
        "two WKB geometries (exact for points/boxes)"
    override def bound: BoundFunction = StIntersectsBound
  }

  object StIntersectsBound extends ScalarFunction[java.lang.Boolean] {
    override def inputTypes(): Array[DataType] = Array(BinaryType, BinaryType)
    override def resultType(): DataType = BooleanType
    override def name(): String = "st_intersects"
    def invoke(a: Array[Byte], b: Array[Byte]): Boolean = {
      val (ax0, ay0, ax1, ay1) = Wkb.mbr(a)
      val (bx0, by0, bx1, by1) = Wkb.mbr(b)
      ax0 <= bx1 && ax1 >= bx0 && ay0 <= by1 && ay1 >= by0
    }
    override def produceResult(input: InternalRow): java.lang.Boolean =
      invoke(input.getBinary(0), input.getBinary(1))
  }

  object StEqualsFn extends BinFn("st_equals", 2) {
    override def description: String =
      "st_equals(a binary, b binary) -> boolean: identical MBRs " +
        "(exact equality for points/boxes)"
    override def bound: BoundFunction = StEqualsBound
  }

  object StEqualsBound extends ScalarFunction[java.lang.Boolean] {
    override def inputTypes(): Array[DataType] = Array(BinaryType, BinaryType)
    override def resultType(): DataType = BooleanType
    override def name(): String = "st_equals"
    def invoke(a: Array[Byte], b: Array[Byte]): Boolean =
      Wkb.mbr(a) == Wkb.mbr(b)
    override def produceResult(input: InternalRow): java.lang.Boolean =
      invoke(input.getBinary(0), input.getBinary(1))
  }

  object StOverlapsFn extends BinFn("st_overlaps", 2) {
    override def description: String =
      "st_overlaps(a binary, b binary) -> boolean: MBR overlap " +
        "(MBR semantics — same region the reference's spatial " +
        "pushdown answers for SP_OVERLAPS_FUNC)"
    override def bound: BoundFunction = StOverlapsBound
  }

  object StOverlapsBound extends ScalarFunction[java.lang.Boolean] {
    override def inputTypes(): Array[DataType] = Array(BinaryType, BinaryType)
    override def resultType(): DataType = BooleanType
    override def name(): String = "st_overlaps"
    def invoke(a: Array[Byte], b: Array[Byte]): Boolean =
      StIntersectsBound.invoke(a, b)
    override def produceResult(input: InternalRow): java.lang.Boolean =
      invoke(input.getBinary(0), input.getBinary(1))
  }

  object UnicodeNormalizeFn extends StrFn("unicode_normalize") {
    override def description: String =
      "unicode_normalize(s string) -> string: NFC + accent strip + " +
        "lowercase + whitespace collapse (the t15 dedup-key " +
        "normalizer; DuckDB-replayable via strip_accents/nfc_normalize)"
    override def bound: BoundFunction = UnicodeNormalizeBound
  }

  object UnicodeNormalizeBound extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "unicode_normalize"
    def invoke(s: UTF8String): UTF8String = {
      // same pipeline as TextFunctions.unicodeNormalize: the kernel's
      // nfcStrip, then Spark-lower (UTF8String), collapse, then a
      // SPACE-ONLY trim — String.trim strips every char <= U+0020
      // (e.g. a leading vertical tab, which is outside the collapse
      // class), where Spark's trim() and DuckDB's trim() strip ' '
      // alone; the regex keeps the three engines bit-identical
      val stripped = UnicodeText.nfcStrip(s).toLowerCase.toString
      UTF8String.fromString(
        stripped.replaceAll("[ \\t\\n\\r\\f]+", " ")
          .replaceAll("^ +| +$", ""))
    }
    override def produceResult(input: InternalRow): UTF8String =
      invoke(input.getUTF8String(0))
  }

  object CompressionRatioFn extends StrFn("compression_ratio") {
    override def description: String =
      "compression_ratio(s string) -> double: zlib-compressed size / " +
        "raw UTF-8 size (the t16 quality signal: boilerplate << 0.3, " +
        "prose 0.3-0.7, noise ~1)"
    override def bound: BoundFunction = CompressionRatioBound
  }

  object CompressionRatioBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = DoubleType
    override def name(): String = "compression_ratio"
    def invoke(s: UTF8String): Double =
      UnicodeText.deflateLen(s).toDouble / math.max(s.numBytes, 1)
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(input.getUTF8String(0))
  }

  object StWithinFn extends BinFn("st_within", 2) {
    override def description: String =
      "st_within(a binary, b binary) -> boolean: a's MBR contained in " +
        "b's MBR (exact for points within boxes)"
    override def bound: BoundFunction = StWithinBound
  }

  object StWithinBound extends ScalarFunction[java.lang.Boolean] {
    override def inputTypes(): Array[DataType] = Array(BinaryType, BinaryType)
    override def resultType(): DataType = BooleanType
    override def name(): String = "st_within"
    def invoke(a: Array[Byte], b: Array[Byte]): Boolean = {
      val (ax0, ay0, ax1, ay1) = Wkb.mbr(a)
      val (bx0, by0, bx1, by1) = Wkb.mbr(b)
      ax0 >= bx0 && ax1 <= bx1 && ay0 >= by0 && ay1 <= by1
    }
    override def produceResult(input: InternalRow): java.lang.Boolean =
      invoke(input.getBinary(0), input.getBinary(1))
  }
}
