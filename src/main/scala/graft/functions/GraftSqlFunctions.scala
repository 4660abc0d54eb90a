package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
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
    Hilbert2dFn)

  def byName(name: String): Option[UnboundFunction] =
    all.find(_.name == name.toLowerCase)

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
}
