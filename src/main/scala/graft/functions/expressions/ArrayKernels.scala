package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the hot loops of
  * the dedup/similarity operators. Spark's higher-order functions
  * (`transform`/`aggregate`) evaluate their lambdas interpreted, which
  * made these kernels the bench bottleneck (~100× slower than straight
  * loops); each expression below keeps BIT-IDENTICAL semantics to its
  * declarative twin (and to the DuckDB oracle SQL) while compiling to a
  * tight Java loop inside WholeStageCodegen.
  */
object Kernels {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Σ aᵢ·bᵢ over float arrays, each element cast to double first,
    * strictly sequential — same bits as the zip_with/aggregate form. */
  def dotFF(a: Column, b: Column): Column =
    column(DotFF(expression(a), expression(b)))

  /** 60-bit SimHash from an array of 60-bit token hashes. */
  def simhash60(hashes: Column): Column =
    column(SimHash60(expression(hashes)))

  /** MinHash signature via universal hashing mod p=2³¹−1:
    * sig_i = min over h of ((a_i·(h mod p) + b_i) mod p) with
    * a_i = (i·2654435761 mod p) | 1, b_i = (i·40503·69069) mod p.
    * All intermediates fit int64 — replicable in DuckDB SQL. */
  def minhash(baseHashes: Column, n: Int): Column =
    column(MinHashSig(expression(baseHashes), n))

  val P31: Long = (1L << 31) - 1

  /** Hilbert-curve index of a 2-D coordinate (order-`bits` curve) —
    * physical clustering for `cell_order=HILBERT`
    * [ref: ha_mytile.cc:71–73, t/hilbert.test]. */
  def hilbert2d(x: Column, y: Column, bits: Int): Column =
    column(Hilbert2D(expression(x), expression(y), bits))

  /** Symmetric int8 scalar quantization of a float vector: scale =
    * maxabs/127, bytes = round(x/scale) — 4× smaller than float32.
    * Ranking property: cosine computed on the quantized bytes equals
    * float cosine up to ~1/254 relative component error (scale cancels
    * in the ratio), which 4× candidate oversampling + exact rerank
    * absorbs. */
  def sq8(v: Column): Column = column(Sq8Quantize(expression(v)))

  /** Σ fᵢ·qᵢ of a float vector against an int8-quantized one (bytes
    * signed) — the query-side scoring kernel for SQ8 ANN. */
  def dotFB(f: Column, q: Column): Column =
    column(DotFB(expression(f), expression(q)))

  /** Σ aᵢ·bᵢ of two int8 vectors (exact integer arithmetic). */
  def dotBB(a: Column, b: Column): Column =
    column(DotBB(expression(a), expression(b)))

  /** Hilbert-curve index of a d-dimensional coordinate (order-`bits`
    * curve over an array of d non-negative longs, d·bits ≤ 63) —
    * generalizes [[hilbert2d]] to any dim count, matching TileDB's
    * n-D Hilbert cell order [tiledb Hilbert order applies to any
    * sparse dim count; 2-D special case in t/hilbert.test]. */
  def hilbertNd(coords: Column, bits: Int): Column =
    column(HilbertNd(expression(coords), bits))

  /** Distinct k-token shingles (space-joined) from a token array —
    * same output as the transform/slice/concat_ws composition. */
  def shingles(tokens: Column, k: Int): Column =
    column(ShinglesExpr(expression(tokens), k))

  /** WKB polygon box from min/max coords — a codegen'd static call to
    * [[graft.functions.Wkb.box]] (`StaticInvoke`), so fixture geometry
    * construction stays out of interpreted-UDF territory like every
    * query-side Wkb path. */
  def wkbBox(xmin: Column, ymin: Column, xmax: Column, ymax: Column)
      : Column =
    column(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      classOf[graft.functions.Wkb.type], BinaryType, "box",
      Seq(expression(xmin), expression(ymin),
        expression(xmax), expression(ymax)),
      inputTypes = Seq(DoubleType, DoubleType, DoubleType, DoubleType)))

  /** Banded random-hyperplane LSH keys: `planes` holds
    * nBands·bitsPerBand unit-free hyperplanes; band b's key packs the
    * band index with the sign bits of its `bitsPerBand` plane
    * projections — one codegen loop per row, no row inflation until the
    * explode over ≤ nBands keys. */
  def lshBands(vec: Column, planes: Array[Array[Float]],
      bitsPerBand: Int): Column =
    column(LshBands(expression(vec), planes, bitsPerBand))

  /** Dense bucket-count vector: counts(i) = |{b ∈ buckets : b = i}|
    * for 0 ≤ i < dim (out-of-range ids ignored; callers pmod). One
    * pass — the transform/filter HOF forms are O(dim·n) interpreted. */
  def bucketCounts(buckets: Column, dim: Int): Column =
    column(BucketCounts(expression(buckets), dim))

  /** Strictly-sequential sum of one DOUBLE field over an array of
    * structs (array order — callers sort_array first), replacing the
    * interpreted `aggregate(ps, 0.0, (acc, x) -> acc + x.f)` fold in
    * the per-doc log-prob scorers. Bit-identical to the fold; null
    * fields contribute nothing (callers guarantee non-null). */
  def structDoubleSum(arr: Column, fieldIdx: Int): Column =
    column(StructDoubleSum(expression(arr), fieldIdx))

  /** |{t ∈ tokens : t ∈ words}| — the codegen'd twin of
    * `size(filter(toks, isInCollection(words)))` (hash-set probe per
    * token instead of an interpreted lambda × |words| comparisons).
    * Counts OCCURRENCES, not distinct members, like the filter form. */
  def countInSet(tokens: Column, words: Seq[String]): Column =
    column(CountInSet(expression(tokens), words.toArray))

  /** Count of the single most frequent adjacent bigram (space-joined)
    * of a token array, 0 below 2 tokens — the codegen'd twin of the
    * sort_array + longest-equal-run fold (identical integer result;
    * one hash-count pass instead of an interpreted struct fold over a
    * sorted copy). */
  def topBigramCount(tokens: Column): Column =
    column(TopBigramCountExpr(expression(tokens)))

  /** Per-document bigram repetition stats in ONE hash-count pass:
    * `[n_grams, max_count, dup_instances]` (dup_instances = Σ counts
    * of bigrams occurring ≥ 2×). The t29 kernel — same pass as
    * [[topBigramCount]], three outputs; no explode, no groupBy, so
    * the Gopher-repetition report stays at scan speed. */
  def bigramStats(tokens: Column): Column =
    column(BigramStatsExpr(expression(tokens)))

  /** NFC-normalize + accent-strip (NFD → drop Mn → NFC) — a codegen'd
    * static call to [[graft.functions.UnicodeText.nfcStrip]], the
    * JVM twin of DuckDB's `strip_accents(nfc_normalize(s))`. */
  def nfcStrip(s: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      classOf[graft.functions.UnicodeText.type], StringType, "nfcStrip",
      Seq(expression(s)), inputTypes = Seq(StringType)))

  /** Distinct character k-grams in first-occurrence order — one
    * codegen pass (see [[CharGramsExpr]]; the HOF twin's interpreted
    * per-position substr is O(n_chars²) per document). */
  def charGrams(s: Column, k: Int): Column =
    column(CharGramsExpr(expression(s), k))

  /** Rolling 64-bit keys of every L-token window — the d10
    * exact-substring prefilter (see [[RollingWindowKeys]]): no false
    * negatives, candidates verified by the md5 tier. */
  def rollingWindowKeys(tokens: Column, l: Int): Column =
    column(RollingWindowKeys(expression(tokens), l))

  /** Winnowing fingerprint selection over a positional k-gram hash
    * array: distinct (1-based position, hash) rightmost-window-min
    * picks — the MOSS document-fingerprinting kernel. */
  def winnow(hashes: Column, w: Int): Column =
    column(WinnowExpr(expression(hashes), w))

  /** Fused token-array → winnowing fingerprints (positional k-gram
    * hash60 + rightmost-min windows) in one codegen pass — the t17
    * hot path (md5 in an interpreted HOF lambda cost 8×). */
  def winnowText(tokens: Column, k: Int, w: Int): Column =
    column(WinnowTextExpr(expression(tokens), k, w))

  /** zlib-compressed byte size of the UTF-8 text — static call to
    * [[graft.functions.UnicodeText.deflateLen]]; numerator of the
    * compression-ratio quality signal. */
  def deflateLen(s: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      classOf[graft.functions.UnicodeText.type], IntegerType, "deflateLen",
      Seq(expression(s)), inputTypes = Seq(StringType)))

  /** Index of the FIRST position where two aligned long-array band-key
    * sequences agree, skipping keys in `excluded` (the hot-band set);
    * −1 when none. The banded-LSH self-join dedupes with this instead
    * of a `distinct()` exchange: a pair matching in k bands joins k
    * times, and the row whose band index equals the first surviving
    * agreement is the ONE emission — candidate sets are identical to
    * the old distinct's, with the dedup now a codegen'd filter inside
    * the join stage instead of a full shuffle of the duplicated
    * candidates. */
  def firstSharedBand(a: Column, b: Column,
      excluded: Array[Long]): Column =
    column(FirstSharedBand(expression(a), expression(b), excluded))

  /** |A ∩ B| of two duplicate-free string arrays — the verify-join
    * kernel. One hash-set build over the smaller side + one probe pass
    * over the larger, no intersection array materialized. Identical to
    * `size(array_intersect(a, b))` on distinct inputs (every shingle /
    * char-gram / window set in the dedup family is distinct by
    * construction), and since the sets are distinct the union size is
    * `size(a) + size(b) − shared`, so `array_union` disappears from the
    * Jaccard verify entirely: the old form built TWO scratch arrays per
    * candidate pair through Spark's interpreted non-primitive
    * ArrayIntersect/ArrayUnion paths. */
  def sharedCount(a: Column, b: Column): Column =
    column(SharedCount(expression(a), expression(b)))
}

/** Shared distinct-element count of two string arrays (see
  * [[Kernels.sharedCount]]). */
case class SharedCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SharedCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = " +
      s"graft.functions.expressions.SharedCount.compute($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
/** First aligned agreement position of two band-key arrays (see
  * [[Kernels.firstSharedBand]]). */
case class FirstSharedBand(left: Expression, right: Expression,
    excluded: Array[Long]) extends BinaryExpression {
  @transient private lazy val exSet: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](excluded.length * 2)
    excluded.foreach(v => s.add(v))
    s
  }
  override def dataType: DataType = IntegerType
  /** Public entry for both eval paths (nullSafeEval is protected, so
    * generated code cannot call it on the shipped instance). */
  def firstShared(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      if (v == b.getLong(i) && !exSet.contains(v)) return i
      i += 1
    }
    -1
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    firstShared(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the expression instance; the generated loop probes its set
    val ref = ctx.addReferenceObj("fsb", this,
      classOf[FirstSharedBand].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.firstShared($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object SharedCount {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(a: ArrayData, b: ArrayData): Long = {
    // hash the smaller side, probe with the larger: inputs are distinct
    // sets, so counting probe hits IS the intersection cardinality
    val (s, l) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = s.numElements()
    val nl = l.numElements()
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(s.getUTF8String(i)); i += 1 }
    var c = 0L
    var j = 0
    while (j < nl) { if (set.contains(l.getUTF8String(j))) c += 1; j += 1 }
    c
  }
}

/** Occurrence count of set members in a token array. */
case class CountInSet(child: Expression, words: Array[String])
  extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CountInSet.compute(v.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.CountInSet.compute($a, $sRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CountInSet {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(arr: ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** Max adjacent-bigram frequency of a token array (one hash-count
  * pass). */
case class TopBigramCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TopBigramCountExpr.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.TopBigramCountExpr.compute($a);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TopBigramCountExpr {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var best = 0L
    var i = 0
    while (i < n - 1) {
      val bg = UTF8String.concat(arr.getUTF8String(i), sep,
        arr.getUTF8String(i + 1))
      val c = counts.merge(bg, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** One-pass [n_grams, max_count, dup_instances] over adjacent
  * space-joined bigrams — [[TopBigramCountExpr]]'s pass with three
  * outputs (see Kernels.bigramStats). [0,0,0] below 2 tokens. */
case class BigramStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BigramStatsExpr.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.BigramStatsExpr.compute($a);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BigramStatsExpr {
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array(0L, 0L, 0L))
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n - 1) {
      val bg = UTF8String.concat(arr.getUTF8String(i), sep,
        arr.getUTF8String(i + 1))
      counts.merge(bg, 1L, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > best) best = c
      if (c >= 2L) dup += c
    }
    new GenericArrayData(Array(n - 1L, best, dup))
  }
}

/** Ordered Σ struct.field(fieldIdx) over an array of structs — the
  * codegen'd twin of the sequential double fold. */
case class StructDoubleSum(child: Expression, fieldIdx: Int)
  extends UnaryExpression {
  @transient private lazy val numFields: Int =
    child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].length
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    StructDoubleSum.compute(v.asInstanceOf[ArrayData], numFields, fieldIdx)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nf = numFields
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.StructDoubleSum.compute($a, $nf, $fieldIdx);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StructDoubleSum {
  def compute(arr: ArrayData, numFields: Int, fieldIdx: Int): Double = {
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val st = arr.getStruct(i, numFields)
      if (st != null && !st.isNullAt(fieldIdx)) acc += st.getDouble(fieldIdx)
      i += 1
    }
    acc
  }
}

/** Hashing-trick featurizer tail: fold an array of bucket ids into a
  * dense count vector. */
case class BucketCounts(child: Expression, dim: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BucketCounts.compute(v.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.BucketCounts.compute($a, $dim);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BucketCounts {
  def compute(buckets: ArrayData, dim: Int): ArrayData = {
    val counts = new Array[Long](dim)
    val n = buckets.numElements()
    var i = 0
    while (i < n) {
      val b = buckets.getLong(i)
      if (b >= 0 && b < dim) counts(b.toInt) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Band keys `(bandIdx << bitsPerBand) | signBits` from hyperplane
  * projections — the candidate-generation kernel for embedding
  * near-dup (two vectors collide iff some band's sign pattern matches
  * exactly; recall math in [[graft.operators.Similarity]]). */
case class LshBands(child: Expression, planes: Array[Array[Float]],
    bitsPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    LshBands.compute(v.asInstanceOf[ArrayData], planes, bitsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.LshBands.compute($a, $pRef, $bitsPerBand);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshBands {
  def compute(vec: ArrayData, planes: Array[Array[Float]],
      bitsPerBand: Int): ArrayData = {
    val nBands = planes.length / bitsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bits = 0L
      var r = 0
      while (r < bitsPerBand) {
        val pl = planes(b * bitsPerBand + r)
        val n = math.min(vec.numElements(), pl.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += vec.getFloat(i).toDouble * pl(i).toDouble; i += 1 }
        if (acc > 0.0) bits |= (1L << r)
        r += 1
      }
      out(b) = (b.toLong << bitsPerBand) | bits
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct space-joined k-grams of a token array (order of first
  * occurrence — matches array_distinct over the sliding transform). */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShinglesExpr.compute(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.ShinglesExpr.compute($a, $k);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Winnowing fingerprint selection (the MOSS algorithm): over every
  * w-length window of the positional k-gram hash sequence, select the
  * RIGHTMOST minimum; emit the distinct (position, hash) selections in
  * position order. Guarantees any shared run of ≥ w+k−1 tokens yields
  * at least one common fingerprint while keeping ~2/(w+1) of the
  * hashes. Selections are non-decreasing in position (a smaller value
  * left of the previous pick would have won its window already), so
  * consecutive-dedup ≡ global DISTINCT — which is what the DuckDB
  * oracle's `SELECT DISTINCT` replays. Fewer than w hashes → no
  * windows → empty. */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = WinnowExpr.OutType
  override def nullSafeEval(v: Any): Any =
    WinnowExpr.compute(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.WinnowExpr.compute($a, $w);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused positional-k-gram hash60 + winnowing: one codegen pass from
  * the token array straight to the fingerprint list. The two-stage
  * declarative form (`transform(sequence, hash60(array_join(slice)))`
  * into [[WinnowExpr]]) computes the same bits but evaluates md5
  * inside an INTERPRETED lambda — measured 5.2 s vs 0.6 s at sf0.1 on
  * t17 (the t9/t11 lesson again). hash60 here is the same
  * "first 15 md5 hex chars base-16" contract as
  * [[graft.functions.TextFunctions.hash60]], so the DuckDB oracle
  * replays it unchanged. */
case class WinnowTextExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  override def dataType: DataType = WinnowExpr.OutType
  override def nullSafeEval(v: Any): Any =
    WinnowTextExpr.compute(v.asInstanceOf[ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.WinnowTextExpr.compute($a, $k, $w);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowTextExpr {
  /** hash60 of each positional k-gram (space-joined), then winnow. */
  def compute(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = tokens.getUTF8String(i + j)
        if (j < k - 1) parts(2 * j + 1) = sep
        j += 1
      }
      md.reset()
      val d = md.digest(
        org.apache.spark.unsafe.types.UTF8String.concat(parts: _*).getBytes)
      // first 15 hex chars base-16 == top 60 bits of the first 8 bytes
      val hi = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
      hs(i) = hi >>> 4
      i += 1
    }
    WinnowExpr.compute(new GenericArrayData(hs), w)
  }
}

object WinnowExpr {
  val OutType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("p", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  def compute(hashes: ArrayData, w: Int): ArrayData = {
    val m = hashes.numElements()
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    var i = 0
    while (i <= m - w) {
      var minV = Long.MaxValue
      var minP = -1
      var j = i
      while (j < i + w) {
        val v = hashes.getLong(j)
        if (v <= minV) { minV = v; minP = j } // <=: rightmost min wins
        j += 1
      }
      if (minP != lastPos) {
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any]((minP + 1).toLong, minV))
        lastPos = minP
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Distinct character k-grams of a string, first-occurrence order —
  * the d9 (tokenizer-free dedup) shingle kernel. The declarative twin
  * (`sequence → transform → substr → array_distinct`) computes the
  * same bits but evaluates an INTERPRETED lambda whose `substr`
  * re-scans the string to each position (O(n_chars²) per document —
  * 11.6 s of d9's 18 s at sf0.1); this is one pass over code-point
  * boundaries. Grams are CODE-POINT windows (`substr`/DuckDB `substr`
  * semantics), not UTF-16 units. */
case class CharGramsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    CharGramsExpr.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = " +
      s"graft.functions.expressions.CharGramsExpr.compute($s, $k);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharGramsExpr {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // code-point boundary table: bounds(i) = UTF-16 offset of char i
    val bounds = new Array[Int](n + 1)
    var off = 0
    var i = 0
    while (i < n) {
      bounds(i) = off
      off = str.offsetByCodePoints(off, 1)
      i += 1
    }
    bounds(n) = str.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p + k <= n) {
      seen.add(UTF8String.fromString(str.substring(bounds(p), bounds(p + k))))
      p += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

object ShinglesExpr {
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = tokens.getUTF8String(i + j)
        if (j < k - 1) parts(2 * j + 1) = sep
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** xy→d mapping of the order-`bits` Hilbert curve (non-negative
  * inputs; callers normalize coordinates to [0, 2^bits)). */
/** Int8 symmetric quantizer: q_i = round(x_i · 127 / maxabs), clamped
  * to [-127, 127]; all-zero input stays all-zero. */
case class Sq8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    Sq8Quantize.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.Sq8Quantize.compute($a);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Sq8Quantize {
  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i)); if (a > mx) mx = a; i += 1
    }
    if (mx == 0.0f) return out
    val s = mx / 127.0
    i = 0
    while (i < n) {
      val q = math.round(v.getFloat(i) / s)
      out(i) = math.max(-127L, math.min(127L, q)).toByte
      i += 1
    }
    out
  }
}

/** Float-vector · int8-vector dot product (bytes signed, doubles). */
case class DotFB(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    DotFB.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, q) => s"${ev.value} = " +
      s"graft.functions.expressions.DotFB.compute($f, $q);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object DotFB {
  def compute(f: ArrayData, q: Array[Byte]): Double = {
    val n = math.min(f.numElements(), q.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += f.getFloat(i).toDouble * q(i).toDouble; i += 1 }
    acc
  }
}

/** int8-vector · int8-vector dot product (exact integer math). */
case class DotBB(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    DotBB.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = " +
      s"graft.functions.expressions.DotBB.compute($x, $y);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object DotBB {
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }
}

/** d-dimensional Hilbert index via Skilling's transpose algorithm
  * (John Skilling, "Programming the Hilbert curve", AIP Conf. Proc.
  * 707, 2004 — the standard public n-D formulation): axes →
  * transposed Hilbert form in place, then bit-interleave to a single
  * comparable long. Requires numElements·bits ≤ 63. */
case class HilbertNd(child: Expression, bits: Int)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HilbertNd.compute(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.HilbertNd.compute($a, $bits);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HilbertNd {
  def compute(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    // bits >= 1 also guards the Gray-encode loop: with bits = 0 its
    // `q != (1L << bits)` bound (1) is unreachable from q = 2
    require(bits >= 1 && n >= 1 && n * bits <= 63,
      s"hilbertNd needs bits >= 1 and dims * bits <= 63, " +
        s"got $n dims at $bits bits")
    val X = new Array[Long](n)
    var i = 0
    while (i < n) { X(i) = coords.getLong(i); i += 1 }
    // inverse undo (Skilling): walk bit planes high→low exchanging /
    // inverting low bits so X becomes the transposed Hilbert index
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 2
    while (q != (1L << bits)) {
      if ((X(n - 1) & q) != 0) t ^= q - 1
      q <<= 1
    }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // interleave the transpose (MSB of X(0) first) into one long
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { d = (d << 1) | ((X(j) >> b) & 1L); j += 1 }
      b -= 1
    }
    d
  }
}

case class Hilbert2D(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert2D.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = graft.functions.expressions.Hilbert2D.xy2d($x, $y, $bits);"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object Hilbert2D {
  /** Classic Hilbert xy→d (rot-and-fold), order `bits`. */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0
    var rx = 0L; var ry = 0L; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1L else 0L
      ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class DotFF(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // acc MUST be freshName'd: two dotFF calls fused into one
      // codegen stage (v14/v21 emit 16 per projection) otherwise
      // redeclare the local and the whole stage silently falls back
      // to the interpreter
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** bit j set iff Σ over hashes of (bit_j(h) ? +1 : −1) > 0, j∈[0,60). */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val counts = ctx.freshName("counts")
      s"""
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long out = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($counts[$j] > 0) out |= (1L << $j);
         |}
         |${ev.value} = out;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** n-element MinHash signature from pre-hashed shingles (universal
  * hashing mod 2³¹−1; empty input → Long.MaxValue sentinel per seed,
  * matching the declarative coalesce(array_min(...), MaxValue)). */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {
  private val P = Kernels.P31
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val out = new Array[Long](n)
    var s = 0
    while (s < n) {
      var mn = Long.MaxValue
      val a = (s.toLong * 2654435761L % P) | 1L
      val b = s.toLong * 40503L * 69069L % P
      var i = 0
      while (i < hs.numElements()) {
        val h = ((hs.getLong(i) % P) * a + b) % P
        if (h < mn) mn = h
        i += 1
      }
      out(s) = mn
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val mn = ctx.freshName("mn")
      val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[$n];
         |for (int $s = 0; $s < $n; $s++) {
         |  long $mn = Long.MAX_VALUE;
         |  long $a = ((long) $s * 2654435761L % ${P}L) | 1L;
         |  long $b = (long) $s * 40503L * 69069L % ${P}L;
         |  for (int $i = 0; $i < $arr.numElements(); $i++) {
         |    long $h = (($arr.getLong($i) % ${P}L) * $a + $b) % ${P}L;
         |    if ($h < $mn) $mn = $h;
         |  }
         |  $out[$s] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Rolling 64-bit window keys for the d10 exact-substring PREFILTER:
  * key(p) = Σᵢ xxh64(tok[p+i]) · B^(L−1−i) over wrapping Long
  * arithmetic (B odd ⇒ multiplication by B is a bijection on ℤ/2⁶⁴),
  * computed in ONE pass per document via the rolling recurrence
  * w(p+1) = (w(p) − h(p)·B^(L−1))·B + h(p+L). Identical windows get
  * identical keys BY CONSTRUCTION (no false negatives); 64-bit
  * collisions only ever ADD candidates, which the exact md5 verify
  * stage removes — so the published result is independent of this
  * hash. Spark-internal only: the DuckDB oracle never sees these
  * keys, it replays the md5 tier. Replaces one md5 per corpus token
  * (~50× the corpus bytes hashed) with one xxh64 per token plus
  * O(1)/window arithmetic. */
case class RollingWindowKeys(child: Expression, L: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    RollingWindowKeys.compute(v.asInstanceOf[ArrayData], L)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.RollingWindowKeys.compute($a, $L);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingWindowKeys {
  val B: Long = 0x100000001b3L // odd (FNV-ish) — bijective under wrap

  def compute(tokens: ArrayData, L: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < L) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      h(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    var bl = 1L // B^(L-1) wrapped
    i = 1
    while (i < L) { bl *= B; i += 1 }
    val out = new Array[Long](n - L + 1)
    var w = 0L
    i = 0
    while (i < L) { w = w * B + h(i); i += 1 }
    out(0) = w
    var p = 0
    while (p + L < n) {
      w = (w - h(p) * bl) * B + h(p + L)
      p += 1
      out(p) = w
    }
    new GenericArrayData(out)
  }
}
