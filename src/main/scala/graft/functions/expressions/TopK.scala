package graft.functions.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k selection + broadcast-centroid assignment kernels for
  * the similarity family. Both replace plans that funneled the whole
  * scored corpus through a `Window.partitionBy(query_id)` (≤ #queries
  * reducer tasks holding every scored row — the round-1 scale-killer):
  *
  *  - [[TopKByScore]] is a k-sized-heap aggregate with partial merge:
  *    each map task reduces its slice to ≤ k entries per group, the
  *    exchange moves k-sized states only, and the merge is k·log k.
  *  - [[ArgTopDot]] scores one row against a driver-side centroid table
  *    (k×dim floats — kilobytes) inside codegen: no row inflation, no
  *    exchange, versus crossJoin(centroids)+window argmin.
  */
object TopK {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Aggregate: the k (score, id) pairs with highest score (ties →
    * lowest id), as `array<struct<id long, score double>>` sorted
    * score-desc, id-asc — exactly the rows a rank-≤-k window keeps. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression())

  /** Index (0-based) of the centroid with the highest dot product
    * against the row's vector; ties → lowest index. */
  def argMaxDot(vec: Column, centroids: Array[Array[Float]]): Column =
    column(ArgTopDot(expression(vec), centroids, 1))

  /** Aggregate: per-position sum of FLOAT vectors plus the row count,
    * as ONE `array<double>` of length dim+1 (count last) — the Lloyd
    * mean-update state. One aggregate expression keeps per-iteration
    * planning O(1) (the dim-separate `avg(element_at)` twin paid
    * Catalyst analysis per column per iteration — measured +1.3 s on
    * v11's six fits), and partial states are k×(dim+1) doubles per map
    * partition — never inflated corpus rows. */
  def vecSumCount(vec: Column, dim: Int): Column =
    column(VecSumCount(expression(vec), dim).toAggregateExpression())

  /** The `n` centroid indices with highest dot products, best first. */
  def argTopDot(vec: Column, centroids: Array[Array[Float]], n: Int): Column =
    column(ArgTopDotList(expression(vec), centroids, n))

  /** `struct(idx int, cos double)`: index of the eval vector with the
    * highest cosine against the row (ties → lowest index) and that
    * cosine. `norms(c)` must be the double-precision L2 norm of
    * `evals(c)`. */
  def maxCos(vec: Column, evals: Array[Array[Float]],
      norms: Array[Double]): Column =
    column(MaxCos(expression(vec), evals, norms))

  /** Aggregate: greedy Maximal-Marginal-Relevance selection fused into
    * one bounded-state pass — keep the `kCand` best (cos, id, vector)
    * rows per group (same heap discipline as [[TopKByScore]]: cos
    * desc, id asc, Double.compare total order), then run the greedy
    * λ·cos − μ·max-cos-to-selected loop AT EVAL TIME over the bounded
    * candidate set. State through every exchange is kCand rows × one
    * vector each; the dataflow twin (candidate table + pairwise-cosine
    * table + kSel argmax/join steps) computes the same bits across ~10
    * stage boundaries — spec-asserted equal. Output
    * `array<struct<rk, id, score>>` in selection order. */
  def mmrSelect(score: Column, id: Column, vec: Column, kCand: Int,
      kSel: Int, lam: Double, muDiv: Double): Column =
    column(MmrSelect(expression(score), expression(id), expression(vec),
      kCand, kSel, lam, muDiv).toAggregateExpression())
}

/** Bounded candidate buffer for [[MmrSelect]]: the kCand best
  * (score, id, vec) triples under (score desc, id asc) —
  * insertion-sorted array (kCand is small by contract; the common-case
  * reject of a worse-than-last row on a full buffer is O(1)). */
final class MmrBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val vecs = new Array[Array[Float]](k)
  var size = 0

  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def insert(s: Double, id: Long, v: Array[Float]): Unit = {
    if (size == k && worse(s, id, scores(size - 1), ids(size - 1))) return
    // find insertion point (first slot the new row is better than)
    var pos = if (size == k) size - 1 else size
    if (size == k) size -= 1 // drop the current worst
    while (pos > 0 && worse(scores(pos - 1), ids(pos - 1), s, id)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
      vecs(pos) = vecs(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id; vecs(pos) = v
    size += 1
  }
}

case class MmrSelect(
    score: Expression,
    id: Expression,
    vec: Expression,
    kCand: Int,
    kSel: Int,
    lam: Double,
    muDiv: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrBuffer] {

  override def children: Seq[Expression] = Seq(score, id, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rk", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MmrBuffer = new MmrBuffer(kCand)

  override def update(b: MmrBuffer, input: InternalRow): MmrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    val v = vec.eval(input)
    if (s != null && i != null && v != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray())
    b
  }

  override def merge(b: MmrBuffer, other: MmrBuffer): MmrBuffer = {
    var i = 0
    while (i < other.size) {
      b.insert(other.scores(i), other.ids(i), other.vecs(i)); i += 1
    }
    b
  }

  /** Same double arithmetic as
    * [[graft.functions.VectorFunctions.cosine]] (per-element double
    * accumulation in index order; zero norm → 0.0). */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  override def eval(b: MmrBuffer): Any = {
    val n = b.size
    val div = new Array[Double](n)
    val taken = new Array[Boolean](n)
    val out = new Array[Any](math.min(kSel, n))
    var step = 0
    while (step < out.length) {
      // argmax of lam*cos − muDiv*div, ties → lowest id (buffer is
      // already (cos desc, id asc)-sorted, so first strict winner wins)
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = lam * b.scores(i) - muDiv * div(i)
          if (best < 0 || java.lang.Double.compare(s, bestScore) > 0 ||
              (java.lang.Double.compare(s, bestScore) == 0 &&
                b.ids(i) < b.ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      out(step) = InternalRow((step + 1).toLong, b.ids(best), bestScore)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val c = cos(b.vecs(i), b.vecs(best))
          if (c > div(i)) div(i) = c
        }
        i += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: MmrBuffer): Array[Byte] = {
    val dim = if (b.size > 0) b.vecs(0).length else 0
    val bb = ByteBuffer.allocate(8 + b.size * (16 + 4 * dim))
    bb.putInt(b.size); bb.putInt(dim)
    var i = 0
    while (i < b.size) {
      bb.putDouble(b.scores(i)); bb.putLong(b.ids(i))
      var j = 0
      while (j < dim) { bb.putFloat(b.vecs(i)(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MmrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val dim = bb.getInt
    val b = new MmrBuffer(kCand)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) { v(j) = bb.getFloat; j += 1 }
      b.insert(s, id, v)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MmrSelect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MmrSelect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1), vec = cs(2))
}

/** Growable bounded buffer: keeps the k best (score, id) pairs.
  * "Better" = higher score, or equal score and lower id — the same
  * total order as `ORDER BY score DESC, id ASC`. */
final class TopKBuffer(val k: Int) {
  // binary min-heap on "worst first" so the root is the eviction victim
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // is (s1,i1) worse than (s2,i2)? java.lang.Double.compare gives a
  // total order (NaN greatest, matching Spark's sort order) — plain
  // </> comparisons are non-transitive under NaN and can both wedge
  // the heap and make the output sort throw
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var worst = pos
      if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst)))
        worst = l
      if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst)))
        worst = r
      if (worst == pos) return
      swap(pos, worst); pos = worst
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def insert(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }

  /** (score desc, id asc) — the output order (Double.compare total
    * order, so NaN scores sort first rather than corrupting the sort). */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }
}

/** TypedImperativeAggregate top-k: partial states are k-bounded, so the
  * exchange carries ≤ k entries per map-side group — never the scored
  * corpus. */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { b.insert(other.scores(i), other.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

/** Per-position float-vector sum + count (see [[TopK.vecSumCount]]):
  * buffer = dim sums + count, all double. Rows shorter than `dim`
  * contribute their prefix (callers pass fixed-width vectors). */
case class VecSumCount(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim + 1)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) { b(i) += arr.getFloat(i).toDouble; i += 1 }
      b(dim) += 1.0
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    new GenericArrayData(b.clone())

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    var i = 0
    while (i <= dim) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Double](dim + 1)
    var i = 0
    while (i <= dim) { b(i) = bb.getDouble; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
}

object ArgTopDot {
  /** Index of the max-dot centroid (ties → lowest index). */
  def best(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      centroids: Array[Array[Float]]): Int = {
    var bestIdx = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      if (acc > bestSim) { bestSim = acc; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  /** The `n` highest-dot centroid indices, best first (ties → lowest
    * index — same order as `ORDER BY sim DESC, cid ASC`). */
  def top(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      centroids: Array[Array[Float]], n: Int): GenericArrayData = {
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val m = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += vec.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      sims(c) = acc
      c += 1
    }
    val idx = centroids.indices.toArray
      .sortWith((a, b) => sims(a) > sims(b) || (sims(a) == sims(b) && a < b))
    new GenericArrayData(idx.take(n).map(Int.box).asInstanceOf[Array[Any]])
  }
}

/** Scalar argmax-dot against a literal centroid table: one codegen'd
  * loop per row, zero row inflation, zero exchange — the replacement
  * for crossJoin(broadcast(centroids)) + window argmin. */
case class ArgTopDot(child: Expression, centroids: Array[Array[Float]], n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    ArgTopDot.best(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val m = ctx.freshName("m")
      val bestIdx = ctx.freshName("bestIdx"); val bestSim = ctx.freshName("bestSim")
      s"""
         |int $bestIdx = 0;
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  float[] cv = $cRef[$c];
         |  int $m = java.lang.Math.min($a.numElements(), cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) cv[$i];
         |  }
         |  if ($acc > $bestSim) { $bestSim = $acc; $bestIdx = $c; }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MaxCos {
  /** (best index, best cosine) over the eval table — double-precision,
    * strictly sequential sums (index ascending), so the value is
    * bit-identical to the DuckDB oracle's in-order list comprehension.
    * Ties → lowest index, the same order as `ORDER BY cos DESC, idx`. */
  def best(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      evals: Array[Array[Float]], norms: Array[Double]): InternalRow = {
    val n = vec.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val v = vec.getFloat(i).toDouble; na += v * v; i += 1
    }
    val vnorm = math.sqrt(na)
    var bestIdx = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < evals.length) {
      val ev = evals(c)
      // a dim mismatch is a data bug — truncating to the overlap would
      // silently deflate the cosine and let contaminated rows through
      require(ev.length == n,
        s"eval vector $c has dim ${ev.length}, corpus row has $n")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vec.getFloat(j).toDouble * ev(j).toDouble; j += 1 }
      // a zero-norm side has no direction: define cos = -1 (never
      // similar) instead of 0/0 = NaN — under Spark's NaN-is-greatest
      // comparison semantics a NaN cosine would pass every >= threshold
      // filter and flag the row as contaminated
      val denom = vnorm * norms(c)
      val cos = if (denom == 0.0) -1.0 else dot / denom
      if (cos > bestCos) { bestCos = cos; bestIdx = c }
      c += 1
    }
    InternalRow(bestIdx, bestCos)
  }
}

/** Scalar max-cosine against a literal eval-vector table (the
  * decontamination kernel): one codegen'd pass per corpus row, zero row
  * inflation, zero exchange — versus crossJoin(broadcast(eval)) +
  * groupBy(max), which inflates the corpus ×|eval| before reducing. */
case class MaxCos(child: Expression, evals: Array[Array[Float]],
    norms: Array[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    MaxCos.best(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      evals, norms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("evals", evals, "float[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.MaxCos.best($a, $eRef, $nRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** n-best variant (query-side probe lists; queries are few, so the
  * interpreted-friendly sort inside is irrelevant to scale). */
case class ArgTopDotList(child: Expression, centroids: Array[Array[Float]],
    n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ArgTopDot.top(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      centroids, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.ArgTopDot.top($a, $cRef, $n);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
