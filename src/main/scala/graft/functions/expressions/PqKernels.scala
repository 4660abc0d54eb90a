package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (codegen'd, see [[Kernels]] for why):
  * a float vector splits into M contiguous `subDim`-wide subvectors,
  * each encoded as the index of its nearest codeword in that
  * subspace's K-entry codebook — M bytes per vector instead of
  * 4·dim, the memory/IO scale path for ANN beyond SQ8's 4×.
  */
object PqKernels {

  /** Encode a float vector into M code bytes. `codebooks` is laid out
    * as M·K rows of `subDim` floats (subspace-major: codeword k of
    * subspace m at index m·K + k); nearest = argmin L2, ties to the
    * lowest code. */
  def pqEncode(vec: Column, codebooks: Array[Array[Float]], k: Int,
      subDim: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    column(PqEncode(expression(vec), codebooks, k, subDim))
  }

  /** Asymmetric-distance (ADC) scores of one encoded vector against Q
    * query lookup tables: out(q) = Σ_m luts(q)(m·K + code_m) — M table
    * adds per query, never touching the float vector. `luts` is Q rows
    * of M·K floats (lut entry = dot(query subvector, codeword)). */
  def pqAdc(codes: Column, luts: Array[Array[Float]], k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    column(PqAdc(expression(codes), luts, k))
  }
}

case class PqEncode(child: Expression, codebooks: Array[Array[Float]],
    k: Int, subDim: Int) extends UnaryExpression {
  // ‖codeword‖² precomputed once per plan: argmin‖x−c‖² over a
  // subspace = argmin(‖c‖² − 2·c·x), so the per-row loop needs no
  // subtraction against x's own norm
  @transient private lazy val cn2: Array[Double] =
    codebooks.map(c => c.map(x => x.toDouble * x.toDouble).sum)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], codebooks, cn2, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][]")
    val cnRef = ctx.addReferenceObj("cn2", cn2, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.PqEncode.compute($a, $cbRef, $cnRef, $k, $subDim);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  def compute(vec: ArrayData, codebooks: Array[Array[Float]],
      cn2: Array[Double], k: Int, subDim: Int): Array[Byte] = {
    val m = codebooks.length / k
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var best = 0
      var bestScore = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val cw = codebooks(mi * k + ki)
        var dot = 0.0
        var i = 0
        val n = math.min(subDim, math.max(0, vec.numElements() - base))
        while (i < n) {
          dot += vec.getFloat(base + i).toDouble * cw(i).toDouble
          i += 1
        }
        val score = cn2(mi * k + ki) - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = ki }
        ki += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }
}

case class PqAdc(child: Expression, luts: Array[Array[Float]], k: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqAdc.compute(v.asInstanceOf[Array[Byte]], luts, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("luts", luts, "float[][]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.PqAdc.compute($a, $lRef, $k);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqAdc {
  def compute(codes: Array[Byte], luts: Array[Array[Float]],
      k: Int): ArrayData = {
    val q = luts.length
    val out = new Array[Double](q)
    var qi = 0
    while (qi < q) {
      val lut = luts(qi)
      var acc = 0.0
      var mi = 0
      while (mi < codes.length) {
        acc += lut(mi * k + (codes(mi) & 0xff)).toDouble
        mi += 1
      }
      out(qi) = acc
      qi += 1
    }
    new GenericArrayData(out)
  }
}
