package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the round-8 kernels, checked directly at
  * the JVM level (no Spark session needed): each kernel against an
  * independently-written naive replay on adversarial random inputs —
  * including astral-plane code points for the string kernel, the case
  * UTF-16-unit slicing silently corrupts. */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  // strings over a small alphabet (forces repeats → distinct-order
  // matters) mixed with multilingual + astral-plane code points
  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("a", "b", "c", " ", "日", "本"),
    1 -> Gen.oneOf("😀", "😁"), // 😀 😁 surrogate pairs
    1 -> Gen.oneOf("é", "ß"))
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  test("RollingWindowKeys == direct polynomial per window; dup windows collide") {
    import graft.functions.expressions.RollingWindowKeys
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val tokGen = Gen.oneOf("a", "b", "cc", "dd", "éé", "x1")
    val docGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, tokGen))
    holds(Prop.forAll(docGen, Gen.chooseNum(1, 7)) { (toks, l) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = RollingWindowKeys.compute(arr, l)
        .toLongArray().toList
      // naive: per-token xxh64, direct Horner per window (wrapping)
      val h = toks.map { t =>
        val u = UTF8String.fromString(t)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }
      val naive = (0 to toks.length - l).map { p =>
        (0 until l).foldLeft(0L)((w, i) =>
          w * RollingWindowKeys.B + h(p + i))
      }.toList
      val eq = got == (if (toks.length < l) Nil else naive)
      // no false negatives: equal token windows ⇒ equal keys
      val windows = (0 to toks.length - l).map(p => toks.slice(p, p + l))
      val collide = windows.zip(got).groupBy(_._1).values
        .forall(g => g.map(_._2).distinct.size == 1)
      eq && (toks.length < l || collide)
    })
  }

  test("CharGramsExpr == naive code-point k-gram set, any unicode") {
    holds(Prop.forAll(strGen, Gen.chooseNum(1, 6)) { (s, k) =>
      val got = graft.functions.expressions.CharGramsExpr
        .compute(UTF8String.fromString(s), k)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toList
      // naive: code-point vector, sliding windows, first-occurrence dedup
      val cps = s.codePoints().toArray
      val naive = (0 to cps.length - k)
        .map(i => new String(cps, i, k)).distinct.toList
      got == (if (cps.length < k) Nil else naive)
    })
  }

  test("MmrBuffer keeps exactly the kCand best under (score desc, id asc)") {
    val entry = for {
      s <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_.toDouble / 4),
        Gen.chooseNum(-1000, 1000).map(_.toDouble / 100))
      id <- Gen.chooseNum(0L, 50L)
    } yield (s, id)
    holds(Prop.forAll(Gen.listOf(entry), Gen.chooseNum(1, 8)) { (xs, k) =>
      val b = new graft.functions.expressions.MmrBuffer(k)
      val v = Array(0.0f)
      xs.foreach { case (s, id) => b.insert(s, id, v) }
      val got = (0 until b.size).map(i => (b.scores(i), b.ids(i))).toList
      // naive: sort ALL inserted entries by the same order, take k
      // (duplicates insert repeatedly and count as distinct entries)
      val naive = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      got == naive
    })
  }

  test("MmrSelect greedy eval == plain-Scala greedy on random vectors") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-8, 8)).map(_.map(_.toFloat).toArray)
    val rowGen = for {
      id <- Gen.chooseNum(0L, 30L)
      v <- vecGen
      cos <- Gen.chooseNum(-100, 100).map(_.toDouble / 100)
    } yield (cos, id, v)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn == 0.0) 0.0 else d / nn
    }
    holds(Prop.forAll(Gen.listOf(rowGen)) { rows0 =>
      // distinct ids (the operator's contract: one row per candidate)
      val rows = rows0.groupBy(_._2).map(_._2.head).toList
      val agg = graft.functions.expressions.MmrSelect(null, null, null,
        kCand = 10, kSel = 4, lam = 0.7, muDiv = 0.3)
      val b = agg.createAggregationBuffer()
      rows.foreach { case (s, id, v) => b.insert(s, id, v) }
      val got = agg.eval(b)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map { r =>
          val ir = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          (ir.getLong(0), ir.getLong(1))
        }.toList
      // naive greedy over the naive top-10
      var remaining = rows.sortBy { case (s, id, _) => (-s, id) }.take(10)
        .map { case (s, id, v) => (s, id, v, 0.0) }
      var sel = List.empty[(Long, Long)]
      var step = 1
      while (step <= 4 && remaining.nonEmpty) {
        val best = remaining.minBy { case (s, id, _, dv) =>
          (-(0.7 * s - 0.3 * dv), id)
        }
        sel :+= ((step.toLong, best._2))
        remaining = remaining.filter(_._2 != best._2).map {
          case (s, id, v, dv) => (s, id, v, math.max(dv, cos(v, best._3)))
        }
        step += 1
      }
      got == sel
    })
  }

  test("SharedCount == size(array_intersect) on distinct string sets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val elemGen = Gen.oneOf("a", "b", "cc", "日本", "😀x", "é", "", "z9")
    val setGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, elemGen).map(_.distinct))
    holds(Prop.forAll(setGen, setGen) { (a, b) =>
      def arr(xs: List[String]) = new GenericArrayData(
        xs.map(x => UTF8String.fromString(x)).toArray[Any])
      val got = graft.functions.expressions.SharedCount
        .compute(arr(a), arr(b))
      val naive = a.toSet.intersect(b.toSet).size.toLong
      // the union identity the Jaccard rewrite rests on
      val unionOk =
        a.size + b.size - got == a.toSet.union(b.toSet).size.toLong
      got == naive && unionOk
    })
  }
}
