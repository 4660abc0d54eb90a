package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.TypedValue
import graft.sources.FragmentPruning

/** The dim0-sweep overlap enumeration must agree exactly with the
  * naive all-pairs check, and must stay near-linear on the fragment
  * layouts a 100 TB table actually has (time/key-ordered, mostly
  * disjoint). Pure driver-side metadata math — no SparkSession. */
class OverlapSweepSpec extends AnyFunSuite {

  private type Box = FragmentPruning.Box
  private val ord = TypedValue.ordering

  // reference model: a dim separates iff a KNOWN max < a KNOWN min
  // (matches FragmentPruning.boxesOverlap — partially-known stats
  // still prune; fully-unknown dims overlap conservatively)
  private def naivePairs(boxes: IndexedSeq[Box]): Set[(Int, Int)] =
    (for {
      i <- boxes.indices
      j <- i + 1 until boxes.size
      if !boxes(i).zip(boxes(j)).exists { case ((mn1, mx1), (mn2, mx2)) =>
        (for (x <- mx1; n <- mn2) yield ord.compare(x, n) < 0)
          .getOrElse(false) ||
          (for (x <- mx2; n <- mn1) yield ord.compare(x, n) < 0)
            .getOrElse(false)
      }
    } yield (i, j)).toSet

  private def sweepPairs(boxes: IndexedSeq[Box]): Set[(Int, Int)] = {
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    FragmentPruning.forEachOverlappingPair(boxes,
      (i, j) => { out += ((i, j)); true })
    out.toSet
  }

  private val boundGen: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(-50L, 50L).map(Some(_)), 1 -> Gen.const(None))

  private def boxGen(dims: Int): Gen[Box] =
    Gen.listOfN(dims, for {
      a <- boundGen; b <- boundGen
    } yield {
      val (lo, hi) = (a, b) match {
        case (Some(x), Some(y)) if x > y => (Some(y), Some(x))
        case other => other
      }
      (lo.map(_.asInstanceOf[Any]), hi.map(_.asInstanceOf[Any]))
    }).map(_.toIndexedSeq)

  test("sweep pair set equals the naive all-pairs check (1–3 dims)") {
    val gen = Gen.choose(1, 3).flatMap(d =>
      Gen.listOfN(30, boxGen(d)).map(_.toIndexedSeq))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen)(boxes => sweepPairs(boxes) == naivePairs(boxes)))
    assert(res.passed, res.status.toString)
  }

  test("early-stop: the sweep halts on the first pair when asked") {
    val boxes = IndexedSeq.tabulate(100)(i =>
      IndexedSeq((Some(i.toLong * 2): Option[Any],
        Some(i.toLong * 2 + 3): Option[Any]))) // chain: i overlaps i+1
    var visits = 0
    FragmentPruning.forEachOverlappingPair(boxes,
      (_, _) => { visits += 1; false })
    assert(visits == 1)
  }

  test("50k time-ordered disjoint fragments enumerate in linear-ish time") {
    val n = 50000
    val boxes = IndexedSeq.tabulate(n)(i =>
      IndexedSeq(
        (Some(i.toLong * 10): Option[Any],
          Some(i.toLong * 10 + 9): Option[Any]),
        (Some(0L): Option[Any], Some(1000L): Option[Any])))
    val t0 = System.nanoTime()
    assert(sweepPairs(boxes).isEmpty)
    val ms = (System.nanoTime() - t0) / 1e6
    // the naive check is n²/2 = 1.25e9 pairs — minutes; the sweep must
    // finish in single-digit seconds even on a slow CI box
    assert(ms < 10000, s"sweep took $ms ms on $n disjoint fragments")
  }

  test("50k chained-overlap fragments find exactly n-1 pairs, fast") {
    val n = 50000
    val boxes = IndexedSeq.tabulate(n)(i =>
      IndexedSeq((Some(i.toLong * 2): Option[Any],
        Some(i.toLong * 2 + 3): Option[Any])))
    val t0 = System.nanoTime()
    assert(sweepPairs(boxes).size == n - 1)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 10000, s"sweep took $ms ms on $n chained fragments")
  }
}
