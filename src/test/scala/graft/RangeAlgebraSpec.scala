package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import graft.core.RangeAlgebra.{DimConstraint, Interval}

/** Property tests for the interval algebra the pushdown rests on —
  * the single highest-value invariant per SURVEY §5: constraint
  * semantics must agree with direct predicate evaluation. */
class RangeAlgebraSpec extends AnyFunSuite {

  private val longs = Gen.chooseNum(-1000L, 1000L)

  /** Run a ScalaCheck property under the default test parameters. */
  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g1: Gen[A], gs: Gen[A]*)(f: Seq[A] => Unit): Unit =
    holds(Prop.forAll(Gen.sequence[Seq[A], A](g1 +: gs)) { vs =>
      f(vs); true
    })

  test("intersect is the AND of memberships") {
    forAll(longs, longs, longs, longs, longs) { case Seq(a, b, c, d, v) =>
      val i1 = Interval(Some(math.min(a, b)), Some(math.max(a, b)))
      val i2 = Interval(Some(math.min(c, d)), Some(math.max(c, d)))
      val both = i1.intersect(i2)
      assert(both.contains(v) == (i1.contains(v) && i2.contains(v)))
    }
  }

  test("gt/lt integral tightening preserves membership semantics") {
    forAll(longs, longs) { case Seq(bound, v) =>
      assert(Interval.gt(LongType, bound).contains(v) == (v > bound))
      assert(Interval.lt(LongType, bound).contains(v) == (v < bound))
      val dv = v.toDouble; val db = bound.toDouble
      assert(Interval.gt(DoubleType, db).contains(dv) == (dv > db))
      assert(Interval.lt(DoubleType, db).contains(dv) == (dv < db))
    }
  }

  test("overlaps is consistent with contains over MBRs") {
    forAll(longs, longs, longs, longs) { case Seq(a, b, m1, m2) =>
      val iv = Interval(Some(math.min(a, b)), Some(math.max(a, b)))
      val (mn, mx) = (math.min(m1, m2), math.max(m1, m2))
      val anyInside = (mn to mx).take(4000).exists(iv.contains(_)) ||
        iv.contains(mn) || iv.contains(mx)
      // overlaps must never prune an MBR that holds a matching value
      if (anyInside) assert(iv.overlaps(mn, mx))
    }
  }

  test("IN-point dedup + range containment (reference P9)") {
    val c = DimConstraint()
      .and(Interval(Some(10L), Some(20L)))
      .andPoints(Seq(5L, 12L, 12L, 18L, 25L))
    assert(c.effectivePoints.contains(Set(12L, 18L)))
    assert(c.accepts(12L) && !c.accepts(5L) && !c.accepts(15L))
  }

  test("string intervals order lexicographically") {
    val iv = Interval(Some("Brand#2"), Some("Brand#4"))
    assert(iv.contains("Brand#33") && !iv.contains("Brand#5"))
    assert(iv.overlaps("Brand#1", "Brand#2") && !iv.overlaps("Brand#5", "Brand#9"))
    val e = intercept[IllegalArgumentException] {
      graft.core.TypedValue.ordering.compare("x", 1L)
    }
    assert(e.getMessage.contains("incomparable"))
  }

  test("empty interval detection drives the empty-scan path") {
    assert(Interval(Some(10L), Some(5L)).isEmpty)
    assert(Interval(Some(5L), Some(5L), loInc = true, hiInc = false).isEmpty)
    assert(!Interval(Some(5L), Some(5L)).isEmpty)
    assert(DimConstraint().and(Interval(Some(10L), Some(5L))).definitelyEmpty)
  }
}
