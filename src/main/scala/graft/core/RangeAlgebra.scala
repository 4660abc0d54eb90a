package graft.core

import org.apache.spark.sql.types.DataType

/** Interval algebra for dimension pushdown — the Spark-side port of the
  * reference's range machinery:
  *
  *  - GT/LT → inclusive GE/LE via ±1 on integral types, kept exclusive
  *    on float/string [mytile-range.h:607–643, mytile-range.cc:450–534]
  *  - AND-merge = most-restrictive intersection (max lower, min upper)
  *    [merge_ranges, mytile-range.h:220–300]
  *  - IN-list point dedup + containment drop
  *    [get_unique_non_contained_in_ranges, mytile-range.cc:647–819]
  *  - range ∩ fragment-MBR overlap test = partition pruning
  *    [build_subarray ∩ non-empty domain, mytile-range.cc:1189–1358]
  */
object RangeAlgebra {
  private val ord = TypedValue.ordering

  /** [lo, hi] with optional open bounds; None = unbounded. */
  case class Interval(
      lo: Option[Any], hi: Option[Any],
      loInc: Boolean = true, hiInc: Boolean = true) {

    def contains(v: Any): Boolean = {
      val okLo = lo.forall(l => {
        val c = ord.compare(v, l); if (loInc) c >= 0 else c > 0
      })
      val okHi = hi.forall(h => {
        val c = ord.compare(v, h); if (hiInc) c <= 0 else c < 0
      })
      okLo && okHi
    }

    def isEmpty: Boolean = (lo, hi) match {
      case (Some(l), Some(h)) =>
        val c = ord.compare(l, h)
        c > 0 || (c == 0 && !(loInc && hiInc))
      case _ => false
    }

    /** Most-restrictive AND-combination. */
    def intersect(o: Interval): Interval = {
      val (nl, nli) = (lo, o.lo) match {
        case (None, x) => (x, o.loInc)
        case (x, None) => (x, loInc)
        case (Some(a), Some(b)) =>
          val c = ord.compare(a, b)
          if (c > 0) (Some(a), loInc)
          else if (c < 0) (Some(b), o.loInc)
          else (Some(a), loInc && o.loInc)
      }
      val (nh, nhi) = (hi, o.hi) match {
        case (None, x) => (x, o.hiInc)
        case (x, None) => (x, hiInc)
        case (Some(a), Some(b)) =>
          val c = ord.compare(a, b)
          if (c < 0) (Some(a), hiInc)
          else if (c > 0) (Some(b), o.hiInc)
          else (Some(a), hiInc && o.hiInc)
      }
      Interval(nl, nh, nli, nhi)
    }

    /** Does this interval overlap [mn, mx] (a fragment MBR)? */
    def overlaps(mn: Any, mx: Any): Boolean = {
      val loOk = lo.forall(l => {
        val c = ord.compare(mx, l); if (loInc) c >= 0 else c > 0
      })
      val hiOk = hi.forall(h => {
        val c = ord.compare(mn, h); if (hiInc) c <= 0 else c < 0
      })
      loOk && hiOk
    }
  }

  object Interval {
    val all: Interval = Interval(None, None)
    def point(v: Any): Interval = Interval(Some(v), Some(v))

    def ge(v: Any): Interval = Interval(Some(v), None)
    def le(v: Any): Interval = Interval(None, Some(v))

    /** GT with the reference's integral tightening (+1 → GE).
      * `> Long.MaxValue` matches nothing — the +1 must not wrap to an
      * interval that matches EVERYTHING (predicate consumption would
      * then prove the impossible predicate true on every file). */
    def gt(dt: DataType, v: Any): Interval =
      if (TypedValue.isIntegral(dt)) {
        val l = v.asInstanceOf[Long]
        if (l == Long.MaxValue) Interval(Some(1L), Some(0L)) // empty
        else Interval(Some(l + 1), None)
      } else Interval(Some(v), None, loInc = false)

    /** LT with the reference's integral tightening (−1 → LE);
      * `< Long.MinValue` matches nothing (no wrap — see gt). */
    def lt(dt: DataType, v: Any): Interval =
      if (TypedValue.isIntegral(dt)) {
        val l = v.asInstanceOf[Long]
        if (l == Long.MinValue) Interval(Some(1L), Some(0L)) // empty
        else Interval(None, Some(l - 1))
      } else Interval(None, Some(v), hiInc = false)
  }

  /** Per-dimension pushdown state: an AND-interval plus optional
    * IN-list points (both must hold ⇒ points are filtered by range). */
  case class DimConstraint(range: Interval = Interval.all,
      points: Option[Set[Any]] = None) {

    def and(i: Interval): DimConstraint = copy(range = range.intersect(i))

    def andPoints(ps: Seq[Any]): DimConstraint = {
      val set = ps.toSet // IN dedup
      copy(points = Some(points.map(_.intersect(set)).getOrElse(set)))
    }

    /** Points surviving range containment (reference drops IN points
      * already outside the merged super-range). */
    def effectivePoints: Option[Set[Any]] =
      points.map(_.filter(range.contains))

    def accepts(v: Any): Boolean =
      v != null && range.contains(v) &&
        points.forall(_.contains(v))

    def definitelyEmpty: Boolean =
      range.isEmpty || effectivePoints.exists(_.isEmpty)

    /** Could any value inside MBR [mn,mx] satisfy this constraint? */
    def overlapsMbr(mn: Any, mx: Any): Boolean =
      range.overlaps(mn, mx) &&
        points.forall(_.exists(p =>
          ord.compare(p, mn) >= 0 && ord.compare(p, mx) <= 0))
  }
}
