package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TypedValue
import graft.functions.expressions.TopKBuffer
import graft.sources.v2.PredicateSupport

/** Unit guards for the total orders the engine's pruning and top-k
  * rest on: string comparisons must follow UTF-8 byte order (what
  * Spark's UTF8String and parquet stats use — NOT Java's UTF-16
  * code-unit order), and the top-k heap must stay a total order under
  * NaN scores. */
class OrderingSpec extends AnyFunSuite {

  private def cp(c: Int): String = new String(Character.toChars(c))

  test("string ordering is code-point (UTF-8 byte) order, not UTF-16") {
    val bmp = "￿"
    val supp = cp(0x1F600) // non-BMP, encodes as a surrogate pair
    // UTF-16 code-unit order gets this backwards (0xFFFF > 0xD83D)
    assert(bmp.compareTo(supp) > 0)
    // the engine order must match Spark/parquet: U+FFFF < U+1F600
    assert(TypedValue.utf8Compare(bmp, supp) < 0)
    assert(TypedValue.ordering.compare(bmp, supp) < 0)
    // prefix relations and ASCII stay ordinary
    assert(TypedValue.utf8Compare("abc", "abd") < 0)
    assert(TypedValue.utf8Compare("ab", "abc") < 0)
    assert(TypedValue.utf8Compare("abc", "abc") == 0)
  }

  test("prefixSuccessor operates on code points and skips surrogates") {
    // supplementary char increments as one code point, not a char
    assert(PredicateSupport.prefixSuccessor("a" + cp(0x1F600))
      .contains("a" + cp(0x1F601)))
    // successor of U+D7FF skips the surrogate block to U+E000
    assert(PredicateSupport.prefixSuccessor("x퟿")
      .contains("x"))
    // U+FFFF is NOT maximal in code-point order (successor U+10000)
    assert(PredicateSupport.prefixSuccessor("￿")
      .contains(cp(0x10000)))
    // all-U+10FFFF has no successor
    assert(PredicateSupport.prefixSuccessor(cp(0x10FFFF)).isEmpty)
    // ordinary ASCII: drop the tail, bump the last char
    assert(PredicateSupport.prefixSuccessor("br").contains("bs"))
    // every string with the prefix sorts inside [p, succ(p))
    for (p <- Seq("br", "a" + cp(0x1F600), "x퟿")) {
      val s = PredicateSupport.prefixSuccessor(p).get
      for (ext <- Seq("", "a", "￿", cp(0x1F600))) {
        assert(TypedValue.utf8Compare(p + ext, p) >= 0)
        assert(TypedValue.utf8Compare(p + ext, s) < 0,
          s"prefix '$p' + ext should sort below its successor")
      }
    }
  }

  test("top-k heap is a total order under NaN scores") {
    val b = new TopKBuffer(3)
    Seq(Double.NaN, 1.0, 2.0, Double.NaN, 0.5).zipWithIndex.foreach {
      case (s, i) => b.insert(s, i.toLong)
    }
    val out = b.sorted // must not throw "comparison method violates..."
    assert(out.length == 3)
    // Double.compare total order: NaN sorts greatest (Spark's order)
    assert(out(0)._1.isNaN && out(1)._1.isNaN)
    assert(out(2)._1 == 2.0)
    // a NaN in the buffer must not block eviction of real scores:
    // better scores still displace the worst entry
    val b2 = new TopKBuffer(2)
    b2.insert(Double.NaN, 1L)
    b2.insert(0.1, 2L)
    b2.insert(0.9, 3L)
    assert(b2.sorted.map(_._2).toSeq == Seq(1L, 3L))
  }
}
