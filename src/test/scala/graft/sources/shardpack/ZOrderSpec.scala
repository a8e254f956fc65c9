package graft.sources.shardpack

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function properties of the Morton machinery: interleave/gather
  * round-trips, per-dimension monotonicity, and the box decomposition's
  * covering contract (every code in the box is in some range; every range
  * member decodes into the box when the budget permits an exact cover;
  * ranges are sorted, disjoint, and within budget).
  */
class ZOrderSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(41)

  test("morton round-trips both dimensions for 16-bit inputs") {
    (0 until 2000).foreach { _ =>
      val (x, y) = (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)
      val c = ZOrder.morton(x, y)
      assert(ZOrder.mortonX(c) == x && ZOrder.mortonY(c) == y, s"($x,$y) -> $c")
    }
  }

  test("morton is monotone in each dimension holding the other fixed") {
    (0 until 500).foreach { _ =>
      val (x, y) = (rnd.nextInt(65535).toLong, rnd.nextInt(65535).toLong)
      assert(ZOrder.morton(x, y) < ZOrder.morton(x + 1, y))
      assert(ZOrder.morton(x, y) < ZOrder.morton(x, y + 1))
    }
  }

  test("hexKey preserves code order lexicographically") {
    (0 until 500).foreach { _ =>
      val (a, b) = (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL)
      assert((a < b) == (ZOrder.hexKey(a) < ZOrder.hexKey(b)), s"$a vs $b")
    }
  }

  test("boxRanges covers the box exactly when the budget allows") {
    (0 until 50).foreach { _ =>
      val x1 = rnd.nextInt(200).toLong; val x2 = x1 + rnd.nextInt(40)
      val y1 = rnd.nextInt(200).toLong; val y2 = y1 + rnd.nextInt(40)
      val ranges = ZOrder.boxRanges(x1, x2, y1, y2, maxRanges = 1 << 20)
      assert(ranges == ranges.sorted, "ranges must be sorted")
      ranges.sliding(2).foreach {
        case Seq((_, h), (l, _)) => assert(h < l, "ranges must be disjoint")
        case _ =>
      }
      // membership in the union of ranges == membership in the box
      val inRanges = (c: Long) => ranges.exists { case (l, h) => c >= l && c <= h }
      for (x <- x1 - 1 to x2 + 1; y <- y1 - 1 to y2 + 1) {
        val expect = x >= x1 && x <= x2 && y >= y1 && y <= y2
        if (x >= 0 && y >= 0)
          assert(inRanges(ZOrder.morton(x, y)) == expect, s"($x,$y)")
      }
    }
  }

  test("budgeted boxRanges over-approximates but never misses") {
    (0 until 50).foreach { _ =>
      val x1 = rnd.nextInt(60000).toLong; val x2 = x1 + rnd.nextInt(400)
      val y1 = rnd.nextInt(60000).toLong; val y2 = y1 + rnd.nextInt(400)
      val ranges = ZOrder.boxRanges(x1, x2, y1, y2, maxRanges = 8)
      assert(ranges.nonEmpty && ranges.length <= 8)
      val inRanges = (c: Long) => ranges.exists { case (l, h) => c >= l && c <= h }
      // sample box members: all must be covered (soundness under merging)
      (0 until 200).foreach { _ =>
        val x = x1 + rnd.nextInt((x2 - x1 + 1).toInt)
        val y = y1 + rnd.nextInt((y2 - y1 + 1).toInt)
        assert(inRanges(ZOrder.morton(x, y)), s"budget merge lost ($x,$y)")
      }
    }
  }
}
