package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** r9 wave 18: X178 jump consistent hashing. */
class JumpHashSpec extends AnyFunSuite {

  private val keys = (1L to 20000L).map(_ * 0x9E3779B97F4A7C15L)

  test("jumpHash: in-range, deterministic, single bucket for n=1") {
    keys.take(200).foreach { k =>
      val b = ZOrder.jumpHash(k, 10)
      assert(b >= 0 && b < 10)
      assert(b == ZOrder.jumpHash(k, 10))
      assert(ZOrder.jumpHash(k, 1) == 0)
    }
  }

  test("jumpHash balances: every bucket within 20% of uniform at " +
    "20k keys over 16 buckets") {
    val counts = keys.groupBy(ZOrder.jumpHash(_, 16)).map(_._2.size)
    assert(counts.size == 16)
    val expect = keys.size / 16.0
    counts.foreach(c => assert(math.abs(c - expect) / expect < 0.2,
      s"bucket count $c vs uniform $expect"))
  }

  test("jumpHash minimal movement: growing n -> n+1 moves ~1/(n+1) " +
    "of keys and moves them ONLY to the new bucket") {
    Seq(7, 32, 100).foreach { n =>
      val moved = keys.flatMap { k =>
        val a = ZOrder.jumpHash(k, n)
        val b = ZOrder.jumpHash(k, n + 1)
        if (a != b) Some(b) else None
      }
      // every mover lands on the NEW bucket n
      assert(moved.forall(_ == n), s"n=$n: mover left the new bucket")
      // movement fraction ~ 1/(n+1), generous 50% tolerance
      val frac = moved.size.toDouble / keys.size
      val ideal = 1.0 / (n + 1)
      assert(frac > ideal * 0.5 && frac < ideal * 1.5,
        s"n=$n: moved fraction $frac vs ideal $ideal")
    }
  }

  test("jumpHash monotone stability across a long growth walk: a " +
    "key's bucket only ever changes to the newly added bucket") {
    keys.take(300).foreach { k =>
      var prev = ZOrder.jumpHash(k, 1)
      (2 to 64).foreach { n =>
        val cur = ZOrder.jumpHash(k, n)
        assert(cur == prev || cur == n - 1,
          s"key $k at n=$n jumped $prev -> $cur (not the new bucket)")
        prev = cur
      }
    }
  }
}
