package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic forAll over ScalaCheck Gens — avoids the
  * scalatestplus bridge (not in the offline dependency cache).
  */
trait PropertyHarness {
  def forAllSampled[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 300)(
      check: (A, B) => Unit): Unit =
    forAllSampled(Gen.zip(ga, gb), n) { case (a, b) => check(a, b) }
}
