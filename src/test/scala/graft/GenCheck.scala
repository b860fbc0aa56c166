package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper: the offline coursier cache
  * has scalacheck but not the scalatestplus bridge, so we sample generators
  * ourselves (fixed seed => reproducible failures).
  */
trait GenCheck {
  def forAllG[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var s = Seed(42L)
    var i = 0
    var produced = 0
    while (i < n * 3 && produced < n) {
      gen.apply(Gen.Parameters.default, s).foreach { a => f(a); produced += 1 }
      s = s.next
      i += 1
    }
    assert(produced > 0, "generator produced no values")
  }

  def forAllG2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    forAllG(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
