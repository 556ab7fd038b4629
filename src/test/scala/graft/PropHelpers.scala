package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper over raw scalacheck Gen
  * (org.scalatestplus is not in the offline cache). 100 seeded samples. */
trait PropHelpers {
  private val N = 100

  private def sample[A](g: Gen[A], i: Long): A =
    g.apply(Gen.Parameters.default, Seed(i)).getOrElse(
      throw new IllegalStateException("Gen failed to produce a value"))

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until N).foreach(i => f(sample(ga, i), sample(gb, i + 1000)))

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (0 until N).foreach(i => f(sample(ga, i), sample(gb, i + 1000), sample(gc, i + 2000)))

  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    (0 until N).foreach(i =>
      f(sample(ga, i), sample(gb, i + 1000), sample(gc, i + 2000), sample(gd, i + 3000)))

  def forAll[A, B, C, D, E](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D], ge: Gen[E])(
      f: (A, B, C, D, E) => Unit): Unit =
    (0 until N).foreach(i =>
      f(sample(ga, i), sample(gb, i + 1000), sample(gc, i + 2000), sample(gd, i + 3000),
        sample(ge, i + 4000)))
}
