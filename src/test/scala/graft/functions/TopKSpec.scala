package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private val agg = new TopKAgg(3)

  test("keeps the k best in (score desc, id asc) order") {
    val buf = Seq(0.9, 0.1, 0.5, 0.7, 0.5).zipWithIndex
      .map { case (s, i) => Scored(s, i.toLong) }
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(Scored(0.9, 0), Scored(0.7, 3), Scored(0.5, 2)))
  }

  test("re-inserting a held element is a no-op (idempotent)") {
    val once = agg.reduce(agg.zero, Scored(0.5, 7))
    assert(agg.reduce(once, Scored(0.5, 7)) == once)
    val full = Seq(Scored(0.9, 1), Scored(0.8, 2), Scored(0.7, 3))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(full, Scored(0.8, 2)) == full)
  }

  test("NaN scores are rejected, not ranked") {
    val buf = Seq(Scored(0.9, 1), Scored(Double.NaN, 2), Scored(0.5, 3))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(Scored(0.9, 1), Scored(0.5, 3)))
    assert(agg.merge(buf, Seq(Scored(Double.NaN, 4))) == buf)
  }

  test("merge equals sequential insertion") {
    val a = Seq(Scored(0.9, 1), Scored(0.3, 2)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(Scored(0.8, 3), Scored(0.4, 4)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b)
      == Seq(Scored(0.9, 1), Scored(0.8, 3), Scored(0.4, 4)))
  }
}
