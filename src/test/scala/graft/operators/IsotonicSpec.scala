package graft.operators

import graft.{Registry, SparkSpec}

/** Cross-checks the minimax-identity isotonic fit against the classic
  * sequential pool-adjacent-violators stack — the two must agree
  * exactly (same rationals), which pins the relational closed form to
  * the textbook algorithm.
  */
class IsotonicSpec extends SparkSpec {

  /** Stack PAV over (weight, sum) pairs; returns per-bin (num, den). */
  private def pav(w: Array[Long], s: Array[Long]): Array[(Long, Long)] = {
    // blocks of (count, sum, span); pool while the left mean >= right
    val st = collection.mutable.Stack.empty[(Long, Long, Int)]
    for (i <- w.indices) {
      var (c, p, span) = (w(i), s(i), 1)
      // violation: prev mean >= cur mean (strict pooling keeps blocks
      // strictly increasing; equal means pool too — same fit values)
      while (st.nonEmpty &&
        st.top._2 * c >= p * st.top._1) {
        val (c0, p0, k0) = st.pop()
        c += c0; p += p0; span += k0
      }
      st.push((c, p, span))
    }
    st.toList.reverse.flatMap { case (c, p, span) =>
      List.fill(span)((p, c))
    }.toArray
  }

  test("minimax fit equals sequential PAV, and is nondecreasing") {
    val rows = Registry.byName("a59_isotonic_calibration")
      .run(spark, sf("sf0.001"))
      .orderBy("bin").collect()
    assert(rows.nonEmpty)
    val w = rows.map(_.getLong(1))
    val s = rows.map(_.getLong(2))
    val expect = pav(w, s)
    rows.zip(expect).foreach { case (r, (num, den)) =>
      val (gn, gd) = (r.getLong(3), r.getLong(4))
      // same rational: cross-multiply (block splits can differ in
      // representation, value must match)
      assert(gn * den == num * gd,
        s"bin ${r.getLong(0)}: got $gn/$gd want $num/$den")
    }
    val fits = rows.map(r =>
      r.getLong(3).toDouble / r.getLong(4).toDouble)
    fits.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, "fit must be nondecreasing")
    }
  }
}
