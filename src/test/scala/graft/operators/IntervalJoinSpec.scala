package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed interval-overlap join must equal the naive theta join —
  * in particular for pairs whose overlap straddles bucket boundaries
  * (shared in 2+ buckets: the count-once filter must not double-count)
  * and for intervals longer than one bucket.
  */
class IntervalJoinSpec extends SparkSpec {

  private val W = 3600L * 1000000L

  /** Mirror of the registered query's join core over explicit intervals
    * (user, st_us, en_us).
    */
  private def bucketed(iv: DataFrame): DataFrame = {
    val a = iv.select(col("user").as("a_user"), col("st").as("a_st"),
      col("en").as("a_en"),
      explode(expr(s"sequence(st div $W, en div $W)")).as("bucket"))
    val b = iv.select(col("user").as("b_user"), col("st").as("b_st"),
      col("en").as("b_en"),
      explode(expr(s"sequence(st div $W, en div $W)")).as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_user") =!= col("b_user") &&
        col("a_st") <= col("b_en") && col("b_st") <= col("a_en") &&
        col("bucket") === expr(s"greatest(a_st, b_st) div $W"))
      .select("a_user", "a_st", "b_user", "b_st")
  }

  private def naive(iv: DataFrame): DataFrame = {
    val a = iv.select(col("user").as("a_user"), col("st").as("a_st"),
      col("en").as("a_en"))
    val b = iv.select(col("user").as("b_user"), col("st").as("b_st"),
      col("en").as("b_en"))
    a.join(b, col("a_user") =!= col("b_user") &&
        col("a_st") <= col("b_en") && col("b_st") <= col("a_en"))
      .select("a_user", "a_st", "b_user", "b_st")
  }

  test("equals the naive theta join, incl. boundary-straddling pairs") {
    import spark.implicits._
    val h = W // one hour
    val iv = Seq(
      // overlap entirely inside one bucket
      (1L, 1000L, 2000L), (2L, 1500L, 2500L),
      // overlap straddles a bucket boundary (shared buckets 0 and 1)
      (3L, h - 500L, h + 500L), (4L, h - 300L, h + 900L),
      // long interval (4 buckets) overlapping a short one mid-way
      (5L, 0L, 4L * h), (6L, 2L * h + 10L, 2L * h + 20L),
      // touching endpoints (st == other's en) count as overlap
      (7L, 5L * h, 6L * h), (8L, 6L * h, 7L * h),
      // disjoint — must NOT appear
      (9L, 10L * h, 10L * h + 100L), (10L, 11L * h, 11L * h + 100L)
    ).toDF("user", "st", "en")
    val got = bucketed(iv).collect().map(_.toSeq).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val want = naive(iv).collect().map(_.toSeq).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got === want)
    // the straddling pair (3, 4) appears exactly once despite sharing
    // 2 buckets (3 also overlaps 5's long interval — a separate pair)
    assert(got(Seq(3L, h - 500L, 4L, h - 300L)) === 1)
    // disjoint pair absent
    assert(!got.keys.exists(r => r.head == 9L || r.head == 10L))
  }

  test("property: equals the naive join on 15 random interval sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val gen = for {
      n <- Gen.choose(2, 40)
      iv <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 12L)
        st <- Gen.choose(0L, 10L * W)       // spans ~10 buckets
        len <- Gen.choose(0L, 3L * W)       // up to 3 buckets long
      } yield (u, st, st + len))
    } yield iv
    (1 to 15).foreach { seed =>
      val iv = sample(gen, seed.toLong)
        // one interval per user keeps pairs well-defined w/o identity cols
        .groupBy(_._1).map(_._2.head).toSeq
        .toDF("user", "st", "en")
      val got = bucketed(iv).collect().map(_.toSeq).toSet
      val want = naive(iv).collect().map(_.toSeq).toSet
      assert(got === want, s"mismatch at seed $seed")
      // multiplicity check too: no pair may surface twice
      val gotAll = bucketed(iv).collect().map(_.toSeq).toSeq
      assert(gotAll.size === gotAll.toSet.size,
        s"duplicate pair emitted at seed $seed")
    }
  }

  test("registered query returns rows at sf0.001") {
    val df = graft.Registry.byName("j20_interval_overlap_join")
      .run(spark, sf("sf0.001"))
    assert(df.count() > 0)
  }
}
