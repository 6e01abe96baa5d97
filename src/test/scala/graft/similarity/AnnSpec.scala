package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF ANN quality: recall of the bucketed search against the exact
  * brute-force baseline on the real embeddings table.
  */
class AnnSpec extends SparkSpec {

  private def recallVsBrute(e: org.apache.spark.sql.DataFrame,
      nlist: Int, nprobe: Int): Double = {
    val q = e.filter(col("vec_id") < 10)
    val brute = SimilarityQueries.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.ivfTopK(e, q, 5, nlist, nprobe).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (brute & ivf).size.toDouble / brute.size
  }

  test("ivf top-k recall vs brute force >= 0.5 with nprobe=4/16 lists") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val recall = recallVsBrute(e, 16, 4)
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("ivf recall >= 0.9 at dim 64 (real table, nprobe=8/16)") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val recall = recallVsBrute(e, 16, 8)
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("ivf recall >= 0.9 at dim 768 (dim-agnostic refinement)") {
    import spark.implicits._
    // synthetic 768-dim corpus: 8 well-separated seeded clusters — the
    // round-1 bug (refinement hardwired to 64 columns) silently averaged
    // only the first 64 dims at any other width; this guards the fix.
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8)(Array.fill(768)(rnd.nextGaussian()))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat),
        (i % 8).toLong)
    }
    val e = rows.toDF("vec_id", "embedding", "label")
    val recall = recallVsBrute(e, 8, 4)
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("ivf recall sweep: monotone non-decreasing in nprobe, 1.0 at nprobe=nlist") {
    // FAISS's recall lever behaves the same here: probing more lists can
    // only add candidates, so recall is monotone in nprobe and exact
    // (rank-tie caveats aside) when every list is probed. A sweep pins
    // the whole curve, not one point — regressions in the assignment or
    // refinement stages show up as a dented curve long before a single
    // threshold trips.
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val sweep = Seq(1, 2, 4, 8, 16).map(p => p -> recallVsBrute(e, 16, p))
    sweep.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 + 1e-9 >= r1,
        s"recall fell from $r1 (nprobe=$p1) to $r2 (nprobe=$p2)")
    case _ => ()
    }
    assert(sweep.last._2 >= 0.999,
      s"full probe should equal brute force, got ${sweep.last._2}")
    assert(sweep.head._2 >= 0.2, "even nprobe=1 finds the home-list hits")
  }

  test("int8 quantization: bounded reconstruction error, high topk recall") {
    import spark.implicits._
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    // error bound: |x - q*scale| <= scale/2 = max|x|/254 per component
    val err = Quantize.quantize(e, "embedding")
      .select(col("embedding"), Quantize.dequantize(col("q"), col("scale"))
        .as("r"), col("scale"))
      .select(max(array_max(zip_with(col("embedding"), col("r"),
        (x, y) => abs(x - y) / col("scale")))))
      .head().getDouble(0)
    assert(err <= 0.5 + 1e-6, s"max normalised error $err")

    val q = e.filter(col("vec_id") < 10)
    val brute = SimilarityQueries.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recon = Quantize.reconstructed(e, "embedding")
    val qTop = SimilarityQueries.bruteForceTopK(recon,
      recon.filter(col("vec_id") < 10), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & qTop).size.toDouble / brute.size
    assert(recall >= 0.8, s"quantized recall=$recall")
  }

  test("vectorise embeddings are unit-norm and partition-independent") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = graft.text.Vectorise.embed(docs, "text", 16)
      .select(col("doc_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = graft.text.Vectorise.embed(docs.repartition(7), "text", 16)
      .select(col("doc_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    val norms = a.values.map(v => math.sqrt(v.map(x => x * x).sum))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("cosine column agrees with a JVM dot product") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
    val got = df.select(SimilarityQueries.cosine(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(got - 8.0 / 9.0) < 1e-12)
  }

  test("semantic dedup corpus keeps no near-dup pair and shrinks the table") {
    val dir = sf("sf0.001")
    val e = spark.read.parquet(dir + "/embeddings.parquet")
    val survivors = graft.Registry.byName("d_semantic_dedup_corpus")
      .run(spark, dir)
    val n = e.count()
    val kept = survivors.count()
    assert(kept > 0 && kept < n, s"kept=$kept of $n — dedup must collapse something")
    // invariant: two survivors in the same label can never be near-dups —
    // within a component only the min-id exemplar survives, and distinct
    // components have no >=0.35 edge between them by CC's definition.
    val s = survivors.join(e.select("vec_id", "embedding"), Seq("vec_id"))
    val offending = s.alias("a")
      .join(s.alias("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(SimilarityQueries.cosine(
        col("a.embedding"), col("b.embedding")), 4) >= 0.35)
      .count()
    assert(offending == 0, s"$offending surviving near-dup pairs")
  }

  test("hard negatives never share the query's label and beat unpicked ones") {
    val dir = sf("sf0.001")
    val e = spark.read.parquet(dir + "/embeddings.parquet")
    val labels = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val hn = graft.Registry.byName("sim_hard_negatives").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hn.nonEmpty)
    hn.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"query $q picked same-label $n")
    }
    // for one query, the worst picked negative must be >= the best
    // cosine among unpicked different-label vectors
    val q0 = hn.filter(_._1 == 0)
    val picked = q0.map(_._2).toSet
    val worst = q0.map(_._3).min
    val best = e.collect().filter(r => labels(r.getLong(0)) != labels(0L)
        && !picked.contains(r.getLong(0)))
      .map { r =>
        val a = e.collect().find(_.getLong(0) == 0L).get.getSeq[Float](1)
        val b = r.getSeq[Float](1)
        val dp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        math.rint(dp / (na * nb) * 10000) / 10000
      }.max
    assert(worst >= best, s"worst picked $worst < best unpicked $best")
  }

  test("random projection roughly preserves pairwise distances (JL)") {
    val dir = sf("sf0.001")
    val proj = graft.Registry.byName("sim_random_projection").run(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      }
    val e = spark.read.parquet(dir + "/embeddings.parquet")
      .filter(col("vec_id") < 100).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = e.keys.toArray.sorted.take(20)
    val ratios = for {
      i <- ids; j <- ids if i < j
      // pairs must be far enough apart that the 4-dp output
      // rounding (~1e-4 per coord) is negligible against the distance
      orig = d2(e(i), e(j)) if orig > 0.01
    } yield d2(proj(i), proj(j)) / orig
    assert(ratios.nonEmpty)
    // K=16 is a coarse projection: expect distances within a broad but
    // bounded distortion band, and unbiased on average
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"worst ratios: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean distortion $mean")
  }
}
