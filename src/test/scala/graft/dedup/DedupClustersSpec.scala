package graft.dedup

import graft.SparkSpec

/** Cluster semantics of the composed MinHash→CC→exemplar pipeline, and
  * the exactness of the banded n-gram Jaccard join, on a crafted corpus.
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
    "omega one two three four five six seven eight nine ten eleven twelve"
  private val near1 = base.replace("five six", "FIVE six")
  private val near2 = base.replace("nine ten", "nine TEN")
  private val other = "totally unrelated words about catalyst tungsten " +
    "volcano iterators shuffling exchanges and broadcast variable reuse " +
    "across executor heartbeats with dynamic allocation spilling sorters"

  test("transitive near-dups collapse into one cluster with min exemplar") {
    // 0~1 and 0~2 are near-dups; 1~2 connect through 0 transitively
    val docs = Seq((10L, base), (11L, near1), (12L, near2), (13L, other),
      (14L, other)).toDF("doc_id", "text")
    val got = DedupClusters.clusters(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // exact dups 13/14 cluster together too
    assert(got == Set((10L, 10L, false), (11L, 10L, true), (12L, 10L, true),
      (13L, 13L, false), (14L, 13L, true)))
  }

  test("ngram jaccard banded join finds near pairs within length band") {
    val docs = Seq((1L, base, base.length), (2L, near1, near1.length),
      (3L, other, other.length)).toDF("doc_id", "text", "n_chars")
    val got = NgramJaccard.similarPairs(docs, threshold = 0.7, lengthBand = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("hash jaccard equals string-set jaccard") {
    import org.apache.spark.sql.functions._
    val df = Seq((base, near1)).toDF("a", "b")
    val viaHash = df.select(graft.functions.JaccardOps.jaccard_sorted(
      graft.functions.JaccardOps.sorted_shingle_hashes(col("a"), 2),
      graft.functions.JaccardOps.sorted_shingle_hashes(col("b"), 2)))
      .head().getDouble(0)
    val viaStrings = df.select(
      size(array_intersect(MinHashDedup.shingles(col("a"), 2),
        MinHashDedup.shingles(col("b"), 2))).cast("double") /
        size(array_union(MinHashDedup.shingles(col("a"), 2),
          MinHashDedup.shingles(col("b"), 2))))
      .head().getDouble(0)
    assert(viaHash == viaStrings)
  }
}

/** Contrastive pairs: positives share a cluster, negatives never do. */
class ClusterContrastiveSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("every pair is (exemplar, same-cluster dup, other-cluster exemplar)") {
    val dir = sf("sf0.001")
    val cl = DedupClusters.clusters(
      graft.Tables(spark, dir).documents, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.Registry.byName("t_cluster_contrastive_pairs")
      .run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, p, n) =>
      assert(cl(a) == a, s"anchor $a must be its own exemplar")
      assert(cl(p) == a, s"positive $p must live in anchor $a's cluster")
      assert(cl(n) == n && n != a, s"negative $n must head another cluster")
    }
  }
}
