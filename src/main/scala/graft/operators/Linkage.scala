package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage, Fellegi–Sunter shape (1969; the model
  * behind Splink/dedupe.io): candidate pairs from BLOCKING (never the
  * cartesian), an agreement vector over comparison fields, and a match
  * score Σᵢ wᵢ where wᵢ is the field's log-likelihood-ratio weight —
  * positive on agreement, negative on disagreement. Entity resolution
  * proper, one tier above the fuzzy-name join (j13): j13 finds SIMILAR
  * strings, this scores WHETHER two records are the same entity.
  *
  * Exactness: the weights are fixed literals (the trained m/u ratios a
  * production linker ships), so the score is a same-order sum of
  * identical doubles in both engines — no ln() at query time. Scale:
  * blocking bounds candidates at Σ|block|²; the agreement vector and
  * score are a pure map over the pair stream; the class thresholds are
  * the Fellegi–Sunter link / possible-link bands.
  */
object Linkage {

  /** Fellegi–Sunter scored candidate pairs over nation blocks — shared
    * by the j15 classification and j18's entity resolution.
    */
  private def scoredPairs(t: Tables): org.apache.spark.sql.DataFrame = {
    val c = t.customer
      .select(col("c_custkey").as("id"), col("c_nationkey").as("blk"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).as("band"),
        pmod(col("c_custkey"), lit(10)).as("chk"))
    val score =
      when(col("a.seg") === col("b.seg"), lit(2.5)).otherwise(lit(-1.5)) +
        when(col("a.band") === col("b.band"), lit(3.0))
          .otherwise(lit(-2.0)) +
        when(col("a.chk") === col("b.chk"), lit(1.5)).otherwise(lit(-0.5))
    // parallelism pinned at the fanout boundary (the j28/SCALING.md
    // "Runtime planning" rule): the Σ|block|² pair fanout is ~×|block|
    // per probe row, and the broadcast-hash plan otherwise fuses ALL
    // pair generation + scoring into the probe side's scan tasks —
    // one task at the bench's single-row-group inputs, and sized by
    // pre-fanout bytes under AQE at any scale (measured: 2 stages,
    // 1 task, 0.92 s of the 1.02 s wall).
    c.repartition(t.customer.sparkSession.sparkContext.defaultParallelism)
      .alias("a")
      .join(c.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(score, 2).as("score"))
  }

  private val linkage = Q(
    "j15_record_linkage",
    (s, d) =>
      scoredPairs(Tables(s, d))
        .filter(col("score") >= 5.0)
        .withColumn("match_class",
          when(col("score") >= 7.0, "link").otherwise("possible")),
    Some(
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS seg,
        |    floor(c_acctbal / 1000) AS band, c_custkey % 10 AS chk
        |  FROM customer),
        |scored AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    round(
        |      (CASE WHEN a.seg = b.seg THEN 2.5 ELSE -1.5 END) +
        |      (CASE WHEN a.band = b.band THEN 3.0 ELSE -2.0 END) +
        |      (CASE WHEN a.chk = b.chk THEN 1.5 ELSE -0.5 END), 2) AS score
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id)
        |SELECT id_a, id_b, score,
        |  CASE WHEN score >= 7.0 THEN 'link' ELSE 'possible' END
        |    AS match_class
        |FROM scored WHERE score >= 5.0""".stripMargin),
  )

  /** Join-explosion audit — the pre-flight check before any fleet-scale
    * join: per-key multiplicities on BOTH sides and the exact output
    * cardinality each key contributes (n_left · n_right), ranked. At
    * 100 TB this is what decides salting/skew-join hints BEFORE the
    * shuffle burns a cluster-hour: the audit costs two key-sized hash
    * aggregates + a join on the counts frames (|keys| rows, never the
    * corpora). `total_out` rides along so the single result answers both
    * "how big" and "who's to blame". All-BIGINT; Spark's AQE skew
    * handling reacts to the same signal at runtime — this materialises
    * it ahead of time, when the plan (bucketing, broadcast, salt count)
    * can still change.
    */
  private val audit = Q(
    "j16_join_explosion_audit",
    (s, d) => {
      val t = Tables(s, d)
      val left = t.events.groupBy(col("user_id").as("key"))
        .agg(count(lit(1)).as("n_left"))
      val right = t.orders.groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n_right"))
      val contrib = left.join(right, "key")
        .withColumn("out_rows", col("n_left") * col("n_right"))
      val total = contrib.agg(sum("out_rows").as("total_out"))
      contrib.crossJoin(broadcast(total))
        .orderBy(desc("out_rows"), asc("key")).limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("out_rows"), asc("key"))))
    },
    Some(
      """WITH l AS (SELECT user_id AS key, count(*) AS n_left
        |           FROM events GROUP BY 1),
        |r AS (SELECT o_custkey AS key, count(*) AS n_right
        |      FROM orders GROUP BY 1),
        |c AS (SELECT l.key, l.n_left, r.n_right,
        |        l.n_left * r.n_right AS out_rows
        |      FROM l JOIN r USING (key)),
        |t AS (SELECT CAST(sum(out_rows) AS BIGINT) AS total_out FROM c)
        |SELECT key, n_left, n_right, out_rows, t.total_out,
        |  CAST(row_number() OVER (ORDER BY out_rows DESC, key) AS INT)
        |    AS rank
        |FROM c CROSS JOIN t
        |ORDER BY out_rows DESC, key LIMIT 10""".stripMargin),
  )

  /** J18: entity resolution end-to-end — the "golden record" build that
    * closes the linkage loop: j15's high-confidence links become edges,
    * connected components merge transitive matches into ENTITIES (the
    * same shared-cache CC machinery the dedup pipeline runs), and each
    * entity gets survivorship-resolved attributes — modal market
    * segment with a deterministic (count DESC, value ASC) tie-break,
    * min id as the stable entity key. The step every MDM/customer-360
    * pipeline runs after pairwise linkage; transitivity is exactly what
    * pairwise classification alone cannot give you.
    *
    * Scale: links are block-bounded (Σ|block|² candidates), CC is the
    * O(log n) loop paid once per distinct link set, survivorship is one
    * (entity, value) count + an entity-keyed argmax window.
    */
  private val golden = Q(
    "j18_entity_golden_records",
    (s, d) => {
      val t = Tables(s, d)
      // threshold 5.0 = any two of the three field agreements (a
      // perfect 7.0 triple-match is vanishingly rare below sf0.01, and
      // an entity-resolution gate that only links exact triples is just
      // exact dedup) — 2-of-3 agreement is the Fellegi-Sunter "link"
      // region this operator models
      val links = scoredPairs(t).filter(col("score") >= 5.0)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val comps = graft.dedup.ConnectedComponents.cached(links, key = Some(
        s"linkage-cc-v2|${graft.domain.SharedCache.planKey(t.customer)}"))
      val recs = comps.join(
        t.customer.select(col("c_custkey").as("id"),
          col("c_mktsegment").as("seg")), "id")
      val segCounts = recs.groupBy(col("component"), col("seg"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("component").orderBy(desc("n"), asc("seg"))
      val canon = segCounts
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("component"), col("seg").as("canonical_seg"))
      recs.groupBy("component").agg(count(lit(1)).as("n_records"))
        .join(canon, "component")
        .select(col("component").as("entity_id"), col("n_records"),
          col("canonical_seg"))
    },
    Some(
      """WITH RECURSIVE c AS (
        |  SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS seg,
        |    floor(c_acctbal / 1000) AS band, c_custkey % 10 AS chk
        |  FROM customer),
        |links AS (
        |  SELECT a.id AS src, b.id AS dst
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |  WHERE round(
        |    (CASE WHEN a.seg = b.seg THEN 2.5 ELSE -1.5 END) +
        |    (CASE WHEN a.band = b.band THEN 3.0 ELSE -2.0 END) +
        |    (CASE WHEN a.chk = b.chk THEN 1.5 ELSE -0.5 END), 2) >= 5.0),
        |sym AS (SELECT src AS a, dst AS b FROM links
        |        UNION SELECT dst, src FROM links),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |comps AS (SELECT id, min(comp) AS component FROM walk GROUP BY 1),
        |recs AS (
        |  SELECT comps.component, c.seg
        |  FROM comps JOIN c ON comps.id = c.id),
        |sc AS (
        |  SELECT component, seg, count(*) AS n FROM recs GROUP BY 1, 2),
        |canon AS (
        |  SELECT component, seg AS canonical_seg
        |  FROM sc QUALIFY row_number() OVER (PARTITION BY component
        |    ORDER BY n DESC, seg ASC) = 1)
        |SELECT r.component AS entity_id,
        |  count(*) AS n_records, any_value(canon.canonical_seg)
        |    AS canonical_seg
        |FROM recs r JOIN canon USING (component)
        |GROUP BY 1""".stripMargin),
  )

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    * sort-based alternative to j15's hash blocking: sort records on a
    * fuzzy key and compare each against its next `w−1` neighbors. Where
    * fixed banding (p9 / j15's band field) misses pairs that straddle a
    * band boundary, adjacency in the sorted order catches them — the
    * classic ER recall lever, usually unioned with hash blocking.
    *
    * Scale shape: the sort is PER SEGMENT (partitioned window —
    * segments are the natural coarse block, so no global single-task
    * sort), and the window emits `w−1` lead pairs per record: candidate
    * volume is exactly (w−1)·n, linear by construction. At fleet scale
    * the segment partitioning becomes repartitionByRange on the sort
    * key with per-partition windows — same plan, boundary pairs
    * recovered by the standard overlap trick.
    */
  private val snm = Q(
    "j19_sorted_neighborhood",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy(asc("c_acctbal"), asc("c_custkey"))
      val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
      val ranked = Tables(s, d).customer
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          cents.as("cents"))
      val pairs = (1 to 2).map { i =>
        ranked
          .withColumn("id_b", lead(col("c_custkey"), i).over(w))
          .withColumn("cents_b", lead(col("cents"), i).over(w))
          .filter(col("id_b").isNotNull)
          .select(col("c_mktsegment").as("seg"),
            col("c_custkey").as("id_a"), col("id_b"),
            lit(i).as("w_dist"),
            (col("cents_b") - col("cents")).as("bal_gap_cents"))
      }.reduce(_.unionByName(_))
      pairs.withColumn("candidate", col("bal_gap_cents") <= 1000L)
    },
    Some(
      """WITH ranked AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |    c_acctbal
        |  FROM customer),
        |p AS (
        |  SELECT c_mktsegment AS seg, c_custkey AS id_a,
        |    lead(c_custkey, 1) OVER w AS id_b,
        |    1 AS w_dist,
        |    lead(cents, 1) OVER w - cents AS bal_gap_cents
        |  FROM ranked
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |               ORDER BY c_acctbal, c_custkey)
        |  UNION ALL
        |  SELECT c_mktsegment, c_custkey,
        |    lead(c_custkey, 2) OVER w2, 2,
        |    lead(cents, 2) OVER w2 - cents
        |  FROM ranked
        |  WINDOW w2 AS (PARTITION BY c_mktsegment
        |                ORDER BY c_acctbal, c_custkey))
        |SELECT seg, id_a, id_b, w_dist, bal_gap_cents,
        |  bal_gap_cents <= 1000 AS candidate
        |FROM p WHERE id_b IS NOT NULL""".stripMargin),
  )

  def all: Seq[Q] = Seq(linkage, audit, golden, snm)
}
