package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the curation pass every training corpus runs before
  * anything else sees the text. Pure `regexp_replace` chain (codegen'd,
  * map-only, zero shuffle); patterns use only constructs with identical
  * semantics in Java regex and RE2 so the DuckDB oracle replays them
  * exactly (no backrefs, no lookaround).
  *
  * Order matters: emails first (their local parts contain digits), then
  * dotted IPv4, then the greedy phone pattern that would otherwise eat
  * IP fragments.
  */
object PiiScrub {

  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePat = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      PhonePat, "<PHONE>")

  def scrubString(s: String): String =
    s.replaceAll(EmailPat, "<EMAIL>")
      .replaceAll(Ipv4Pat, "<IP>")
      .replaceAll(PhonePat, "<PHONE>")

  // round-trip query: plant PII derived from fixture columns, scrub it,
  // and let the oracle replay the same construction + redaction — the
  // patterns are shared constants so the two sides cannot drift
  private def sq(s: String): String = s.replace("'", "''")

  private val q = Q(
    "t_pii_scrub",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          scrub(concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com"),
            lit(" at 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1 or +44 7911 12"), (col("doc_id") % 100).cast("string"),
            lit("99"))).as("clean")),
    Some(
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com at 10.0.'
         |      || CAST(doc_id % 256 AS VARCHAR)
         |      || '.1 or +44 7911 12' || CAST(doc_id % 100 AS VARCHAR)
         |      || '99',
         |    '${sq(EmailPat)}', '<EMAIL>', 'g'),
         |    '${sq(Ipv4Pat)}', '<IP>', 'g'),
         |    '${sq(PhonePat)}', '<PHONE>', 'g') AS clean
         |FROM documents""".stripMargin),
  )

  /** k-anonymity audit — the redaction family's structural sibling: a
    * released table is k-anonymous when every quasi-identifier
    * combination covers ≥ k rows; groups below k re-identify individuals
    * and must be suppressed or generalised before publication. One hash
    * aggregate over the quasi-identifier columns; the flag column is the
    * suppression worklist. (PII regexes scrub free text; this audits the
    * STRUCTURED columns the reference publishes.)
    */
  private val kanon = Q(
    "p11_k_anonymity",
    (s, d) =>
      graft.Tables(s, d).customer
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          (col("n") < 10).as("suppress")),
    Some(
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(*) < 10 AS suppress
        |FROM customer GROUP BY 1, 2""".stripMargin),
  )

  /** l-diversity audit — k-anonymity's stronger sibling (Machanavajjhala
    * et al. 2007): a k-anonymous group still leaks when every member
    * shares the same SENSITIVE value (homogeneity attack), so each
    * quasi-identifier group must also span ≥ l distinct sensitive
    * values. One hash aggregate with a count-distinct — at fleet scale
    * the exact distinct swaps for the [[graft.operators.Extended]] HLL
    * register sketch, same group keys.
    */
  private val ldiv = Q(
    "p12_l_diversity",
    (s, d) =>
      graft.Tables(s, d).customer
        .withColumn("acct_band", floor(col("c_acctbal") / 2000))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("acct_band")).as("l_distinct"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("l_distinct"), (col("l_distinct") < 3).as("homogeneous")),
    Some(
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT floor(c_acctbal / 2000)) AS l_distinct,
        |  count(DISTINCT floor(c_acctbal / 2000)) < 3 AS homogeneous
        |FROM customer GROUP BY 1, 2""".stripMargin),
  )

  /** t-closeness audit — the distributional member of the privacy
    * triple (Li, Li & Venkatasubramanian 2007): a group can be
    * k-anonymous AND l-diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs sharply from the global one (skewness
    * attack). Per quasi-identifier group, total-variation distance
    * between the group's sensitive-band distribution and the corpus
    * distribution; groups beyond t = 0.3 are flagged.
    *
    * Exactness: TVD over a common denominator —
    * Σ_b |n_gb·N − n_b·N_g| / (2·N_g·N) — stays in BIGINT until one
    * final ppm floor-division. The group×band grid comes from a
    * broadcastable cross join of two TINY aggregates (groups × bands),
    * left-joined with the group-band counts, so absent bands contribute
    * their full global mass; the fact table is scanned twice and never
    * shuffled wider than its group keys. At fleet counts the BIGINT
    * products (n·N ≤ 4·10¹⁸) near Long range — swap to DECIMAL(38,0)
    * there, identical plan.
    */
  private val tclose = Q(
    "p13_t_closeness",
    (s, d) => {
      val rows = graft.Tables(s, d).customer
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("band"))
      val global = rows.groupBy("band").agg(count(lit(1)).as("n_b"))
      val groups = rows.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n_g"))
      val cells = rows.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("n_gb"))
      val total = rows.agg(count(lit(1)).as("n_total"))
      val grid = groups.crossJoin(broadcast(global))
        .crossJoin(broadcast(total))
        .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("n_gb", coalesce(col("n_gb"), lit(0L)))
      grid.groupBy("c_nationkey", "c_mktsegment")
        .agg(max(col("n_g")).as("n"),
          expr("sum(abs(n_gb * n_total - n_b * n_g))").as("tvd_num"),
          max(expr("2 * n_g * n_total")).as("tvd_den"))
        .withColumn("tvd_ppm", expr("(1000000 * tvd_num) div tvd_den"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("tvd_ppm"), (col("tvd_ppm") > 300000).as("skewed"))
    },
    Some(
      """WITH rows_ AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
        |  FROM customer),
        |gb AS (SELECT band, count(*) AS n_b FROM rows_ GROUP BY 1),
        |grps AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_g
        |         FROM rows_ GROUP BY 1, 2),
        |cells AS (SELECT c_nationkey, c_mktsegment, band,
        |            count(*) AS n_gb
        |          FROM rows_ GROUP BY 1, 2, 3),
        |tot AS (SELECT count(*) AS n_total FROM rows_),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band, b.n_b,
        |    t.n_total, coalesce(c.n_gb, 0) AS n_gb
        |  FROM grps g CROSS JOIN gb b CROSS JOIN tot t
        |  LEFT JOIN cells c
        |    ON c.c_nationkey = g.c_nationkey
        |   AND c.c_mktsegment = g.c_mktsegment AND c.band = b.band)
        |SELECT c_nationkey, c_mktsegment, max(n_g) AS n,
        |  CAST((1000000 * sum(abs(n_gb * n_total - n_b * n_g)))
        |    // max(2 * n_g * n_total) AS BIGINT) AS tvd_ppm,
        |  CAST((1000000 * sum(abs(n_gb * n_total - n_b * n_g)))
        |    // max(2 * n_g * n_total) AS BIGINT) > 300000 AS skewed
        |FROM grid GROUP BY 1, 2""".stripMargin),
  )

  /** Joinable pseudonymization — the RELEASE side of the privacy family
    * (p11–p13 audit what may be published; this transforms identifiers
    * so it CAN be): every direct identifier is replaced by a keyed
    * surrogate `md5(pepper ‖ id)` so cross-table joins still line up
    * (referential integrity preserved) while the raw id never appears in
    * the release. Deterministic given the pepper, rotating the pepper
    * unlinks every release batch from the previous one. One codegen map
    * per table + the usual equi join on the surrogate; the query PROVES
    * joinability by aggregating events against a pseudonymized user dim
    * on the surrogate alone.
    */
  private val pseud = Q(
    "p14_pseudonymize_joinable",
    (s, d) => {
      val pepper = "graft-pepper-v1:"
      def surrogate(c: org.apache.spark.sql.Column) =
        substring(md5(concat(lit(pepper), c.cast("string"))), 1, 16)
      val e = graft.Tables(s, d).events
      val eventsP = e.select(surrogate(col("user_id")).as("pseud"),
        col("event_type"))
      val usersP = e.groupBy("user_id")
        .agg(min(col("ts").cast("date")).as("first_day"))
        .select(surrogate(col("user_id")).as("pseud"), col("first_day"))
      eventsP.join(usersP, "pseud")
        .groupBy("pseud", "first_day")
        .agg(count(lit(1)).as("n_events"))
    },
    Some(
      """WITH ep AS (
        |  SELECT substring(md5('graft-pepper-v1:' || CAST(user_id AS VARCHAR)), 1, 16)
        |    AS pseud, event_type
        |  FROM events),
        |up AS (
        |  SELECT substring(md5('graft-pepper-v1:' || CAST(user_id AS VARCHAR)), 1, 16)
        |    AS pseud, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id)
        |SELECT ep.pseud, up.first_day, count(*) AS n_events
        |FROM ep JOIN up USING (pseud)
        |GROUP BY 1, 2""".stripMargin),
  )

  /** Noisy count release via the geometric mechanism
    * (Ghosh–Roughgarden–Sundararajan): integer noise k with
    * P(k) ∝ α^|k|, here α = 1/2 ⇒ nominal ε = ln 2 for a
    * sensitivity-1 count.
    *
    * ABOUT THE PRIVACY CLAIM — read before using. The REGISTERED query
    * (`p15_dp_noisy_counts`) draws its randomness from an FNV-1a hash
    * of the PUBLIC group key plus a hard-coded salt, so anyone can
    * recompute the noise and recover the exact counts: it provides NO
    * differential privacy. It exists to prove the MECHANISM replays
    * bit-exactly across engines (the integer inverse-CDF below), which
    * is why its epsilon column is named `epsilon_nominal` — the ε the
    * mechanism WOULD provide if the draw were secret. The usable
    * release is [[dpNoisyCounts]], which keys the same PRF with a
    * caller-supplied secret pepper (never checked in, never published):
    * under the standard keyed-PRF assumption the draw is then
    * unpredictable to anyone without the pepper and the nominal ε
    * applies. A production publisher also drops `n` and `noise` and
    * ships only `noisy_n` + ε; the demo keeps them so the oracle can
    * check the arithmetic.
    *
    * The sampler is INTEGER inverse-CDF arithmetic, which is what makes
    * the release reproducible across engines (and across re-runs, which
    * an auditor will demand): with α = 1/2 the CDF values F(k)·3·2^53
    * are exact integers — 2^(54+k) for k<0, 3·2^53 − 2^(53−k) for k≥0 —
    * precomputed once into a 107-row threshold table. The per-group
    * uniform draw is the low 53 bits of the keyed hash, scaled by 3,
    * and the noise is the least k whose threshold exceeds the draw: a
    * broadcast join + min, no floats anywhere until the published ε.
    */
  private val dpSalt = "|dp-v1"

  /** The production geometric-mechanism release: ε = ln 2 noisy counts
    * of `df` grouped by `keyCols`, with the noise draw keyed by the
    * caller's secret `pepper` (see the privacy note above — without a
    * secret pepper this is a replayable demo, not DP). Same broadcast
    * threshold-table plan as the registered query; linear in groups.
    */
  def dpNoisyCounts(df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], pepper: String)(
      implicit s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    require(pepper.nonEmpty, "dpNoisyCounts needs a non-empty pepper")
    val mask = (1L << 53) - 1
    // HMAC-SHA256 inside a UDF, for two reasons that both bit earlier
    // versions of this function:
    //  1. SECRECY OF THE KEY. `lit(pepper)` put the pepper into the
    //     logical plan, so it leaked verbatim through explain output,
    //     the Spark UI SQL tab, and event logs. A UDF closure ships the
    //     pepper only inside the serialized task binary — none of those
    //     surfaces print it.
    //  2. PRF STRENGTH. xxhash64 avalanches but is NOT a keyed PRF —
    //     non-crypto hashes admit seed/key-recovery and distinguishing
    //     attacks, so the "unpredictable without the pepper" argument
    //     the ε claim rests on did not hold. HMAC-SHA256 is the
    //     standard PRF assumption.
    // Cost: the UDF runs once per GROUP (post-aggregation), so codegen
    // loss is irrelevant at any scale. No oracle replays this path.
    val draw = udf { (key: String) =>
      val macI = javax.crypto.Mac.getInstance("HmacSHA256")
      macI.init(new javax.crypto.spec.SecretKeySpec(
        pepper.getBytes("UTF-8"), "HmacSHA256"))
      val h = macI.doFinal(key.getBytes("UTF-8"))
      (java.nio.ByteBuffer.wrap(h, 0, 8).getLong & mask) * 3L
    }
    val groups = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("u", draw(concat_ws("\u0000",
        keyCols.map(c => col(c).cast("string")): _*)))
    val thr = dpThresholds.toDF("tk", "tt")
    groups
      .join(broadcast(thr), col("u") < col("tt"))
      .groupBy(col("n") +: keyCols.map(col): _*)
      .agg(min(col("tk")).cast("long").as("noise"))
      .select(keyCols.map(col) :+
        greatest(lit(0L), col("n") + col("noise")).as("noisy_n") :+
        lit(0.6931471805599453d).as("epsilon"): _*)
  }
  // F(k)·M thresholds, M = 3·2^53: least k with draw*3 < T(k) is the
  // geometric-mechanism inverse CDF (see scaladoc)
  private def dpThresholds: Seq[(Int, Long)] = {
    val M = BigInt(3) << 53
    (-53 to 53).map { k =>
      val t = if (k < 0) BigInt(1) << (54 + k) else M - (BigInt(1) << (53 - k))
      k -> t.toLong
    }
  }

  private val dp = Q(
    "p15_dp_noisy_counts",
    (s, d) => {
      import s.implicits._
      val o = Tables(s, d).orders
      val mask = (1L << 53) - 1
      val groups = o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .withColumn("u",
          graft.functions.TextSketches.fnv1a(concat_ws("|",
            col("o_orderpriority"), col("o_orderstatus"), lit(dpSalt)))
            .bitwiseAND(lit(mask)) * 3L)
      val thr = dpThresholds.toDF("tk", "tt")
      groups
        .join(broadcast(thr), col("u") < col("tt"))
        .groupBy("o_orderpriority", "o_orderstatus", "n")
        .agg(min(col("tk")).cast("long").as("noise"))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
          col("noise"),
          greatest(lit(0L), col("n") + col("noise")).as("noisy_n"),
          lit(0.6931471805599453d).as("epsilon_nominal"))
    },
    Some {
      val values = dpThresholds
        .map { case (k, t) => s"($k, $t)" }.mkString(", ")
      s"""WITH RECURSIVE
         |g AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
         |      FROM orders GROUP BY 1, 2),
         |items AS (SELECT o_orderpriority || '|' || o_orderstatus ||
         |            '|$dpSalt' AS doc_id, 0 AS i,
         |            o_orderpriority || '|' || o_orderstatus ||
         |            '|$dpSalt' AS t
         |          FROM g),
         |${graft.functions.OracleSql.fnvFold("items")},
         |u AS (SELECT doc_id,
         |        CAST(h % 9007199254740992 AS BIGINT) * 3 AS u
         |      FROM done),
         |thr(tk, tt) AS (VALUES $values),
         |nz AS (SELECT doc_id, CAST(min(tk) AS BIGINT) AS noise
         |       FROM u JOIN thr ON u.u < thr.tt GROUP BY 1)
         |SELECT g.o_orderpriority, g.o_orderstatus, g.n, nz.noise,
         |  greatest(0, g.n + nz.noise) AS noisy_n,
         |  CAST(0.6931471805599453 AS DOUBLE) AS epsilon_nominal
         |FROM g JOIN nz ON nz.doc_id = g.o_orderpriority || '|' ||
         |  g.o_orderstatus || '|$dpSalt'""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q, kanon, ldiv, tclose, pseud, dp)
}
