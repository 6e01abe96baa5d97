package graft.domain

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** `dom_*` queries: the REAL domain operators (Salaries, DedupPipeline,
  * Getters, Indicators, Extract, Enrich, Publisher) running on the
  * [[AdsFixture]] views, each with a DuckDB oracle that recomputes the
  * same semantics independently (window-function components, mirrored
  * rule chains). These convert the round-1 "spec-only" domain components
  * into hash-checked CORRECTNESS rows.
  */
object DomainQueries {
  import AdsFixture.withCtes

  // ---- F4: the full salary rule chain (not the round-1 analog) ---------

  private val salaryExtract = Q(
    "dom_salary_extract",
    (s, d) =>
      Salaries.extractSalary(cachedAds(s, d))
        .select("id", "min_salary", "max_salary", "min_annualised_salary",
          "max_annualised_salary", "rate"),
    Some(withCtes("ads", "sal1", "sal2", "sal3", "sal4", "sal5", "salaried") +
      """SELECT id,
        |  CASE WHEN NOT excluded THEN round(min_annual2 / mult, 2) END
        |    AS min_salary,
        |  CASE WHEN NOT excluded THEN round(max_annual2 / mult, 2) END
        |    AS max_salary,
        |  CASE WHEN NOT excluded THEN round(min_annual2, 2) END
        |    AS min_annualised_salary,
        |  CASE WHEN NOT excluded THEN round(max_annual2, 2) END
        |    AS max_annualised_salary,
        |  CASE WHEN NOT excluded THEN raw_salary_unit END AS rate
        |FROM salaried""".stripMargin),
  )

  // ---- D3: duplicate subgraphs over the real link table ----------------

  private val dupSubgraphs = Q(
    "dom_dup_subgraphs",
    (s, d) => cachedDupComps(s, d),
    Some(withCtes("lnk_ranked", "links", "banded", "comps") +
      "SELECT id, component FROM comps"),
  )

  // ---- D4: location-split components -----------------------------------

  private val splitSql =
    """SELECT id, component FROM (
      |  SELECT id,
      |    count(*) OVER (PARTITION BY comp0, loc) AS group_size,
      |    min(id) OVER (PARTITION BY comp0, loc) AS component
      |  FROM (
      |    SELECT m.id, m.component AS comp0, a.job_location_raw AS loc
      |    FROM comps m JOIN ads a ON m.id = a.id
      |    WHERE length(coalesce(a.description, '')) >= 5))
      |WHERE group_size > 1""".stripMargin

  private val subgraphsByLoc = Q(
    "dom_subgraphs_by_location",
    // the same subgraphsByLocation(duplicateSubgraphs(links), ads)
    // computation the materialised splitcomps entry holds — before r09
    // this query re-ran the whole CC iteration per call while four other
    // queries read the cache (r08 VERDICT item 3: curate once, read many)
    (s, d) => cachedSplitComps(s, d),
    Some(withCtes("ads", "lnk_ranked", "links", "banded", "comps") + splitSql),
  )

  // ---- D5+D6: dedup-aware snapshot read (full composition) -------------

  private val snapFrom = "1996-03-01"
  private val snapTo = "1996-04-30"

  private val snapshotAds = Q(
    "dom_snapshot_ads",
    (s, d) => {
      val t = Tables(s, d)
      DedupPipeline.snapshotAds(cachedAds(s, d), AdsFixture.links(t),
          snapFrom, snapTo,
          precomputedGraphs = Some(cachedSplitComps(s, d)))
        .select("id", "created", "job_location_raw")
    },
    Some(withCtes("ads", "lnk_ranked", "links", "banded", "comps") +
      s""", splitcomps AS ($splitSql),
         |inwin AS (
         |  SELECT * FROM ads
         |  WHERE created BETWEEN TIMESTAMP '$snapFrom 00:00:00'
         |    AND TIMESTAMP '$snapTo 00:00:00'),
         |dupes AS (
         |  SELECT id FROM (
         |    SELECT s.id,
         |      row_number() OVER (PARTITION BY s.component ORDER BY s.id) AS rn
         |    FROM splitcomps s
         |    WHERE s.id IN (SELECT id FROM inwin))
         |  WHERE rn > 1)
         |SELECT id, created, job_location_raw FROM inwin
         |WHERE id NOT IN (SELECT id FROM dupes)""".stripMargin),
  )

  // ---- the getters read API (dedup without location split) -------------

  private val getAds = Q(
    "dom_get_job_ads",
    (s, d) => {
      val t = Tables(s, d)
      Getters.getJobAds(cachedAds(s, d), AdsFixture.links(t),
          fromDate = Some("1997-01-01"), toDate = Some("1997-03-31"),
          returnDescription = false, deduplicate = true,
          precomputedGraphs = Some(cachedDupComps(s, d)))
        .select("id", "created", "job_location_raw", "raw_salary_unit")
    },
    Some(withCtes("ads", "lnk_ranked", "links", "banded", "comps") +
      """, inwin AS (
        |  SELECT * FROM ads
        |  WHERE created >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND created <= TIMESTAMP '1997-03-31 00:00:00'),
        |dupes AS (
        |  SELECT id FROM (
        |    SELECT c.id,
        |      row_number() OVER (PARTITION BY c.component ORDER BY c.id) AS rn
        |    FROM comps c
        |    WHERE c.id IN (SELECT id FROM inwin))
        |  WHERE rn > 1)
        |SELECT id, created, job_location_raw, raw_salary_unit FROM inwin
        |WHERE id NOT IN (SELECT id FROM dupes)""".stripMargin),
  )

  // ---- J6: real feature assembly, nested skills flattened for hashing --

  private val features = Q(
    "dom_features",
    (s, d) => {
      val t = Tables(s, d)
      val adsDf = cachedAds(s, d)
      val sal = Salaries.extractSalary(adsDf)
        .select("id", "min_annualised_salary", "max_annualised_salary", "rate")
      Getters.withFeatures(adsDf, sal,
          AdsFixture.locationLinks(t), AdsFixture.locations(t),
          AdsFixture.socLinks(t), AdsFixture.socs(t),
          AdsFixture.skillLinks(t),
          precomputedLoc = Some(cachedLoc(s, d)))
        .select(col("id"), col("min_annualised_salary"),
          col("max_annualised_salary"), col("rate"),
          col("nuts_2_code"), col("nuts_2_name"),
          col("soc_code"), col("soc_title"),
          concat_ws("|", transform(col("skills"), x =>
            concat_ws(":", x.getField("surface_form"),
              x.getField("preferred_label"),
              x.getField("cluster_0").cast("string")))).as("skills_str"))
    },
    Some(withCtes("ads", "sal1", "sal2", "sal3", "sal4", "sal5", "salaried",
      "location_links", "locations", "soc_links", "socs", "skill_links") +
      """, sal AS (
        |  SELECT id AS job_id,
        |    CASE WHEN NOT excluded THEN round(min_annual2, 2) END
        |      AS min_annualised_salary,
        |    CASE WHEN NOT excluded THEN round(max_annual2, 2) END
        |      AS max_annualised_salary,
        |    CASE WHEN NOT excluded THEN raw_salary_unit END AS rate
        |  FROM salaried),
        |loc AS (
        |  SELECT DISTINCT ll.job_id, l.nuts_2_code, l.nuts_2_name
        |  FROM location_links ll
        |  LEFT JOIN locations l ON ll.location_id = l.ipn_18_code),
        |soc AS (
        |  SELECT job_id, soc_code, soc_title
        |  FROM soc_links JOIN socs USING (soc_id)),
        |sk AS (
        |  SELECT job_id,
        |    string_agg(surface_form || ':' || preferred_label || ':'
        |        || CAST(cluster_0 AS VARCHAR), '|'
        |      ORDER BY surface_form, preferred_label, cluster_0) AS skills_str
        |  FROM skill_links GROUP BY job_id)
        |SELECT a.id, s.min_annualised_salary, s.max_annualised_salary, s.rate,
        |  loc.nuts_2_code, loc.nuts_2_name, soc.soc_code, soc.soc_title,
        |  coalesce(sk.skills_str, '') AS skills_str
        |FROM ads a
        |LEFT JOIN sal s ON a.id = s.job_id
        |LEFT JOIN loc ON a.id = loc.job_id
        |LEFT JOIN soc ON a.id = soc.job_id
        |LEFT JOIN sk ON a.id = sk.job_id""".stripMargin),
  )

  // ---- W1-composition: weekly snapshot expansion with in-window dedup --

  private val wkStart = LocalDate.parse("1996-03-04") // Monday
  private val wkEnd = LocalDate.parse("1996-05-27") // Monday, 13 weeks

  /** Location-split components, materialised content-addressed so the
    * several queries composing them (snapshot + 3 weekly indicators)
    * compute CC once per (code, data) state — the reference passes its
    * cached get_subgraphs_by_location between flow steps the same way.
    */
  /** Unsplit duplicate components, materialised once — dup_subgraphs,
    * get_job_ads AND the split variant below all build on this single
    * CC run (the reference's cached get_subgraphs passed between steps).
    */
  private def cachedDupComps(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // by-name materialisation: CC executes jobs while its frame is being
    // BUILT, so the builder must not run at all on a warm cache
    SharedCache.materialiseWith(s,
      SharedCache.defaultRoot,
      "dupcomps", s"$d|ads-links-fixture-dupcomps|v1") {
      DedupPipeline.duplicateSubgraphs(AdsFixture.links(Tables(s, d)))
    }

  private def cachedSplitComps(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    SharedCache.materialiseWith(s,
      SharedCache.defaultRoot,
      "splitcomps", s"$d|ads-links-fixture-splitcomps|v1") {
      DedupPipeline.subgraphsByLocation(cachedDupComps(s, d),
        cachedAds(s, d))
    }

  /** The ads fixture view itself, materialised (r08 VERDICT item 3:
    * "curate once, read many"): ~10 dom_* queries start from `ads`, and
    * each call was re-deriving the orders⋈customer⋈nation column algebra
    * from the base tables. One build per run (the cold pass pays it);
    * every consumer scans the materialised parquet with column pruning.
    * Values are parquet-exact: long/date/double/string all round-trip
    * bit-identically, so every dom_* oracle is untouched.
    */
  private def cachedAds(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    SharedCache.materialiseWith(s,
      SharedCache.defaultRoot,
      "adsfixture", s"$d|ads-fixture-view|v1") {
      AdsFixture.ads(Tables(s, d))
    }

  /** The standardisable location dim (location_links ⟕ locations,
    * distinct), materialised: four queries (features, jobs_by_location,
    * aggregate_skills, weekly_loc_vacancies) each re-ran the same
    * join + distinct per call (item 3 cont.: curate once, read many).
    */
  private def cachedLoc(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    SharedCache.materialiseWith(s,
      SharedCache.defaultRoot,
      "adsloc", s"$d|ads-location-dim|v1") {
      val t = Tables(s, d)
      AdsFixture.locationLinks(t)
        .join(broadcast(AdsFixture.locations(t)),
          col("location_id") === col("ipn_18_code"), "left_outer")
        .select(col("job_id"), col("nuts_2_code"), col("nuts_2_name"))
        .distinct()
    }

  /** The weekly dedup-aware snapshot expansion, materialised: five
    * queries (weekly ads/stock/salary-spread/loc-vacancies/publish)
    * consume the same (spine ⋈ ads) expansion minus per-window duplicate
    * rows; before r09 each ran the expansion + window-dedup anti-join
    * per call (the reference passes its cached weekly frame between flow
    * steps the same way).
    */
  private def weekly(s: org.apache.spark.sql.SparkSession, d: String) =
    SharedCache.materialiseWith(s,
      SharedCache.defaultRoot,
      "weeklyads", s"$d|ads-weekly-$wkStart-$wkEnd|v1") {
      val t = Tables(s, d)
      Getters.weeklyAds(s, cachedAds(s, d), AdsFixture.links(t),
        wkStart, wkEnd, precomputedGraphs = Some(cachedSplitComps(s, d)))
    }

  /** Shared oracle CTEs for the weekly expansion (spine = Mondays
    * [wkStart, wkEnd], window = 42 days back; per-(week, component)
    * min-id exemplar like the engine).
    */
  private val weeklySql =
    s""", spine AS (
       |  SELECT CAST(wd AS DATE) AS week_date,
       |    CAST(wd - INTERVAL 42 DAY AS DATE) AS window_from
       |  FROM (SELECT unnest(generate_series(DATE '$wkStart',
       |    DATE '$wkEnd', INTERVAL 7 DAY)) AS wd)),
       |expanded AS (
       |  SELECT a.*, sp.week_date FROM ads a JOIN spine sp
       |    ON a.created >= sp.window_from AND a.created <= sp.week_date),
       |wdupes AS (
       |  SELECT week_date, id FROM (
       |    SELECT e.week_date, e.id,
       |      row_number() OVER (PARTITION BY e.week_date, c.component
       |        ORDER BY e.id) AS rn
       |    FROM expanded e JOIN splitcomps c ON e.id = c.id)
       |  WHERE rn > 1),
       |weekly AS (
       |  SELECT e.* FROM expanded e
       |  WHERE NOT EXISTS (SELECT 1 FROM wdupes w
       |    WHERE w.week_date = e.week_date AND w.id = e.id))""".stripMargin

  private def weeklyPrefix: String =
    withCtes("ads", "lnk_ranked", "links", "banded", "comps") +
      s", splitcomps AS ($splitSql)" + weeklySql

  private val weeklyAdsQ = Q(
    "dom_weekly_ads",
    (s, d) => weekly(s, d).select("week_date", "id"),
    Some(weeklyPrefix + "\nSELECT week_date, id FROM weekly"),
  )

  private val weeklyStockQ = Q(
    "dom_weekly_stock",
    (s, d) => Indicators.weeklyStock(weekly(s, d), indexValue = 250.0),
    Some(weeklyPrefix +
      """
        |SELECT week_date AS date,
        |  CAST(count(*) AS BIGINT) * 100.0 / 250.0 AS volume_idx
        |FROM weekly GROUP BY week_date""".stripMargin),
  )

  // weeklySpread oracle: weekly expansion + full salary chain + quantiles
  private val weeklySpreadOracle: String =
    withCtes("ads", "lnk_ranked", "links", "banded", "comps") +
      s", splitcomps AS ($splitSql)" + weeklySql +
      """, salch AS (
        |  SELECT id,
        |    CASE WHEN NOT excluded THEN round(min_annual2, 2) END
        |      AS min_annualised_salary,
        |    CASE WHEN NOT excluded THEN round(max_annual2, 2) END
        |      AS max_annualised_salary
        |  FROM (
        |    SELECT *,
        |      (raw_salary_unit IS NULL OR mult IS NULL
        |       OR (raw_salary_currency IS NOT NULL
        |           AND raw_salary_currency <> 'GBP')
        |       OR mx IS NULL OR max_annual < 4.20 * 1950.0
        |       OR max_annual2 > 500000.0) AS excluded
        |    FROM (
        |      SELECT *,
        |        CASE WHEN disparity AND extreme THEN min_annual1
        |             ELSE max_annual END AS max_annual2,
        |        CASE WHEN disparity AND NOT extreme THEN max_annual
        |             ELSE min_annual1 END AS min_annual2
        |      FROM (
        |        SELECT *, (max_annual / min_annual1 > 10) AS disparity,
        |          (max_annual > 500000.0) AS extreme
        |        FROM (
        |          SELECT *, CASE WHEN min_annual0 < 4.20 * 1950.0
        |            THEN max_annual ELSE min_annual0 END AS min_annual1
        |          FROM (
        |            SELECT *, mn * mult AS min_annual0, mx * mult AS max_annual
        |            FROM (
        |              SELECT *,
        |                CASE raw_salary_unit WHEN 'DAY' THEN 260.0
        |                     WHEN 'HOUR' THEN 1950.0
        |                     WHEN 'YEAR' THEN 1.0 END AS mult,
        |                least(coalesce(raw_min_salary, raw_salary),
        |                      coalesce(raw_max_salary, raw_salary)) AS mn,
        |                greatest(coalesce(raw_min_salary, raw_salary),
        |                         coalesce(raw_max_salary, raw_salary)) AS mx
        |              FROM ads)))))))
        |SELECT w.week_date AS date,
        |  coalesce(quantile_cont(s.min_annualised_salary, 0.25), 0.0) / 1000.0
        |    AS lower_quartile_min_salaries_k,
        |  coalesce(quantile_cont(s.min_annualised_salary, 0.50), 0.0) / 1000.0
        |    AS median_min_salaries_k,
        |  coalesce(quantile_cont(s.min_annualised_salary, 0.75), 0.0) / 1000.0
        |    AS upper_quartile_min_salaries_k,
        |  coalesce(quantile_cont(s.max_annualised_salary, 0.25), 0.0) / 1000.0
        |    AS lower_quartile_max_salaries_k,
        |  coalesce(quantile_cont(s.max_annualised_salary, 0.50), 0.0) / 1000.0
        |    AS median_max_salaries_k,
        |  coalesce(quantile_cont(s.max_annualised_salary, 0.75), 0.0) / 1000.0
        |    AS upper_quartile_max_salaries_k
        |FROM weekly w JOIN salch s ON w.id = s.id
        |GROUP BY w.week_date""".stripMargin

  private val weeklySpreadQ = Q(
    "dom_weekly_salary_spread",
    (s, d) => {
      val sal = Salaries.extractSalary(cachedAds(s, d))
        .select("id", "min_annualised_salary", "max_annualised_salary")
      Indicators.weeklySalarySpread(weekly(s, d).select("week_date", "id")
        .join(sal, "id"))
    },
    Some(weeklySpreadOracle),
  )

  // ---- A6: aggregate skills over standardised locations ----------------

  private def adsWithLocSkills(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    val t = Tables(s, d)
    val loc = cachedLoc(s, d)
    Indicators.standardiseLocation(
      cachedAds(s, d).select("id")
        .join(loc, col("id") === col("job_id"), "left_outer").drop("job_id")
        .join(AdsFixture.skillLinks(t), col("id") === col("job_id"))
        .drop("job_id"))
  }

  private val stdLocSql =
    """SELECT a.id,
      |  CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
      |       THEN 'London'
      |       WHEN loc.nuts_2_code IS NULL THEN 'Unmatched'
      |       ELSE loc.nuts_2_name END AS nuts_2_name,
      |  CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
      |       THEN 'UKI'
      |       WHEN loc.nuts_2_code IS NULL THEN 'ZZZ1'
      |       ELSE loc.nuts_2_code END AS nuts_2_code,
      |  sk.surface_form, sk.preferred_label, sk.cluster_0
      |FROM ads a
      |LEFT JOIN (
      |  SELECT DISTINCT ll.job_id, l.nuts_2_code, l.nuts_2_name
      |  FROM location_links ll
      |  LEFT JOIN locations l ON ll.location_id = l.ipn_18_code) loc
      |  ON a.id = loc.job_id
      |JOIN skill_links sk ON a.id = sk.job_id""".stripMargin

  private val aggSkills = Q(
    "dom_aggregate_skills",
    (s, d) => Indicators.aggregateSkills(adsWithLocSkills(s, d),
      "nuts_2_code", "nuts_2_name"),
    Some(withCtes("ads", "location_links", "locations", "skill_links") +
      s""", std AS ($stdLocSql),
         |counted AS (
         |  SELECT nuts_2_code, nuts_2_name, cluster_0, count(*) AS n
         |  FROM std WHERE cluster_0 IS NOT NULL
         |  GROUP BY 1, 2, 3)
         |SELECT nuts_2_code, nuts_2_name, cluster_0,
         |  n * 100.0 / CAST(sum(n) OVER (PARTITION BY nuts_2_code) AS BIGINT)
         |    AS percentage
         |FROM counted""".stripMargin),
  )

  // ---- A1: jobs by (standardised) location -----------------------------

  private val jobsByLoc = Q(
    "dom_jobs_by_location",
    (s, d) => {
      val t = Tables(s, d)
      val loc = cachedLoc(s, d)
      Indicators.jobsByLocation(Indicators.standardiseLocation(
        cachedAds(s, d).select("id")
          .join(loc, col("id") === col("job_id"), "left_outer")
          .drop("job_id")))
    },
    Some(withCtes("ads", "location_links", "locations") +
      """, std AS (
        |  SELECT a.id,
        |    CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
        |         THEN 'London'
        |         WHEN loc.nuts_2_code IS NULL THEN 'Unmatched'
        |         ELSE loc.nuts_2_name END AS nuts_2_name,
        |    CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
        |         THEN 'UKI'
        |         WHEN loc.nuts_2_code IS NULL THEN 'ZZZ1'
        |         ELSE loc.nuts_2_code END AS nuts_2_code
        |  FROM ads a
        |  LEFT JOIN (
        |    SELECT DISTINCT ll.job_id, l.nuts_2_code, l.nuts_2_name
        |    FROM location_links ll
        |    LEFT JOIN locations l ON ll.location_id = l.ipn_18_code) loc
        |    ON a.id = loc.job_id)
        |SELECT nuts_2_code, nuts_2_name, count(*) AS n_ads
        |FROM std WHERE nuts_2_code IS NOT NULL
        |GROUP BY 1, 2""".stripMargin),
  )

  /** A7 per-code: weekly per-location volumes against per-location stock
    * indexes (`weekly_stock.py:92-109` — the reference's regional
    * indicator). The real `Indicators.{standardiseLocation,
    * stockIndexByCode, weeklyLocVacancies}` chain runs under the gate:
    * weekly dedup-aware ads → location dim join (broadcast) → London/
    * unmatched consolidation → per-code index over a fixed 4-week stock
    * window → indexed volumes. The index side is a tiny aggregate
    * (|codes| rows, broadcast); the only corpus-sized shuffle is the
    * weekly count itself.
    */
  private val weeklyLocQ = Q(
    "dom_weekly_loc_vacancies",
    (s, d) => {
      val t = Tables(s, d)
      val loc = cachedLoc(s, d)
      val std = Indicators.standardiseLocation(
        weekly(s, d).select("week_date", "id")
          .join(loc, col("id") === col("job_id"), "left_outer")
          .drop("job_id"))
      val idx = Indicators.stockIndexByCode(
        std.filter(col("week_date").between("1996-04-01", "1996-04-22")),
        "nuts_2_code")
      Indicators.weeklyLocVacancies(std, idx)
    },
    Some(weeklyPrefix +
      s""", location_links AS (
         |${AdsFixture.SQL("location_links")}),
         |locations AS (
         |${AdsFixture.SQL("locations")}),
         |std AS (
         |  SELECT w.week_date,
         |    CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
         |         THEN 'London'
         |         WHEN loc.nuts_2_code IS NULL THEN 'Unmatched'
         |         ELSE loc.nuts_2_name END AS nuts_2_name,
         |    CASE WHEN loc.nuts_2_code IN ('UKI3','UKI4','UKI5','UKI6','UKI7')
         |         THEN 'UKI'
         |         WHEN loc.nuts_2_code IS NULL THEN 'ZZZ1'
         |         ELSE loc.nuts_2_code END AS nuts_2_code
         |  FROM weekly w
         |  LEFT JOIN (
         |    SELECT DISTINCT ll.job_id, l.nuts_2_code, l.nuts_2_name
         |    FROM location_links ll
         |    LEFT JOIN locations l ON ll.location_id = l.ipn_18_code) loc
         |    ON w.id = loc.job_id),
         |idx AS (
         |  SELECT nuts_2_code, CAST(count(*) AS DOUBLE) / 4 AS code_index
         |  FROM std
         |  WHERE week_date BETWEEN DATE '1996-04-01' AND DATE '1996-04-22'
         |    AND nuts_2_code IS NOT NULL
         |  GROUP BY 1),
         |cnt AS (
         |  SELECT week_date, nuts_2_name, nuts_2_code, count(*) AS n
         |  FROM std WHERE nuts_2_code IS NOT NULL
         |  GROUP BY 1, 2, 3)
         |SELECT c.week_date AS date, c.nuts_2_name AS location_name,
         |  c.nuts_2_code AS location_code,
         |  c.n * 100.0 / i.code_index AS volume_idx
         |FROM cnt c JOIN idx i ON c.nuts_2_code = i.nuts_2_code""".stripMargin),
  )

  // ---- F13: publisher 2-dp rounding (real Publisher.rounded) -----------

  private val publishRounded = Q(
    "dom_publish_rounded",
    (s, d) => Publisher.rounded(
      Indicators.weeklyStock(weekly(s, d), indexValue = 250.0)),
    Some(weeklyPrefix +
      """
        |SELECT week_date AS date,
        |  round(CAST(count(*) AS BIGINT) * 100.0 / 250.0, 2) AS volume_idx
        |FROM weekly GROUP BY week_date""".stripMargin),
  )

  // ---- F2: real stripHtml over synthetic HTML --------------------------

  private val htmlStrip = Q(
    "dom_html_strip",
    (s, d) => {
      val docs = Tables(s, d).documents
      docs.select(col("doc_id"),
        Extract.stripHtml(concat(lit("<div class=\"ad\"><p>"), col("text"),
          lit("</p><br/></div>"))).as("clean"))
    },
    Some(
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    '<div class="ad"><p>' || text || '</p><br/></div>',
        |    '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
        |FROM documents""".stripMargin),
  )

  // ---- F6: real cleanSkillText (regex passes + lemma dictionary) -------

  private val lemmaDict = Map("skills" -> "skill", "data" -> "datum",
    "systems" -> "system")

  private val cleanSkill = Q(
    "dom_clean_skill_text",
    (s, d) => {
      val docs = Tables(s, d).documents
      docs.select(col("doc_id"),
        Enrich.cleanSkillText(s, lemmaDict)(
          concat(lit("TopSkills•"), col("text"))).as("clean"))
    },
    Some(
      """SELECT doc_id,
        |  array_to_string(list_transform(
        |    string_split(trim(regexp_replace(lower(regexp_replace(
        |      regexp_replace('TopSkills•' || text, '[•·▪–\-*]+', ',', 'g'),
        |      '([a-z])([A-Z])', '\1. \2', 'g')), '\s+', ' ', 'g')), ' '),
        |    w -> CASE WHEN w = 'skills' THEN 'skill'
        |              WHEN w = 'data' THEN 'datum'
        |              WHEN w = 'systems' THEN 'system' ELSE w END), ' ')
        |    AS clean
        |FROM documents""".stripMargin),
  )

  // ---- S2+F1-F3: real page extractors over synthesized HTML ------------
  //
  // The query builds a full job-board page per ad from the fixture values,
  // runs the REAL Extract.reed / Extract.indeed regex pipeline, and the
  // oracle predicts the extractor's output directly from the generating
  // values — a construction-vs-extraction round trip that fails if any
  // regex drifts.

  private def reedPage: org.apache.spark.sql.Column = {
    val k = col("id")
    val span = when(k % 23 === 0,
      lit("<span itemprop=\"baseSalary\">Competitive</span>"))
      .otherwise(concat(
        lit("<span itemprop=\"baseSalary\">" +
          "<meta itemprop=\"currency\" content=\"GBP\"/>" +
          "<meta itemprop=\"value\" content=\""),
        ((k * 7) % 90000).cast("string"), lit(".50\"/>" +
          "<meta itemprop=\"minValue\" content=\""),
        ((k * 3) % 80000).cast("string"), lit(".25\"/>" +
          "<meta itemprop=\"maxValue\" content=\""),
        ((k * 11) % 90000).cast("string"), lit(".75\"/>" +
          "<meta itemprop=\"unitText\" content=\""),
        when(k % 4 === 0 || k % 4 === 3, "YEAR").when(k % 4 === 1, "DAY")
          .otherwise("HOUR"),
        lit("\"/></span>")))
    concat(
      lit("<html><script>dataLayer = [{\n"),
      lit("jobId: '"), k.cast("string"), lit("',\n"),
      lit("jobPostedDate: '"), date_format(col("created"), "dd/MM/yyyy"),
      lit("',\n"),
      lit("jobTitle: 'Engineer "), (k % 50).cast("string"), lit("',\n"),
      lit("jobLocation: '"), col("job_location_raw"), lit("',\n"),
      lit("jobRecruiterName: 'Acme "), (k % 7).cast("string"), lit("',\n"),
      lit("jobType: 'Permanent',\n"),
      lit("}]</script><body>"),
      when(k % 29 =!= 0, span).otherwise(lit("")),
      lit("<span itemprop=\"description\">Role in <b>"),
      col("job_location_raw"), lit("</b> city</span></body></html>"))
  }

  private val extractReed = Q(
    "dom_extract_reed",
    (s, d) => Extract.reed(
      // (a scan-widening exchange was tried here and REVERTED: with a
      // 150k-row fixture the serial shuffle write of the single-split
      // source costs what the parallel regex saves — measured neutral
      // at sf0.1, and at scale the fixture has many splits anyway)
      cachedAds(s, d).select(reedPage.as("text"))),
    Some(withCtes("ads") +
      """SELECT CAST(id AS VARCHAR) AS id,
        |  strftime(created, '%d/%m/%Y') AS created_raw,
        |  'Engineer ' || CAST(id % 50 AS VARCHAR) AS job_title_raw,
        |  job_location_raw,
        |  'Acme ' || CAST(id % 7 AS VARCHAR) AS company_raw,
        |  'Permanent' AS contract_type_raw,
        |  'Reed' AS data_source,
        |  created,
        |  'Role in ' || job_location_raw || ' city' AS description,
        |  CASE WHEN id % 23 <> 0 THEN
        |    CAST(CAST((id * 7) % 90000 AS VARCHAR) || '.50' AS DOUBLE)
        |    END AS raw_salary,
        |  CASE WHEN id % 23 <> 0 THEN
        |    CAST(CAST((id * 3) % 80000 AS VARCHAR) || '.25' AS DOUBLE)
        |    END AS raw_min_salary,
        |  CASE WHEN id % 23 <> 0 THEN
        |    CAST(CAST((id * 11) % 90000 AS VARCHAR) || '.75' AS DOUBLE)
        |    END AS raw_max_salary,
        |  CASE WHEN id % 23 <> 0 THEN
        |    CASE WHEN id % 4 = 0 OR id % 4 = 3 THEN 'YEAR'
        |         WHEN id % 4 = 1 THEN 'DAY' ELSE 'HOUR' END
        |    END AS raw_salary_unit,
        |  CASE WHEN id % 23 <> 0 THEN 'GBP' END AS raw_salary_currency,
        |  (id % 23 = 0) AS salary_competitive,
        |  FALSE AS salary_negotiable
        |FROM ads WHERE id % 29 <> 0""".stripMargin),
  )

  private val indeedScrapeDate = "2021-07-05"

  private def indeedPage: org.apache.spark.sql.Column = {
    val k = col("id")
    concat(
      lit("<html><head><script>window._initialData={"),
      when(k % 31 =!= 0,
        concat(lit("\"jobKey\":\""), k.cast("string"), lit("\",")))
        .otherwise(lit("")),
      lit("\"jobTitle\":\"Engineer "), (k % 50).cast("string"), lit("\","),
      lit("\"jobLocation\":\""), col("job_location_raw"), lit("\","),
      lit("\"hiringCompanyName\":\"Acme "), (k % 7).cast("string"),
      lit("\","),
      lit("\"salaryText\":\"£"), ((k * 7) % 90000).cast("string"),
      lit(" per annum\","),
      lit("\"end\":1}</script></head><body>" +
        "<span class=\"indeed-apply-widget\" " +
        "data-indeed-apply-joburl=\"https://jobs.example/apply/"),
      k.cast("string"), lit("\"></span>" +
        "<div class=\"jobsearch-jobDescriptionText\"><p>Role in "),
      col("job_location_raw"), lit(".</p></div></body></html>"))
  }

  private val extractIndeed = Q(
    "dom_extract_indeed",
    (s, d) => Extract.indeed(
      cachedAds(s, d).select(indeedPage.as("text")),
      indeedScrapeDate),
    Some(withCtes("ads") +
      s"""SELECT CAST(id AS VARCHAR) AS id, 'Indeed' AS data_source,
         |  'https://jobs.example/apply/' || CAST(id AS VARCHAR) AS url,
         |  DATE '$indeedScrapeDate' AS created,
         |  'Engineer ' || CAST(id % 50 AS VARCHAR) AS job_title_raw,
         |  job_location_raw,
         |  'Acme ' || CAST(id % 7 AS VARCHAR) AS company_raw,
         |  CAST(NULL AS VARCHAR) AS contract_type_raw,
         |  'Role in ' || job_location_raw || '.' AS description,
         |  CAST(NULL AS VARCHAR) AS closing_date_raw,
         |  '£' || CAST((id * 7) % 90000 AS VARCHAR) || ' per annum'
         |    AS job_salary_raw
         |FROM ads WHERE id % 31 <> 0""".stripMargin),
  )

  // ---- D2: vector near-dup links, oracled with LSH blocking off --------
  //
  // With nPlanes = 0 the sign-LSH candidate stage degenerates to "all
  // pairs within each temporal window", which is exactly SQL-expressible:
  // the oracle recomputes the whole scoring chain (epoch-aligned 56d/28d
  // windows, md5-ordered per-window background sample, sequential-order
  // L1 mean, relative score, max across windows). The LSH-blocked path is
  // the same code minus candidates, covered by VectorDedupSpec.

  private val vectorDedupQ = Q(
    "dom_vector_dedup_links",
    (s, d) => {
      // per-window pair scoring is CPU-bound over the single-split
      // embeddings file — widen before the window fan-out
      val e = graft.util.Widen.cpuHeavy(Tables(s, d).embeddings)
      val vecs = e.select(col("vec_id").as("id"),
        expr("timestamp'1995-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, CAST(vec_id % 100 AS INT), 0, 0, 0)")
          .as("created"),
        col("embedding").as("vector"))
      // threshold 0.25: the fixture embeddings are clustered, not
      // duplicated, so the production 0.8 cut returns nothing — a lower
      // cut keeps the oracle non-vacuous (46 links at sf0.01)
      VectorDedup.nearDuplicateLinks(vecs, dim = 64, nPlanes = 0,
          backgroundSample = 32, threshold = 0.25)
        .select(col("first_id"), col("second_id"),
          round(col("weight"), 4).as("weight"))
    },
    Some(
      """WITH vecs AS (
        |  SELECT vec_id AS id,
        |    TIMESTAMP '1995-01-01 00:00:00'
        |      + (vec_id % 100) * INTERVAL 1 DAY AS created,
        |    embedding FROM embeddings),
        |blocked AS (
        |  SELECT id, embedding,
        |    make_timestamp(CAST((floor(epoch(created)/2419200)*2419200
        |      - k*2419200) AS BIGINT) * 1000000) AS win
        |  FROM vecs, (SELECT unnest([0,1]) AS k)),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY win
        |    ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
        |  FROM blocked),
        |samples AS (
        |  SELECT win, list(embedding ORDER BY rn) AS bgs
        |  FROM ranked WHERE rn <= 32 GROUP BY win),
        |based AS (
        |  SELECT b.id, b.win, b.embedding,
        |    list_sum(list_transform(s.bgs, g ->
        |      list_sum(list_transform(range(1, len(b.embedding) + 1),
        |        i -> abs(CAST(b.embedding[i] AS DOUBLE)
        |          - CAST(g[i] AS DOUBLE))))))
        |      / len(s.bgs) AS base
        |  FROM blocked b JOIN samples s ON b.win = s.win),
        |pairs AS (
        |  SELECT a.id AS first_id, b.id AS second_id,
        |    (a.base - list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> abs(CAST(a.embedding[i] AS DOUBLE)
        |        - CAST(b.embedding[i] AS DOUBLE)))))
        |      / a.base AS w
        |  FROM based a JOIN based b ON a.win = b.win AND a.id < b.id)
        |SELECT first_id, second_id, round(max(w), 4) AS weight
        |FROM pairs WHERE w > 0.25 GROUP BY 1, 2""".stripMargin),
  )

  def all: Seq[Q] = Seq(salaryExtract, dupSubgraphs, subgraphsByLoc,
    snapshotAds, getAds, features, weeklyAdsQ, weeklyStockQ, weeklySpreadQ,
    weeklyLocQ,
    aggSkills, jobsByLoc, publishRounded, htmlStrip, cleanSkill,
    extractReed, extractIndeed, vectorDedupQ)
}
