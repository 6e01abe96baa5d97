package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** The query-API layer (SURVEY §3.3) — Scala mirror of
  * dqa/data_getters.py's read path. The reference assembles a per-job
  * feature dict in driver memory (`get_features`, data_getters.py:638-663)
  * and loops windows re-reading the DB; here features are a multi-way
  * left join (J6) and the window loop is a spine range-join, so the whole
  * read path is one lazy plan.
  */
object Getters {

  /** The reference's primary read API, `get_db_job_ads`
    * (dqa/data_getters.py:144-285), re-expressed as one lazy plan:
    * date-filtered fact scan, optional description drop (P1), optional
    * feature assembly (J6), optional dedup-aware filtering (D3–D6) with
    * the same weight band and location-split semantics. A reference user
    * calls this exactly like the original, minus the chunking/caching
    * knobs that partitioned scans make obsolete.
    */
  def getJobAds(
      ads: DataFrame,
      links: DataFrame,
      fromDate: Option[String] = None,
      toDate: Option[String] = None,
      returnDescription: Boolean = true,
      deduplicate: Boolean = false,
      minDupeWeight: Double = DedupPipeline.MinDupeWeight,
      maxDupeWeight: Double = DedupPipeline.MaxDupeWeight,
      splitDupesByLocation: Boolean = false,
      features: Option[DataFrame => DataFrame] = None,
      precomputedGraphs: Option[DataFrame] = None,
  ): DataFrame = {
    var out = ads
    fromDate.foreach(f => out = out.filter(col("created") >= f)) // P4
    toDate.foreach(t => out = out.filter(col("created") <= t))
    if (deduplicate) {
      // precomputedGraphs = the UNSPLIT duplicate components (the
      // reference's cached get_subgraphs output passed between steps);
      // the location split still applies on top when requested
      val comps0 = precomputedGraphs.getOrElse(DedupPipeline
        .duplicateSubgraphs(links, minDupeWeight, maxDupeWeight))
      val comps =
        if (splitDupesByLocation) DedupPipeline.subgraphsByLocation(comps0, ads)
        else comps0
      val dupes = DedupPipeline.identifyDuplicates(comps, out.select("id"))
      out = out.join(dupes, Seq("id"), "left_anti") // J7
    }
    features.foreach(f => out = f(out)) // J6 hook (withFeatures curried)
    if (!returnDescription) out = out.drop("description") // P1/P6
    out
  }

  /** J6 feature assembly: ads ⟕ salary ⟕ location(+dim) ⟕ SOC ⟕ skills[].
    * Skills (many per ad) are pre-grouped to an array of structs —
    * nested end-to-end, no 1NF round-trip.
    */
  def withFeatures(
      ads: DataFrame,
      salaries: DataFrame, // (job_id, min/max_annualised_salary, rate, …)
      locationLinks: DataFrame, // (job_id, location_id)
      locations: DataFrame, // LocationDim
      socLinks: DataFrame, // (job_id, soc_id)
      socs: DataFrame, // SocDim
      skillLinks: DataFrame, // SkillLink
      precomputedLoc: Option[DataFrame] = None, // (job_id, nuts_2_code, nuts_2_name), distinct — the cached location dim passed between steps like precomputedGraphs
  ): DataFrame = {
    val loc = precomputedLoc.getOrElse(locationLinks
      .join(broadcast(locations),
        col("location_id") === col("ipn_18_code"), "left_outer")
      .select(col("job_id"), col("nuts_2_code"), col("nuts_2_name"))
      .distinct()) // J2: links can map to several rows of the same code
    val soc = socLinks
      .join(broadcast(socs), Seq("soc_id"))
      .select(col("job_id"), col("soc_code"), col("soc_title"))
    val skills = skillLinks
      .groupBy("job_id")
      .agg(sort_array(collect_list(struct(
        col("surface_form"), col("preferred_label"),
        col("cluster_0")))).as("skills"))
    ads
      .join(salaries.withColumnRenamed("id", "job_id"),
        col("id") === col("job_id"), "left_outer").drop("job_id")
      .join(loc, col("id") === col("job_id"), "left_outer").drop("job_id")
      .join(soc, col("id") === col("job_id"), "left_outer").drop("job_id")
      .join(skills, col("id") === col("job_id"), "left_outer").drop("job_id")
  }

  /** Weekly snapshot expansion: one row per (week_date, ad) for every
    * 6-week window ending at each Monday in [start, end] — the
    * distributed form of `get_weekly_ads` (flows/aggregate/common
    * .py:251-265). Dedup runs *within each window* exactly like the
    * reference (exemplar = min id of the window-intersection of each
    * duplicate group).
    */
  def weeklyAds(spark: SparkSession, ads: DataFrame, links: DataFrame,
      start: LocalDate, end: LocalDate,
      splitByLocation: Boolean = true,
      precomputedGraphs: Option[DataFrame] = None): DataFrame = {
    import graft.operators.TimeWindows
    val spine = TimeWindows.iterdates(start, end).map { case (f, t) =>
      (java.sql.Date.valueOf(f), java.sql.Date.valueOf(t))
    }
    val spineDf = spark.createDataFrame(spine)
      .toDF("window_from", "week_date")
    // each ad lands in ≤6 windows: range join against the broadcast spine
    val expanded = ads.join(broadcast(spineDf),
      col("created") >= col("window_from") &&
        col("created") <= col("week_date"))

    val comps = precomputedGraphs.getOrElse {
      val comps0 = DedupPipeline.duplicateSubgraphs(links)
      if (splitByLocation) DedupPipeline.subgraphsByLocation(comps0, ads)
      else comps0
    }
    // per-window exemplar: rank ids within (week, component)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("week_date", "component").orderBy(asc("id"))
    val dupes = expanded.select("week_date", "id")
      .join(comps, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select("week_date", "id")
    expanded.join(dupes, Seq("week_date", "id"), "left_anti")
  }
}
