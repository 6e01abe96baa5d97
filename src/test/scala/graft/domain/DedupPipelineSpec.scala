package graft.domain

import graft.SparkSpec

import java.sql.Timestamp

/** Hand-computed mirror of the reference's duplicate-identification
  * semantics (dqa/data_getters.py:288-404): weight banding, location
  * split, min-id exemplar within the window intersection.
  */
class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  // graph: {a,b,c} linked; {d,e} linked; f isolated. Weights: a-b & b-c
  // & d-e in band; a-c out of band (ignored, but same component via b).
  private val links = Seq(
    ("a", "b", 0.97), ("b", "c", 0.99), ("a", "c", 0.5), ("d", "e", 1.0),
  ).toDF("first_id", "second_id", "weight")

  private val ads = Seq(
    ("a", "London", "long description", "2021-02-02"),
    ("b", "London", "long description", "2021-02-03"),
    ("c", "Leeds", "long description", "2021-02-04"),
    ("d", "York", "long description", "2021-02-05"),
    ("e", "York", "abc", "2021-02-06"), // description < 5 chars
    ("f", "York", "long description", "2021-02-07"),
  ).map { case (id, loc, desc, day) => (id, loc, desc, ts(day)) }
    .toDF("id", "job_location_raw", "description", "created")

  test("weight band filters edges but components span in-band paths") {
    val comps = DedupPipeline.duplicateSubgraphs(links).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d",
      "e" -> "d"))
  }

  test("location split re-keys groups and drops short descriptions") {
    val comps = DedupPipeline.duplicateSubgraphs(links)
    val split = DedupPipeline.subgraphsByLocation(comps, ads).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // {a,b} stay (London group of 2); c alone in Leeds → dropped;
    // e dropped for short description so {d} is singleton → dropped
    assert(split == Map("a" -> "a", "b" -> "a"))
  }

  test("exemplar = min id within scope; rest are duplicates") {
    val comps = DedupPipeline.duplicateSubgraphs(links)
    val ids = Seq("b", "c").toDF("id") // window without 'a'
    val dupes = DedupPipeline.identifyDuplicates(comps, ids)
      .collect().map(_.getString(0)).toSet
    assert(dupes == Set("c")) // b is the exemplar of the intersection
  }

  test("snapshotAds removes duplicates, keeps exemplars and non-dupes") {
    val out = DedupPipeline
      .snapshotAds(ads, links, "2021-02-01", "2021-02-28",
        splitByLocation = false)
      .select("id").collect().map(_.getString(0)).toSet
    // groups {a,b,c} → exemplar a; {d,e} → exemplar d; f untouched
    assert(out == Set("a", "d", "f"))
  }

  test("getJobAds mirrors get_db_job_ads: date filter, dedup, projection") {
    val got = Getters.getJobAds(ads, links,
      fromDate = Some("2021-02-03"), toDate = Some("2021-02-28"),
      returnDescription = false, deduplicate = true)
    // window excludes 'a' (02-02); groups {a,b,c}∩window = {b,c} → keep b
    // (min of the intersection, like the reference); {d,e} → keep d
    assert(got.select("id").collect().map(_.getString(0)).toSet ==
      Set("b", "d", "f"))
    assert(!got.columns.contains("description"))
  }

  test("snapshotAds with location split only drops same-location dupes") {
    val out = DedupPipeline
      .snapshotAds(ads, links, "2021-02-01", "2021-02-28")
      .select("id").collect().map(_.getString(0)).toSet
    // only {a,b} is a split group → b dropped; c,d,e,f all kept
    assert(out == Set("a", "c", "d", "e", "f"))
  }
}
