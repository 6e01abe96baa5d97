package graft.text

import graft.{Q, Tables}
import graft.dedup.ConnectedComponents
import graft.domain.AdsFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skill-taxonomy grouping — the scalable analog of the reference's
  * consensus clustering (labs/skills/cluster_utils.py builds a skill
  * co-occurrence graph and runs a Leiden ensemble on one machine; the
  * graph CONSTRUCTION is the data-pipeline part, re-expressed here, and
  * the community step becomes thresholded connected components, which is
  * deterministic and distributes — the ensemble/modularity refinement is
  * model construction and stays out of scope per SURVEY §2).
  *
  * Scale notes: the co-occurrence self-join fans k² pairs per ad with k
  * detected skills — bounded in practice (ads carry tens of skills, and
  * a top-k cap per ad bounds it structurally); the pair aggregation is
  * map-side combined on (skill, skill) keys, and the clustering itself
  * is the O(log n) large/small-star loop.
  */
object SkillClusters {

  /** Weighted co-occurrence edges: skills appearing together in at least
    * `minCount` ads (entity < entity dedup orders each pair once).
    */
  def cooccurrenceEdges(skillsPerAd: DataFrame, minCount: Long): DataFrame =
    skillsPerAd.alias("a")
      .join(skillsPerAd.alias("b"),
        col("a.job_id") === col("b.job_id") &&
          col("a.entity") < col("b.entity"))
      .groupBy(col("a.entity").as("src"), col("b.entity").as("dst"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** (entity, cluster) labels: cluster = min entity of the thresholded
    * co-occurrence component; entities below threshold with every
    * neighbour become singletons.
    */
  def clusters(skillsPerAd: DataFrame, minCount: Long): DataFrame =
    ConnectedComponents.run(
      cooccurrenceEdges(skillsPerAd, minCount).select("src", "dst"),
      nodeSet = Some(skillsPerAd.select(col("entity").as("id")).distinct()))
      .select(col("id").as("entity"), col("component").as("cluster"))

  private val q = Q(
    "dom_skill_clusters",
    (s, d) => clusters(
      AdsFixture.skillLinks(Tables(s, d))
        .select(col("job_id"), col("surface_form").as("entity")),
      minCount = 590L),
    Some(
      """WITH RECURSIVE sl AS (
        |  SELECT l_orderkey AS job_id,
        |    l_returnflag || '_' || CAST(l_linenumber AS VARCHAR) AS entity
        |  FROM lineitem),
        |edges AS (
        |  SELECT a.entity AS src, b.entity AS dst
        |  FROM sl a JOIN sl b
        |    ON a.job_id = b.job_id AND a.entity < b.entity
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 590),
        |sym AS (
        |  SELECT src AS a, dst AS b FROM edges
        |  UNION SELECT dst, src FROM edges),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |labeled AS (
        |  SELECT id, min(comp) AS cluster FROM walk GROUP BY id)
        |SELECT e.entity, coalesce(l.cluster, e.entity) AS cluster
        |FROM (SELECT DISTINCT entity FROM sl) e
        |LEFT JOIN labeled l ON e.entity = l.id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
