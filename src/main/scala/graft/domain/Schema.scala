package graft.domain

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit

import java.sql.Timestamp

/** Core domain tables (SURVEY.md §1), one case class per reference ORM.
  * Storage is columnar parquet with these fixed schemas; the composite
  * PK (id, data_source) of the fact table (ref orms/raw_jobs.py:16-17)
  * is enforced at write time by `dropDuplicates`, and the `__version__`
  * audit column (ref ojd_daps/__init__.py:15-29) by the shared writer.
  */
final case class RawJobAd(
    id: String,
    data_source: String,
    created: Timestamp,
    url: Option[String],
    s3_location: Option[String],
    job_title_raw: Option[String],
    job_location_raw: Option[String],
    raw_salary: Option[Double],
    raw_min_salary: Option[Double],
    raw_max_salary: Option[Double],
    raw_salary_band: Option[String],
    raw_salary_unit: Option[String],
    raw_salary_currency: Option[String],
    salary_competitive: Option[Boolean],
    salary_negotiable: Option[Boolean],
    company_raw: Option[String],
    contract_type_raw: Option[String],
    closing_date_raw: Option[String],
    description: Option[String],
)

/** Dense description vector (ref orms/raw_jobs.py:52-55) — stored as a
  * native float array, not the reference's JSON string round-trip.
  */
final case class AdVector(id: String, vector: Array[Float])

/** job ↔ feature link rows (ref orms/link_tables.py). */
final case class DuplicateLink(first_id: String, second_id: String,
    weight: Double)
final case class LocationLink(job_id: String, location_id: String)
final case class SocLink(job_id: String, soc_id: String)
final case class SkillLink(job_id: String, surface_form: String,
    preferred_label: String, cluster_0: Option[String],
    cluster_1: Option[String], cluster_2: Option[String])

/** Location dimension (ref orms/std_features.py:96-119, abridged to the
  * levels the aggregations consume).
  */
final case class LocationDim(ipn_18_code: String, ipn_18_name: String,
    lad_18_code: Option[String], nuts_2_code: Option[String],
    nuts_2_name: Option[String])

final case class SocDim(soc_id: String, soc_code: String, soc_title: String)

object Schema {
  /** Shared writer: stamps `__version__` and enforces overwrite
    * semantics (ref tasks/extract.py:101-106 teardown ≙ overwrite).
    */
  def writeVersioned(df: DataFrame, path: String, version: String): Unit =
    df.withColumn("__version__", lit(version))
      .write.mode(SaveMode.Overwrite).parquet(path)
}
