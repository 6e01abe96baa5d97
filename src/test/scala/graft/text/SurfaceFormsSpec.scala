package graft.text

import graft.SparkSpec

/** Unit semantics of the manual curation pass — the reference's
  * remove_and_reassign_forms contract: removals drop rows, an assignment
  * REPLACES any existing row carrying that surface form.
  */
class SurfaceFormsSpec extends SparkSpec {

  test("removeAndReassign: remove drops, assign replaces by form") {
    import spark.implicits._
    val forms = Seq(
      (1L, "java", "label_pref"),
      (2L, "coffee", "chunk_descr"), // will be reassigned to 9
      (3L, "bad form", "chunk_descr"), // will be removed
      (4L, "scala", "label_pref"),
    ).toDF("entity", "surface_form", "surface_form_type")
    val rm = Seq("bad form").toDF("surface_form")
    val asg = Seq((9L, "coffee", "manual"), (9L, "espresso", "manual"))
      .toDF("entity", "surface_form", "surface_form_type")

    val got = SurfaceForms.removeAndReassign(forms, rm, asg)
      .collect().map(r => (r.getAs[Long]("entity"),
        r.getAs[String]("surface_form"),
        r.getAs[String]("surface_form_type"))).toSet
    assert(got == Set(
      (1L, "java", "label_pref"),
      (4L, "scala", "label_pref"),
      (9L, "coffee", "manual"), // replaced entity 2's row
      (9L, "espresso", "manual"), // net-new assignment
    ))
  }

  test("conflicting assignments for one form resolve deterministically") {
    import spark.implicits._
    val forms = Seq((1L, "java", "label_pref"))
      .toDF("entity", "surface_form", "surface_form_type")
    val asg = Seq((9L, "java", "manual"), (10L, "java", "manual"))
      .toDF("entity", "surface_form", "surface_form_type")
    val got = SurfaceForms.removeAndReassign(forms,
      Seq.empty[String].toDF("surface_form"), asg).collect()
    // exactly one row survives: max (entity, type) wins — never two
    // entities claiming the same form
    assert(got.length == 1)
    assert(got.head.getAs[Long]("entity") == 10L)
  }

  test("null surface forms in the assignment list are dropped") {
    import spark.implicits._
    val forms = Seq((1L, "java", "label_pref"))
      .toDF("entity", "surface_form", "surface_form_type")
    val asg = Seq((9L, null.asInstanceOf[String], "manual"))
      .toDF("entity", "surface_form", "surface_form_type")
    val got = SurfaceForms.removeAndReassign(forms,
      spark.emptyDataFrame.selectExpr("CAST(NULL AS STRING) AS surface_form")
        .limit(0),
      asg)
    assert(got.collect().map(_.getAs[String]("surface_form")).toSeq
      == Seq("java"))
  }
}
