package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skills surface-form model BUILD pipeline — the data-pipeline half of
  * the reference's surface_forms_flow.py + skills_detection_utils.py
  * (round-1 gap #6). Stages, each a DataFrame op with a DuckDB oracle:
  *
  *  - candidate generation: preferred label, flattened alternate labels
  *    (newline-joined, flatten_skills_labels:74-103), and description
  *    noun chunks via the POS-pattern-lite chunker ([[NounChunks]],
  *    standing in for spaCy's model-based `doc.noun_chunks`,
  *    chunk_forms:122-138 — closed-class boundary words are the
  *    model-free part of POS tagging; the chunker's over-capture of
  *    open-class verbs is absorbed by the same tf-idf representativity
  *    mask the reference uses to absorb spaCy's over-capture);
  *  - one-to-one dedup by type priority (deduplicate_surface_forms:
  *    208-249): within an entity keep the most reliable type, across
  *    entities keep the first (type rank, entity) — entity tiebreak
  *    replaces the reference's implicit row order, deterministically;
  *  - tf-idf representativity mask (tfidf_representativity_mask:
  *    292-374): sklearn parity (tokens \\b\\w\\w+\\b of the lowercased
  *    doc, tf = count, idf = ln((1+n)/(1+df))+1, rows L2-normalised);
  *    label forms auto-pass; chunk forms pass if their linked entity is
  *    the arg-max document of the phrase tf-idf sum, or both scores
  *    clear the ambiguity threshold. Sums are rounded to 6 dp before
  *    comparison so FP reassociation can't flip arg-max ties;
  *  - frequency refinement (frequency_refinement:707-745): drop
  *    single-word, non-preferred forms whose detection count exceeds the
  *    95th percentile.
  *
  * The detection side (Aho–Corasick phrase matcher) is [[PhraseMatch]] /
  * J9; consensus Leiden clustering of the resulting skill graph is
  * model construction (cluster_utils.py) and stays out of scope per
  * SURVEY §2.
  */
object SurfaceForms {

  val TypeOrder: Seq[String] = Seq("label_pref", "label_alt", "chunk_descr")
  val MinLength = 3
  val AmbigThreshold = 1.0

  private def cleanForm(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Candidate (entity, surface_form_type, surface_form) rows from a
    * skills table (entity, preferred_label, alt_labels, description).
    */
  def candidates(skills: DataFrame): DataFrame = {
    val pref = skills.select(col("entity"),
      lit("label_pref").as("surface_form_type"),
      cleanForm(col("preferred_label")).as("surface_form"))
    val alt = skills
      .select(col("entity"), explode(split(col("alt_labels"), "\n")).as("al"))
      .select(col("entity"), lit("label_alt").as("surface_form_type"),
        cleanForm(col("al")).as("surface_form"))
    val chunks = skills
      .select(col("entity"),
        explode(NounChunks.chunks(cleanForm(col("description"))))
          .as("surface_form"))
      .select(col("entity"), lit("chunk_descr").as("surface_form_type"),
        col("surface_form"))
    pref.union(alt).union(chunks)
      .filter(length(col("surface_form")) >= MinLength)
  }

  /** One-to-one form→entity assignment by type priority. */
  def dedupe(forms: DataFrame,
      order: Seq[String] = TypeOrder): DataFrame = {
    val rank = order.zipWithIndex.foldLeft(lit(order.size)) {
      case (acc, (t, i)) =>
        when(col("surface_form_type") === t, lit(i)).otherwise(acc)
    }
    val withinEntity = Window.partitionBy("entity", "surface_form")
      .orderBy("type_rank")
    val acrossEntities = Window.partitionBy("surface_form")
      .orderBy(col("type_rank"), col("entity"))
    forms.withColumn("type_rank", rank)
      .withColumn("r1", row_number().over(withinEntity))
      .filter(col("r1") === 1)
      .withColumn("r2", row_number().over(acrossEntities))
      .filter(col("r2") === 1)
      .select("entity", "surface_form", "surface_form_type")
  }

  /** sklearn-parity tf-idf matrix (entity, word, tfidf) for per-entity
    * documents (entity, doc_text).
    */
  def tfidfMatrix(docs: DataFrame): DataFrame = {
    // Pinned-parallelism exchanges throughout this pipeline: every frame
    // here is a few MB, so both the single-file scan (one input split)
    // and AQE's size-based coalescing would otherwise serialise the regex
    // tokenisation, the windows, and — fatally — the downstream sparse
    // product that pipelines onto the final exchange, onto ONE task
    // (observed as a 2.2s single-task stage = 90% of the tf-idf query).
    // User repartitions are exempt from coalescing; each keys on what the
    // next operator needs, so no ENSURE_REQUIREMENTS exchange is added.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(par, col("entity"))
      .select(col("entity"),
        explode(expr(
          "regexp_extract_all(lower(doc_text), '\\\\b\\\\w\\\\w+\\\\b', 0)"))
          .as("word"))
    // hash(entity) clusters (entity, word) too — tf aggregates in place
    val tf = toks.groupBy("entity", "word").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n"))
    // df and the row norms as WINDOW aggregates, not groupBy+self-join:
    // a join back onto `tf` makes Catalyst execute the token/tf subtree
    // once per consumer (no subtree sharing across a self-join diamond),
    // which dominated this query's profile. Windows keep one linear
    // pipeline — tf is computed once, each window is an exchange of the
    // (entity, word)-sized matrix only — and the final by-entity window
    // leaves the output hash(entity)-partitioned, exactly what the
    // downstream representativity aggregation wants.
    val byWord = Window.partitionBy("word")
    val byEntity = Window.partitionBy("entity")
    tf
      .repartition(par, col("word"))
      .withColumn("df", count(lit(1)).over(byWord).cast("double"))
      .crossJoin(broadcast(nDocs))
      .withColumn("w0", col("tf") *
        (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + 1.0))
      .repartition(par, col("entity"))
      .withColumn("nrm", sqrt(sum(col("w0") * col("w0")).over(byEntity)))
      .select(col("entity"), col("word"), (col("w0") / col("nrm")).as("tfidf"))
  }

  /** Representativity-filtered forms: label forms pass; chunk forms pass
    * iff their linked entity is the arg-max document for the phrase, or
    * both the best and the linked scores exceed the ambiguity threshold.
    */
  def tfidfRepresentativity(forms: DataFrame, docs: DataFrame): DataFrame = {
    // label-derived forms are auto-representative (reference:306-309) —
    // only chunk forms are scored, which also keeps the word-fanout join
    // to the small candidate set
    val labelForms = forms.filter(col("surface_form_type").contains("label"))
    val chunkForms = forms.filter(!col("surface_form_type").contains("label"))
    // The scoring is a sparse matrix product (form,word)×(word,entity);
    // its output (Σ_form Σ_word df(word) rows — every form reaches every
    // doc sharing a word) dwarfs both inputs, so the product must never
    // cross the network: (a) the form side is taxonomy-bounded
    // (ESCO-sized), so it broadcasts into the matrix, which arrives
    // hash(entity)-partitioned from its normalisation window; (b) the
    // per-(form,entity) sum then groups on a superset of the partitioning
    // keys — zero exchange for the fanout-sized aggregate; (c) the
    // arg-max aggregate partial-reduces to ≤|forms| rows per partition
    // before its (tiny) exchange.
    // the matrix arrives hash(entity)-partitioned at pinned parallelism
    // (see tfidfMatrix) — the product stage below inherits both
    val tfidf = tfidfMatrix(docs)
    // dense integer ids for the (tiny) form side: the fanout-sized
    // aggregate below then hashes three longs per row instead of copying
    // and comparing the surface-form string 10^(large) times — the string
    // rejoins on the |forms|-row dim after the reduction. The id window
    // is global but runs over the taxonomy-bounded form set only.
    val formDim = chunkForms
      .select(col("entity").as("linked"), col("surface_form"))
      .withColumn("form_id",
        row_number().over(Window.orderBy("surface_form")).cast("long"))
    val formWords = formDim
      .select(col("form_id"), col("linked"),
        explode(split(col("surface_form"), " ")).as("word"))
    // score kept in exact 6-dp integer space from the start: one HALF_UP
    // rounding per group (round() goes through BigDecimal — doing it
    // twice per group showed up in the profile as GC pressure), same
    // decisions as the oracle's round(sum, 6)
    val sums = tfidf
      .join(broadcast(formWords), "word")
      .groupBy(col("form_id"), col("linked"), col("entity"))
      .agg(round(sum(col("tfidf")) * 1e6, 0).cast("long").as("s6"))
    // Arg-max via one HASH aggregate: max(struct(...)) would be exact but
    // structs aren't mutable-buffer types, so Spark demotes it to a
    // SortAggregate — a full sort of the fanout-sized frame. Instead pack
    // (score, entity) into one long: scores are already 6-dp-rounded, so
    // s·10^6 is an exact integer, and max(s6·2^40 − entity) = highest
    // score with lowest-entity tiebreak. Valid while s < 2^23/10^6 (a
    // form's score is ≤ its word count — L2-normalised terms are ≤ 1)
    // and 0 ≤ entity < 2^40; both hold for taxonomy-sized inputs by a
    // wide margin. Threshold tests stay in exact integer space.
    val P = 1L << 40
    val thr6 = (AmbigThreshold * 1e6).toLong
    val decided = sums.groupBy("form_id")
      .agg(max(col("s6") * P - col("entity")).as("pk"),
        max(when(col("entity") === col("linked"), col("s6"))).as("linked_s6"))
      .withColumn("rem", pmod(col("pk"), lit(P)))
      .withColumn("best_doc",
        when(col("rem") === 0, lit(0L)).otherwise(lit(P) - col("rem")))
      // pk + best_doc = s6·2^40 exactly; decode by shift (long `/` is
      // double division in Spark and loses exactness at this magnitude)
      .withColumn("best_s6", shiftright(col("pk") + col("best_doc"), 40))
      .join(broadcast(formDim), "form_id")
      .select(col("linked").as("b_entity"),
        col("surface_form").as("b_form"),
        col("best_doc"), col("best_s6"), col("linked_s6"))
    val keptChunks = chunkForms
      .join(decided, col("entity") === col("b_entity") &&
        col("surface_form") === col("b_form"), "left_outer")
      .filter(col("best_doc") === col("entity") ||
        (col("best_s6") > thr6 && col("linked_s6") > thr6))
      .select("entity", "surface_form", "surface_form_type")
    labelForms.select("entity", "surface_form", "surface_form_type")
      .union(keptChunks)
  }

  /** Drop single-word, non-preferred forms whose detection count exceeds
    * the `pct` percentile of all counts.
    */
  def frequencyRefinement(forms: DataFrame, counts: DataFrame,
      pct: Double = 0.95): DataFrame = {
    val thr = counts.agg(percentile(col("n"), lit(pct)).as("thr"))
    val toRemove = counts.crossJoin(broadcast(thr))
      .filter(col("n") > col("thr") &&
        size(split(col("surface_form"), " ")) <= 1)
      .join(forms, "surface_form")
      .filter(col("surface_form_type") =!= "label_pref")
      .select("surface_form").distinct()
    forms.join(toRemove, Seq("surface_form"), "left_anti")
  }

  /** Manual curation pass (`remove_and_reassign_forms`,
    * skills_detection_utils.py:408-467): drop rejected forms, then apply
    * manual (form → entity) assignments — an assignment REPLACES any
    * existing row carrying that form (the reference's
    * `drop_duplicates(keep="last")` after append). The reference resolves
    * conflicting assignments for one form by list position; a distributed
    * frame has no row order, so conflicts resolve by max (entity, type) —
    * deterministic, documented divergence (curators should submit one
    * assignment per form). Manual lists are curator-sized, so both
    * correction joins broadcast.
    */
  def removeAndReassign(forms: DataFrame, manualRemove: DataFrame,
      manualAssign: DataFrame): DataFrame = {
    val assignOnce = manualAssign.na.drop(Seq("surface_form"))
      .groupBy("surface_form")
      .agg(max(struct(col("entity"), col("surface_form_type"))).as("m"))
      .select(col("surface_form"), col("m.entity").as("entity"),
        col("m.surface_form_type").as("surface_form_type"))
    forms
      .join(broadcast(manualRemove.select("surface_form")),
        Seq("surface_form"), "left_anti")
      .join(broadcast(assignOnce.select("surface_form")),
        Seq("surface_form"), "left_anti")
      .unionByName(assignOnce)
  }

  // ---- fixture (ESCO-skills-shaped, derived from `part`) + queries ----

  private def skillsView(t: Tables): DataFrame =
    t.part.select(
      col("p_partkey").as("entity"),
      col("p_name").as("preferred_label"),
      // second alt label is single-word and very frequent across
      // entities — the shape frequency refinement exists to remove
      concat(lower(col("p_type")), lit(" "), col("p_name"), lit("\n"),
        lower(col("p_type"))).as("alt_labels"),
      concat(col("p_name"), lit(" for "), lower(col("p_type")),
        lit(" use grade "), col("p_size").cast("string")).as("description"))

  private val skillsSql =
    """SELECT p_partkey AS entity,
      |  p_name AS preferred_label,
      |  lower(p_type) || ' ' || p_name || chr(10) || lower(p_type)
      |    AS alt_labels,
      |  p_name || ' for ' || lower(p_type) || ' use grade ' ||
      |    CAST(p_size AS VARCHAR) AS description
      |FROM part""".stripMargin

  private def clean(x: String) =
    s"trim(regexp_replace(lower($x), '[^a-z0-9]+', ' ', 'g'))"

  private val candidatesSql =
    s"""SELECT * FROM (
       |  SELECT entity, 'label_pref' AS surface_form_type,
       |    ${clean("preferred_label")} AS surface_form
       |  FROM skills
       |  UNION ALL
       |  SELECT entity, 'label_alt',
       |    ${clean("al")}
       |  FROM (SELECT entity, unnest(string_split(alt_labels, chr(10))) AS al
       |        FROM skills)
       |  UNION ALL
       |  SELECT entity, 'chunk_descr', ch
       |  FROM (SELECT entity,
       |          unnest(${NounChunks.chunksSql(clean("description"))
             .linesIterator.mkString(" ")}) AS ch
       |        FROM skills))
       |WHERE length(surface_form) >= 3""".stripMargin

  private val dedupedSql =
    """SELECT entity, surface_form, surface_form_type FROM (
      |  SELECT *, row_number() OVER (PARTITION BY surface_form
      |    ORDER BY type_rank, entity) AS r2
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY entity, surface_form
      |      ORDER BY type_rank) AS r1
      |    FROM (
      |      SELECT *, CASE surface_form_type WHEN 'label_pref' THEN 0
      |        WHEN 'label_alt' THEN 1 WHEN 'chunk_descr' THEN 2
      |        ELSE 3 END AS type_rank
      |      FROM cands))
      |  WHERE r1 = 1)
      |WHERE r2 = 1""".stripMargin

  /** Deduped candidate forms, materialised content-addressed: the build,
    * tf-idf and refinement queries all consume this frame, and inside the
    * tf-idf query it is read TWICE (label and chunk branches) — without
    * materialisation Catalyst re-executes the two-window dedup subtree
    * per consumer (the reference caches the surface-form table between
    * flow steps the same way).
    */
  private def cachedForms(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.domain.SharedCache.materialiseWith(s,
      graft.domain.SharedCache.defaultRoot,
      "surface-forms", s"$d|surface-forms-dedup|v1") {
      dedupe(candidates(skillsView(Tables(s, d))))
    }

  private val buildQ = Q(
    "dom_surface_forms_build",
    (s, d) => cachedForms(s, d),
    Some(s"""WITH skills AS ($skillsSql),
            |cands AS ($candidatesSql)
            |$dedupedSql""".stripMargin),
  )

  private val tfidfQ = Q(
    "dom_surface_forms_tfidf",
    (s, d) => {
      val sk = skillsView(Tables(s, d))
      val docs = sk.select(col("entity"),
        concat(col("preferred_label"), lit(" "), col("description"))
          .as("doc_text"))
      tfidfRepresentativity(cachedForms(s, d), docs)
    },
    Some(s"""WITH skills AS ($skillsSql),
            |cands AS ($candidatesSql),
            |forms AS ($dedupedSql),
            |docs AS (
            |  SELECT entity, preferred_label || ' ' || description AS doc_text
            |  FROM skills),
            |toks AS (
            |  SELECT entity,
            |    unnest(regexp_extract_all(lower(doc_text),
            |      '\\b\\w\\w+\\b', 0)) AS word
            |  FROM docs),
            |tf AS (SELECT entity, word, count(*) AS tf
            |       FROM toks GROUP BY 1, 2),
            |idf AS (
            |  SELECT word,
            |    ln((1.0 + (SELECT CAST(count(*) AS DOUBLE) FROM docs))
            |      / (1.0 + CAST(count(*) AS DOUBLE))) + 1.0 AS idf
            |  FROM tf GROUP BY word),
            |weighted AS (
            |  SELECT tf.entity, tf.word, tf.tf * idf.idf AS w0
            |  FROM tf JOIN idf USING (word)),
            |norms AS (
            |  SELECT entity, sqrt(sum(w0 * w0)) AS nrm
            |  FROM weighted GROUP BY entity),
            |tfidf AS (
            |  SELECT w.entity, w.word, w.w0 / n.nrm AS tfidf
            |  FROM weighted w JOIN norms n ON w.entity = n.entity),
            |sums AS (
            |  SELECT f.entity AS linked, f.surface_form, m.entity,
            |    round(sum(m.tfidf), 6) AS s
            |  FROM (SELECT entity, surface_form,
            |          unnest(string_split(surface_form, ' ')) AS word
            |        FROM forms) f
            |  JOIN tfidf m USING (word)
            |  GROUP BY 1, 2, 3),
            |best AS (
            |  SELECT linked, surface_form, entity AS best_doc, s AS best_s
            |  FROM (SELECT *, row_number() OVER (
            |      PARTITION BY linked, surface_form
            |      ORDER BY s DESC, entity ASC) AS rn FROM sums)
            |  WHERE rn = 1),
            |linkeds AS (
            |  SELECT linked, surface_form, s AS linked_s
            |  FROM sums WHERE entity = linked)
            |SELECT f.entity, f.surface_form, f.surface_form_type
            |FROM forms f
            |LEFT JOIN best b
            |  ON f.entity = b.linked AND f.surface_form = b.surface_form
            |LEFT JOIN linkeds l
            |  ON f.entity = l.linked AND f.surface_form = l.surface_form
            |WHERE contains(f.surface_form_type, 'label')
            |  OR b.best_doc = f.entity
            |  OR (b.best_s > 1.0 AND l.linked_s > 1.0)""".stripMargin),
  )

  private val refineQ = Q(
    "dom_surface_forms_refine",
    (s, d) => {
      val t = Tables(s, d)
      val sk = skillsView(t)
      val forms = cachedForms(s, d)
      // detection-count stand-in: whitespace-boundary containment of the
      // form in the skills descriptions (the real detector is
      // PhraseMatch / J9) — single-word type forms hit hundreds of
      // descriptions, exactly the too-frequent shape the refinement cuts
      val counts = forms.select("surface_form").distinct()
        .join(graft.util.Widen.cpuHeavy(sk.select(
          concat(lit(" "), lower(col("description")), lit(" ")).as("padded"))),
          expr("contains(padded, ' ' || surface_form || ' ')"))
        .groupBy("surface_form").agg(count(lit(1)).as("n"))
      frequencyRefinement(forms, counts)
    },
    Some(s"""WITH skills AS ($skillsSql),
            |cands AS ($candidatesSql),
            |forms AS ($dedupedSql),
            |counts AS (
            |  SELECT surface_form, count(*) AS n
            |  FROM (SELECT DISTINCT surface_form FROM forms) f
            |  JOIN skills s
            |    ON contains(' ' || lower(s.description) || ' ',
            |                ' ' || f.surface_form || ' ')
            |  GROUP BY surface_form),
            |thr AS (SELECT quantile_cont(n, 0.95) AS thr FROM counts),
            |to_remove AS (
            |  SELECT DISTINCT c.surface_form
            |  FROM counts c CROSS JOIN thr
            |  JOIN forms f ON c.surface_form = f.surface_form
            |  WHERE c.n > thr.thr
            |    AND len(string_split(c.surface_form, ' ')) <= 1
            |    AND f.surface_form_type <> 'label_pref')
            |SELECT entity, surface_form, surface_form_type FROM forms
            |WHERE surface_form NOT IN (SELECT surface_form FROM to_remove)""".stripMargin),
  )

  private val adjustQ = Q(
    "dom_surface_forms_adjust",
    (s, d) => {
      val forms = cachedForms(s, d)
      // deterministic stand-ins for the curator's manual lists
      val rm = forms.filter(col("surface_form").startsWith("a"))
        .select("surface_form")
      val asg = forms.filter(col("surface_form").startsWith("b"))
        .select(col("surface_form"), lit(-1L).as("entity"),
          lit("manual").as("surface_form_type")).distinct()
      removeAndReassign(forms, rm, asg)
        .select("entity", "surface_form", "surface_form_type")
    },
    Some(s"""WITH skills AS ($skillsSql),
            |cands AS ($candidatesSql),
            |forms AS ($dedupedSql),
            |rm AS (SELECT surface_form FROM forms
            |       WHERE surface_form LIKE 'a%'),
            |asg AS (SELECT DISTINCT surface_form,
            |          CAST(-1 AS BIGINT) AS entity,
            |          'manual' AS surface_form_type
            |        FROM forms WHERE surface_form LIKE 'b%')
            |SELECT entity, surface_form, surface_form_type FROM forms
            |WHERE surface_form NOT IN (SELECT surface_form FROM rm)
            |  AND surface_form NOT IN (SELECT surface_form FROM asg)
            |UNION ALL
            |SELECT entity, surface_form, surface_form_type FROM asg""".stripMargin),
  )

  def queries: Seq[Q] = Seq(buildQ, tfidfQ, refineQ, adjustQ)
}
