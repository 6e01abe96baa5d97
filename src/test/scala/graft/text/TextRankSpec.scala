package graft.text

import graft.SparkSpec

/** TextRank centrality on a constructed word graph with a known hub. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hub word outranks peripheral words; short tokens drop out") {
    // "alpha" is adjacent to every other content word; "bravo" touches
    // only the hub; "xy" is below the content-length filter
    val d = docs(
      "alpha bravo alpha charlie alpha delta xy alpha echo",
      "alpha bravo alpha foxtrot")
    val ranks = TextRank.keywords(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!ranks.contains("xy"))
    val hub = ranks("alpha")
    Seq("bravo", "charlie", "delta", "echo", "foxtrot").foreach { w =>
      assert(hub > ranks(w), s"$w (${ranks(w)}) !< alpha ($hub)")
    }
  }

  test("isolated content words converge to the damped floor") {
    // a doc of one long repeated token has no edges (self-loops
    // filtered) → its word keeps the 0.15 floor in integer units
    val d = docs("zulu zulu zulu")
    val ranks = TextRank.keywords(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("zulu") == 150000L, s"got ${ranks.get("zulu")}")
  }
}
