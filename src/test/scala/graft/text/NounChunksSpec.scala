package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behaviour of the POS-pattern-lite noun chunker. */
class NounChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(NounChunks.chunks(col("t")).as("c"))
      .collect().head.getSeq[String](0)

  test("boundary words split noun-phrase runs") {
    assert(chunk("strong communication skills and attention to detail")
      == Seq("strong communication skills", "attention", "detail"))
    assert(chunk("experience with cloud infrastructure in a fast paced team")
      == Seq("experience", "cloud infrastructure", "fast paced team"))
  }

  test("light verbs and auxiliaries are boundaries") {
    assert(chunk("you will use modern data pipelines to provide insight")
      == Seq("modern data pipelines", "insight"))
  }

  test("domain -ing nouns survive (no suffix heuristic)") {
    assert(chunk("marketing manager for the engineering department")
      == Seq("marketing manager", "engineering department"))
  }

  test("length caps: short fragments and run-ons drop") {
    // two-char fragment dropped by the >= 3 char floor
    assert(chunk("go and java") == Seq("java"))
    // a 6-token run exceeds MaxTokens and is discarded whole
    val run = "alpha beta gamma delta epsilon zeta"
    assert(chunk(run).isEmpty)
    assert(chunk("alpha beta gamma delta epsilon") ==
      Seq("alpha beta gamma delta epsilon"))
  }

  test("consecutive boundaries yield no empty chunks") {
    assert(chunk("of the and with") == Seq.empty)
    assert(chunk("") == Seq.empty)
  }
}
