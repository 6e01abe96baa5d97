package graft.text

import graft.SparkSpec

/** Greedy longest-match behaviour of the WordPiece encoder on corpora
  * whose derived vocabulary is fully predictable.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def fertility(texts: Seq[String]): Map[String, Int] = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    WordPiece.encode(texts.toDF("text"))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
  }

  test("words shorter than MaxPiece encode as one piece") {
    // small corpus: every substring fits in the top-40 per role, so the
    // whole word (≤ 6 chars) is itself an initial piece
    val f = fertility(Seq("alpha beta gamma alpha"))
    assert(f("alpha") == 1 && f("beta") == 1 && f("gamma") == 1)
  }

  test("longer words take ceil(len / MaxPiece) pieces when all substrings are in vocab") {
    val f = fertility(Seq("abcdefgh abcdefgh abcdefghijklm"))
    assert(f("abcdefgh") == 2)      // abcdef + gh
    assert(f("abcdefghijklm") == 3) // abcdef + ghijkl + m
  }

  test("vocab eviction degrades to shorter pieces, never fails") {
    // many distinct words push most substrings out of the top-40;
    // single-char fallbacks keep every word encodable
    val words = (0 until 120).map(i => f"w${i}%03dxyz")
    val f = fertility(Seq(words.mkString(" ")))
    assert(f.size == 120)
    assert(f.values.forall(n => n >= 1 && n <= 7), f.values.max.toString)
  }
}
