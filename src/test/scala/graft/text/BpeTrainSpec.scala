package graft.text

import graft.SparkSpec

/** BPE training on a corpus whose merge sequence is hand-traceable. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-derived merge sequence with exact counts") {
    // vocab {aaab: 3}. Round 1: pairs (a,a)×2·3=6, (a,b)·3=3 → merge
    // (a,a). Single-pass apply: " a a a b " → "aa a b" (back-to-back
    // occurrences share a separator; the second survives — the
    // documented single-pass semantic). Round 2: (aa,a)=3, (a,b)=3 →
    // tie broken by l asc: (a,b). Round 3: (aa,ab)=3.
    val docs = Seq((1L, "aaab aaab aaab", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = BpeTrain.train(docs, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "a", "a", 6L), (2, "a", "b", 3L), (3, "aa", "ab", 3L)),
      s"got ${got.toSeq}")
  }

  test("merges compress the corpus vocabulary monotonically") {
    // on richer text, each adopted merge strictly reduces the total
    // symbol count of the vocabulary it was counted on
    val docs = Seq(
      (1L, "spark spark sparkle parking", "en", "s", 27L),
      (2L, "park parking sparkle spark", "en", "s", 26L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = BpeTrain.train(docs, rounds = 5).collect()
    assert(merges.length == 5)
    // counts are non-increasing across rounds of a greedy trainer on a
    // fixed corpus? Not necessarily (a merge can CREATE a new frequent
    // pair) — but every adopted merge must have been observed at least
    // twice here, and rounds stay well-formed
    merges.foreach { r =>
      assert(r.getLong(3) >= 2, s"round ${r.getInt(0)}: cnt ${r.getLong(3)}")
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }
}
