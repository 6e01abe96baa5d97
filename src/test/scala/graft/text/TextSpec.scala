package graft.text

import graft.SparkSpec
import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class PhraseMatchSpec extends SparkSpec {

  test("aho-corasick finds overlapping and nested patterns") {
    val ac = new AhoCorasick(Seq("he", "she", "his", "hers", "war", "ward"))
    assert(ac.matches("ushers").map(Seq("he", "she", "his", "hers", "war",
      "ward")) == Seq("he", "she", "hers"))
    assert(ac.matches("warden").map(Seq("he", "she", "his", "hers", "war",
      "ward")) == Seq("war", "ward"))
    assert(ac.matches("xyz").isEmpty)
    assert(ac.matches("").isEmpty)
  }

  test("phrase match column emits dictionary hits per document") {
    import spark.implicits._
    val df = Seq((1L, "fast join on the window merge path"),
      (2L, "nothing relevant here")).toDF("doc_id", "text")
    val dict = Seq("fast join", "window merge", "group")
    val got = df.select(col("doc_id"),
      PhraseMatch.matchPhrases(spark, dict)(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) == Set("fast join", "window merge"))
    assert(got(2L) == Set.empty[String])
  }
}

class LangIdSpec extends SparkSpec {
  test("language id on representative sentences") {
    assert(LangId.detect(
      "the quick brown fox jumps over the lazy dog and runs into the woods") == "en")
    assert(LangId.detect(
      "der schnelle braune fuchs springt über den faulen hund und rennt in den wald") == "de")
    assert(LangId.detect(
      "le renard brun rapide saute par dessus le chien paresseux dans la forêt") == "fr")
    assert(LangId.detect(
      "el rápido zorro marrón salta sobre el perro perezoso en el bosque") == "es")
    assert(LangId.detect("敏捷的棕色狐狸跳过懒狗") == "zh")
    assert(LangId.detect("素早い茶色のキツネは怠け者の犬を飛び越えます") == "ja")
    assert(LangId.detect("быстрая коричневая лиса прыгает через ленивую собаку") == "ru")
    assert(LangId.detect(
      "la volpe marrone che salta sopra il cane pigro della foresta") == "it")
    assert(LangId.detect(
      "a raposa marrom pula sobre um cão preguiçoso na floresta do norte") == "pt")
    assert(LangId.detect(
      "de snelle bruine vos springt over de luie hond in het bos van een boer") == "nl")
    assert(LangId.detect("빠른 갈색 여우가 게으른 개를 뛰어넘는다") == "ko")
    assert(LangId.detect("الثعلب البني السريع يقفز فوق الكلب الكسول") == "ar")
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
  }
}

class RollingHashSpec extends SparkSpec {

  test("expression value matches the JVM implementation (codegen path)") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "the quick brown fox",
      "ünïcödé ẗêxt", "a" * 10000)
    val df = texts.toDF("t")
    val got = df.select(RollingHash.rolling_hash(col("t"))).collect()
      .map(_.getLong(0))
    val want = texts.map(t => RollingHash.hash(UTF8String.fromString(t)))
    assert(got.toSeq == want)
  }

  test("hash is within the Mersenne field and collision-free on a corpus") {
    val hs = (0 until 1000).map(i =>
      RollingHash.hash(UTF8String.fromString(s"doc $i payload")))
    assert(hs.forall(h => h >= 0 && h < RollingHash.Mod))
    assert(hs.distinct.size == 1000)
  }
}

class HybridRetrievalSpec extends SparkSpec {

  test("rrf fusion reproduces 1/(60+rank) sums from the constituent rankings") {
    val dir = sf("sf0.001")
    val t = graft.Tables(spark, dir)
    val bm = Bm25.topK(t.documents, Seq("spark", "join"), 20)
    val ann = graft.similarity.SimilarityQueries.bruteForceTopK(
      t.embeddings, t.embeddings.filter(col("vec_id") === 0), 20)
    val bmRanks = bm.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val annRanks = ann.collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    val fused = HybridRetrieval.fuse(bm, ann, 60, 10).collect()
    assert(fused.length == 10)
    fused.foreach { r =>
      val (id, rrf) = (r.getLong(0), r.getDouble(1))
      val want = bmRanks.get(id).map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        annRanks.get(id).map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 5e-7, s"doc $id: $rrf vs $want")
    }
    // descending by fused score, and a doc present in BOTH rankings can
    // never rank below one present in only the weaker tail of a single
    // ranking with a worse reciprocal sum — spot the ordering invariant
    val scores = fused.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}

class BpeEncodeSpec extends SparkSpec {
  import graft.functions.BpeEncode

  test("segmenter applies lowest-rank leftmost merges to fixpoint") {
    import spark.implicits._
    val got = Seq("there", "anding", "xyz", "a", "")
      .toDF("w")
      .select(BpeEncode.bpe_encode(col("w")).as("s")).collect()
      .map(_.getSeq[String](0).toList)
    assert(got(0) == List("the", "re"), got(0))   // t+h, th+e, then r+e
    assert(got(1) == List("and", "ing"), got(1))  // i+n, in+g, a+n, an+d
    assert(got(2) == List("x", "y", "z"))         // no rule touches it
    assert(got(3) == List("a"))
    assert(got(4) == Nil)
  }

  test("overlong words bypass the merge search (length cap)") {
    import spark.implicits._
    val big = "th" * (BpeEncode.MaxWordLen / 2 + 8) // > cap, all mergeable
    val got = Seq(big).toDF("w")
      .select(BpeEncode.bpe_encode(col("w")).as("s"))
      .head().getSeq[String](0)
    assert(got.length == big.length, "must stay per-char symbols")
    assert(got.forall(s => s == "t" || s == "h"))
    val small = "th" * 8 // same content under the cap DOES merge
    val merged = Seq(small).toDF("w")
      .select(BpeEncode.bpe_encode(col("w")).as("s"))
      .head().getSeq[String](0)
    assert(merged.length < small.length)
  }

  test("codegen and interpreted paths agree on corpus words") {
    val words = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().limit(500)
    val viaExpr = words.select(col("w"),
        BpeEncode.bpe_encode(col("w")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    viaExpr.foreach { case (w, syms) =>
      val direct = BpeEncode.encode(UTF8String.fromString(w))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toList
      assert(direct == syms, s"$w: $direct vs $syms")
      assert(syms.mkString == w, s"segmentation must losslessly cover $w")
    }
  }
}

/** Collocation mining: the association ratio is exact count algebra. */
class PmiSpec extends SparkSpec {

  test("pmi ratio is the exact count algebra on a known corpus") {
    import spark.implicits._
    // "a b" x6 and "b a" x5 adjacencies in one doc of 12 tokens
    val text = Seq.fill(6)("a b").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("pmi").toString
    Seq((0L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.byName("t_pmi_collocations").run(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // N=11 bigrams; c12(a,b)=6, left c1(a)=6, right c2(b)=6
    assert(got(("a", "b")) == (6L, BigDecimal(6.0 * 11 / 36)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // c12(b,a)=5, c1(b)=5, c2(a)=5 -> 5*11/25 = 2.2
    assert(got(("b", "a")) == (5L, 2.2))
  }
}
