package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher — the Spark re-expression of the
  * reference's spaCy PhraseMatcher text-containment join (SURVEY §2.3 J9;
  * ref flows/enrich/labs/skills/skills_detection_utils.py:470-538).
  *
  * The automaton is built once on the driver and broadcast; the UDF emits
  * the distinct dictionary phrases contained in each document in a single
  * O(|text|) pass regardless of dictionary size — at 100 TB this is a
  * map-only stage (no shuffle, no per-phrase scan).
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  private val goto = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val out = mutable.ArrayBuffer(mutable.Set.empty[Int])
  private val fail = mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var s = 0
    p.foreach { ch =>
      s = goto(s).getOrElseUpdate(ch, {
        goto += mutable.Map.empty[Char, Int]
        out += mutable.Set.empty[Int]
        fail += 0
        goto.size - 1
      })
    }
    out(s) += idx
  }
  // BFS failure links
  locally {
    val queue = mutable.Queue.empty[Int]
    goto(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (ch, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !goto(f).contains(ch)) f = fail(f)
        val cand = goto(f).getOrElse(ch, 0)
        fail(s) = if (cand != s) cand else 0
        out(s) ++= out(fail(s))
      }
    }
  }

  /** Indices of all patterns occurring in `text` (distinct). */
  def matches(text: String): Seq[Int] = {
    val found = mutable.SortedSet.empty[Int]
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !goto(s).contains(ch)) s = fail(s)
      s = goto(s).getOrElse(ch, 0)
      found ++= out(s)
      i += 1
    }
    found.toSeq
  }
}

object PhraseMatch {
  /** Column of matched phrases (array<string>) for a text column. */
  def matchPhrases(spark: SparkSession, dictionary: Seq[String])(
      text: Column): Column = {
    val ac = new AhoCorasick(dictionary)
    val bAc = spark.sparkContext.broadcast(ac)
    val bDict = spark.sparkContext.broadcast(dictionary.toIndexedSeq)
    val f = udf((t: String) =>
      if (t == null) Seq.empty[String]
      else bAc.value.matches(t).map(bDict.value))
    f(text)
  }
}
