package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported 1:1 from the reference's
  * tests/test_text_cleaning_utils.py — every assertion below is the
  * reference's own expected output.
  */
class TextCleaningSpec extends AnyFunSuite {
  import TextCleaning._

  test("lemmatise: plural collapses to the singular form") {
    assert(lemmatise("policies") == lemmatise("policy"))
    assert(lemmatise("skills") == "skill")
    assert(lemmatise("skills.") == "skills.") // punctuation blocks it
    assert(lemmatise("Skills") == "Skills") // capitals block it
    // WordNet irregular-form table (noun pos, the reference's only use)
    assert(lemmatise("women") == "woman")
    assert(lemmatise("criteria") == "criterion")
    assert(lemmatise("matrices") == "matrix")
    assert(lemmatise("wolves") == "wolf")
    assert(lemmatise("businessmen") == "businessman")
    // plural-is-a-lemma cases stay put, like WordNet's min-length pick
    assert(lemmatise("data") == "data")
    assert(lemmatise("media") == "media")
    // index-protected words the suffix rules would mangle
    assert(lemmatise("series") == "series")
    assert(lemmatise("physics") == "physics")
    assert(lemmatise("gas") == "gas")
    assert(lemmatise("lens") == "lens")
    // regular suffix ladder still applies outside the table
    assert(lemmatise("boxes") == "box")
    assert(lemmatise("classes") == "class")
    assert(lemmatise("sizes") == "size")
  }

  test("clean_punctuation golden cases") {
    assert(cleanPunctuation("• ‣ ◦ ⁃ ∙") == ", , , , ,")
    assert(cleanPunctuation(": / -") == "     ")
    assert(cleanPunctuation("back\\slash") == "back slash")
    assert(cleanPunctuation("Preserves commas, semicollons; full stops.")
      == "Preserves commas, semicollons; full stops.")
  }

  test("remove_punctuation golden cases incl. preserved symbols") {
    assert(removePunctuation("• ‣ ◦ ⁃ ∙") == "         ")
    assert(removePunctuation(": / -") == "     ")
    assert(removePunctuation("back\\slash") == "back slash")
    assert(removePunctuation("Removes commas, semicollons; full stops.")
      == "Removes commas  semicollons  full stops ")
    assert(removePunctuation("5+") == "5+")
    assert(removePunctuation("C++") == "C++")
    assert(removePunctuation("C#") == "C#")
  }

  test("pad / unpad punctuation golden cases") {
    assert(padPunctuation("Pad around, most. of+ the; punctuation\\ marks/")
      == "Pad around ,  most .  of+ the ;  punctuation \\  marks / ")
    assert(unpadPunctuation("Remove ; padding / around , punctation . marks")
      == "Remove; padding/ around, punctation. marks")
  }

  test("detect_sentences splits camel-case sentence boundaries") {
    assert(detectSentences("Detect skillsAssess demand")
      == "Detect skills. Assess demand")
    assert(detectSentences("USA") == "USA")
  }

  test("lemmatize_paragraph golden cases") {
    assert(lemmatizeParagraph("skills") == "skill")
    assert(lemmatizeParagraph("skills.") == "skills.")
    assert(lemmatizeParagraph("Skills") == "Skills")
  }

  test("remove_stopwords and clean_up golden cases") {
    assert(removeStopwords("an apple and a tomato") == "apple tomato")
    assert(cleanUp("an     apple  and a  tomato  ") == "an apple and a tomato")
    assert(cleanUp("   ") == "")
  }

  test("clean_text full pipeline golden cases") {
    assert(cleanText("I went to the shop. I bought apples, oranges and a tomato")
      == "went shop bought apple orange tomato")
    assert(cleanText("I went to the shop. I bought apples, oranges and a tomato",
      keepPunct = true) == "went shop. bought apple, orange tomato")
  }

  test("clean_chunks golden cases") {
    assert(cleanChunks("Apples, tomatos") == "apple tomato")
    assert(cleanChunks(".NET") == "net")
  }

  test("split_string golden cases") {
    assert(splitString("First line\nSecond line")
      == Seq("First line", "Second line"))
    assert(splitString("First sentence. Second sentence", ".")
      == Seq("First sentence", "Second sentence"))
    assert(splitString(null) == Seq.empty)
  }
}
