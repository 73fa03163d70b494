package graft

import org.apache.spark.sql.functions.col
import graft.operators.Sentences

/** Sentence segmentation semantics on inputs beyond the constructed
  * t33 corpus: abbreviation protection, terminal retention, whitespace
  * runs, boundary cases.
  */
class SentencesSpec extends SparkSpec {

  private def split(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(Sentences.split(col("t")).as("s"))
      .collect()(0).getSeq[String](0)
  }

  test("terminals stay with their sentence; whitespace runs consumed") {
    assert(split("One. Two!  Three?\n\nFour.") ==
      Seq("One.", "Two!", "Three?", "Four."))
  }

  test("protected abbreviations never split") {
    assert(split("Dr. Smith met Mr. Jones. They talked, e.g. about tea.") ==
      Seq("Dr. Smith met Mr. Jones.", "They talked, e.g. about tea."))
  }

  test("no terminal -> one sentence; empty string -> one empty element") {
    assert(split("no terminal here") == Seq("no terminal here"))
    assert(split("") == Seq(""))
  }

  test("terminal at end produces no trailing empty sentence") {
    assert(split("Only one.") == Seq("Only one."))
  }

  test("a word merely ending in an abbreviation string still splits") {
    // 'fetc.' ends in 'etc.' but IS a sentence end — protection is
    // word-boundary-anchored
    assert(split("I fetc. Then left.") == Seq("I fetc.", "Then left."))
    assert(split("He said adr. Next one.") ==
      Seq("He said adr.", "Next one."))
  }

  test("abbreviation at sentence end still restores its dot") {
    // 'etc.' is protected, so the split happens only at '!'
    assert(split("Tea, coffee, etc. were served! Yes.") ==
      Seq("Tea, coffee, etc. were served!", "Yes."))
  }
}
