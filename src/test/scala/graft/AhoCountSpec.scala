package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AhoCountUtil

/** Aho-Corasick automaton semantics: all-occurrence counting including
  * overlapping, nested, and shared-suffix matches; byte-exact UTF-8.
  */
class AhoCountSpec extends AnyFunSuite {

  private def count(pats: Seq[String], text: String): Map[String, Long] = {
    val a = new AhoCountUtil.Automaton(pats)
    pats.zip(a.counts(UTF8String.fromString(text))).toMap
  }

  test("classic ushers: nested and suffix matches all fire") {
    val c = count(Seq("he", "she", "his", "hers"), "ushers")
    assert(c == Map("he" -> 1L, "she" -> 1L, "his" -> 0L, "hers" -> 1L))
  }

  test("overlapping occurrences of a periodic pattern") {
    assert(count(Seq("aa"), "aaaa")("aa") == 3L)
  }

  test("multiple occurrences and pattern-inside-pattern") {
    val c = count(Seq("ab", "abab"), "abababab")
    assert(c("ab") == 4L && c("abab") == 3L)
  }

  test("utf-8 multibyte patterns never alias continuation bytes") {
    // é = C3 A9; pattern "é" must not fire inside a different
    // codepoint sharing the A9 byte (e.g. © = C2 A9)
    val c = count(Seq("é", "café"), "café © café")
    assert(c("é") == 2L && c("café") == 2L)
  }

  test("empty text and absent patterns") {
    val c = count(Seq("x", "yz"), "")
    assert(c.values.forall(_ == 0L))
  }

  test("duplicate and empty patterns are rejected loudly") {
    // a duplicate would share a trie terminal and silently zero the
    // earlier entry's count
    intercept[IllegalArgumentException] {
      new AhoCountUtil.Automaton(Seq("the", "the"))
    }
    intercept[IllegalArgumentException] {
      new AhoCountUtil.Automaton(Seq("a", ""))
    }
  }
}
