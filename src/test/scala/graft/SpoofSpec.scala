package graft

import graft.operators.Spoof

/** Unit coverage for the Unicode spoof audit — homoglyph skeleton,
  * mixed-script token detection, invisible-character counting.
  * Non-ASCII test inputs use \u escapes so the fixtures are
  * byte-reviewable.
  */
class SpoofSpec extends SparkSpec {

  test("skeleton: Cyrillic and Greek lookalikes map to Latin") {
    // p<CYRILLIC a>yp<CYRILLIC a>l
    assert(Spoof.skeleton("pаypаl") == "paypal")
    // Greek capital ALPHA BETA EPSILON
    assert(Spoof.skeleton("ΑΒΕ") == "ABE")
    // Cyrillic ES TE O ER
    assert(Spoof.skeleton("СТОР") == "CTOP")
    // Cyrillic PE is NOT in the documented subset — passes through
    assert(Spoof.skeleton("П") == "П")
    assert(Spoof.skeleton("plain ascii 42") == "plain ascii 42")
  }

  test("skeleton: NFKC first, invisibles stripped") {
    assert(Spoof.skeleton("ＡＢ") == "AB")   // fullwidth A B
    assert(Spoof.skeleton("ﬁle") == "file")     // fi ligature
    assert(Spoof.skeleton("fr​ee") == "free")   // ZWSP
    assert(Spoof.skeleton("so­ft") == "soft")   // soft hyphen
    assert(Spoof.skeleton("a﻿b⁠c") == "abc") // BOM, word joiner
  }

  test("mixed-script tokens: >=2 scripts among letters, COMMON neutral") {
    assert(Spoof.mixedScriptTokens("pаypal account") == 1L)
    assert(Spoof.mixedScriptTokens("plain words only") == 0L)
    // all-Greek token is single-script, not mixed (BETA ALPHA NU KAPPA)
    assert(Spoof.mixedScriptTokens("ΒΑΝΚ alert") == 0L)
    // digits and punctuation are neutral
    assert(Spoof.mixedScriptTokens("abc123, def!") == 0L)
    // Cyrillic ES inside a Latin token + Greek OMICRON inside another
    assert(Spoof.mixedScriptTokens("abсd efοg") == 2L)
    assert(Spoof.mixedScriptTokens("") == 0L)
  }

  test("invisible count: counted before normalization") {
    assert(Spoof.invisibleCount("fr​ee ‌‍") == 3L)
    assert(Spoof.invisibleCount("﻿bom ­soft ⁠wj") == 3L)
    assert(Spoof.invisibleCount("clean") == 0L)
  }

  test("SQL surface: spoof_skeleton/mixed_script_tokens/invisible_count") {
    import spark.implicits._
    val got = Seq("pаypal l​ink", "ok text")
      .toDF("t")
      .selectExpr("spoof_skeleton(t) AS sk", "mixed_script_tokens(t) AS m",
        "invisible_count(t) AS iv")
      .collect()
    assert(got(0).getString(0) == "paypal link")
    assert(got(0).getLong(1) == 1L)
    assert(got(0).getLong(2) == 1L)
    assert(got(1).getString(0) == "ok text")
    assert(got(1).getLong(1) == 0L)
    assert(got(1).getLong(2) == 0L)
  }
}
