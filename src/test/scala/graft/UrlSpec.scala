package graft

import graft.operators.Url

/** Unit coverage for the URL canonicalizer — the frontier-dedup key
  * derivation. RFC 3986 §6 normalizations plus the documented
  * registrable-domain heuristic.
  */
class UrlSpec extends SparkSpec {

  test("canonicalize: case, default port, dot segments, fragment") {
    assert(Url.canonicalize("HTTP://WWW.Example.COM:80/a/./b/../c?q=1#f")
      .contains("http://www.example.com/a/c?q=1"))
    assert(Url.canonicalize("https://h:443/").contains("https://h/"))
    assert(Url.canonicalize("https://h:8443/x").contains("https://h:8443/x"))
    assert(Url.canonicalize("http://h").contains("http://h/"))
    assert(Url.canonicalize("http://h/a/b/../../../x")
      .contains("http://h/x"))
    assert(Url.canonicalize("ftp://h:21/f").contains("ftp://h/f"))
  }

  test("canonicalize: percent normalization") {
    // unreserved decodes, reserved stays encoded but uppercased
    assert(Url.canonicalize("http://h/%7Euser/%41%2fb")
      .contains("http://h/~user/A%2Fb"))
    // malformed triplet passes through
    assert(Url.canonicalize("http://h/a%zz").contains("http://h/a%zz"))
    assert(Url.canonicalize("http://h/p?x=%2a").contains("http://h/p?x=%2A"))
  }

  test("canonicalize: userinfo kept, IPv6 literal, unparsable -> None") {
    assert(Url.canonicalize("http://u:p@H/x").contains("http://u:p@h/x"))
    assert(Url.canonicalize("http://[2001:DB8::1]:80/x")
      .contains("http://[2001:db8::1]/x"))
    assert(Url.canonicalize("not a url").isEmpty)
    assert(Url.canonicalize("http://").isEmpty)
    assert(Url.canonicalize("http://h:99999/").isEmpty) // port > 65535
    assert(Url.canonicalize("://h/").isEmpty)
  }

  test("registrable domain heuristic") {
    assert(Url.registrableDomain("http://a.b.example.com/")
      .contains("example.com"))
    assert(Url.registrableDomain("http://www.site.co.uk/x")
      .contains("site.co.uk"))
    assert(Url.registrableDomain("http://example.com/").contains("example.com"))
    assert(Url.registrableDomain("http://localhost/").contains("localhost"))
    assert(Url.registrableDomain("http://192.168.0.7/").contains("192.168.0.7"))
    assert(Url.registrableDomain("http://[::1]/").contains("[::1]"))
  }

  test("SQL surface: url_canonical/url_host/url_domain registered") {
    import spark.implicits._
    val got = Seq("HTTP://A.Example.COM:80/x/../y#f", "nope")
      .toDF("u")
      .selectExpr("url_canonical(u)", "url_host(u)", "url_domain(u)")
      .collect()
    assert(got(0).getString(0) == "http://a.example.com/y")
    assert(got(0).getString(1) == "a.example.com")
    assert(got(0).getString(2) == "example.com")
    assert(got(1).isNullAt(0) && got(1).isNullAt(1) && got(1).isNullAt(2))
  }
}
