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

  test("resolve: RFC 3986 §5.4 normal examples") {
    val base = "http://a/b/c/d;p?q"
    def r(ref: String) = Url.resolve(base, ref)
    assert(r("g").contains("http://a/b/c/g"))
    assert(r("./g").contains("http://a/b/c/g"))
    assert(r("g/").contains("http://a/b/c/g/"))
    assert(r("/g").contains("http://a/g"))
    // RFC says "http://g"; we additionally apply the §6.2.3 empty-path
    // normalization the canonicalizer always does
    assert(r("//g").contains("http://g/"))
    assert(r("?y").contains("http://a/b/c/d;p?y"))
    assert(r("g?y").contains("http://a/b/c/g?y"))
    assert(r("#s").contains("http://a/b/c/d;p?q")) // fragment dropped
    assert(r(";x").contains("http://a/b/c/;x"))
    assert(r("").contains("http://a/b/c/d;p?q"))
    assert(r(".").contains("http://a/b/c/"))
    assert(r("..").contains("http://a/b/"))
    assert(r("../g").contains("http://a/b/g"))
    assert(r("../..").contains("http://a/"))
    assert(r("../../g").contains("http://a/g"))
  }

  test("resolve: RFC 3986 §5.4 abnormal examples + non-hierarchical") {
    val base = "http://a/b/c/d;p?q"
    def r(ref: String) = Url.resolve(base, ref)
    assert(r("../../../g").contains("http://a/g"))
    assert(r("../../../../g").contains("http://a/g"))
    assert(r("/./g").contains("http://a/g"))
    assert(r("/../g").contains("http://a/g"))
    assert(r("g.").contains("http://a/b/c/g."))
    assert(r(".g").contains("http://a/b/c/.g"))
    assert(r("g..").contains("http://a/b/c/g.."))
    assert(r("..g").contains("http://a/b/c/..g"))
    assert(r("./../g").contains("http://a/b/g"))
    assert(r("g;x=1/./y").contains("http://a/b/c/g;x=1/y"))
    assert(r("g?y/./x").contains("http://a/b/c/g?y/./x"))
    // non-hierarchical URIs → None (null-on-fail; crawl filters drop)
    assert(r("g:h").isEmpty)
    assert(r("mailto:x@y.com").isEmpty)
    assert(r("javascript:void(0)").isEmpty)
    // absolute hierarchical ref resolves on its own, canonicalized
    assert(r("HTTPS://X.Org:443/p/../q#f").contains("https://x.org/q"))
    // unparsable base → None even for a resolvable-looking ref
    assert(Url.resolve("not a url", "/g").isEmpty)
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

  test("SQL surface: url_resolve registered, null-strict") {
    import spark.implicits._
    val got = Seq(
      ("http://a/b/c/d", "../g"),
      ("http://a/b/c/d", "mailto:x"),
      ("bad base", "/g"))
      .toDF("base", "ref")
      .selectExpr("url_resolve(base, ref) AS r")
      .collect()
    assert(got(0).getString(0) == "http://a/b/g")
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
  }
}
