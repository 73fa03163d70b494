package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines — the per-document
  * normalization every crawl-derived training set runs before
  * domain-level aggregation (source weighting, per-domain caps,
  * dedup-by-canonical-URL): tracking-parameter stripping, canonical
  * form, registered-domain extraction.
  *
  * Scale shape: pure per-row Column compositions over Spark's
  * codegen'd built-ins (`parse_url`, `split`, higher-order `filter`/
  * `array_sort`/`array_join`) — no UDFs, no state, no shuffle; the
  * downstream per-domain aggregate is an ordinary hash group-by. Every
  * step is deterministic string algebra a DuckDB oracle replays
  * exactly.
  */
object Web {

  /** Lowercased host of `url` (scheme://host[:port]/...). */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Registered domain by the 2-label heuristic with a small built-in
    * second-level-suffix list (co.uk / com.au / co.jp style): the last
    * two host labels, or three when the 2-label tail is itself a
    * public second-level suffix. A full public-suffix-list lookup is a
    * broadcast-joinable table at scale; the heuristic covers the
    * overwhelming majority of corpus hosts and is exactly replayable.
    */
  def registeredDomain(url: Column): Column = {
    val labels = split(host(url), "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val sld = Seq("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
      "co.kr", "com.br", "com.cn", "co.in", "co.za")
    when(n <= 2, host(url))
      .when(last2.isin(sld: _*), last3)
      .otherwise(last2)
  }

  /** Query string with tracking parameters removed: any key starting
    * with one of `prefixes` (utm_ campaign tags) or exactly matching
    * one of `keys` (click ids, referrers). Remaining parameters are
    * SORTED — parameter order is transport noise, and a canonical
    * order is what makes canonical-URL dedup keys stable. Empty result
    * → NULL (no '?' in the canonical form).
    */
  def cleanQuery(url: Column,
                 prefixes: Seq[String] = Seq("utm_"),
                 keys: Seq[String] = Seq("ref", "fbclid", "gclid",
                   "mc_cid", "mc_eid")): Column = {
    val q = parse_url(url, lit("QUERY"))
    val kept = filter(split(q, "&"), p => {
      val k = lower(element_at(split(p, "="), 1))
      val isTracking = prefixes.map(pre => k.startsWith(pre))
        .reduce(_ || _) || k.isin(keys: _*)
      !isTracking && p =!= ""
    })
    when(q.isNull || size(kept) === 0, lit(null).cast("string"))
      .otherwise(array_join(array_sort(kept), "&"))
  }

  /** Per-registered-domain document cap (the Gopher/MassiveWeb
    * anti-SEO-farm pass): keep at most `k` documents per domain,
    * preferring longer documents, doc_id ascending as the unique
    * tiebreak. Rows pass through with a `domain` column added.
    *
    * Scale shape: the custom [[graft.plans.TopKPerKey]] operator
    * bounds every input partition to k rows per domain BEFORE the
    * exchange (shuffle volume ≤ k × domains × partitions, not the
    * corpus — the map-side combine stock window functions lack), then
    * the exact per-domain window rank picks the final k.
    */
  def domainCap(docs: org.apache.spark.sql.DataFrame, url: Column,
                k: Int): org.apache.spark.sql.DataFrame = {
    val dd = docs.withColumn("domain", registeredDomain(url))
    val bounded = graft.plans.TopKPerKey(dd, Seq("domain"),
      Seq(("n_chars", false), ("doc_id", true)), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    bounded.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** robots.txt group-aware parse (RFC 9309, the public Robots
    * Exclusion Protocol): returns (user-agent token lowercased,
    * isAllow, path-prefix) rules. Group logic per the RFC — one or
    * more consecutive `User-agent` lines open a group; `Allow` /
    * `Disallow` / `Crawl-delay` lines attach to ALL agents of the
    * current group; a `User-agent` line after rules starts a NEW
    * group (groups never merge). Comments (`#` to EOL) stripped,
    * keys case-insensitive, empty `Disallow:` (allow-all marker)
    * yields no rule, unknown directives and `Sitemap` ignored.
    *
    * Path matching downstream is plain prefix (no `*`/`$` wildcard
    * expansion) — the overwhelming majority of real rules are bare
    * prefixes, and prefix rules keep the crawl-filter join pure
    * `startswith` Column algebra; wildcard rules would need a regex
    * translation layer.
    */
  def parseRobots(txt: String): Vector[(String, Boolean, String)] = {
    val out = Vector.newBuilder[(String, Boolean, String)]
    var uas: List[String] = Nil
    var inRules = false
    txt.split("\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val c = line.indexOf(':')
      if (line.nonEmpty && c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { uas = Nil; inRules = false }
            uas = value.toLowerCase :: uas
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty)
              uas.foreach(u => out += ((u, key == "allow", value)))
          case "crawl-delay" => inRules = true
          case _ => () // sitemap + unknown directives: not group members
        }
      }
    }
    out.result()
  }

  /** Reference decision for one (ua, path) against parsed rules — the
    * semantics the distributed crawl-filter join must reproduce: the
    * group is the agent's own rules if any exist, else the `*` group;
    * within the group the LONGEST matching prefix wins; a length tie
    * goes to Allow; no match (or no group) → allowed. Driver-side
    * helper for specs and tiny rule sets; the p56 query runs the same
    * logic as a broadcast join + max(struct(len, is_allow)) aggregate.
    */
  def robotsAllowed(rules: Seq[(String, Boolean, String)], ua: String,
                    path: String): Boolean = {
    val mine = rules.filter(_._1 == ua.toLowerCase)
    val group = if (mine.nonEmpty) mine else rules.filter(_._1 == "*")
    val matching = group.filter { case (_, _, p) => path.startsWith(p) }
    if (matching.isEmpty) true
    else matching.maxBy { case (_, allow, p) => (p.length, allow) }._2
  }

  /** Canonical URL: lowercase scheme+host, default ports dropped, path
    * kept verbatim (trailing-slash-normalized: bare "" → "/"), cleaned
    * sorted query, fragment dropped. The stable key for URL-level
    * dedup and the input to per-domain uniqueness counts.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val rawPath = parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", "/").otherwise(rawPath)
    val cq = cleanQuery(url)
    concat(scheme, lit("://"), host(url), path,
      when(cq.isNull, "").otherwise(concat(lit("?"), cq)))
  }
}
