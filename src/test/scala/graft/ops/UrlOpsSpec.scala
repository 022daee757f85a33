package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[UrlOps]] — canonicalization invariants, registered-domain
  * extraction, URL dedup, and the per-domain cap. */
class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[String] =
    urls.toSeq.toDF("url").select(UrlOps.canonicalize(col("url")))
      .as[String].collect().toSeq

  test("canonicalize: case, www, default ports, slashes, params, fragment") {
    val got = canonOf(
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&id=3#frag",
      "http://example.com:80/a/b?id=3&gclid=z",
      "https://example.com:8443/a/b?id=3",
      "http://sub.example.com/p/",
      "https://example.com/p?utm_source=x&utm_medium=y")
    assert(got == Seq(
      "https://example.com/a/b?id=3",
      "http://example.com/a/b?id=3",
      "https://example.com:8443/a/b?id=3",
      "http://sub.example.com/p",
      "https://example.com/p"))
  }

  test("canonicalize is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&id=3#frag",
      "http://example.com:8080//x//y/?ref=r&q=1#s")
    val once  = canonOf(messy: _*)
    val twice = canonOf(once: _*)
    assert(once == twice)
  }

  test("non-default port and param order survive canonicalization") {
    assert(canonOf("http://h.example.com:8080/p?b=2&a=1") ==
      Seq("http://h.example.com:8080/p?b=2&a=1"))
  }

  test("registered domain honors two-level public suffixes") {
    val got = Seq("blog.sample.co.uk", "news.example.com", "example.org",
      "sample.co.uk", "a.b.c.example.com", "localhost")
      .toDF("h").select(UrlOps.registeredDomain(col("h")))
      .as[String].collect().toSeq
    assert(got == Seq("sample.co.uk", "example.com", "example.org",
      "sample.co.uk", "example.com", "localhost"))
  }

  test("dedupByUrl collapses syntactic variants onto one keeper") {
    val docs = Seq(
      (1L, "HTTP://WWW.Example.com:80/x/?utm_source=a"),
      (2L, "http://example.com/x"),
      (3L, "https://example.com/x"), // scheme differs → distinct page
      (4L, "http://example.com/y#frag"),
      (5L, "http://example.com/y?fbclid=abc"))
      .toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(docs, "doc_id", "url")
      .orderBy("canon_url")
      .select("canon_url", "keeper", "n_dups")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("http://example.com/x", 1L, 2L),
      ("http://example.com/y", 4L, 2L),
      ("https://example.com/x", 3L, 1L)))
  }

  test("domainCap keeps top-N per registered domain, deterministic ties") {
    val docs = Seq(
      (1L, "http://a.example.com/1", 100L),
      (2L, "http://b.example.com/2", 300L),
      (3L, "http://example.com/3", 200L),
      (4L, "http://example.com/4", 200L), // tie with 3 → doc_id breaks it
      (5L, "http://other.net/5", 50L))
      .toDF("doc_id", "url", "n_chars")
    val capped = UrlOps.domainCap(docs, "doc_id", "url", "n_chars", cap = 2)
    val kept = capped.where(col("kept")).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L, 3L, 5L),
      "example.com keeps 300-char doc 2 and the doc_id-smaller 200-char doc 3")
    val rep = UrlOps.domainCapReport(capped).orderBy("registered_domain")
      .as[(String, Long, Long)].collect().toSeq
    assert(rep == Seq(("example.com", 4L, 2L), ("other.net", 1L, 1L)))
  }

  test("urlFilter: domain block wins over path rules; canon variants can't dodge") {
    val docs = Seq(
      (1L, "http://bad.example.net/fine"),
      (2L, "https://ok.example.org/tag/x"),          // path rule
      (3L, "HTTPS://WWW.OK.example.org/tag//x/"),    // same page, messy
      (4L, "https://ok.example.org/article"),
      (5L, "http://bad.example.net/tag/x"))          // both → domain
      .toDF("doc_id", "url")
    val out = UrlOps.urlFilter(docs, "url",
        blockedDomains = Seq("example.net"),
        pathPatterns = Seq("/tag/"))
      .orderBy("doc_id").select("url_block_reason", "url_keep")
      .as[(String, Boolean)].collect().toSeq
    assert(out == Seq(("domain", false), ("path", false), ("path", false),
      (null, true), ("domain", false)))
  }

  test("domainQuality: whole-domain verdict by integer mean threshold") {
    val docs = Seq(
      (1L, "http://good.example.com/a", 400L),
      (2L, "http://good.example.com/b", 200L),   // mean 300 ≥ 250 → keep
      (3L, "http://spam.example.net/a", 240L),
      (4L, "http://spam.example.net/b", 200L))   // mean 220 < 250 → drop
      .toDF("doc_id", "url", "sig")
    val out = UrlOps.domainQuality(docs, "url", $"sig",
        thrNum = 250L, thrDen = 1L)
      .orderBy("registered_domain")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(("example.com", 2L, 600L, true),
      ("example.net", 2L, 440L, false)))
    // the rollup is one map-side-combined aggregate
    val p = UrlOps.domainQuality(docs, "url", $"sig", 250L, 1L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial"), "signal sum must map-side combine")
  }

  test("anchorStats: canonical variants merge; modal anchor ties break lexically") {
    val links = Seq(
      (1L, "https://t.example.com/p", "Home"),
      (2L, "HTTPS://WWW.T.EXAMPLE.COM/p/?utm_source=x", "Docs"), // same page
      (3L, "https://t.example.com/p", "Docs"),
      (3L, "https://t.example.com/p", "Home"),  // 2-2 tie → 'Docs' (lex)
      (4L, "https://other.net/q", "Other"))
      .toDF("doc_id", "url", "anchor")
    val out = UrlOps.anchorStats(links, "doc_id", "url", "anchor")
      .orderBy("canon_url")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("https://other.net/q", 1L, 1L, 1L, "Other"),
      ("https://t.example.com/p", 4L, 3L, 2L, "Docs")))
  }

  test("anchorStats elections are aggregates, not windows") {
    val links = Seq((1L, "https://a.com/x", "a")).toDF("doc_id", "url", "anchor")
    val p = UrlOps.anchorStats(links, "doc_id", "url", "anchor")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window sort expected:\n$p")
  }

  test("canonicalization is scan-stage only: zero exchanges in the plan") {
    val docs = Seq((1L, "http://example.com/x")).toDF("doc_id", "url")
    val p = UrlOps.withUrlColumns(docs, "url")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }
}
