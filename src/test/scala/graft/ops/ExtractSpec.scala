package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Extract]] — jusText-style main-content extraction on a handcrafted
  * page where every block's fate is checkable by eye. */
class ExtractSpec extends SparkSuite {
  import spark.implicits._

  private val page =
    """<header><a href="/">Home</a> <a href="/x">More</a></header>""" +
      """<nav><ul><li><a href="/l">A quite long navigation label with many words</a></li></ul></nav>""" +
      """<article><p>This is the real article content, long enough to clear the forty character floor.</p>""" +
      """<p>Short.</p>""" +
      """<div class="ad"><a href="/buy">Buy</a></div>""" +
      """<p>Second real paragraph with <b>inline bold</b> markup that also clears the length floor easily.</p></article>""" +
      """<footer>(c) site</footer>"""

  test("chrome drops, content survives, inline tags strip, order holds") {
    val out = Extract.mainContent(Seq((1L, page)).toDF("doc_id", "html"),
        "html", minTextLen = 40, linkNum = 1, linkDen = 2)
      .select("n_blocks", "n_kept", "main_text")
      .as[(Long, Long, String)].collect().head
    assert(out._1 == 7, "seven non-empty blocks on the page")
    assert(out._2 == 2, "exactly the two long low-link paragraphs survive")
    assert(out._3 ==
      "This is the real article content, long enough to clear the forty" +
        " character floor.\n" +
        "Second real paragraph with inline bold markup that also clears" +
        " the length floor easily.")
  }

  test("long but link-dense nav fails density; short header fails length") {
    val bs = Seq((1L, page)).toDF("doc_id", "html")
      .select(explode(Extract.blocks(col("html"))).as("b"))
      .select(col("b.t"), col("b.l")).as[(String, Long)].collect().toSeq
    val nav = bs.find(_._1.startsWith("A quite long navigation")).get
    assert(nav._1.length >= 40 && nav._2 * 2 > nav._1.length,
      "the nav block must be dropped by link density, not by length")
    val header = bs.find(_._1 == "Home More").get
    assert(header._2 == 8, "anchor chars = len(Home)+len(More)")
  }

  test("script/style bodies vanish wholesale; entities decode in kept text") {
    val page =
      """<script>var tracker = "id"; if (x<2) { emit("&amp;"); }</script>""" +
        """<style>.nav { display: none; }</style>""" +
        """<p>Research &amp; development notes &lt;draft&gt; padded to clear the length floor.</p>"""
    val out = Extract.mainContent(Seq((1L, page)).toDF("doc_id", "html"),
        "html", minTextLen = 40, linkNum = 1, linkDen = 2)
      .select("n_blocks", "main_text").as[(Long, String)].collect().head
    assert(out._1 == 1, "script and style must not surface as blocks")
    assert(out._2 ==
      "Research & development notes <draft> padded to clear the length floor.")
  }

  test("links: every href/anchor pair extracted in page order") {
    val html = "<p>x</p><a class=\"n\" href=\"https://a.example/p\">One</a>" +
      "<div><a href=\"/rel?q=1\"> two words </a></div>" +
      "<a rel=\"nofollow\" href=\"HTTP://B.example/\">B</a>" +
      "<a name=\"no-href\">skip</a>"
    val out = Seq((1L, html)).toDF("doc_id", "html")
      .select(explode(Extract.links(col("html"))).as("l"))
      .select("l.href", "l.anchor").as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("https://a.example/p", "One"),
      ("/rel?q=1", "two words"),
      ("HTTP://B.example/", "B")))
  }

  test("pages with no qualifying block yield empty main text, not null") {
    val out = Extract.mainContent(
        Seq((1L, "<nav><a href=\"/\">x</a></nav>")).toDF("doc_id", "html"),
        "html", minTextLen = 40, linkNum = 1, linkDen = 2)
      .select("n_kept", "main_text", "main_len")
      .as[(Long, String, Long)].collect().head
    assert(out == ((0L, "", 0L)))
  }

  test("noindex: robots/googlebot opt-outs detected, benign metas pass") {
    val pages = Seq(
      "<head><meta name=\"robots\" content=\"noindex\"></head>",
      "<head><meta content=\"none\" name=\"googlebot\"></head>", // attr order
      "<head><meta name=\"robots\" content=\"all, noindex\"></head>",
      "<head><meta name=\"robots\" content=\"index, follow\"></head>",
      "<head><meta name=\"keywords\" content=\"noindex\"></head>", // wrong name
      "<head><meta name=\"robots\" content=\"nofollow\"></head>",  // not noindex
      "<head><meta name=\"robots\" content=\"noindexing\"></head>", // word bound
      "<p>no meta at all</p>")
    val got = pages.toDF("html").select(Extract.noindex($"html"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, false, false, false, false, false))
  }
}
