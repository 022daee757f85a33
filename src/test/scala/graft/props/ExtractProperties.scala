package graft.props

import graft.SparkSuite
import graft.ops.Extract
import org.apache.spark.sql.functions._

/** Generated-input differential properties for HTML main-content
  * extraction: a plain-Scala reference (same regexes, same rules) recomputes
  * every page's answer on randomized pages, and two structural laws hold by
  * construction — surrounding a page with more link-only chrome never
  * changes its extracted content, and extraction is a fixpoint (extracting
  * the re-wrapped main text returns it unchanged). */
class ExtractProperties extends SparkSuite {
  import spark.implicits._

  private val minLen = 40

  private def refExtract(html: String): (Long, Long, String) = {
    val anchorRe = "<a[^>]*>([^<]*)</a>".r
    val cleaned = html
      .replaceAll("(?s)<script[^>]*>.*?</script>", " ")
      .replaceAll("(?s)<style[^>]*>.*?</style>", " ")
    def decode(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    val items = cleaned.split(Extract.blockTagRe, -1).toSeq
      .map { raw =>
        val t = decode(raw.replaceAll("<[^>]*>", " "))
          .replaceAll("\\s+", " ").trim
        (t, anchorRe.findAllMatchIn(raw).map(_.group(1).length).sum)
      }
      .filter(_._1.nonEmpty)
    val kept = items.filter { case (t, l) =>
      t.length >= minLen && l * 2 <= t.length }
    (items.size.toLong, kept.size.toLong, kept.map(_._1).mkString("\n"))
  }

  private def pages(seed: Long, n: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    def word() = (1 to (2 + r.nextInt(7)))
      .map(_ => ('a' + r.nextInt(26)).toChar).mkString
    def sentence(k: Int) = (1 to k).map(_ => word()).mkString(" ")
    def block(): String = r.nextInt(7) match {
      case 0 => s"<p>${sentence(5 + r.nextInt(40))}</p>"
      case 1 => // content with inline markup and entities
        s"<p>${sentence(3 + r.nextInt(20))} &amp; <b>${word()}</b> " +
          s"&lt;${word()}&gt; ${sentence(2 + r.nextInt(20))}</p>"
      case 2 => s"""<li><a href="/${word()}">${sentence(1 + r.nextInt(8))}</a></li>"""
      case 3 => s"""<div class="ad"><a href="/buy">${sentence(2 + r.nextInt(4))}</a></div>"""
      case 4 => // code elements: character data is NOT content
        s"""<script>var ${word()} = "${word()}"; if (1<2) { ${word()}(); }</script>"""
      case 5 => s"<style>.${word()} { color: red; }</style>"
      case _ => s"<h2>${sentence(1 + r.nextInt(5))}</h2>"
    }
    (0 until n).map { i =>
      val body = (1 to (3 + r.nextInt(9))).map(_ => block()).mkString
      (i.toLong,
        s"""<header><a href="/">${word()}</a> <a href="/x">${word()}</a></header>""" +
          body + s"<footer>(c) ${word()}</footer>")
    }
  }

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Extract.mainContent(rows.toDF("doc_id", "html"), "html",
        minTextLen = minLen, linkNum = 1, linkDen = 2)
      .select("doc_id", "n_blocks", "n_kept", "main_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("extraction equals the scalar reference on random pages") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val rows = pages(seed, 30)
      val got = run(rows)
      rows.foreach { case (id, html) =>
        assert(got(id) == refExtract(html), s"seed $seed page $id diverged")
      }
    }
  }

  test("more link-only chrome never changes the extracted content") {
    val chrome =
      """<nav><ul><li><a href="/a">more links here</a></li>""" +
        """<li><a href="/b">and even more of them</a></li></ul></nav>"""
    val rows = pages(21L, 25)
    val plain = run(rows)
    val wrapped = run(rows.map { case (id, h) => (id, chrome + h + chrome) })
    rows.foreach { case (id, _) =>
      assert(wrapped(id)._3 == plain(id)._3,
        s"chrome changed page $id's main text")
      assert(wrapped(id)._1 > plain(id)._1,
        "the chrome blocks must still be SEEN (counted), just not kept")
    }
  }

  test("extraction is a fixpoint: re-embedding the main text returns it") {
    // extracted text is PLAIN text (entities decoded), so embedding it back
    // into HTML requires the inverse escaping — &amp; first, then the angle
    // brackets the decode may have introduced
    def escape(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val rows = pages(31L, 25)
    val extracted = run(rows)
    val nonEmpty = rows.collect {
      case (id, _) if extracted(id)._3.nonEmpty =>
        (id, "<p>" + extracted(id)._3.split("\n").map(escape)
          .mkString("</p><p>") + "</p>")
    }
    assert(nonEmpty.nonEmpty, "generator produced no kept content at all")
    val again = run(nonEmpty)
    nonEmpty.foreach { case (id, _) =>
      assert(again(id)._3 == extracted(id)._3, s"page $id not a fixpoint")
      assert(again(id)._1 == again(id)._2, "every re-wrapped block must be kept")
    }
  }
}
