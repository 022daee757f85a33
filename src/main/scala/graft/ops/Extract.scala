package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the trafilatura/jusText slot of a
  * web-corpus pipeline, and the single most-used operator UPSTREAM of
  * every quality rule: strip a page's navigation / header / footer /
  * advertising chrome BEFORE Gopher scoring, dedup, or tokenization ever
  * see it. Rule zero of the [[FilterCascade]].
  *
  * Semantics (jusText's core heuristic, kept deliberately closed-form so
  * an SQL oracle replays it bit-for-bit):
  *   1. '''Segment''' the page into blocks at block-level tag boundaries
  *      (`p, div, h1-6, li, ul, ol, br, nav, header, footer, aside,
  *      article, section, main, blockquote, table, tr, td`).
  *   2. Per block, '''strip''' remaining (inline) tags to spaces and
  *      collapse whitespace → the block's text; '''measure''' its anchor
  *      text (characters inside `<a>…</a>`).
  *   3. '''Classify''': a block is main content iff its text is at least
  *      `minTextLen` chars AND its link density (anchor chars / text
  *      chars) is at most `linkNum/linkDen` — short blocks are chrome
  *      (headers, copyright lines), link-dense blocks are navigation/ads.
  *      The density test is the INTEGER cross-multiplication
  *      `link_len · linkDen ≤ text_len · linkNum` — no float ratio, so
  *      the decision is exactly reproducible.
  *   4. '''Join''' the kept blocks' texts with newlines, in page order.
  *
  * '''Scale shape.''' Pure scan-stage expression work — split/transform/
  * filter/aggregate higher-order functions over each row's own string, no
  * UDF, no shuffle, no join: the plan must show zero Exchange (audited).
  * At 100 TB this is the same map-only pass a payload decode is.
  *
  * Reference analog: consumer-side payload decode — de-batch / de-chunk /
  * schema-decode before the application sees the record
  * (pulsar-client/src/main/java/org/apache/pulsar/client/impl/ConsumerImpl.java:1365+);
  * extraction is exactly that decode step for web documents.
  *
  * Regex subset note: patterns avoid lookaround, backreferences and
  * case-insensitivity flags so Java regex (Spark) and RE2 (DuckDB) agree;
  * fixtures and real-world normalizers lowercase tags first.
  */
object Extract {

  /** Block-level tag boundary — the segmentation delimiter. */
  val blockTagRe: String =
    "</?(?:p|div|h[1-6]|li|ul|ol|br|nav|header|footer|aside|article" +
      "|section|main|blockquote|table|tr|td)(?: [^>]*)?/?>"

  private val anchorRe = "<a[^>]*>([^<]*)</a>"

  /** script/style elements vanish WHOLESALE — their character data is code,
    * not content, and tag-stripping alone would keep it as "text". (?s) so
    * the body may span lines; lazy so adjacent elements don't merge. Both
    * constructs are RE2- and Java-regex-compatible. */
  private def dropCodeElements(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")

  /** The named character references that actually occur in page text,
    * decoded in the standard order (&amp; last, so `&amp;lt;` correctly
    * yields the literal `&lt;`); &nbsp; becomes a plain space BEFORE the
    * whitespace collapse so it merges with its neighbors. */
  private def decodeEntities(t: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(t) { case (c, (e, r)) => regexp_replace(c, e, r) }

  /** A block's visible text: inline tags to spaces, entities decoded,
    * whitespace collapsed. */
  private def blockText(raw: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(raw, "<[^>]*>", " ")), "\\s+", " "))

  /** Total anchor-text characters of a block (its `<a>…</a>` contents). */
  private def anchorLen(raw: Column): Column =
    aggregate(regexp_extract_all(raw, lit(anchorRe), lit(1)), lit(0L),
      (acc, x) => acc + length(x).cast("long"))

  /** The page's non-empty blocks as (t = text, l = anchor chars), in page
    * order. script/style bodies are dropped before segmentation. */
  def blocks(html: Column): Column =
    filter(
      transform(split(dropCodeElements(html), blockTagRe), b =>
        struct(blockText(b).as("t"), anchorLen(b).as("l"))),
      s => s.getField("t") =!= "")

  /** Main-content keep decision for one block struct. */
  private def isMain(s: Column, minTextLen: Int, linkNum: Int,
                     linkDen: Int): Column =
    length(s.getField("t")) >= minTextLen &&
      s.getField("l") * linkDen <= length(s.getField("t")).cast("long") * linkNum

  /** Extract main content from `htmlCol`: appends
    * (n_blocks, n_kept, main_text, main_len) to `docs`. */
  def mainContent(docs: DataFrame, htmlCol: String, minTextLen: Int,
                  linkNum: Int, linkDen: Int): DataFrame = {
    val bs = blocks(col(htmlCol))
    val kept = filter(bs, s => isMain(s, minTextLen, linkNum, linkDen))
    docs
      .withColumn("n_blocks", size(bs).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("main_text",
        array_join(transform(kept, _.getField("t")), "\n"))
      .withColumn("main_len", length(col("main_text")).cast("long"))
  }

  /** Outlink tags of a page: each `<a … href="…" …>text</a>` as a
    * (href, anchor) struct, in page order — the link-graph feed
    * ([[UrlOps.canonicalize]] → registered domain → [[PageRank]]): the
    * crawl-side step that turns pages into edges. Tag-scoped regexes
    * (extract whole tags first, then pull the attribute/text from each)
    * so both engines parse identically. */
  def links(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("<a [^>]*href=\"[^\"]*\"[^>]*>[^<]*</a>"), lit(0)),
      tag => struct(
        regexp_extract(tag, "href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_extract(tag, ">([^<]*)</a>", 1)).as("anchor")))

  /** Publisher opt-out compliance: true iff the page carries a
    * `<meta name="robots" …>` (or googlebot) directive whose content
    * includes `noindex` or `none` — the pages a compliant corpus build
    * must EXCLUDE regardless of their quality score. Tag-scoped regex
    * (whole meta tags first, then the content attribute of each), both
    * attribute orders accepted, lowercase per the fixture/normalizer
    * contract. Scan-stage expression — composes with [[mainContent]]
    * in the same map-only pass. */
  def noindex(html: Column): Column =
    exists(
      regexp_extract_all(html,
        lit("<meta [^>]*name=\"(?:robots|googlebot)\"[^>]*>"), lit(0)),
      tag => regexp_extract(tag, "content=\"([^\"]*)\"", 1)
        .rlike("(?:^|[, ])(?:noindex|none)(?:$|[, ])"))

  /** The extracted main text as a single column expression — the form the
    * [[FilterCascade]] consumes as rule zero (extract, then judge quality
    * on what a reader actually sees). */
  def mainTextExpr(html: Column, minTextLen: Int, linkNum: Int,
                   linkDen: Int): Column =
    array_join(
      transform(
        filter(blocks(html), s => isMain(s, minTextLen, linkNum, linkDen)),
        _.getField("t")), "\n")
}
