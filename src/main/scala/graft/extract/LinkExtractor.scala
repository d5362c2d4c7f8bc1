package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink extraction from raw page HTML — the web-graph feeder of a
  * Common-Crawl-style pipeline (WAT-record extraction): every `<a>`
  * tag becomes one (page url, href, resolved absolute url, anchor
  * text, nofollow) row, ready to collapse into the host-level edge
  * table that [[graft.ops.WebGraph]] ranks.
  *
  * Graft-added operator (north_rule webtext surface); the reference
  * has no link extraction — its HTML path stops at main-content text
  * (cf. /root/reference/soa_extractor/run.py pipeline stages).
  *
  * Scale shape: pure per-row Columns end to end — tag scan, href
  * parse, RFC 3986 reference resolution and anchor-text strip all run
  * inside the page row's task; the only new rows are the posexplode of
  * a page's own tag list (bounded by the page's anchor count). No
  * shuffle is introduced; the host-graph groupBy downstream is the
  * first exchange and it carries only (src_host, dst_host) thin rows.
  *
  * Parsing contract (documented subset, same spirit as the
  * boilerplate stripper's regex-DOM): tags are found with a
  * non-greedy case-insensitive scan, href values may be double-quoted,
  * single-quoted or unquoted, anchor text is the tag's inner text with
  * nested markup stripped and whitespace collapsed. Reference
  * resolution implements RFC 3986 §5.2: absolute refs pass through,
  * scheme-relative (`//h/p`) take the base scheme, root-relative
  * (`/p`) take the base authority, relative refs merge with the base
  * path directory; dot segments are removed exactly (§5.2.4) except
  * that a trailing `/.` or `/..` yields no trailing slash (the
  * canonical-join form; deterministic, documented). Fragments are
  * dropped — a crawl frontier never distinguishes them.
  */
object LinkExtractor {

  /** All `<a ...>...</a>` tags of an HTML string, in document order. */
  def anchorTags(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0))

  /** The href attribute value of one anchor tag ("" when absent —
    * deterministic, never null). Quote styles tried in order: double,
    * single, unquoted (an unquoted value cannot start with a quote, so
    * the order is unambiguous).
    */
  def hrefOf(tag: Column): Column = {
    val dq = "(?is)\\bhref\\s*=\\s*\"([^\"]*)\""
    val sq = "(?is)\\bhref\\s*=\\s*'([^']*)'"
    val uq = "(?is)\\bhref\\s*=\\s*([^\\s\"'>]+)"
    when(tag.rlike(dq), regexp_extract(tag, dq, 1))
      .when(tag.rlike(sq), regexp_extract(tag, sq, 1))
      .otherwise(regexp_extract(tag, uq, 1))
  }

  /** Inner text of a tag: nested markup stripped, whitespace runs
    * collapsed to single spaces, trimmed.
    */
  def anchorTextOf(tag: Column): Column =
    trim(regexp_replace(
      regexp_replace(tag, "<[^>]*>", " "), "\\s+", " "))

  /** True when the tag carries rel=nofollow (any rel list containing
    * the token) — the link-graph convention crawlers honor when
    * building ranking edges.
    */
  def isNofollow(tag: Column): Column =
    tag.rlike("(?is)\\brel\\s*=\\s*[\"'][^\"']*\\bnofollow\\b")

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path
    * (must start with "/"). Single higher-order fold — no loop, no
    * UDF: `..` pops, `.` is dropped, a trailing `/.`/`/..` yields no
    * trailing slash (documented delta), `..` at the root stays at the
    * root per the RFC.
    */
  def removeDotSegments(path: Column): Column = {
    val segs = split(substring(path, 2, 1 << 30), "/")
    val folded = aggregate(segs, array().cast("array<string>"),
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..",
            when(size(acc) >= 1, slice(acc, lit(1), size(acc) - 1))
              .otherwise(acc))
          .otherwise(concat(acc, array(s))))
    concat(lit("/"), array_join(folded, "/"))
  }

  /** Resolve `href` against the absolute base URL `base` (RFC 3986
    * §5.2 subset — see object scaladoc). The fragment is always
    * stripped; an empty href resolves to the base (RFC: same
    * document).
    */
  def resolveUrl(base: Column, href0: Column): Column = {
    val href = regexp_replace(href0, "#.*$", "")
    val scheme = lower(regexp_extract(base,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authority = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val basePath0 = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val basePath = when(basePath0 === "", lit("/")).otherwise(basePath0)
    // directory of the base path: through the last "/"
    val baseDir = regexp_extract(basePath, "^(.*/)", 1)
    when(href === "", regexp_replace(base, "#.*$", ""))
      .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"),
        concat(scheme, lit("://"), authority, removeDotSegments(href)))
      .otherwise(concat(scheme, lit("://"), authority,
        removeDotSegments(concat(baseDir, href))))
  }

  /** One row per extracted link: (urlCol, link_pos, href_raw,
    * href_abs, anchor, nofollow), document order preserved in
    * `link_pos`. Tags without an href (named anchors) are dropped;
    * empty-string hrefs resolve to the base per the RFC and are kept
    * (self-reference — a frontier dedups them against the page
    * itself).
    */
  def extractLinks(pages: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val tagged = pages
      .select(col(urlCol), posexplode(anchorTags(col(htmlCol)))
        .as(Seq("link_pos", "_tag")))
      .filter(col("_tag").rlike("(?is)\\bhref\\s*="))
    tagged.select(col(urlCol), col("link_pos"),
      hrefOf(col("_tag")).as("href_raw"),
      resolveUrl(col(urlCol), hrefOf(col("_tag"))).as("href_abs"),
      anchorTextOf(col("_tag")).as("anchor"),
      isNofollow(col("_tag")).as("nofollow"))
  }

  /** Collapse extracted links into the host-level ranking edge table
    * [[graft.ops.WebGraph]] consumes: (src, dst) with nofollow edges
    * dropped (the crawler convention) and only http(s) targets kept
    * (mailto:/javascript: links are not graph edges). Multi-edges are
    * preserved — PageRank weights repeated links, matching the
    * multi-edge contract of [[graft.ops.WebGraph.pageRank]].
    */
  def hostEdges(links: DataFrame, urlCol: String = "url"): DataFrame =
    links
      .filter(!col("nofollow") &&
        col("href_abs").rlike("^https?://"))
      .select(
        graft.ops.Curation.matchHost(col(urlCol)).as("src"),
        graft.ops.Curation.matchHost(col("href_abs")).as("dst"))
}
