package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Page-metadata extraction from raw HTML — the WAT-record head
  * surface of a Common-Crawl-style pipeline: `<title>`, `<meta
  * name=…>` descriptions/keywords, Open Graph properties,
  * `<link rel=canonical>`, `<base href>` and the `<meta name=robots>`
  * indexing directives, one typed row per page.
  *
  * Graft-added operator (north_rule webtext surface); the reference
  * stops at main-content text and has no head-metadata extraction
  * (cf. /root/reference/soa_extractor/run.py pipeline stages). The
  * canonical-URL and noindex signals are what a crawl/train corpus
  * uses to collapse syndicated copies and honor publisher opt-outs
  * BEFORE any content-level dedup runs — at 10^12 pages, dropping a
  * noindex'd or canonically-aliased page here is far cheaper than
  * minhashing it later.
  *
  * Scale shape: pure per-row Columns end to end — tag scans are
  * non-greedy case-insensitive regexps over the page string, entity
  * decode is a fixed replace chain, canonical/base resolution reuses
  * [[LinkExtractor.resolveUrl]]. No explode, no shuffle, no UDF: the
  * whole operator runs inside the page row's task and survives any
  * corpus size that can hold the page itself.
  *
  * Parsing contract (documented subset, same spirit as
  * [[LinkExtractor]]): the FIRST matching tag wins (browser/WAT
  * convention for title/canonical/base); attribute order inside a tag
  * is free (`name=… content=…` and `content=… name=…` both match);
  * attribute values may be double- or single-quoted; entity decode
  * covers the reference's minimal set (&lt; &gt; &quot; &#39;/&apos;
  * &nbsp; then &amp; last, so `&amp;lt;` round-trips to `&lt;` not
  * `<`); text is whitespace-collapsed and trimmed.
  */
object MetaExtractor {

  /** Decode the documented entity subset; &amp; last (double-escape
    * safe). Mirrors HtmlExtractor.decodeEntities' named set minus
    * numeric refs (a regexp chain cannot compute a codepoint; numeric
    * refs are left intact and documented).
    */
  def decodeEntities(s: Column): Column = {
    val step = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    step.foldLeft(s) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  private def collapse(s: Column): Column =
    trim(regexp_replace(s, "\\s+", " "))

  /** First `<title>` inner text: markup-stripped, entity-decoded,
    * whitespace-collapsed ("" when absent — deterministic, never
    * null).
    */
  def titleOf(html: Column): Column =
    collapse(decodeEntities(regexp_replace(
      regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1),
      "<[^>]*>", " ")))

  /** The content attribute value of one meta-ish tag string ("" when
    * absent). Quote styles tried in order: double, single (an
    * attribute value containing the other quote survives; unquoted
    * content is not in the subset — real pages quote content values).
    */
  def contentOf(tag: Column): Column = {
    val dq = "(?is)\\bcontent\\s*=\\s*\"([^\"]*)\""
    val sq = "(?is)\\bcontent\\s*=\\s*'([^']*)'"
    when(tag.rlike(dq), regexp_extract(tag, dq, 1))
      .when(tag.rlike(sq), regexp_extract(tag, sq, 1))
      .otherwise(lit(""))
  }

  /** The first `<meta name="<name>" …>` tag (attribute order free),
    * "" when the page has none. `name` is a literal, not a pattern.
    */
  def metaTag(html: Column, name: String): Column =
    regexp_extract(html,
      s"(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']${java.util.regex.Pattern.quote(name)}[\"'][^>]*>",
      0)

  /** Entity-decoded, collapsed content of `<meta name=… content=…>`. */
  def metaNamed(html: Column, name: String): Column =
    collapse(decodeEntities(contentOf(metaTag(html, name))))

  /** Entity-decoded, collapsed content of an Open Graph
    * `<meta property="og:…" content=…>` tag.
    */
  def ogOf(html: Column, prop: String): Column =
    collapse(decodeEntities(contentOf(regexp_extract(html,
      s"(?is)<meta\\b[^>]*\\bproperty\\s*=\\s*[\"']${java.util.regex.Pattern.quote(prop)}[\"'][^>]*>",
      0))))

  // ONE href parser for the whole repo (LinkExtractor.hrefOf): double
  // then single quotes, then the unquoted form; "" when absent
  private def hrefOfTag(tag: Column): Column = LinkExtractor.hrefOf(tag)

  /** Raw href of the first `<link rel="canonical" …>` tag ("" when
    * absent); attribute order free.
    */
  def canonicalHrefOf(html: Column): Column =
    hrefOfTag(regexp_extract(html,
      "(?is)<link\\b[^>]*\\brel\\s*=\\s*[\"']canonical[\"'][^>]*>", 0))

  /** Raw href of the first `<base …>` tag ("" when absent) — shifts
    * the resolution base for every relative reference on the page.
    */
  def baseHrefOf(html: Column): Column =
    hrefOfTag(regexp_extract(html, "(?is)<base\\b[^>]*>", 0))

  /** True when `<meta name="robots" content="…">` carries the given
    * directive token (noindex / nofollow / none …) as a list member.
    */
  def robotsDirective(html: Column, token: String): Column =
    contentOf(metaTag(html, "robots"))
      .rlike(s"(?i)(^|[\\s,])${java.util.regex.Pattern.quote(token)}([\\s,]|$$)")

  /** One metadata row per page: (urlCol, title, description, keywords,
    * og_title, og_type, canonical_raw, canonical_abs, base_href,
    * noindex, nofollow_meta, n_meta_tags). The canonical URL is
    * resolved RFC 3986-style against the page's effective base
    * (`<base href>` when present and absolute, else the page url);
    * pages with no canonical tag get canonical_abs = "" — callers
    * treat "" as self-canonical.
    */
  def pageMeta(pages: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val html = col(htmlCol)
    val base0 = baseHrefOf(html)
    // effective resolution base: an absolute <base href> replaces the
    // page url; relative/absent base keeps the page url (subset:
    // relative <base> is rare and ambiguous across browsers)
    val base = when(base0.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), base0)
      .otherwise(col(urlCol))
    val canonRaw = canonicalHrefOf(html)
    pages.select(
      col(urlCol),
      titleOf(html).as("title"),
      metaNamed(html, "description").as("description"),
      metaNamed(html, "keywords").as("keywords"),
      ogOf(html, "og:title").as("og_title"),
      ogOf(html, "og:type").as("og_type"),
      canonRaw.as("canonical_raw"),
      when(canonRaw === "", lit(""))
        .otherwise(LinkExtractor.resolveUrl(base, canonRaw))
        .as("canonical_abs"),
      base0.as("base_href"),
      robotsDirective(html, "noindex").as("noindex"),
      robotsDirective(html, "nofollow").as("nofollow_meta"),
      size(regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0)))
        .cast("int").as("n_meta_tags"))
  }

  // ---- hreflang alternate links ----

  /** `<link rel="alternate" hreflang=…>` rows — the publisher-declared
    * translation graph: one row per hreflang-bearing link tag in
    * document order, href resolved RFC 3986-style against the page
    * url, language code lowercased (BCP 47 codes are
    * case-insensitive). Alternate links WITHOUT hreflang (RSS/atom
    * feeds, stylesheets) never match; `link_pos` indexes the page's
    * hreflang-bearing tags. A crawl corpus uses these to group
    * translations BEFORE language-stratified sampling (the groups are
    * also ready-made candidates for margin-based bitext mining —
    * SimSearch.marginMining). Pure per-row regexp Columns; the only
    * explode is over a page's own link tags.
    */
  def hreflangLinks(pages: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val tags = regexp_extract_all(col(htmlCol),
      lit("(?is)<link\\b[^>]*\\bhreflang\\s*=\\s*[\"'][^\"']*[\"'][^>]*>"),
      lit(0))
    val t = col("_t")
    val href = LinkExtractor.hrefOf(t)
    pages
      .select(col(urlCol), posexplode(tags).as(Seq("link_pos", "_t")))
      .filter(t.rlike("(?is)\\brel\\s*=\\s*[\"']alternate[\"']"))
      .select(col(urlCol), col("link_pos"),
        lower(regexp_extract(t,
          "(?is)\\bhreflang\\s*=\\s*[\"']([^\"']*)[\"']", 1))
          .as("hreflang"),
        LinkExtractor.resolveUrl(col(urlCol), href).as("href_abs"))
  }

  /** RSS/Atom feed AUTODISCOVERY — `<link rel="alternate"
    * type="application/rss+xml|application/atom+xml">` rows, one per
    * feed-typed link tag in document order: how a crawler finds a
    * site's feeds from any page without guessing paths (the discovery
    * step that FEEDS ops.Robots.parseFeed). href resolved RFC
    * 3986-style against the page url; `kind` is "rss" or "atom" from
    * the MIME type; attribute order and quote style free; alternate
    * links with other types (hreflang translations, stylesheets) never
    * match; linkless tags are dropped. `link_pos` indexes the page's
    * <link> tags, so gaps are audit pointers to the non-feed links in
    * between. Pure per-row regexp Columns; the only explode is over a
    * page's own link tags. href parsing delegates to
    * [[LinkExtractor.hrefOf]] — the one shared definition — so
    * unquoted attributes (href=/feed.xml, valid HTML) resolve too.
    */
  def feedLinks(pages: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val typePat = "(?is)\\btype\\s*=\\s*[\"']application/" +
      "(rss|atom)\\+xml[\"']"
    val tags = regexp_extract_all(col(htmlCol),
      lit("(?is)<link\\b[^>]*>"), lit(0))
    val t = col("_t")
    val href = LinkExtractor.hrefOf(t)
    pages
      .select(col(urlCol), posexplode(tags).as(Seq("link_pos", "_t")))
      .filter(t.rlike("(?is)\\brel\\s*=\\s*[\"']alternate[\"']") &&
        t.rlike(typePat))
      // hrefless tags drop BEFORE resolution (an empty RFC 3986
      // reference resolves to the page itself, which is not a feed)
      .filter(href =!= "")
      .select(col(urlCol), col("link_pos"),
        lower(regexp_extract(t, typePat, 1)).as("kind"),
        LinkExtractor.resolveUrl(col(urlCol), href).as("feed_url"))
  }

  // ---- JSON-LD structured data (schema.org) ----

  /** All `<script type="application/ld+json">` payloads of a page, in
    * document order. Attribute order and surrounding attributes are
    * free, quotes double or single; `<script>` without the ld+json
    * type (plain, text/javascript, …) never matches.
    */
  def jsonLdBlocks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<script\\b[^>]*\\btype\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>"),
      lit(1))

  /** JSON-LD (schema.org) structured-data extraction: one row per
    * ld+json script block in document order, with the fields a train
    * corpus keeps for provenance/recency/licensing decisions — entity
    * type, Article headline + datePublished, author name (object or
    * plain-string form), Product name + offer price, and the @graph
    * entity count. Publishers ship these blocks on most commercial
    * pages; datePublished/author feed recency- and source-stratified
    * sampling the <meta> surface (pageMeta) can't provide.
    *
    * Scale shape: per-row regexp block scan + codegen'd
    * `get_json_object` path extraction — the only explode is over a
    * page's own script blocks (a handful per page), no shuffle, no
    * UDF. A malformed block (truncated/invalid JSON) yields
    * valid = false with every field null and n_entities = 0 — the
    * parse failure is data, not an error. Pages with no ld+json block
    * produce no rows. For a top-level `@graph` wrapper the entity
    * type is taken from the graph's first node and n_entities counts
    * the graph's nodes; a deeper per-node unroll is
    * `explode(json_array)` away and deliberately not defaulted (most
    * consumers want the page-level row).
    */
  def jsonLd(pages: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val b = col("_b")
    def j(p: String) = get_json_object(b, p)
    val author = j("$.author")
    pages
      .select(col(urlCol),
        posexplode(jsonLdBlocks(col(htmlCol))).as(Seq("block_pos", "_b")))
      .withColumn("valid", j("$").isNotNull)
      .withColumn("ld_type",
        coalesce(j("$['@type']"), j("$['@graph'][0]['@type']")))
      .withColumn("headline", j("$.headline"))
      .withColumn("name", j("$.name"))
      .withColumn("author_name", coalesce(j("$.author.name"),
        when(substring(author, 1, 1) =!= "{" &&
          substring(author, 1, 1) =!= "[", author)))
      .withColumn("date_published", j("$.datePublished"))
      .withColumn("price", j("$.offers.price"))
      .withColumn("n_entities",
        when(j("$['@graph']").isNotNull,
          json_array_length(j("$['@graph']")).cast("long"))
          .otherwise(when(col("valid"), lit(1L)).otherwise(lit(0L))))
      .drop("_b")
  }
}
