package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots-exclusion (robots.txt / RFC 9309) parsing and URL admission
  * — the crawl-politeness gate a Common-Crawl-style pipeline applies
  * before a URL may enter the frontier or the corpus.
  *
  * Documented subset of RFC 9309: the `User-agent: *` group's
  * `Allow:` / `Disallow:` literal path-prefix rules. Group semantics
  * are exact — consecutive `User-agent:` lines form one group header,
  * a group's rules run until the next group header, only groups whose
  * header set contains `*` apply, and rules in other agents' groups
  * are ignored wherever they appear in the file. Decision semantics
  * are exact: the LONGEST matching prefix wins and `Allow` beats
  * `Disallow` on equal length (RFC 9309 §2.2.2); a URL with no
  * matching rule is allowed; an empty `Disallow:` value is the
  * standard allow-all no-op. Out of subset (documented): `*`/`$`
  * wildcards inside rule paths, `Crawl-delay`, `Sitemap`.
  *
  * Scale shape: parsing is one per-row higher-order fold over the
  * robots file's lines (group state in the fold accumulator — no
  * explode, no shuffle); the per-host rule arrays are tiny (robots
  * files are capped at 500 KiB by the RFC) and reach the URL table by
  * one broadcast join keyed on host; the decision is then a per-row
  * array fold. With `broadcastRules=false` the join shuffles the thin
  * (url, host) side once instead.
  */
object Robots {

  /** One robots file → the `*` group's rules as an
    * array<struct<allow boolean, prefix string>> (file order kept).
    */
  def starGroupRules(txt: Column): Column = {
    val lines = split(txt, "\r?\n")
    val emptyRules =
      array().cast("array<struct<allow:boolean,prefix:string>>")
    val init = struct(lit(false).as("active"), lit(false).as("lastua"),
      emptyRules.as("rules"))
    val folded = aggregate(lines, init, (acc, l0) => {
      // comments stripped, surrounding whitespace trimmed
      val l = trim(regexp_replace(l0, "#.*$", ""))
      val low = lower(l)
      val value = trim(regexp_replace(l, "^[^:]*:", ""))
      val isUa = low.startsWith("user-agent:")
      val isAllow = low.startsWith("allow:")
      val isDis = low.startsWith("disallow:")
      // consecutive UA lines accumulate into one group header; any
      // other line closes the header
      val active = when(isUa && acc("lastua"),
          acc("active") || value === "*")
        .when(isUa, value === "*")
        .otherwise(acc("active"))
      val rules = when((isAllow || isDis) && acc("active") &&
          value =!= "",
          concat(acc("rules"),
            array(struct(isAllow.as("allow"), value.as("prefix")))))
        .otherwise(acc("rules"))
      struct(active.as("active"), isUa.as("lastua"), rules.as("rules"))
    })
    folded("rules")
  }

  /** The `*` group's Crawl-delay in seconds (long), -1 when absent or
    * non-numeric. Crawl-delay is outside RFC 9309 but ubiquitous in
    * the wild and the one robots directive a polite fetch scheduler
    * budgets on; same group-selection semantics as [[starGroupRules]]
    * (consecutive UA headers accumulate; directives in foreign groups
    * never apply), FIRST valid value in the `*` group wins (the
    * behavior of the common parsers). Integer seconds only — the rare
    * fractional form rounds down via the leading-digits match.
    */
  def crawlDelay(txt: Column): Column = {
    val lines = split(txt, "\r?\n")
    val init = struct(lit(false).as("active"), lit(false).as("lastua"),
      lit(-1L).as("delay"))
    val folded = aggregate(lines, init, (acc, l0) => {
      val l = trim(regexp_replace(l0, "#.*$", ""))
      val low = lower(l)
      val value = trim(regexp_replace(l, "^[^:]*:", ""))
      val isUa = low.startsWith("user-agent:")
      val isDelay = low.startsWith("crawl-delay:")
      val active = when(isUa && acc("lastua"),
          acc("active") || value === "*")
        .when(isUa, value === "*")
        .otherwise(acc("active"))
      val num = regexp_extract(value, "^([0-9]+)", 1)
      val delay = when(isDelay && acc("active") && acc("delay") === -1L &&
          num =!= "", num.cast("long"))
        .otherwise(acc("delay"))
      struct(active.as("active"), isUa.as("lastua"), delay.as("delay"))
    })
    folded("delay")
  }

  /** Per-host fetch budget over a scheduling horizon: how many fetches
    * the [[crawlDelay]] allows in `horizonSec` seconds (hosts without
    * a declared delay get `defaultDelaySec` — a polite crawler never
    * treats silence as permission to hammer). Integral DIV; a declared
    * delay of 0 also falls to the default (0 means "no delay declared
    * correctly", not "infinite rate").
    */
  def fetchBudget(delay: Column, horizonSec: Long,
      defaultDelaySec: Long): Column = {
    require(defaultDelaySec >= 1 && horizonSec >= 1,
      "need positive horizon and default delay")
    val eff = when(delay > 0L, delay).otherwise(lit(defaultDelaySec))
    call_function("div", lit(horizonSec), eff)
  }

  /** Parse a (host, robots_txt) table into per-host packed rule
    * arrays: (hostCol, rules). Hosts whose file yields no `*` rules
    * keep an empty array (distinct from absent-from-table).
    */
  def parseRobots(robots: DataFrame, hostCol: String, txtCol: String)
      : DataFrame =
    robots.select(col(hostCol), starGroupRules(col(txtCol)).as("rules"))

  /** Admission decision per URL against parsed per-host rules
    * ([[parseRobots]] output). Appends (matched_prefix, allowed):
    * the most specific (longest-pattern) matching rule wins, Allow
    * beats Disallow on ties, no match (or no robots row for the
    * host) → allowed with matched_prefix "".
    *
    * `rfcWildcards = true` turns on the RFC 9309 §2.2.3 pattern
    * forms the spec REQUIRES of parsers: `*` matches any character
    * run anywhere in the path, a TRAILING `$` anchors the match to
    * the path end ("/fish*$", or the star-leading ".php$" extension
    * form — written here without its leading slash-star because Scala
    * block comments nest); a mid-pattern `$` stays
    * literal. Precedence is still pattern octet-length (RFC: "most
    * octets"), wildcard characters counted — so "/p*" (2 octets of
    * prefix + the star) outranks "/p" exactly as the spec's
    * most-specific rule dictates. Wildcard-free rules take the same
    * `startsWith` fast path as before (the regex compile only runs
    * for rules that actually carry `*`/`$`), so flipping the flag on
    * a wildcard-free rule table changes nothing — and costs nothing.
    */
  def allowedByRobots(urls: DataFrame, urlCol: String, rules: DataFrame,
      hostCol: String = "host", broadcastRules: Boolean = true,
      rfcWildcards: Boolean = false): DataFrame = {
    val host = Curation.matchHost(col(urlCol))
    val path0 = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val side = rules.select(col(hostCol).as("_rb_host"),
      col("rules").as("_rb_rules"))
    val joined = urls
      .withColumn("_rb_h", host).withColumn("_rb_p", path)
      .join(if (broadcastRules) broadcast(side) else side,
        col("_rb_h") === col("_rb_host"), "left")
    // rule pattern → anchored regex: escape every non-alnum char,
    // then un-escape `\*` into `.*` and a TRAILING `\$` into the `$`
    // anchor (a mid-pattern `$` stays escaped = literal, per RFC)
    def ruleRx(p: Column): Column = concat(lit("^"),
      regexp_replace(
        regexp_replace(
          regexp_replace(p, "([^A-Za-z0-9])", "\\\\$1"),
          "\\\\\\*", ".*"),
        "\\\\\\$$", "\\$"))
    def ruleMatches(r: Column): Column =
      if (!rfcWildcards) col("_rb_p").startsWith(r("prefix"))
      else when(!r("prefix").contains("*") &&
          !r("prefix").endsWith("$"),
          col("_rb_p").startsWith(r("prefix")))
        .otherwise(call_function("rlike", col("_rb_p"),
          ruleRx(r("prefix"))))
    val matched = filter(col("_rb_rules"), r => ruleMatches(r))
    // best = max over (prefix length, allow) — longest wins, allow
    // beats disallow on equal length; prefix rides along for output
    val best = array_max(transform(matched,
      r => struct(length(r("prefix")).as("l"),
        r("allow").cast("int").as("a"), r("prefix").as("p"))))
    joined
      .withColumn("_rb_best",
        when(col("_rb_rules").isNull, lit(null)).otherwise(best))
      .withColumn("matched_prefix",
        coalesce(col("_rb_best")("p"), lit("")))
      .withColumn("allowed",
        coalesce(col("_rb_best")("a") === 1, lit(true)))
      .drop("_rb_host", "_rb_rules", "_rb_h", "_rb_p", "_rb_best")
  }

  /** Sitemap URL discovery (sitemaps.org protocol, `<urlset>` subset)
    * — the crawl-seeding complement of the robots gate: each
    * `<url>` block of a (host, sitemap_xml) row becomes one
    * (hostCol, entry_pos, loc, lastmod, priority_ppm) row.
    *
    * Subset contract: `<url>` blocks are scanned case-insensitively
    * in document order; `entry_pos` is the block's 0-based position
    * among ALL blocks (dropped blocks leave gaps — the position is an
    * audit pointer into the source file); blocks without a non-empty
    * `<loc>` are dropped (the spec makes loc mandatory); `<lastmod>`
    * is kept verbatim-trimmed ("" when absent — W3C datetime
    * validation is the date-validator family's job, not the
    * parser's); `<priority>` is parsed as a decimal into integer ppm
    * (spec default 0.5 → 500000 when absent/empty). `<sitemapindex>`
    * files yield zero rows here — their nested sitemap locs are a
    * fetch-frontier concern, exposed separately via
    * [[sitemapIndexLocs]].
    *
    * Scale shape: one posexplode of a file's own `<url>` blocks
    * (bounded at 50k entries per file by the protocol), per-row
    * regexps otherwise — no shuffle, no UDF.
    */
  def parseSitemap(maps: DataFrame, hostCol: String, xmlCol: String)
      : DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?is)<url>.*?</url>"), lit(0))
    val prio = regexp_extract(col("_sm_b"),
      "(?is)<priority>\\s*([0-9.]*)\\s*</priority>", 1)
    maps
      .select(col(hostCol),
        posexplode(blocks).as(Seq("entry_pos", "_sm_b")))
      .withColumn("loc", trim(regexp_extract(col("_sm_b"),
        "(?is)<loc>(.*?)</loc>", 1)))
      .filter(col("loc") =!= "")
      .withColumn("lastmod", trim(regexp_extract(col("_sm_b"),
        "(?is)<lastmod>(.*?)</lastmod>", 1)))
      .withColumn("priority_ppm",
        when(prio === "", lit(500000L))
          .otherwise((prio.cast("decimal(10,6)") * 1000000)
            .cast("long")))
      .drop("_sm_b")
  }

  /** All `Sitemap:` directive URLs declared in a robots.txt — the
    * DISCOVERY step that feeds [[parseSitemap]]/[[sitemapIndexLocs]]
    * their fetch frontier (the sitemaps.org autodiscovery convention).
    * Unlike Allow/Disallow/Crawl-delay, `Sitemap:` is independent of
    * any user-agent group — it applies file-wide wherever it appears,
    * including inside a foreign agent's group — so this is a plain
    * per-line scan, not a group fold. Multiple directives are all
    * kept in file order; comments strip first; the value must be an
    * absolute http(s) URL (the protocol requires absolute — a
    * relative value is malformed and dropped). Case-insensitive
    * directive, value case preserved (URLs are case-sensitive).
    * Per-row array ops only — no explode, no shuffle.
    */
  def sitemapUrls(txt: Column): Column = {
    val lines = split(txt, "\r?\n")
    val vals = transform(lines, l0 => {
      val l = trim(regexp_replace(l0, "#.*$", ""))
      when(lower(l).startsWith("sitemap:"),
        trim(regexp_replace(l, "^[^:]*:", ""))).otherwise(lit(""))
    })
    filter(vals, v => v.rlike("^https?://"))
  }

  /** DataFrame form of [[sitemapUrls]]: one (hostCol, map_pos,
    * sitemap_url) row per declared sitemap, 0-based position in
    * declaration order; hosts without directives yield no rows.
    */
  def sitemapDirectives(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame =
    robots.select(col(hostCol),
      posexplode(sitemapUrls(col(txtCol)))
        .as(Seq("map_pos", "sitemap_url")))

  /** Nested sitemap locations of a `<sitemapindex>` file — the
    * fetch-frontier rows a crawler enqueues before calling
    * [[parseSitemap]] on each fetched child.
    */
  def sitemapIndexLocs(maps: DataFrame, hostCol: String,
      xmlCol: String): DataFrame =
    maps
      .select(col(hostCol), posexplode(regexp_extract_all(col(xmlCol),
        lit("(?is)<sitemap>.*?</sitemap>"), lit(0)))
        .as(Seq("entry_pos", "_sm_b")))
      .withColumn("loc", trim(regexp_extract(col("_sm_b"),
        "(?is)<loc>(.*?)</loc>", 1)))
      .filter(col("loc") =!= "")
      .drop("_sm_b")

  /** RSS 2.0 / Atom feed parsing — the recency-discovery complement
    * of the sitemap (publishers surface NEW urls in feeds long before
    * sitemaps regenerate): each `<item>` (RSS) or `<entry>` (Atom)
    * block becomes one (hostCol, entry_pos, kind, link, title,
    * published) row.
    *
    * Subset contract: blocks scan case-insensitively in document
    * order (RSS items first, then Atom entries — a real feed carries
    * one kind); `entry_pos` is 0-based among ALL blocks, dropped
    * blocks leave gaps (audit pointer, same contract as
    * [[parseSitemap]]). RSS link = `<link>text</link>`; Atom link =
    * the FIRST `<link …>` tag with `rel="alternate"` or no rel at all
    * (self/enclosure/hub links skipped). Blocks without a link are
    * dropped. Title is CDATA-unwrapped, markup-stripped,
    * whitespace-collapsed. `published` is kept verbatim-trimmed from
    * `<pubDate>` (RSS) else `<published>` else `<updated>` (Atom) —
    * date normalization is the validator family's job, not the
    * parser's.
    *
    * Scale shape: per-row regexps + one posexplode of a feed's own
    * blocks; no shuffle, no UDF.
    */
  def parseFeed(feeds: DataFrame, hostCol: String, xmlCol: String)
      : DataFrame = {
    val rss = regexp_extract_all(col(xmlCol),
      lit("(?is)<item\\b[^>]*>.*?</item>"), lit(0))
    val atom = regexp_extract_all(col(xmlCol),
      lit("(?is)<entry\\b[^>]*>.*?</entry>"), lit(0))
    val b = col("_fd_b")
    val rssLink = trim(regexp_extract(b, "(?is)<link>(.*?)</link>", 1))
    val atomTags = regexp_extract_all(b, lit("(?is)<link\\b[^>]*>"),
      lit(0))
    // try_element_at: an entry with zero admissible links yields null
    // (ANSI element_at throws on the empty array)
    val altTag = try_element_at(filter(atomTags, t =>
      !t.rlike("(?is)\\brel\\s*=") ||
        t.rlike("(?is)\\brel\\s*=\\s*[\"']alternate[\"']")), lit(1))
    val dq = "(?is)\\bhref\\s*=\\s*\"([^\"]*)\""
    val sq = "(?is)\\bhref\\s*=\\s*'([^']*)'"
    val atomLink = when(altTag.isNull, lit(""))
      .when(altTag.rlike(dq), regexp_extract(altTag, dq, 1))
      .when(altTag.rlike(sq), regexp_extract(altTag, sq, 1))
      .otherwise(lit(""))
    val title = trim(regexp_replace(regexp_replace(
      regexp_replace(regexp_extract(b,
        "(?is)<title[^>]*>(.*?)</title>", 1),
        "(?s)<!\\[CDATA\\[(.*?)\\]\\]>", "$1"),
      "<[^>]*>", " "), "\\s+", " "))
    val pub = Seq("pubDate", "published", "updated").map(tag =>
        trim(regexp_extract(b, s"(?is)<$tag[^>]*>(.*?)</$tag>", 1)))
      .reduce((a, c) => when(a =!= "", a).otherwise(c))
    feeds
      .select(col(hostCol),
        posexplode(concat(rss, atom)).as(Seq("entry_pos", "_fd_b")),
        size(rss).as("_fd_nr"))
      .withColumn("kind",
        when(col("entry_pos") < col("_fd_nr"), lit("rss"))
          .otherwise(lit("atom")))
      .withColumn("link",
        when(col("kind") === "rss", rssLink).otherwise(atomLink))
      .filter(col("link") =!= "")
      .withColumn("title", title)
      .withColumn("published", pub)
      .drop("_fd_b", "_fd_nr")
  }

  /** Recrawl scheduling from observed snapshot churn — the refresh
    * policy side of the crawler (the estimation idea of Cho &
    * Garcia-Molina 2003, "Effective Page Refresh Policies for Web
    * Crawlers", kept integer-exact: the observed change RATIO drives a
    * linear interval interpolation instead of the paper's Poisson
    * log-estimator, which needs floats).
    *
    * Input: one row per (url, crawl day, content hash) from past
    * snapshots. Per url the snapshots are ordered by day and adjacent
    * pairs compared: `n_changes` = pairs with differing hashes,
    * `n_obs` = pairs. The change ratio in ppm (single-snapshot urls
    * default to 500000 — maximum ignorance) interpolates the revisit
    * interval between `maxDays` (never changes) and `minDays` (changes
    * every observation): interval = maxDays - (maxDays - minDays) *
    * ratio / 10^6, integral DIV. `next_due_day` = last seen day +
    * interval; `overdue_days` = max(0, nowDay - next_due_day) is the
    * recrawl priority.
    *
    * Scale shape: one window per url over its OWN snapshot history —
    * partitions bounded by the crawl-history depth (dozens), the same
    * by-construction-tiny window contract as latestSnapshotAsOf; the
    * rest is per-row integer Columns. Output: (url, n_snaps, n_changes,
    * change_ppm, interval_days, last_day, next_due_day, overdue_days).
    */
  def revisitSchedule(snaps: DataFrame, urlCol: String, dayCol: String,
      hashCol: String, nowDay: Long, minDays: Long = 1L,
      maxDays: Long = 60L): DataFrame = {
    require(minDays >= 1 && maxDays >= minDays,
      "need 1 <= minDays <= maxDays")
    // hash tiebreak: two crawls of one url on the SAME day would
    // otherwise order arbitrarily per run/task retry, flipping
    // n_changes (and the recrawl priority) between executions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol)).orderBy(col(dayCol), col(hashCol))
    val stepped = snaps.select(col(urlCol), col(dayCol).cast("long"),
        col(hashCol))
      .withColumn("_prev", lag(col(hashCol), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNull, lit(0L))
          .otherwise(when(col(hashCol) =!= col("_prev"), lit(1L))
            .otherwise(lit(0L))))
    stepped.groupBy(col(urlCol).as("url"))
      .agg(count(lit(1)).as("n_snaps"), sum(col("_chg")).as("n_changes"),
        max(col(dayCol).cast("long")).as("last_day"))
      .withColumn("change_ppm",
        when(col("n_snaps") < 2, lit(500000L))
          .otherwise(call_function("div",
            col("n_changes") * lit(1000000L), col("n_snaps") - 1)))
      .withColumn("interval_days",
        lit(maxDays) - call_function("div",
          lit(maxDays - minDays) * col("change_ppm"), lit(1000000L)))
      .withColumn("next_due_day", col("last_day") + col("interval_days"))
      .withColumn("overdue_days",
        greatest(lit(0L), lit(nowDay) - col("next_due_day")))
  }
}
