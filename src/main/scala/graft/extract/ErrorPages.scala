package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Soft-error-page detection — the web-corpus gate that drops pages
  * which returned HTTP 200 but carry error CONTENT ("soft 404s":
  * custom not-found pages, expired listings, stub redirect shells).
  * A Common-Crawl-style corpus is full of them, they survive every
  * status-code filter by definition, and they poison both dedup
  * (mass-identical templates) and training data (anti-content).
  *
  * Graft-added operator (north_rule webtext surface); the reference
  * has no page-level quality gating.
  *
  * Detection rule (deterministic, documented): a page is a soft error
  * when an error signal fires AND the body is short. Signals:
  * `title_error` — the title contains an error token (404/410, "not
  * found", "error", "forbidden", "gone"); `body_error` — the body
  * text contains an error phrase ("page not found", "does not
  * exist", "no longer available", "been removed"). A LONG page that
  * merely mentions an error (an article about 404s) is not flagged —
  * the `n_tokens < minTokens` conjunct encodes that. Link density is
  * reported as a ppm feature (error shells are mostly navigation) but
  * does not gate by itself.
  *
  * Scale shape: per-row Columns only — title via
  * [[MetaExtractor.titleOf]], body from the `<body>` region with
  * markup stripped, token/anchor counts as regexp folds. No shuffle,
  * no explode, no UDF.
  */
object ErrorPages {

  private val TitleError =
    "(?i)\\b(404|410|not found|error|forbidden|gone)\\b"
  private val BodyError =
    "(?i)(page not found|does not exist|no longer available|been removed)"

  /** The `<body>` region's text: markup stripped, whitespace
    * collapsed ("" when the page has no body tag).
    */
  def bodyTextOf(html: Column): Column =
    trim(regexp_replace(regexp_replace(
      regexp_extract(html, "(?is)<body[^>]*>(.*?)</body>", 1),
      "<[^>]*>", " "), "\\s+", " "))

  /** Whitespace token count of a cleaned text column (0 for ""). */
  def tokenCountOf(text: Column): Column =
    when(text === "", lit(0L))
      .otherwise(size(split(text, " ")).cast("long"))

  /** The gate verdict alone, as a composable Column (the streaming
    * ingest chain wants one boolean, not the full signal row).
    */
  def softErrorOf(html: Column, minTokens: Long = 100L): Column = {
    val body = bodyTextOf(html)
    (MetaExtractor.titleOf(html).rlike(TitleError) ||
      body.rlike(BodyError)) && tokenCountOf(body) < minTokens
  }

  /** One signal row per page: (urlCol, n_tokens, n_links,
    * link_density_ppm, title_error, body_error, soft_error).
    */
  def softErrorSignals(pages: DataFrame, urlCol: String,
      htmlCol: String, minTokens: Long = 100L): DataFrame = {
    val html = col(htmlCol)
    val body = bodyTextOf(html)
    val nTok = tokenCountOf(body)
    val nLinks = size(regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*>"), lit(0))).cast("long")
    val titleErr = MetaExtractor.titleOf(html).rlike(TitleError)
    val bodyErr = body.rlike(BodyError)
    pages.select(
      col(urlCol),
      nTok.as("n_tokens"),
      nLinks.as("n_links"),
      // integral DIV (`/` on longs is double division in Spark; the
      // oracle's `//` must agree bit-for-bit)
      call_function("div", nLinks * lit(1000000L),
        greatest(nTok, lit(1L))).as("link_density_ppm"),
      titleErr.as("title_error"),
      bodyErr.as("body_error"),
      ((titleErr || bodyErr) && nTok < minTokens).as("soft_error"))
  }
}
