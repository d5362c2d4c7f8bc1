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

  /** Parse a (host, robots_txt) table into per-host packed rule
    * arrays: (hostCol, rules). Hosts whose file yields no `*` rules
    * keep an empty array (distinct from absent-from-table).
    */
  def parseRobots(robots: DataFrame, hostCol: String, txtCol: String)
      : DataFrame =
    robots.select(col(hostCol), starGroupRules(col(txtCol)).as("rules"))

  /** Admission decision per URL against parsed per-host rules
    * ([[parseRobots]] output). Appends (matched_prefix, allowed):
    * longest matching prefix wins, Allow beats Disallow on ties, no
    * match (or no robots row for the host) → allowed with
    * matched_prefix "".
    */
  def allowedByRobots(urls: DataFrame, urlCol: String, rules: DataFrame,
      hostCol: String = "host", broadcastRules: Boolean = true)
      : DataFrame = {
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
    val matched = filter(col("_rb_rules"),
      r => col("_rb_p").startsWith(r("prefix")))
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
}
