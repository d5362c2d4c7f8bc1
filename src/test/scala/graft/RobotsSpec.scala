package graft

import graft.ops.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val robotsTxt =
    """# site policy
      |User-agent: googlebot
      |Disallow: /
      |
      |User-agent: bingbot
      |User-agent: *
      |Disallow: /private
      |Allow: /private/pub
      |Disallow:
      |Allow:
      |
      |User-agent: other
      |Disallow: /docs
      |""".stripMargin

  test("starGroupRules: group isolation, shared headers, empty no-ops") {
    import spark.implicits._
    val rules = Seq(robotsTxt).toDF("txt")
      .select(Robots.starGroupRules(col("txt")).as("r"))
      .select(explode(col("r")).as("rule"))
      .select(col("rule")("allow"), col("rule")("prefix"))
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    // only the */bingbot group's non-empty rules; googlebot's
    // Disallow: / and other's Disallow: /docs are ignored
    assert(rules.toSeq === Seq(
      (false, "/private"), (true, "/private/pub")))
  }

  test("allowedByRobots: longest prefix wins, allow beats disallow, " +
    "no-rule and no-host default to allowed") {
    import spark.implicits._
    val parsed = Robots.parseRobots(
      Seq(("h.com", robotsTxt),
        ("empty.com", "User-agent: *\n")).toDF("host", "txt"),
      "host", "txt")
    val urls = Seq(
      "http://h.com/docs/x.html", // other-agent group must not apply
      "http://h.com/private/secret", // disallowed
      "http://h.com/private/pub/ok", // longer Allow wins
      "http://h.com/", // no matching rule
      "http://empty.com/anything", // robots present, zero rules
      "http://norobots.com/anything" // no robots row at all
    ).toDF("url")
    for (bcast <- Seq(true, false)) {
      val got = Robots.allowedByRobots(urls, "url", parsed,
          broadcastRules = bcast)
        .select("url", "allowed", "matched_prefix")
        .collect().map(r => r.getString(0) ->
          ((r.getBoolean(1), r.getString(2)))).toMap
      assert(got("http://h.com/docs/x.html") === ((true, "")))
      assert(got("http://h.com/private/secret") ===
        ((false, "/private")))
      assert(got("http://h.com/private/pub/ok") ===
        ((true, "/private/pub")))
      assert(got("http://h.com/") === ((true, "")))
      assert(got("http://empty.com/anything") === ((true, "")))
      assert(got("http://norobots.com/anything") === ((true, "")))
    }
  }

  test("allowedByRobots rfcWildcards: star/anchor patterns, literal " +
    "mid-pattern dollar, wildcard length precedence, regex-metachar " +
    "paths stay literal, flag off = prefix semantics") {
    import spark.implicits._
    val txt = """User-agent: *
                |Disallow: /fish*
                |Allow: /fish/ok$
                |Disallow: /*.php$
                |Allow: /p
                |Disallow: /p*
                |Disallow: /a$b
                |Disallow: /q+r
                |""".stripMargin
    val parsed = Robots.parseRobots(
      Seq(("w.com", txt)).toDF("host", "txt"), "host", "txt")
    val urls = Seq(
      "http://w.com/fish/deep/x", // /fish* star matches any suffix
      "http://w.com/fish/ok", // anchored Allow (8 octets) beats /fish* (6)
      "http://w.com/fish/ok2", // $ anchor must NOT match a longer path
      "http://w.com/site/index.php", // mid-path star + anchor
      "http://w.com/site/index.php?x=1", // query excluded from path? no — path ends at ?, so .php$ matches
      "http://w.com/pq", // /p* (3) outranks Allow /p (2) -> disallowed
      "http://w.com/a$b/z", // mid-pattern $ is a literal character
      "http://w.com/q+r/z", // '+' in a rule must not act as regex
      "http://w.com/zzz" // no rule
    ).toDF("url")
    val got = Robots.allowedByRobots(urls, "url", parsed,
        rfcWildcards = true)
      .select("url", "allowed", "matched_prefix")
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got("http://w.com/fish/deep/x") === ((false, "/fish*")))
    assert(got("http://w.com/fish/ok") === ((true, "/fish/ok$")))
    assert(got("http://w.com/fish/ok2") === ((false, "/fish*")))
    assert(got("http://w.com/site/index.php") === ((false, "/*.php$")))
    assert(got("http://w.com/site/index.php?x=1") ===
      ((false, "/*.php$")))
    assert(got("http://w.com/pq") === ((false, "/p*")))
    assert(got("http://w.com/a$b/z") === ((false, "/a$b")))
    assert(got("http://w.com/q+r/z") === ((false, "/q+r")))
    assert(got("http://w.com/zzz") === ((true, "")))
    // flag off: star and dollar are literal prefix characters
    val off = Robots.allowedByRobots(urls, "url", parsed)
      .select("url", "allowed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(off("http://w.com/fish/deep/x"), "literal '/fish*' prefix " +
      "must not match without the flag")
    assert(off("http://w.com/a$b/z") === false) // plain prefix rule
  }

  test("sitemapIndexLocs: nested sitemap fetch frontier") {
    import spark.implicits._
    val xml =
      """<?xml version="1.0"?><sitemapindex>
        |<sitemap><loc> http://h.com/sm1.xml </loc>
        |<lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><!-- fetch error, no loc --></sitemap>
        |<SITEMAP><LOC>http://h.com/sm2.xml</LOC></SITEMAP>
        |</sitemapindex>""".stripMargin
    val got = Robots.sitemapIndexLocs(
        Seq(("h.com", xml)).toDF("host", "xml"), "host", "xml")
      .select("entry_pos", "loc").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(0 -> "http://h.com/sm1.xml",
      2 -> "http://h.com/sm2.xml"))
    // a <urlset> file yields no index rows, and vice versa
    assert(Robots.sitemapIndexLocs(
      Seq(("h", "<urlset><url><loc>x</loc></url></urlset>"))
        .toDF("host", "xml"), "host", "xml").isEmpty)
    assert(Robots.parseSitemap(
      Seq(("h", xml)).toDF("host", "xml"), "host", "xml").isEmpty)
  }

  test("crawlDelay: group selection, first-wins, invalid and " +
      "fractional values; fetchBudget floors and defaults") {
    import spark.implicits._
    def delay(txt: String): Long =
      Seq(txt).toDF("t").select(Robots.crawlDelay(col("t")))
        .collect()(0).getLong(0)
    // accumulated UA headers: * shares the group with bingbot
    assert(delay("User-agent: bingbot\nUser-agent: *\nCrawl-delay: 4") === 4L)
    // foreign group only
    assert(delay("User-agent: googlebot\nCrawl-delay: 3") === -1L)
    // first valid wins
    assert(delay("User-agent: *\nCrawl-delay: 10\nCrawl-delay: 2") === 10L)
    // non-numeric ignored, later valid taken
    assert(delay("User-agent: *\nCrawl-delay: x\nCrawl-delay: 6") === 6L)
    // fractional rounds down via leading digits
    assert(delay("User-agent: *\nCrawl-delay: 2.9") === 2L)
    // before any group header: inactive
    assert(delay("Crawl-delay: 7\nUser-agent: *\nDisallow: /") === -1L)
    // comments and case-insensitivity
    assert(delay("USER-AGENT: *\ncrawl-DELAY: 5 # be nice") === 5L)
    val b = Seq((10L, 0L, -1L)).toDF("a", "b", "c")
      .select(Robots.fetchBudget(col("a"), 3600L, 5L),
        Robots.fetchBudget(col("b"), 3600L, 5L),
        Robots.fetchBudget(col("c"), 3600L, 5L)).collect()(0)
    assert(b.getLong(0) === 360L)
    assert(b.getLong(1) === 720L) // declared 0 -> default, not infinity
    assert(b.getLong(2) === 720L)
  }

  test("revisitSchedule: never/always/sometimes-changing and " +
      "single-snapshot urls get the right intervals; overdue clamps") {
    import spark.implicits._
    val snaps = Seq(
      // static: 3 snapshots, same hash -> ratio 0, interval = maxDays
      ("u-static", 0L, "a"), ("u-static", 7L, "a"), ("u-static", 14L, "a"),
      // churner: changes every step -> ratio 1e6, interval = minDays
      ("u-churn", 0L, "a"), ("u-churn", 7L, "b"), ("u-churn", 14L, "c"),
      // half: 1 change in 2 observations -> 500000 ppm
      ("u-half", 0L, "a"), ("u-half", 7L, "a"), ("u-half", 14L, "b"),
      // single snapshot -> default 500000 ppm
      ("u-one", 14L, "a")
    ).toDF("url", "day", "h")
    val got = Robots.revisitSchedule(snaps, "url", "day", "h",
        nowDay = 40L, minDays = 2L, maxDays = 30L)
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    def f(u: String, c: String) = got(u).getAs[Long](c)
    assert(f("u-static", "change_ppm") === 0L)
    assert(f("u-static", "interval_days") === 30L)
    assert(f("u-static", "next_due_day") === 44L)
    assert(f("u-static", "overdue_days") === 0L) // due in the future
    assert(f("u-churn", "change_ppm") === 1000000L)
    assert(f("u-churn", "interval_days") === 2L)
    assert(f("u-churn", "overdue_days") === 40L - 16L)
    assert(f("u-half", "change_ppm") === 500000L)
    assert(f("u-half", "interval_days") === 30L - 14L) // 30 - 28/2
    assert(f("u-one", "n_snaps") === 1L)
    assert(f("u-one", "change_ppm") === 500000L)
    assert(f("u-one", "interval_days") === 16L)
  }

  test("revisitSchedule: two snapshots on the SAME day order by hash " +
      "— n_changes is stable across partitionings") {
    import spark.implicits._
    // day 7 has two crawls ("a" then "b" in hash order): pairs are
    // (a,a)=0, (a,b)=1, (b,c)=1 -> n_changes 2 under ANY partitioning
    val snaps = Seq(("u", 0L, "a"), ("u", 7L, "b"), ("u", 7L, "a"),
      ("u", 14L, "c")).toDF("url", "day", "h")
    def run(df: org.apache.spark.sql.DataFrame): Long =
      Robots.revisitSchedule(df, "url", "day", "h", nowDay = 40L)
        .collect()(0).getAs[Long]("n_changes")
    assert(run(snaps) === 2L)
    assert(run(snaps.repartition(7)) === 2L)
    assert(run(snaps.repartition(3).sortWithinPartitions(desc("h")))
      === 2L)
  }

  test("sitemapUrls: cross-group directive, order, comments, " +
      "relative and case handling") {
    import spark.implicits._
    def urls(txt: String): Seq[String] =
      Seq(txt).toDF("t").select(Robots.sitemapUrls(col("t")))
        .head.getSeq[String](0)
    // applies file-wide, even inside a FOREIGN agent's group
    assert(urls("User-agent: googlebot\nDisallow: /\n" +
      "Sitemap: http://h/g.xml\n") === Seq("http://h/g.xml"))
    // multiple directives all kept, file order preserved
    assert(urls("Sitemap: https://h/a.xml\nUser-agent: *\n" +
      "Sitemap: https://h/b.xml\n")
      === Seq("https://h/a.xml", "https://h/b.xml"))
    // comments strip first; relative values are malformed -> dropped;
    // directive case-insensitive, value case/trim preserved-stripped
    assert(urls("# Sitemap: https://h/x.xml\nSitemap: /local.xml\n")
      === Seq.empty)
    assert(urls("SITEMAP:   https://h/S2.XML  \n")
      === Seq("https://h/S2.XML"))
    assert(urls("User-agent: *\nDisallow: /z\n") === Seq.empty)
  }
}
