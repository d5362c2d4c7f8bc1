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
}
