package graft

import graft.extract.LinkExtractor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkExtractorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def resolve(base: String, href: String): String = {
    import spark.implicits._
    Seq((base, href)).toDF("b", "h")
      .select(LinkExtractor.resolveUrl(col("b"), col("h")))
      .head().getString(0)
  }

  test("resolveUrl: RFC 3986 reference-resolution subset") {
    val base = "http://h.example.com/a/b/c.html"
    // absolute passes through (fragment stripped)
    assert(resolve(base, "https://x.org/p#f") === "https://x.org/p")
    // other schemes are absolute too
    assert(resolve(base, "mailto:x@y.z") === "mailto:x@y.z")
    // scheme-relative takes the base scheme
    assert(resolve(base, "//cdn.net/l.js") === "http://cdn.net/l.js")
    // root-relative takes the base authority
    assert(resolve(base, "/idx/2") === "http://h.example.com/idx/2")
    // relative merges with the base directory
    assert(resolve(base, "d.html") === "http://h.example.com/a/b/d.html")
    // dot segments removed exactly
    assert(resolve(base, "../d.html") === "http://h.example.com/a/d.html")
    assert(resolve(base, "../../d.html") === "http://h.example.com/d.html")
    // .. past the root stays at the root (RFC 5.2.4)
    assert(resolve(base, "../../../../d") === "http://h.example.com/d")
    assert(resolve(base, "./x/./y") === "http://h.example.com/a/b/x/y")
    // fragment-only / empty href resolve to the base sans fragment
    assert(resolve(base, "#top") === base)
    assert(resolve(base, "") === base)
    // base with no path: directory is "/"
    assert(resolve("http://h.com", "p.html") === "http://h.com/p.html")
  }

  test("hrefOf: double-quoted, single-quoted and unquoted attributes") {
    import spark.implicits._
    val got = Seq(
      """<a href="dq.html">x</a>""",
      """<a class='k' href='sq.html'>x</a>""",
      """<a href=uq.html rel=nofollow>x</a>""",
      """<a HREF="case.html">x</a>""",
      """<a name="top">x</a>""").toDF("tag")
      .select(LinkExtractor.hrefOf(col("tag"))).as[String].collect()
    assert(got === Seq("dq.html", "sq.html", "uq.html", "case.html", ""))
  }

  test("extractLinks: positions, anchor text, nofollow, href-less drop") {
    import spark.implicits._
    val html = """<html><body>
      |<a href="/a">first <b>bold</b>   text</a>
      |<a name="x">not a link</a>
      |<A rel="nofollow external" href=//c.net/z>upper</A>
      |</body></html>""".stripMargin
    val rows = LinkExtractor.extractLinks(
      Seq(("http://h.com/d/p.html", html)).toDF("url", "html"),
      "url", "html")
      .orderBy("link_pos")
      .collect()
    assert(rows.length === 2)
    val r0 = rows(0)
    assert(r0.getAs[Int]("link_pos") === 0)
    assert(r0.getAs[String]("href_raw") === "/a")
    assert(r0.getAs[String]("href_abs") === "http://h.com/a")
    assert(r0.getAs[String]("anchor") === "first bold text")
    assert(!r0.getAs[Boolean]("nofollow"))
    val r1 = rows(1)
    assert(r1.getAs[Int]("link_pos") === 2) // named anchor keeps its slot
    assert(r1.getAs[String]("href_abs") === "http://c.net/z")
    assert(r1.getAs[Boolean]("nofollow"))
  }

  test("hostEdges: nofollow and non-http dropped, multi-edges kept") {
    import spark.implicits._
    val html = """<a href="http://x.com/1">a</a>
      |<a href="http://x.com/2">b</a>
      |<a rel='nofollow' href="http://spam.com/">c</a>
      |<a href="mailto:a@b.c">d</a>""".stripMargin
    val edges = LinkExtractor.hostEdges(
      LinkExtractor.extractLinks(
        Seq(("http://h.com:80/p", html)).toDF("url", "html"),
        "url", "html"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq === Seq(("h.com", "x.com"), ("h.com", "x.com")))
  }
}
