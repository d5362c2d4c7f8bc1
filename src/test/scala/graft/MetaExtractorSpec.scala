package graft

import graft.extract.MetaExtractor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetaExtractorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def metaOf(url: String, html: String)
      : org.apache.spark.sql.Row = {
    import spark.implicits._
    MetaExtractor.pageMeta(
      Seq((url, html)).toDF("url", "html"), "url", "html").head()
  }

  test("pageMeta: tag/attribute variations the oracle plant skips") {
    val r = metaOf("http://h.example.com/a/b/c.html",
      """<HTML><HEAD>
        |<TITLE id="t"> Hello &amp;amp; <i>world</i>
        |  again </TITLE>
        |<title>second title ignored</title>
        |<meta CONTENT='a "quoted" word' NAME='description'>
        |<META name="keywords" content="k1,&#39;k2&#39;">
        |<meta property='og:title' content='OG &lt;t&gt;'/>
        |<link REL='canonical' HREF='../c/p.html'>
        |<meta name="robots" content="NONE,noindexing,noindex">
        |</HEAD><body></body></HTML>""".stripMargin)
    // first title wins; markup stripped; &amp;amp; decodes ONCE (amp
    // last ⇒ no double-decode); whitespace collapsed
    assert(r.getAs[String]("title") === "Hello &amp; world again")
    // attribute order free, single quotes, inner double quotes survive
    assert(r.getAs[String]("description") === "a \"quoted\" word")
    assert(r.getAs[String]("keywords") === "k1,'k2'")
    assert(r.getAs[String]("og_title") === "OG <t>")
    assert(r.getAs[String]("og_type") === "")
    // relative canonical resolves against the page url (no <base>)
    assert(r.getAs[String]("canonical_raw") === "../c/p.html")
    assert(r.getAs[String]("canonical_abs") ===
      "http://h.example.com/a/c/p.html")
    assert(r.getAs[String]("base_href") === "")
    // token match: "noindexing" must NOT count; bare "noindex" does
    assert(r.getAs[Boolean]("noindex"))
    assert(!r.getAs[Boolean]("nofollow_meta"))
    assert(r.getAs[Int]("n_meta_tags") === 4)
  }

  test("pageMeta: absent tags are deterministic empties; base shifts") {
    val none = metaOf("http://h.com/x", "<html><body>no head</body></html>")
    assert(none.getAs[String]("title") === "")
    assert(none.getAs[String]("description") === "")
    assert(none.getAs[String]("canonical_abs") === "")
    assert(!none.getAs[Boolean]("noindex"))
    assert(none.getAs[Int]("n_meta_tags") === 0)

    // absolute <base href> replaces the resolution base; a relative
    // <base> is ignored (documented subset)
    val shifted = metaOf("http://h.com/a/b.html",
      """<base href="http://other.org/d/e/">""" +
        """<link rel="canonical" href="x.html">""")
    assert(shifted.getAs[String]("canonical_abs") ===
      "http://other.org/d/e/x.html")
    val relBase = metaOf("http://h.com/a/b.html",
      """<base href="/d/"><link rel="canonical" href="x.html">""")
    assert(relBase.getAs[String]("canonical_abs") === "http://h.com/a/x.html")
  }

  test("jsonLd: no ld+json block -> no rows; nested/array author forms; " +
      "plain <script> never matches") {
    import spark.implicits._
    val pages = Seq(
      ("u0", "<html><script>var a=1;</script>" +
        "<script type='text/javascript'>b()</script><body>x</body></html>"),
      ("u1", "<script type=\"application/ld+json\">" +
        "{\"@type\":\"Article\",\"author\":[{\"name\":\"A\"}]}</script>")
    ).toDF("url", "html")
    val r = MetaExtractor.jsonLd(pages, "url", "html").collect()
    // u0 has scripts but none typed ld+json: zero rows
    assert(r.forall(_.getString(0) == "u1") && r.length === 1)
    // author as ARRAY of objects: neither the object-form path nor the
    // plain-string fallback applies -> null (documented subset), and
    // the row still parses as valid
    val row = r.head
    assert(row.getAs[Boolean]("valid"))
    assert(row.getAs[String]("ld_type") === "Article")
    assert(row.isNullAt(row.fieldIndex("author_name")))
  }

  test("feedLinks: UNQUOTED hrefs are valid HTML and must be " +
      "discovered; genuinely hrefless feed tags still drop") {
    import spark.implicits._
    val pages = Seq(("http://h.example.com/blog/p.html",
      "<head>" +
        "<link rel=\"alternate\" type=\"application/rss+xml\" " +
        "href=/feed.xml>" + // unquoted absolute-path href
        "<link rel=\"alternate\" type=\"application/atom+xml\" " +
        "href=atom.xml>" +  // unquoted relative href
        "<link rel=\"alternate\" type=\"application/rss+xml\">" +
        "</head>")).toDF("url", "html")
    val got = MetaExtractor.feedLinks(pages, "url", "html")
      .orderBy("link_pos").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0, "rss", "http://h.example.com/feed.xml"),
      (1, "atom", "http://h.example.com/blog/atom.xml")))
  }
}
