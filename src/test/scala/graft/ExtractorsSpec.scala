package graft

import graft.extract.{ContentExtractor, HtmlExtractor, PdfExtractor}
import graft.gen.PagesGen
import org.scalatest.funsuite.AnyFunSuite

class ExtractorsSpec extends AnyFunSuite {

  test("html: blocks, headings, tables, boilerplate") {
    val html =
      """<html><body>
        |<nav><a href="/">home</a> <a href="/x">about</a> <a href="/y">contact us</a></nav>
        |<h1>Detailed positions</h1>
        |<p>This is the real main content of the page with enough words to
        |pass the boilerpipe word-count threshold for content blocks.</p>
        |<table><thead><tr><th>A</th></tr></thead><tbody><tr><td>1 Bond</td></tr></tbody></table>
        |<footer><a href="/p">privacy</a> <a href="/t">terms</a></footer>
        |</body></html>""".stripMargin
    val c = HtmlExtractor.extract(html.getBytes("UTF-8"))
    assert(c.content_kind === "html")
    // page_md keeps everything, markdown-ized
    assert(c.page_md.contains("# Detailed positions"))
    assert(c.page_md.contains("<table><thead>"))
    // main_text drops the nav/footer link blocks
    assert(c.main_text.contains("real main content"))
    assert(!c.main_text.contains("privacy"))
    assert(!c.main_text.contains("home about"))
    // spans index into main_text
    c.spans.foreach { s =>
      assert(s.start >= 0 && s.end <= c.main_text.length && s.start <= s.end)
    }
    val headingSpan = c.spans.find(_.kind == "heading")
    assert(headingSpan.isDefined)
    val hs = headingSpan.get
    assert(c.main_text.substring(hs.start, hs.end) === "Detailed positions")
  }

  test("html: entity decode and script skip") {
    val html = "<p>a &amp; b &lt;c&gt;</p><script>var x = '<p>no</p>';</script>"
    val c = HtmlExtractor.extract(html.getBytes("UTF-8"))
    assert(c.page_md.contains("a & b <c>"))
    assert(!c.page_md.contains("var x"))
  }

  test("html: malformed input never throws") {
    val bads = Seq("<", "<table>", "<a<b>>", "</p></p><td>x", "&#xx;", "<!--")
    bads.foreach { b =>
      val c = HtmlExtractor.extract(b.getBytes("UTF-8"))
      assert(c.content_kind === "html")
    }
  }

  test("pdf: build + parse round trip preserves lines in reading order") {
    val lines = Seq("# Transaction list", "Portfolio number 123-456789-01",
      "| 01.02.2024 | YOUR SALE | USD 1'000.00 |", "last (line) with parens")
    val pdf = PagesGen.buildPdf(lines)
    assert(PdfExtractor.isPdf(pdf))
    val c = PdfExtractor.extract(pdf)
    assert(c.content_kind === "pdf")
    assert(c.page_md === lines.mkString("\n"))
    assert(c.main_text === lines.mkString("\n"))
    assert(c.spans.length === lines.length)
  }

  test("pdf: multi-page — pages in order, never y-interleaved") {
    // both pages place text at the same y coordinates; per-page parsing
    // must keep page 1's lines strictly before page 2's
    val p1 = Seq("# Detailed positions", "Portfolio number 111-222333-44",
      "| 100 Fund A | USD | 1.00 | 2.00 | 3.00 |")
    val p2 = Seq("# Transaction list",
      "| 01.02.2024 | YOUR SALE | USD 1'000.00 |")
    val pdf = PagesGen.buildPdfPages(Seq(p1, p2))
    assert(PdfExtractor.isPdf(pdf))
    val c = PdfExtractor.extract(pdf)
    assert(c.content_kind === "pdf")
    assert(c.page_md === (p1 ++ p2).mkString("\n"))
    assert(c.spans.length === p1.length + p2.length)
  }

  test("pdf: garbage degrades gracefully") {
    val c = PdfExtractor.extract("%PDF-1.4 garbage".getBytes)
    assert(c.content_kind === "pdf" || c.content_kind === "error")
    assert(c.error.nonEmpty || c.page_md.isEmpty)
  }

  test("dispatch: empty / pdf / html") {
    assert(ContentExtractor.extract(Array.empty[Byte]).content_kind === "empty")
    assert(ContentExtractor.extract("  ".getBytes).content_kind === "empty")
    assert(ContentExtractor.extract(PagesGen.buildPdf(Seq("x")))
      .content_kind === "pdf")
    assert(ContentExtractor.extract("<p>hello</p>".getBytes)
      .content_kind === "html")
  }

  test("generator is deterministic and pure in (seed, idx)") {
    val a = PagesGen.pageFor(7, 42)
    val b = PagesGen.pageFor(7, 42)
    assert(a.url === b.url)
    assert(a.html.toSeq === b.html.toSeq)
    val c = PagesGen.pageFor(7, 43)
    assert(a.html.toSeq !== c.html.toSeq)
  }

  test("generator covers all row classes and extraction works on each") {
    (0L until 100L).foreach { i =>
      val p = PagesGen.pageFor(i, 42)
      val c = ContentExtractor.extract(p.html)
      assert(c.content_kind !== "error", s"idx $i: ${c.error}")
    }
  }
}
