package graft.gen

import graft.model.Page
import java.sql.Timestamp
import scala.util.Random

/** Deterministic synthetic pages-table generator (FIXTURES.md §1).
  * Every page is a pure function of (seed, idx) — independent of
  * partitioning and evaluation order — so goldens and parallelism
  * invariance tests are exact. No external data.
  *
  * Row classes embed the reference's document shapes
  * (/root/reference/pipeline/extractors/positions.py,
  * trade_information.py, fx_tf.py, others.py): Positions pages with
  * continuation rows, Transaction-list pages exercising every
  * transaction_type rule (incl. SPOT-without-SALE), FX pairs, Others,
  * Ignore/TOC, boilerplate-heavy pages, minimal PDFs (both layouts as
  * markdown pipe tables), and near-empty pages. A hot host
  * (idx % 5 == 0) creates genuine skew for the salting path.
  */
object PagesGen {

  /** Bump on any change to generated content — benchmark tables cached
    * on disk are keyed by this.
    */
  val Version = 4

  val Currencies = Vector("SGD", "USD", "CHF", "HKD", "EUR", "GBP", "JPY",
    "AUD", "CAD")

  private val BookingTexts = Vector(
    "FX FORWARD settlement", "FX SPOT conversion", "SPOT conversion deal",
    "SPOT SALE of holdings", "SOLD FOR YOU AS AGENT", "YOUR SALE of units",
    "SEC. DELIVERY AGAINST PAYMENT", "SALE SPOT executed",
    "SOLD TO YOU AS PRINCIPAL", "NEW ISSUE PURCHASE", "YOUR PURCHASE order",
    "SEC. RECEIPT AGAINST PAYMENT", "REDEMPTION of fund units",
    "FRAMEWORK REDEMPTION partial", "REDUCTION of deposit",
    "REPAYMENT of principal", "INTEREST CAP. applied",
    "UBS Call Deposit increase", "Portfolio increase booked",
    "new investment subscription", "Coupon payment received",
    "Custody fee charged")

  private val SecurityNames = Vector(
    "Global Equity Fund", "Asia Bond 2.5% 2030", "Tech Growth ETF",
    "Sovereign Bond 1.75% 2028", "Emerging Markets Fund",
    "Green Energy Notes", "Dividend Aristocrats ETF", "Money Market Fund",
    "Infrastructure Trust", "Real Estate Income Fund")

  private val Fillers = Vector("market", "review", "outlook", "summary",
    "analysis", "update", "quarterly", "report", "performance", "holdings",
    "allocation", "strategy", "balanced", "growth", "income", "global")

  def rngFor(seed: Long, idx: Long): Random =
    new Random(seed * 0x9E3779B97F4A7C15L + idx * 0xC2B2AE3D27D4EB4FL)

  private def host(rng: Random, idx: Long): String =
    if (idx % 5 == 0) "hot.example.com"
    else s"site${rng.nextInt(500)}.example.org"

  private def money(rng: Random): String = {
    val kind = rng.nextInt(20)
    val v: Long =
      if (kind == 0) 1000000000000L + rng.nextInt(1000000) // 13 int digits → VAL_RANGE
      else 100L + rng.nextInt(2000000)
    // thousands separated with apostrophe like Swiss bank statements
    val grouped = v.toString.reverse.grouped(3).mkString("'").reverse
    if (kind == 1) f"$grouped.${rng.nextInt(1000)}%03d" // 3 decimals → VAL_RANGE
    else f"$grouped.${rng.nextInt(100)}%02d"
  }

  private def dateStr(rng: Random): String =
    // ~1 in 10 dates lands on day 29-31 of Feb/Apr: a mix of
    // calendar-invalid (30.02, 31.04, 29.02 non-leap) and valid
    // (29.02.2024, 30.04) shapes that exercises VAL_DATE + leap logic
    if (rng.nextInt(10) == 0)
      f"${29 + rng.nextInt(3)}%02d.${2 + rng.nextInt(2) * 2}%02d.${2023 + rng.nextInt(3)}%04d"
    else
      f"${1 + rng.nextInt(28)}%02d.${1 + rng.nextInt(12)}%02d.${2023 + rng.nextInt(3)}%04d"

  private def isin(rng: Random): String = {
    val cc = Vector("US", "CH", "SG", "DE", "GB")(rng.nextInt(5))
    val mid = (1 to 9).map(_ => "ABCDEFGHIJ0123456789"(rng.nextInt(20))).mkString
    s"$cc$mid${rng.nextInt(10)}"
  }

  private def account(rng: Random): String =
    f"${rng.nextInt(1000)}%03d-${rng.nextInt(1000000)}%06d.${('A' + rng.nextInt(26)).toChar}${('A' + rng.nextInt(26)).toChar}${rng.nextInt(10)}"

  private def portfolio(rng: Random): String =
    f"${rng.nextInt(1000)}%03d-${rng.nextInt(1000000)}%06d-${rng.nextInt(100)}%02d"

  private def sentence(rng: Random, n: Int): String =
    (1 to n).map(_ => Fillers(rng.nextInt(Fillers.length))).mkString(" ")

  private def nav(rng: Random): String = {
    val links = (1 to 6 + rng.nextInt(6))
      .map(i => s"""<a href="/p$i">${Fillers(rng.nextInt(Fillers.length))}</a>""")
      .mkString(" ")
    s"<nav>$links</nav>"
  }

  private def footer(rng: Random): String = {
    val links = (1 to 8).map(i => s"""<a href="/f$i">${Fillers(rng.nextInt(Fillers.length))} ${Fillers(rng.nextInt(Fillers.length))}</a>""").mkString(" ")
    s"<footer>$links <p>All rights reserved legal notice terms</p></footer>"
  }

  private def htmlPage(rng: Random, body: String): String =
    s"""<html><head><title>statement page</title><style>.x{color:red}</style></head><body>${nav(rng)}$body${footer(rng)}</body></html>"""

  private def positionsBody(rng: Random): String = {
    val port = portfolio(rng)
    val client = s"Client ${('A' + rng.nextInt(26)).toChar}. ${Fillers(rng.nextInt(Fillers.length)).capitalize}"
    // varying statement dates: valuation_date must come from the page
    val intro =
      s"""<p>Portfolio number $port</p><p>$client</p><p>Statement of assets valued as of ${dateStr(rng)} ${sentence(rng, 18)}</p>"""
    val nRows = 2 + rng.nextInt(4)
    val rows = (1 to nRows).flatMap { _ =>
      val ccy = Currencies(rng.nextInt(Currencies.length))
      val qty = (100 * (1 + rng.nextInt(500))).toString
      val name = SecurityNames(rng.nextInt(SecurityNames.length))
      val price = f"${50 + rng.nextInt(200)}%d.${rng.nextInt(100)}%02d"
      val value = money(rng)
      val main =
        s"<tr><td>$qty $name</td><td>$ccy</td><td>$price</td><td>${money(rng)}</td><td>$value</td></tr>"
      val cont =
        s"<tr><td>ISIN ${isin(rng)}</td><td>${account(rng)}</td><td></td><td></td><td></td></tr>"
      if (rng.nextBoolean()) Seq(main, cont) else Seq(main)
    }.mkString("")
    val currencyRow = {
      val ccy = Currencies(rng.nextInt(Currencies.length))
      s"<tr><td>$ccy</td><td>0.00 Call account balance</td><td></td><td></td><td>${money(rng)}</td></tr>"
    }
    val table =
      s"<table><thead><tr><th>Description</th><th>Ccy</th><th>Market price</th><th>Cost</th><th>Market value</th></tr></thead><tbody>$rows$currencyRow<tr><td>Total</td><td></td><td></td><td></td><td>${money(rng)}</td></tr></tbody></table>"
    s"<h1>Detailed positions</h1>$intro$table"
  }

  private def transactionBody(rng: Random, fxHeavy: Boolean,
      heading: String = "Transaction list"): String = {
    val port = portfolio(rng)
    val intro =
      s"""<p>Portfolio number $port</p><p>Client ${('A' + rng.nextInt(26)).toChar}. Holder</p><p>Statement of assets and transactions ${sentence(rng, 14)}</p>"""
    val nRows = 3 + rng.nextInt(5)
    val rows = (1 to nRows).map { _ =>
      val d1 = dateStr(rng); val d2 = dateStr(rng)
      val booking =
        if (fxHeavy && rng.nextInt(10) < 7)
          Vector("FX FORWARD deal", "FX SPOT conversion", "SPOT conversion")(rng.nextInt(3))
        else BookingTexts(rng.nextInt(BookingTexts.length))
      // occasional off-list alpha token where the currency sits → VAL_CURR
      val ccy =
        if (rng.nextInt(15) == 0) Vector("XBT", "ZZZ", "Fee")(rng.nextInt(3))
        else Currencies(rng.nextInt(Currencies.length))
      val amt = money(rng)
      val name = SecurityNames(rng.nextInt(SecurityNames.length))
      val extra =
        if (booking.startsWith("FX"))
          s"You bought $ccy ${money(rng)} You sold ${Currencies(rng.nextInt(Currencies.length))} ${money(rng)} $ccy - ${account(rng)}"
        else s"ISIN ${isin(rng)} ${account(rng)}"
      s"<tr><td>$d1</td><td>$booking</td><td>$ccy $amt</td><td>$name $extra</td><td>${money(rng)}</td><td>$d2</td><td></td><td>${money(rng)}</td></tr>"
    }.mkString("")
    // a noise row that fails the date+type filter
    val noise = s"<tr><td>Balance</td><td></td><td>${money(rng)}</td></tr>"
    val table =
      s"<table><thead><tr><th>Date</th><th>Booking text</th><th>Amount</th><th>Description</th><th>Price</th><th>Value date</th><th>Fee</th><th>Total</th></tr></thead><tbody>$rows$noise</tbody></table>"
    s"<h1>$heading</h1>$intro$table"
  }

  private def othersBody(rng: Random): String = {
    val rows = (1 to 3 + rng.nextInt(3)).map { _ =>
      s"<tr><td>${sentence(rng, 2)}</td><td>${money(rng)}</td><td>${dateStr(rng)}</td></tr>"
    }.mkString("")
    s"<h1>Account summary</h1><p>${sentence(rng, 20)}</p><table><tbody>$rows</tbody></table>"
  }

  private def ignoreBody(rng: Random): String =
    s"<h1>Table of contents</h1><p>${sentence(rng, 8)}</p><p>1. Overview 2. Performance 3. Important information</p>"

  private def boilerplateBody(rng: Random): String = {
    val linkFarm = (1 to 20).map(i =>
      s"""<a href="/x$i">${Fillers(rng.nextInt(Fillers.length))}</a>""").mkString(" ")
    s"""<div>$linkFarm</div><h2>Market commentary</h2><p>${sentence(rng, 45)}</p><p>${sentence(rng, 30)}</p><div>$linkFarm</div>"""
  }

  /** Minimal deterministic PDF: one uncompressed content stream PER
    * page, Helvetica, text placed with Td/Tj line by line.
    */
  def buildPdfPages(pageLines: Seq[Seq[String]]): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def contentOf(lines: Seq[String]): String = {
      val content = new StringBuilder("BT /F1 10 Tf 50 780 Td ")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) content.append("0 -14 Td ")
        content.append(s"(${esc(l)}) Tj ")
      }
      content.append("ET")
      content.toString
    }
    val nPages = pageLines.length
    val fontObj = 3 + 2 * nPages
    val kids = (0 until nPages).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    val pageObjs = pageLines.zipWithIndex.map { case (lines, p) =>
      val pageNum = 3 + 2 * p
      val contentNum = pageNum + 1
      val cs = contentOf(lines)
      s"""$pageNum 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $contentNum 0 R /Resources << /Font << /F1 $fontObj 0 R >> >> >> endobj
$contentNum 0 obj << /Length ${cs.length} >> stream
$cs
endstream endobj"""
    }.mkString("\n")
    val pdf =
      s"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj
$pageObjs
$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
trailer << /Root 1 0 R >>
%%EOF"""
    pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  def buildPdf(lines: Seq[String]): Array[Byte] = buildPdfPages(Seq(lines))

  private def pdfLines(rng: Random, positions: Boolean): Seq[String] = {
    if (positions) {
      val port = portfolio(rng)
      Seq(
        "# Detailed positions",
        s"Portfolio number $port",
        s"Statement of assets as of ${dateStr(rng)}",
        "| Description | Ccy | Market price | Cost | Market value |",
        "| --- | --- | --- | --- | --- |") ++
        (1 to 2 + rng.nextInt(3)).flatMap { _ =>
          val ccy = Currencies(rng.nextInt(Currencies.length))
          val qty = (100 * (1 + rng.nextInt(500))).toString
          val name = SecurityNames(rng.nextInt(SecurityNames.length))
          Seq(
            s"| $qty $name | $ccy | ${50 + rng.nextInt(200)}.25 | ${money(rng)} | ${money(rng)} |",
            s"| ISIN ${isin(rng)} ${account(rng)} | | | | |")
        }
    } else {
      Seq(
        "# Transaction list",
        s"Portfolio number ${portfolio(rng)}",
        "| Date | Booking text | Amount | Description |",
        "| --- | --- | --- | --- |") ++
        (1 to 3 + rng.nextInt(3)).map { _ =>
          val booking = BookingTexts(rng.nextInt(BookingTexts.length))
          val ccy = Currencies(rng.nextInt(Currencies.length))
          s"| ${dateStr(rng)} | $booking | $ccy ${money(rng)} | ISIN ${isin(rng)} ${account(rng)} |"
        }
    }
  }

  /** The page for (seed, idx) — the single source of truth.
    *
    * @param boost size multiplier: appends (boost-1) extra long filler
    *              paragraphs so benchmark pages approximate real
    *              Common-Crawl page sizes (~10-50 KB) while staying
    *              deterministic. boost=1 (tests) keeps pages ~2 KB.
    */
  def pageFor(idx: Long, seed: Long = 42L, boost: Int = 1): Page = {
    val rng = rngFor(seed, idx)
    val h = host(rng, idx)
    val filler =
      if (boost <= 1) ""
      else (1 until boost)
        .map(_ => s"<p>${sentence(rng, 120)}</p>").mkString
    val cls = (idx % 100).toInt
    val (payload, lang): (Array[Byte], String) = cls match {
      case c if c < 22 =>
        (htmlPage(rng, positionsBody(rng) + filler).getBytes("UTF-8"), "en")
      case c if c < 38 =>
        (htmlPage(rng, transactionBody(rng, fxHeavy = false) + filler).getBytes("UTF-8"), "en")
      case c if c < 46 =>
        (htmlPage(rng, transactionBody(rng, fxHeavy = true) + filler).getBytes("UTF-8"), "en")
      // Trade-headed pages (classified "Trade" via "Trade information")
      case c if c < 52 =>
        (htmlPage(rng, transactionBody(rng, fxHeavy = false,
          heading = "Trade information") + filler).getBytes("UTF-8"), "en")
      // FXTF-headed pages (classified "FXTF" via "FX & TF")
      case c if c < 58 =>
        (htmlPage(rng, transactionBody(rng, fxHeavy = true,
          heading = "FX & TF") + filler).getBytes("UTF-8"), "en")
      case c if c < 66 =>
        (htmlPage(rng, othersBody(rng) + filler).getBytes("UTF-8"), "en")
      case c if c < 74 =>
        (htmlPage(rng, ignoreBody(rng) + filler).getBytes("UTF-8"), "en")
      case c if c < 82 =>
        (htmlPage(rng, boilerplateBody(rng) + filler).getBytes("UTF-8"),
          Vector("en", "de", "fr")(rng.nextInt(3)))
      case c if c < 88 =>
        (buildPdf(pdfLines(rng, positions = rng.nextBoolean())), "en")
      // multi-page PDFs: 2-3 pages, mixed positions/transaction layouts
      case c if c < 91 =>
        val nPg = 2 + rng.nextInt(2)
        (buildPdfPages((1 to nPg).map(_ =>
          pdfLines(rng, positions = rng.nextBoolean()))), "en")
      case c if c < 97 =>
        ((if (rng.nextBoolean()) "" else "   \n  ").getBytes("UTF-8"), "und")
      case _ =>
        // markdown-table variant delivered as plain-text-ish HTML <pre>
        (htmlPage(rng,
          s"<h1>Detailed positions</h1><p>Portfolio number ${portfolio(rng)}</p><p>${pdfLines(rng, positions = true).drop(3).mkString("<br>")}</p>")
          .getBytes("UTF-8"), "en")
    }
    val ts = new Timestamp(1704067200000L + (idx % 31536000L) * 1000L)
    Page(s"https://$h/page/$idx", ts, payload, null, lang)
  }

  /** Distributed generation: pure function of the range index. */
  def pages(spark: org.apache.spark.sql.SparkSession, n: Long,
      seed: Long = 42L, partitions: Int = 32, boost: Int = 1)
      : org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => pageFor(i, seed, boost))
  }
}
