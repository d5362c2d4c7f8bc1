package graft.pipeline

import graft.extract.ContentExtractor
import graft.model.Page
import graft.rules.{RuleSet, ScalarRules}
import graft.textops.{ParsedTable, TextOps}
import scala.collection.mutable.ArrayBuffer

/** Non-Spark reference evaluator of the full pipeline semantics —
  * the second implementation behind the golden byte-identity tests
  * (SURVEY §5.2-3). Shares the scalar kernels (ContentExtractor,
  * TextOps, ScalarRules) with the Spark path; everything the Spark path
  * expresses as Columns/windows is re-implemented here as plain loops,
  * mirroring the reference's Python
  * (/root/reference/pipeline/orchestrator.py:51-188).
  */
object ScalarEvaluator {

  private val BuyPat = "You bought ([A-Z]{3}) ([0-9',\\. ]*\\d)".r
  private val SellPat = "You sold ([A-Z]{3}) ([0-9',\\. ]*\\d)".r

  private case class Seg(cells: Seq[String], var text: String,
      tableIdx: Int, rowIdx: Int)

  def tablesOf(pageMd: String): Seq[ParsedTable] =
    TextOps.parseHtmlTables(pageMd) ++ TextOps.parseMarkdownTables(pageMd)

  /** Enumerate table rows with header-as-data repair (G3) applied —
    * SHARED by this evaluator and the Spark pipeline's flatMap, so both
    * paths see identical rows by construction. Positions repair:
    * header[0] starts with digit/currency (orchestrator.py:73-87);
    * Transaction repair: header[0] contains a DD.MM.YYYY date
    * (orchestrator.py:144-155).
    */
  def enumerateRows(pageType: String, pageMd: String)
      : Seq[(Int, Int, Seq[String])] =
    tablesOf(pageMd).zipWithIndex.flatMap { case (t, tIdx) =>
      val rows: Seq[Seq[String]] = pageType match {
        case "Positions" if t.headers.nonEmpty =>
          val firstH = t.headers.head.trim
          if (firstH.nonEmpty && (firstH.head.isDigit ||
              TextOps.startsWithCurrency(firstH))) t.headers +: t.rows
          else t.rows
        // Trade/FXTF-classified pages carry the same transaction-row
        // shape; TradeInformationPlugin applies the identical
        // date-in-header repair (trade_information.py:67-74).
        case ("Transaction" | "Trade" | "FXTF") if t.headers.nonEmpty &&
            TextOps.extractDates(t.headers.head).nonEmpty =>
          t.headers +: t.rows
        // Others iterates data rows only (others.py:43), like default
        case _ => t.rows
      }
      rows.zipWithIndex.map { case (cells, rIdx) => (tIdx, rIdx, cells) }
    }

  /** Full pipeline for one page: extract → classify → segment → route →
    * extract fields → validate. Returns the per-page records.
    */
  def process(page: Page, rs: RuleSet): Seq[ExtractedRecord] = {
    val content = ContentExtractor.extract(page.html)
    processMd(page.url, content.page_md, rs)
  }

  def processMd(url: String, pageMd: String, rs: RuleSet): Seq[ExtractedRecord] = {
    if (pageMd.isEmpty) return Nil
    val pageType = ScalarRules.effectivePageType(pageMd, rs)

    val portfolioNo = TextOps.extractPortfolioNo(pageMd).getOrElse("")
    val clientName = TextOps.extractClientName(pageMd).getOrElse("")
    val asOfDate = TextOps.extractAsOfDate(pageMd).getOrElse("")
    val out = ArrayBuffer.empty[ExtractedRecord]

    pageType match {
      case "Positions" =>
        // orchestrator.py:58-137 — stateful main/continuation stitching
        val segs = ArrayBuffer.empty[Seg]
        enumerateRows(pageType, pageMd).foreach { case (tIdx, rIdx, cells) =>
          val rowText = cells.mkString(" ").trim
          if (rowText.nonEmpty && !TextOps.lower(rowText).startsWith("total")) {
            val firstCol = cells.headOption.getOrElse("").trim
            // ASCII digit, matching the Column twin's `^[0-9]` exactly
            // (deviation from Python's Unicode isdigit, documented:
            // the parity contract between the two backends wins)
            val isMain = firstCol.nonEmpty &&
              ((firstCol.head >= '0' && firstCol.head <= '9') ||
                TextOps.startsWithCurrency(firstCol)) &&
              !TextOps.startsWithDate(firstCol)
            if (isMain) segs += Seg(cells, rowText, tIdx, rIdx)
            else if (segs.nonEmpty) segs.last.text += " " + rowText
          }
        }
        segs.foreach { s =>
          out += extractPositions(url, pageType, s.cells, s.text, portfolioNo,
            asOfDate)
        }
      case "Transaction" | "Trade" | "FXTF" =>
        // orchestrator.py:139-188 — per-row records. Trade/FXTF pages
        // share the transaction-row shape (trade_information.py:81-85);
        // per-row classify_record routes FX rows regardless of page type.
        enumerateRows(pageType, pageMd).foreach { case (_, _, cells) =>
          if (cells.nonEmpty) {
            val validDate = TextOps.startsWithDate(cells.head.trim)
            val hasType = cells.length > 1 && cells(1).trim.nonEmpty
            if (validDate && hasType) {
              val rowText = cells.mkString(" ")
              val (group, ttype) = ScalarRules.classifyRecord(rowText, rs)
              out += extractTrade(url, pageType, group, ttype, cells, rowText,
                clientName, rs)
            }
          }
        }
      case "Others" =>
        // OthersPlugin.extract (others.py:33-63): all table rows; keep
        // rows with ≥2 cells that are non-empty and contain an ASCII
        // alphanumeric (C10 noise filter; ASCII to match the Column twin)
        enumerateRows(pageType, pageMd).foreach { case (_, _, cells) =>
          val content = cells.count(c => c.trim.nonEmpty &&
            c.exists(ch => (ch >= 'a' && ch <= 'z') ||
              (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')))
          if (content >= 2) out += extractOthers(url, pageType, cells)
        }
      case _ => // Ignore / Unknown — no records (orchestrator.py:20-21)
    }
    out.toSeq.map(validate)
  }

  /** OthersPlugin row record (others.py:48-59): generic columns only —
    * no field extraction, no page context.
    */
  def extractOthers(url: String, pageType: String,
      cells: Seq[String]): ExtractedRecord =
    ExtractedRecord.empty(url, pageType).copy(
      routed_section = "Others", target_section = "Others",
      txn_type = "Other", row_text = cells.mkString(" "))

  /** PositionsPlugin.extract_row (positions.py:176-250). `asOfDate` is
    * the page-level "as of DD.MM.YYYY" statement date (G4 context).
    */
  def extractPositions(url: String, pageType: String, cells: Seq[String],
      rowText: String, portfolioNo: String, asOfDate: String): ExtractedRecord = {
    val firstCol = cells.headOption.getOrElse("").trim
    var currency = ""
    var quantity = ""
    var name = ""
    if (TextOps.startsWithCurrency(firstCol) && firstCol.length <= 4) {
      currency = firstCol
      if (cells.length > 1) {
        val (a, b) = TextOps.splitFirst(cells(1))
        b match {
          case Some(rest) => quantity = a; name = rest
          case None       => name = cells(1)
        }
      }
    } else {
      val (a, b) = TextOps.splitFirst(firstCol)
      b match {
        case Some(rest) => quantity = a; name = rest
        case None       => quantity = firstCol
      }
    }
    val marketPrice = if (cells.length > 2) cells(2) else ""
    val marketValue = if (cells.length > 4) cells(4) else ""
    val costPrice = if (cells.length > 4) cells(4) else ""
    if (currency.isEmpty)
      currency = TextOps.sniffCurrency(cells).getOrElse("")
    val account = TextOps.extractAccount(rowText).getOrElse("")
    val isin = TextOps.extractIsin(rowText).getOrElse("")
    ExtractedRecord.empty(url, pageType).copy(
      routed_section = "Positions", target_section = "Positions",
      txn_type = "Positions", row_text = rowText,
      portfolio_no = portfolioNo, valuation_date = asOfDate,
      currency = currency, quantity = quantity, security_name = name,
      securities_id = isin, account_no = account,
      market_price = marketPrice, market_value = marketValue,
      cost_price = costPrice)
  }

  /** TradeInformationPlugin.extract_row (trade_information.py:185-264)
    * + graft-added FX buy/sell correlation (J1, docs/some_rule.txt:38-44).
    */
  def extractTrade(url: String, pageType: String, group: String,
      ttype: String, cells: Seq[String], rowText: String,
      clientName: String, rs: RuleSet): ExtractedRecord = {
    var tradeDate = ""
    var settlementDate = ""
    if (TextOps.startsWithDate(cells.head)) {
      tradeDate = cells.head
      val dates = TextOps.extractDates(rowText)
      settlementDate = if (dates.length > 1) dates(1) else cells.head
    }
    val txnRaw = if (cells.length > 1) cells(1).trim else ""
    var currency = ""
    var fNet = ""
    var net = ""
    if (cells.length > 2) {
      val parts = cells(2).split("\\s+").filter(_.nonEmpty)
      if (parts.nonEmpty && parts(0).matches("[A-Za-z]+")) {
        currency = parts(0)
        fNet = parts.drop(1).mkString(" ")
        net = fNet
      } else { fNet = cells(2); net = cells(2) }
    }
    val name = if (cells.length > 3) cells(3) else ""
    val unitPrice = if (cells.length > 4) cells(4) else ""
    val gross = if (cells.length > 7) cells(7) else ""
    val isin = TextOps.extractIsin(rowText).getOrElse("")
    val account = TextOps.extractAccount(rowText).getOrElse("")
    val txnDetail = ScalarRules.classifyTxnType(rowText, rs)
    // J1 — FX buy/sell correlation within the record text
    val buyM = BuyPat.findFirstMatchIn(rowText)
    val sellM = SellPat.findFirstMatchIn(rowText)
    ExtractedRecord.empty(url, pageType).copy(
      routed_section = group, target_section = group, txn_type = ttype,
      txn_type_detail = txnDetail, row_text = rowText,
      client_name = clientName, trade_date = tradeDate,
      settlement_date = settlementDate, transaction_type_raw = txnRaw,
      currency = currency, security_name = name, securities_id = isin,
      account_no = account, foreign_unit_price = unitPrice,
      foreign_gross_consideration = gross,
      foreign_net_consideration = fNet, net_consideration = net,
      currency_buy = buyM.map(_.group(1)).getOrElse(""),
      amount_buy = buyM.map(_.group(2)).getOrElse(""),
      currency_sell = sellM.map(_.group(1)).getOrElse(""),
      amount_sell = sellM.map(_.group(2)).getOrElse(""))
  }

  /** Validation + normalization (N14/N15, C12 downgrade, strict ISIN,
    * and the reference's full VAL taxonomy — error_system.py:37-43:
    * VAL_DATE (impossible calendar date), VAL_CURR (currency-list
    * membership), VAL_RANGE (max 12 integer / 2 decimal digits,
    * docs/rule_2.txt number constraints), VAL_CONFLICT (settlement
    * before trade date). Code order here is the contract the Column
    * twin reproduces exactly.
    */
  def validate(r: ExtractedRecord): ExtractedRecord = {
    val errs = ArrayBuffer.empty[String]
    if (r.securities_id.nonEmpty && !TextOps.isValidIsin(r.securities_id))
      errs += "VAL_ISIN_SHAPE"
    else if (r.securities_id.nonEmpty &&
        !graft.functions.IsinValid.check(r.securities_id))
      errs += "VAL_ISIN_CHECKSUM" // shape OK, ISO 6166 Luhn digit wrong
    val netNum = TextOps.normalizeNumber(r.net_consideration)
    if (r.net_consideration.nonEmpty && netNum.isEmpty)
      errs += "VAL_NUM_NET"
    val mvNum = TextOps.normalizeNumber(r.market_value)
    if (r.market_value.nonEmpty && mvNum.isEmpty) errs += "VAL_NUM_MV"
    // VAL_RANGE: parses, but violates the 12-integer/2-decimal digit cap
    if (netNum.isDefined && !TextOps.numberInRange(r.net_consideration))
      errs += "VAL_RANGE_NET"
    if (mvNum.isDefined && !TextOps.numberInRange(r.market_value))
      errs += "VAL_RANGE_MV"
    val tIso = TextOps.normalizeDate(r.trade_date).getOrElse("")
    val sIso = TextOps.normalizeDate(r.settlement_date).getOrElse("")
    // VAL_DATE: present but lexically unparseable OR calendar-impossible
    val tOk = TextOps.isValidCalendarDate(tIso)
    val sOk = TextOps.isValidCalendarDate(sIso)
    if (r.trade_date.nonEmpty && !tOk) errs += "VAL_DATE_TRADE"
    if (r.settlement_date.nonEmpty && !sOk) errs += "VAL_DATE_SETTLE"
    if (r.currency.nonEmpty && !TextOps.Currencies.contains(r.currency))
      errs += "VAL_CURR"
    // VAL_CONFLICT: both dates valid and settlement precedes trade
    if (tOk && sOk && sIso < tIso) errs += "VAL_CONFLICT"
    // C12 downgrade (docs/rule_2.txt:390-418)
    val section =
      if (r.routed_section == "FXTF" &&
          (r.currency_buy.isEmpty || r.currency_sell.isEmpty)) "Trade"
      else if (r.routed_section == "Trade" && r.securities_id.isEmpty)
        "Others"
      else if (r.routed_section == "Positions" && r.market_value.isEmpty)
        "Others"
      else r.routed_section
    r.copy(target_section = section,
      trade_date_iso = tIso, settlement_date_iso = sIso,
      net_consideration_num = netNum.map(_.setScale(6)),
      market_value_num = mvNum.map(_.setScale(6)),
      validation_errors = errs.toSeq)
  }
}
