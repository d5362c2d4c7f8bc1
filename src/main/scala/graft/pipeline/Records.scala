package graft.pipeline

/** One extracted record — the union of the reference's per-group output
  * dicts (positions.py:183-199, trade_information.py:192-212), all
  * string fields defaulting to "" exactly like the reference, plus the
  * graft-added typed/validated columns (N14/N15, J1, C12).
  *
  * NOTE on routing (documented deviation): the reference's
  * orchestrator.extract_fields compares routed groups ("Trade", "FXTF",
  * "Others") against section names ("Trade information", "FX & TF"),
  * which never match, silently dropping every transaction record
  * (/root/reference/pipeline/orchestrator.py:203-215). We adopt the
  * soa-path group naming (run.py:207-230) and route Trade/FXTF/Others
  * records through the trade field extractor, Positions through the
  * positions extractor — the unambiguous intent of both paths.
  */
case class ExtractedRecord(
    url: String,
    page_type: String,
    target_section: String, // after C12 downgrade
    routed_section: String, // before downgrade
    txn_type: String,
    txn_type_detail: String, // C5 transaction_type_rules output
    row_text: String,
    portfolio_no: String,
    client_name: String,
    trade_date: String,
    settlement_date: String,
    transaction_type_raw: String,
    currency: String,
    quantity: String,
    security_name: String,
    securities_id: String,
    account_no: String,
    foreign_unit_price: String,
    foreign_gross_consideration: String,
    foreign_net_consideration: String,
    net_consideration: String,
    market_price: String,
    market_value: String,
    cost_price: String,
    valuation_date: String,
    currency_buy: String,
    amount_buy: String,
    currency_sell: String,
    amount_sell: String,
    trade_date_iso: String,
    settlement_date_iso: String,
    net_consideration_num: Option[BigDecimal],
    market_value_num: Option[BigDecimal],
    validation_errors: Seq[String])

object ExtractedRecord {
  def empty(url: String, pageType: String): ExtractedRecord =
    ExtractedRecord(url, pageType, "", "", "", "", "", "", "", "", "", "",
      "", "", "", "", "", "", "", "", "", "", "", "", "", "", "", "", "",
      "", "", None, None, Nil)
}
