package graft

import graft.rules._
import org.scalatest.funsuite.AnyFunSuite

class RulesSpec extends AnyFunSuite {
  val rs = RuleSets.plugin

  test("page classification: positions heading") {
    assert(ScalarRules.classifyPage("# Detailed positions\nbody", rs) ===
      "Positions")
  }

  test("page classification: plugin header mode uses # lines") {
    // 'Portfolio' appears in body but not in a # line → header = # lines only
    val text = "# Nothing here\nPortfolio number 123"
    assert(ScalarRules.classifyPage(text, rs) === "Ignore")
  }

  test("page classification: plugin falls back to first 10 lines") {
    val text = "Statement of assets\nmore\n"
    assert(ScalarRules.classifyPage(text, rs) === "Positions")
  }

  test("page classification: soa header = first 20 lines") {
    val text = ("x\n" * 19) + "Holdings overview"
    assert(ScalarRules.classifyPage(text, RuleSets.soa) === "Positions")
    val text2 = ("x\n" * 20) + "Holdings overview"
    assert(ScalarRules.classifyPage(text2, RuleSets.soa) === "Ignore")
  }

  test("page classification: case-insensitive") {
    assert(ScalarRules.classifyPage("# TRANSACTION LIST", rs) === "Transaction")
  }

  test("record classification: priority shadowing (FX FORWARD over SELL)") {
    // 'FX FORWARD ... SALE' matches both p100 and p70 — highest wins
    assert(ScalarRules.classifyRecord("FX FORWARD SALE deal", rs) ===
      ("FXTF", "FX Forward"))
  }

  test("record classification: fallback") {
    assert(ScalarRules.classifyRecord("coupon payment", rs) ===
      ("Others", "Other"))
  }

  test("record classification: keyword order within a rule") {
    assert(ScalarRules.classifyRecord("YOUR SALE of bonds", rs) ===
      ("Trade", "Sell"))
    assert(ScalarRules.classifyRecord("NEW ISSUE PURCHASE", rs) ===
      ("Trade", "Buy"))
  }

  test("txn type: SPOT without SALE is FX Spot; with SALE excluded") {
    assert(ScalarRules.classifyTxnType("SPOT conversion", rs) === "FX Spot")
    // SPOT+SALE: rule 90 excluded; falls to Sell (p70, matches SALE)
    assert(ScalarRules.classifyTxnType("SPOT SALE deal", rs) === "Sell")
  }

  test("condition algebra") {
    import Cond._
    val c = AllOf(Seq(Contains("a"), AnyOf(Seq(Contains("b"), Contains("c"))),
      NoneOf(Seq(Contains("z")))))
    assert(Cond.eval("xaxbx", c))
    assert(!Cond.eval("xaxbz", c))
    assert(!Cond.eval("xax", c))
  }

  test("Column compiler matches scalar on a corpus") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val texts = Seq(
      "# Detailed positions\nstuff", "# Transaction list\nrows",
      "# FX & TF\n", "plain text\nPortfolio number", "# Other\nnothing",
      "# trade INFORMATION\n", ("y\n" * 12) + "Holdings")
    val df = texts.toDF("t")
    for (r <- Seq(RuleSets.plugin, RuleSets.soa)) {
      val got = df.select(RuleCompiler.classifyPage($"t", r)).as[String]
        .collect().toSeq
      val want = texts.map(ScalarRules.classifyPage(_, r))
      assert(got === want, s"variant ${r.name}")
    }
    val rows = Seq("FX FORWARD SALE", "YOUR SALE", "SPOT x", "SPOT SALE",
      "buy low", "nothing", "REPAYMENT", "new invest")
    val df2 = rows.toDF("t")
    val rec = RuleCompiler.classifyRecord($"t", rs)
    val gotRec = df2
      .select(rec.getField("txn_group"), rec.getField("txn_type"))
      .as[(String, String)].collect().toSeq
    assert(gotRec === rows.map(ScalarRules.classifyRecord(_, rs)))
    val gotTxn = df2.select(RuleCompiler.classifyTxnType($"t", rs))
      .as[String].collect().toSeq
    assert(gotTxn === rows.map(ScalarRules.classifyTxnType(_, rs)))
  }

  test("JSON loader: plugin_rules.json resource == hardcoded RuleSets.plugin") {
    assert(RuleLoader.pluginFromResource === RuleSets.plugin)
  }

  test("JSON loader: parses the reference rule.json field shapes") {
    val json = """{
      "page_classification": {"rules": [
        {"priority": 10, "type": "Trade", "match_in": "header",
         "contains_any": ["Trade information"]},
        {"priority": 0, "fallback": true, "type": "Ignore"}]},
      "record_classification": {"rules": [
        {"priority": 100, "match_any": ["FX FORWARD"],
         "output": "FX Forward", "output_group": "FXTF"},
        {"priority": 0, "fallback": true, "output": "Other",
         "output_group": "Others"}]},
      "transaction_type_rules": [
        {"name": "FX Spot (implicit)", "priority": 90, "match_any": ["SPOT"],
         "exclude_if_contains": ["SALE"], "output": "FX Spot"}],
      "sections": [{"section_name": "ignored-by-loader"}]
    }"""
    val loaded = RuleLoader.fromJson(json, "test")
    assert(loaded.pageRules ===
      Seq(PageRule(10, "Trade", Seq("Trade information")),
        PageRule(0, "Ignore", Nil, fallback = true)))
    assert(loaded.recordRules.head ===
      RecordRule(100, Seq("FX FORWARD"), "FX Forward", "FXTF"))
    assert(loaded.recordFallback === ("Others", "Other"))
    assert(loaded.txnTypeRules ===
      Seq(TxnTypeRule("FX Spot (implicit)", 90, Seq("SPOT"), Seq("SALE"),
        "FX Spot")))
    // a loaded set drives the classifiers like any built-in one
    assert(ScalarRules.classifyPage("# Trade information\n", loaded) ===
      "Trade")
    assert(ScalarRules.classifyTxnType("SPOT SALE", loaded) === "Other")
  }

  test("fallback selection: LAST fallback in priority-desc order wins") {
    // the reference loop reassigns the default on every fallback rule,
    // so the lowest-priority fallback is the effective default
    val two = RuleSets.plugin.copy(pageRules =
      RuleSets.plugin.pageRules ++ Seq(
        PageRule(5, "HighFallback", Nil, fallback = true)))
    // fallbacks sorted desc: HighFallback(5), Ignore(0) → last = Ignore
    assert(two.pageFallback === "Ignore")
  }
}
