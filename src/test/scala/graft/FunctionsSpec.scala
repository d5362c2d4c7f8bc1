package graft

import graft.functions.{GraftFunctions, IsinValid, Md5Prefix32}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("IsinValid: known-valid ISINs pass, corrupted fail") {
    // public, well-known ISINs with correct check digits
    val valid = Seq("US0378331005", "US5949181045", "DE0005140008",
      "GB0002634946", "CH0012032048")
    valid.foreach(i => assert(IsinValid.check(i), i))
    assert(!IsinValid.check("US0378331004")) // wrong check digit
    assert(!IsinValid.check("us0378331005")) // lowercase country
    assert(!IsinValid.check("US03783310056")) // wrong length
    assert(!IsinValid.check(null))
  }

  test("IsinValid as Column: codegen path matches scalar") {
    import spark.implicits._
    val data = Seq("US0378331005", "US0378331004", "XXNOPE", "DE0005140008")
    val got = data.toDF("s").select(IsinValid($"s")).as[Boolean]
      .collect().toSeq
    assert(got === data.map(IsinValid.check))
  }

  test("Md5Prefix32 == conv(substring(md5))") {
    import spark.implicits._
    val data = Seq("hello", "a", "", "The quick brown fox", "日本語")
    val df = data.toDF("s")
    val native = df.select(Md5Prefix32($"s")).as[Long].collect().toSeq
    val builtin = df.select(
      conv(substring(md5($"s"), 1, 8), 16, 10).cast("long")).as[Long]
      .collect().toSeq
    assert(native === builtin)
    // and matches the Dedup.tokHash used by the DuckDB-verified minhash
    val viaDedup = df.select(Dedup.tokHash($"s")).as[Long].collect().toSeq
    assert(native === viaDedup)
  }

  test("SQL registration works") {
    // the config-driven twin of register(): applying the extensions
    // class to a fresh SparkSessionExtensions must inject cleanly
    // (resolution through a real session is covered by register below,
    // which shares the expression constructors)
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT isin_valid('US0378331005'), md5_prefix32('hello')").collect()(0)
    assert(r.getBoolean(0))
    assert(r.getLong(1) === 1564557354L) // verified against DuckDB md5
  }

  test("one-pass SimHashMd5 == the per-bit HOF formulation") {
    import spark.implicits._
    // tricky tokenizations: leading/trailing/multiple whitespace, tabs,
    // empty, single token, unicode
    val data = Seq("the quick brown fox", "  leading ws", "trailing ws  ",
      "a  b\t\tc", "", "   ", "one", "HeLLo WoRLD", "日本 語 テスト")
    val df = data.toDF("s")
    val native = df.select(Dedup.simhash16($"s")).as[Long].collect().toSeq
    // the round-1 formulation, inlined: 16 aggregate/transform passes
    val pre = lower(trim($"s"))
    val toks = filter(split(pre, "\\s+"), t => t =!= "")
    val h = (t: org.apache.spark.sql.Column) =>
      conv(substring(md5(t), 1, 4), 16, 10).cast("long")
    val hof = (0 until 16).map { i =>
      val bitSum = aggregate(
        transform(toks, t => (shiftright(h(t), i).bitwiseAND(lit(1L))) * 2 - 1),
        lit(0L), (acc, x) => acc + x)
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val want = df.select(hof).as[Long].collect().toSeq
    assert(native === want)
  }

  test("SimHashXx64 matches the xxhash64 HOF formulation") {
    import spark.implicits._
    val data = Seq("the quick brown fox jumps", "x", "a b  c", "")
    val df = data.toDF("s")
    val native = df.select(Dedup.simhash64($"s")).as[Long].collect().toSeq
    val pre = lower(trim($"s"))
    val toks = filter(split(pre, "\\s+"), t => t =!= "")
    val hof = (0 until 64).map { i =>
      val bitSum = aggregate(
        transform(toks,
          t => (shiftright(xxhash64(t), i).bitwiseAND(lit(1L))) * 2 - 1),
        lit(0L), (acc, x) => acc + x)
      when(bitSum > 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val want = df.select(hof).as[Long].collect().toSeq
    assert(native === want)
  }

  test("DotProduct native == interpreted HOF fold, bitwise") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // adversarial magnitudes: FP addition order matters, so bitwise
    // equality here proves the loop order matches the HOF fold
    val rows = (0 until 200).map { i =>
      val d = 1 + (i % 7)
      (Seq.fill(d)(rng.nextDouble() * math.pow(10, rng.nextInt(13) - 6)
         * (if (rng.nextBoolean()) 1 else -1)),
       Seq.fill(d)(rng.nextDouble() * math.pow(10, rng.nextInt(13) - 6)
         * (if (rng.nextBoolean()) 1 else -1)))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.DotProductCol(col("a"), col("b")).as("n"),
      graft.ops.SimSearch.dotHof(col("a"), col("b")).as("h")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // null array -> null (standard null-safe binary eval)
    val nr = Seq((Seq(1.0, 2.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(graft.functions.DotProductCol(col("a"),
        col("b").cast("array<double>"))).collect()
    assert(nr.head.isNullAt(0))
    // length mismatch throws loudly (HOF would null-pad silently)
    val ex = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
        .select(graft.functions.DotProductCol(col("a"), col("b")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("UnicodeNormalize: NFC collapses composed/decomposed twins, " +
      "NFKC folds compatibility forms, nulls pass through") {
    import spark.implicits._
    val composed = "caf\u00e9"        // U+00E9
    val decomposed = "cafe\u0301"     // e + combining acute
    val ligature = "\ufb01le"         // fi ligature + "le"
    val fullwidth = "\uff21BC"        // full-width A + "BC"
    val rows = Seq(composed, decomposed, ligature, fullwidth, "plain")
      .toDF("s")
    val nfc = rows.select(
      graft.functions.UnicodeNormalize(col("s")).as("n")).as[String]
      .collect()
    assert(nfc(0) === nfc(1), "NFC must collapse the twins")
    assert(nfc(0) === composed, "NFC canonical form is the composed one")
    assert(nfc(2) === ligature, "NFC must NOT fold compatibility forms")
    assert(nfc(3) === fullwidth)
    assert(nfc(4) === "plain") // fast path: already normalized
    val nfkc = rows.select(
      graft.functions.UnicodeNormalize(col("s"), "NFKC").as("n"))
      .as[String].collect()
    assert(nfkc(2) === "file", "NFKC folds the ligature")
    assert(nfkc(3) === "ABC", "NFKC folds full-width forms")
    // parity with the JDK scalar on every row (codegen == interpreted)
    val scalar = Seq(composed, decomposed, ligature, fullwidth, "plain")
      .map(s => java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFKC))
    assert(nfkc.toSeq === scalar)
    // nulls stay null; SQL registration resolves
    graft.functions.GraftFunctions.register(spark)
    val viaSql = Seq((decomposed: String), (null: String)).toDF("s")
      .selectExpr("nfc(s)").collect()
    assert(viaSql(0).getString(0) === composed)
    assert(viaSql(1).isNullAt(0))
    // bad form rejected at analysis
    val ex2 = intercept[Exception] {
      rows.select(graft.functions.UnicodeNormalize(col("s"), "NFX"))
        .collect()
    }
    assert(ex2.getMessage != null)
  }

  test("IdnToUnicode: canonical punycode pairs, fast path, hostile " +
      "input, SQL registration") {
    import spark.implicits._
    def dec(h: String): String =
      Seq(h).toDF("h").select(graft.functions.IdnToUnicode(col("h")))
        .head.getString(0)
    // the canonical RFC 3492 examples (the q120 oracle literals pin
    // these same pairs in SQL)
    assert(dec("xn--mnchen-3ya.example.com") === "münchen.example.com")
    assert(dec("xn--bcher-kva.org") === "bücher.org")
    assert(dec("xn--fiqs8s.cn") === "中国.cn")
    // the Cyrillic-а homograph: decoded label mixes scripts
    assert(dec("xn--pple-43d.com") === "аpple.com")
    // plain ASCII host: fast path, unchanged
    assert(dec("plain.example.com") === "plain.example.com")
    // already-Unicode input: no ACE label, unchanged
    assert(dec("münchen.example.com") === "münchen.example.com")
    // hostile/malformed ACE: never throws, keeps the wire form label
    assert(dec("xn--ébogus.example.com") != null)
    // null-safe
    val n = Seq((null: String)).toDF("h")
      .select(graft.functions.IdnToUnicode(col("h"))).head
    assert(n.isNullAt(0))
    // SQL registration
    GraftFunctions.register(spark)
    assert(Seq("xn--bcher-kva.org").toDF("h")
      .selectExpr("idn_to_unicode(h)").head.getString(0)
      === "bücher.org")
  }

  test("mixedScriptHost: single-label script mixing flags, " +
      "cross-label and single-script hosts pass") {
    import spark.implicits._
    def f(h: String): Boolean =
      Seq(h).toDF("h")
        .select(graft.ops.Curation.mixedScriptHost(col("h")))
        .head.getBoolean(0)
    assert(f("аpple.com"), "Cyrillic-a + Latin in ONE label")
    assert(f("pαypal.example.com"), "Greek alpha + Latin")
    assert(!f("münchen.example.com"), "Latin-only label")
    assert(!f("中国.cn"), "Han is not in the confusable pairs")
    assert(!f("пример.example.com"),
      "pure-Cyrillic label + pure-Latin labels: mixing across labels " +
        "is a multilingual site, not a homograph")
  }

  test("AhoCorasickStats == brute-force position sweep on random " +
      "text with nested/overlapping terms; build guards; null-safe") {
    import spark.implicits._
    val terms = Seq("scan", "can", "an", "a", "window", "win", "ndo",
      "zzz", "aa")
    // brute force: every (term, end-position) occurrence + distinct terms
    def brute(s: String): (Long, Long) = {
      val hits = for {
        t <- terms
        i <- 0 to s.length - t.length
        if s.regionMatches(i, t, 0, t.length)
      } yield t
      (hits.size.toLong, hits.distinct.size.toLong)
    }
    val rnd = new scala.util.Random(11)
    val alpha = "scanwido z"
    val texts = (0 until 300).map { _ =>
      (0 until rnd.nextInt(80)).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString
    } ++ Seq("", "scan", "aaa", "windowindow", "zzzz")
    val out = texts.toDF("t")
      .select(col("t"),
        graft.functions.AhoCorasickStats(col("t"), terms).as("st"))
      .collect()
    out.foreach { r =>
      val (m, d) = brute(r.getString(0))
      val arr = r.getSeq[Long](1)
      assert(arr(0) === m, s"matches mismatch on '${r.getString(0)}'")
      assert(arr(1) === d, s"distinct mismatch on '${r.getString(0)}'")
    }
    // "aaa" overlap sanity pinned by hand: "a" x3 + "aa" x2
    val aaa = Seq("aaa").toDF("t")
      .select(graft.functions.AhoCorasickStats(col("t"), terms))
      .head.getSeq[Long](0)
    assert(aaa(0) === 5L && aaa(1) === 2L)
    // null-safe
    val n = Seq((null: String)).toDF("t")
      .select(graft.functions.AhoCorasickStats(col("t"), terms)).head
    assert(n.isNullAt(0))
    // build guards: >64 terms, empty term, duplicate term
    intercept[IllegalArgumentException] {
      new graft.functions.AcAutomaton((1 to 65).map("t" + _).toArray)
    }
    intercept[IllegalArgumentException] {
      new graft.functions.AcAutomaton(Array("ok", ""))
    }
    intercept[IllegalArgumentException] {
      new graft.functions.AcAutomaton(Array("dup", "dup"))
    }
  }

  test("SortedIntersectCount == size(array_intersect) on " +
      "sorted-distinct sets, incl. empty/disjoint") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, a, b)
    } ++ Seq((200L, Seq.empty[Long], Seq(1L, 2L)),
      (201L, Seq(1L, 2L), Seq.empty[Long]),
      (202L, Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        graft.functions.SortedIntersectCountCol(col("a"), col("b"))
          .as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long")
          .as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"mismatch at id ${r.getLong(0)}"))
    // null arrays null-safe
    val n = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b")
      .select(graft.functions.SortedIntersectCountCol(col("a"), col("b")))
      .head
    assert(n.isNullAt(0))
  }
}
