package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Charset sniffing + decode normalization over raw page bytes — the
  * step between the WARC payload (`html:binary`) and every
  * string-typed operator downstream. Real web crawls are ~5-10%
  * non-UTF-8 (legacy Latin-1/Windows-1252 and UTF-16 exports);
  * decoding them as UTF-8 silently corrupts exactly the
  * high-value non-English tail a multilingual corpus wants.
  *
  * Detection order (WHATWG encoding-sniffing subset, documented):
  * 1. byte-order mark — EF BB BF → utf-8 (BOM form), FF FE →
  *    utf-16le, FE FF → utf-16be;
  * 2. `charset=` declaration in the first `sniffBytes` bytes,
  *    scanned over a Latin-1 view (every byte maps 1:1, so the ASCII
  *    declaration is always visible regardless of the true charset);
  *    aliases normalized (latin1 → iso-8859-1, utf8 → utf-8,
  *    cp1252 → windows-1252, ascii → us-ascii);
  * 3. default utf-8 (the modern-web prior).
  *
  * Scale shape: pure per-row Columns — BOM check is a 3-byte hex
  * compare, the declaration scan is one regexp over a bounded
  * prefix, decode is a when-chain over the supported charset set
  * (Spark's `decode` takes a literal charset, so per-row dispatch is
  * a branch, not a dynamic call). No shuffle, no UDF.
  */
object CharsetSniffer {

  /** Charsets the decode path supports; sniffed names outside this
    * set fall back to utf-8 (documented, counted by callers via
    * `charset_supported`).
    */
  val Supported: Seq[String] = Seq("utf-8", "utf-8-bom", "utf-16le",
    "utf-16be", "iso-8859-1", "windows-1252", "us-ascii")

  private def aliasNorm(cs: Column): Column =
    when(cs.isin("utf8", "utf-8"), "utf-8")
      .when(cs.isin("latin1", "latin-1", "iso8859-1", "iso-8859-1"),
        "iso-8859-1")
      .when(cs.isin("cp1252", "windows-1252"), "windows-1252")
      .when(cs.isin("ascii", "us-ascii"), "us-ascii")
      .otherwise(cs)

  /** Detected charset label of a binary html column. */
  def sniffCharset(bin: Column, sniffBytes: Int = 1024): Column = {
    val bom3 = hex(substring(bin, 1, 3))
    val bom2 = hex(substring(bin, 1, 2))
    // Latin-1 view of the sniff prefix: 1:1 byte→char, never fails
    val head = decode(substring(bin, 1, sniffBytes), "ISO-8859-1")
    val decl = lower(regexp_extract(head,
      "(?is)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)", 1))
    when(bom3 === "EFBBBF", "utf-8-bom")
      .when(bom2 === "FFFE", "utf-16le")
      .when(bom2 === "FEFF", "utf-16be")
      .when(decl =!= "", aliasNorm(decl))
      .otherwise(lit("utf-8"))
  }

  // windows-1252 = iso-8859-1 except bytes 0x80-0x9F, which map to
  // printable BMP chars instead of C1 controls. Spark's `decode`
  // whitelists charsets (no windows-1252), so: decode latin-1 (bytes
  // 0x80-0x9F → codepoints U+0080-U+009F, 1:1) then translate the 27
  // defined positions (0x81/8D/8F/90/9D are undefined in cp1252 and
  // pass through).
  private val Cp1252From =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089" +
    "\u008A\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095" +
    "\u0096\u0097\u0098\u0099\u009A\u009B\u009C\u009E\u009F"
  private val Cp1252To =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030" +
    "\u0160\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022" +
    "\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"

  /** Decode `bin` per the sniffed charset (BOM stripped for the
    * utf-8 BOM form; utf-16 variants decode without their BOM bytes).
    * Unsupported sniffed charsets decode as utf-8 (fallback).
    */
  def decodeAs(bin: Column, charset: Column): Column =
    when(charset === "utf-8-bom",
        decode(substring(bin, 4, Int.MaxValue), "UTF-8"))
      .when(charset === "utf-16le",
        decode(substring(bin, 3, Int.MaxValue), "UTF-16LE"))
      .when(charset === "utf-16be",
        decode(substring(bin, 3, Int.MaxValue), "UTF-16BE"))
      .when(charset === "iso-8859-1", decode(bin, "ISO-8859-1"))
      .when(charset === "windows-1252",
        translate(decode(bin, "ISO-8859-1"), Cp1252From, Cp1252To))
      .when(charset === "us-ascii", decode(bin, "US-ASCII"))
      .otherwise(decode(bin, "UTF-8"))

  /** One row per page: (urlCol, charset, charset_supported, n_bytes,
    * text) — `text` is the normalized-to-UTF-8 string every
    * downstream operator consumes.
    */
  def decodePages(pages: DataFrame, urlCol: String, binCol: String,
      sniffBytes: Int = 1024): DataFrame = {
    val bin = col(binCol)
    val cs = sniffCharset(bin, sniffBytes)
    pages.select(
      col(urlCol),
      cs.as("charset"),
      cs.isin(Supported: _*).as("charset_supported"),
      length(bin).cast("long").as("n_bytes"),
      decodeAs(bin, cs).as("text"))
  }
}
