package graft.extract

import graft.model.{ExtractedContent, Span}
import scala.collection.mutable.ArrayBuffer

/** One structural block of a page, produced by the streaming tokenizer.
  *
  * @param kind     "heading" | "paragraph" | "table"
  * @param level    heading level 1-6 (0 otherwise)
  * @param text     cleaned block text (entity-decoded, whitespace-collapsed)
  * @param words    whitespace-token count
  * @param linkWords tokens that occurred inside <a> elements
  * @param raw      verbatim source markup (tables only; preserved so the
  *                 downstream table parser sees the reference's exact
  *                 `<table>…</table>` shape)
  */
case class Block(kind: String, level: Int, text: String, words: Int,
    linkWords: Int, raw: String) {
  def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
}

/** X1 — HTML boilerplate stripping (SURVEY §2.11).
  *
  * A streaming, zero-dependency tokenizer builds a flat block sequence
  * (headings / paragraphs / tables) with per-block text-density features;
  * content vs boilerplate is decided by the published Boilerpipe
  * NumWordsRulesClassifier decision rules (Kohlschütter, Fankhauser,
  * Nejdl: "Boilerplate Detection using Shallow Text Features", WSDM 2010)
  * over (prev, curr, next) word counts and link densities.
  *
  * Two artifacts per page:
  *  - `page_md`: full-page markdown-ization (ALL blocks — the analogue of
  *    the reference's OCR markdown intermediate, which transcribes the
  *    whole page; /root/reference/soa_extractor/run.py:170-183). Record
  *    extraction downstream runs on this.
  *  - `main_text` + `spans`: boilerplate-stripped main content — the
  *    byte-identity artifact of the north rule.
  *
  * Pure Scala; one instance is reusable across a partition
  * (mapPartitions). The hot path is written for allocation economy —
  * the extraction kernel's allocation rate is what caps multi-core
  * scaling (GC barriers + DRAM traffic), so text runs are decoded,
  * whitespace-collapsed, and word-counted in a single fused pass
  * directly from the source string into a reused builder; tables are
  * scanned in one pass (no regex replace / split / join garbage); tag
  * names never allocate more than one small String.
  */
object HtmlExtractor {

  private val BlockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "blockquote", "pre", "article", "section", "nav",
    "header", "footer", "aside", "main", "figure", "figcaption", "tr",
    "br", "hr", "title")

  private val SkipTags = Set("script", "style", "noscript", "svg", "iframe")

  /** Minimal entity decode — the same four entities the reference decodes
    * (pipeline/utils.py:13-24) plus &quot;/&#39; and numeric refs.
    * (Standalone form; the block tokenizer uses the fused in-place
    * variant below.)
    */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val rep = entityOf(s, i + 1, semi)
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Entity body s[from, to) → replacement string or null. */
  private def entityOf(s: String, from: Int, to: Int): String = {
    val len = to - from
    @inline def is(lit: String): Boolean =
      len == lit.length && s.regionMatches(from, lit, 0, len)
    if (is("nbsp")) " "
    else if (is("amp")) "&"
    else if (is("lt")) "<"
    else if (is("gt")) ">"
    else if (is("quot")) "\""
    else if (is("#39") || is("apos")) "'"
    else if (len > 1 && s.charAt(from) == '#') {
      var v = 0
      var k = from + 1
      var ok = k < to
      while (k < to && ok) {
        val d = s.charAt(k)
        if (d >= '0' && d <= '9') { v = v * 10 + (d - '0'); k += 1 }
        else ok = false
      }
      if (ok && v >= 0 && v <= 0xFFFF) String.valueOf(v.toChar) else null
    } else null
  }

  /** Tokenize + build the flat block sequence. Malformed HTML never
    * throws: stray '<' is text, unclosed tags close at EOF.
    */
  def blocks(html: String): Seq[Block] = {
    val out = ArrayBuffer.empty[Block]
    val textBuf = new StringBuilder(1024)
    val nameBuf = new StringBuilder(16)
    var wordCount = 0
    var linkWordCount = 0
    var anchorDepth = 0
    var headingLevel = 0 // >0 while inside h1..h6
    // fused decode/collapse/count state for the current block
    var pendingSpace = false
    var inWord = false

    def flush(kind: String, level: Int): Unit = {
      if (textBuf.nonEmpty)
        out += Block(kind, level, textBuf.toString, wordCount, linkWordCount,
          "")
      textBuf.setLength(0)
      wordCount = 0; linkWordCount = 0; pendingSpace = false; inWord = false
    }

    // one fused pass: entity-decode + whitespace-collapse + word-count
    // straight from html[start,end) into textBuf (no substring, no
    // intermediate decoded/trimmed copies)
    def addRun(start: Int, end: Int): Unit = {
      if (start >= end) return
      val before = wordCount
      // a new run is separated from prior content (the old path joined
      // trimmed runs with a single space)
      if (textBuf.nonEmpty) pendingSpace = true
      inWord = false
      @inline def put(ch: Char): Unit =
        if (Character.isWhitespace(ch)) {
          if (textBuf.nonEmpty) pendingSpace = true
          inWord = false
        } else {
          if (pendingSpace) { textBuf.append(' '); pendingSpace = false }
          textBuf.append(ch)
          if (!inWord) { wordCount += 1; inWord = true }
        }
      var i = start
      while (i < end) {
        val c = html.charAt(i)
        if (c == '&') {
          val semi = html.indexOf(';', i + 1)
          if (semi > i && semi < end && semi - i <= 8) {
            val rep = entityOf(html, i + 1, semi)
            if (rep != null) {
              var k = 0
              while (k < rep.length) { put(rep.charAt(k)); k += 1 }
              i = semi + 1
            } else { put(c); i += 1 }
          } else { put(c); i += 1 }
        } else { put(c); i += 1 }
      }
      val added = wordCount - before
      if (anchorDepth > 0) linkWordCount += added
    }

    val n = html.length
    var i = 0

    // case-insensitive indexOf without copying the page to lowercase
    def indexOfIC(target: String, from: Int): Int = {
      val tn = target.length
      var k = from
      val last = n - tn
      while (k <= last) {
        if (html.regionMatches(true, k, target, 0, tn)) return k
        k += 1
      }
      -1
    }

    /** One-pass table scan over html[tStart,tEnd): builds the
      * tag-stripped, entity-decoded, collapsed cell text + word count
      * (regex-replaceAll semantics: '<'…next '>' with ≥1 char between =
      * a tag → one space) and counts words inside <a>…</a> regions on
      * the raw tag-stripped stream (the old lw regex semantics).
      */
    def scanTable(tStart: Int, tEnd: Int): Block = {
      val sb = new StringBuilder(256)
      var w = 0
      var lw = 0
      var pend = false
      var word = false
      var lwWord = false
      var inA = false
      @inline def text(ch: Char): Unit = {
        if (Character.isWhitespace(ch)) { if (sb.nonEmpty) pend = true; word = false }
        else {
          if (pend) { sb.append(' '); pend = false }
          sb.append(ch)
          if (!word) { w += 1; word = true }
        }
      }
      @inline def lwRaw(ch: Char): Unit =
        if (Character.isWhitespace(ch)) lwWord = false
        else if (inA && !lwWord) { lw += 1; lwWord = true }
        else if (!inA) lwWord = false
      var k = tStart
      while (k < tEnd) {
        val c = html.charAt(k)
        if (c == '<') {
          val close = html.indexOf('>', k + 1)
          if (close > k + 1 && close < tEnd) {
            // a tag: word break on both streams; track <a>/</a>
            val isEnd = html.charAt(k + 1) == '/'
            val ns = if (isEnd) k + 2 else k + 1
            if (ns < close) {
              val c0 = html.charAt(ns)
              if (c0 == 'a' || c0 == 'A') {
                val after = ns + 1
                if (after == close || html.charAt(after) == ' ' ||
                  html.charAt(after) == '/' ||
                  Character.isWhitespace(html.charAt(after))) {
                  if (isEnd) inA = false else inA = true
                }
              }
            }
            if (sb.nonEmpty) pend = true
            word = false; lwWord = false
            k = close + 1
          } else { text(c); lwRaw(c); k += 1 }
        } else if (c == '&') {
          val semi = html.indexOf(';', k + 1)
          if (semi > k && semi < tEnd && semi - k <= 8) {
            val rep = entityOf(html, k + 1, semi)
            if (rep != null) {
              var m = 0
              while (m < rep.length) { text(rep.charAt(m)); m += 1 }
              // raw lw stream counts the undecoded chars
              var m2 = k
              while (m2 <= semi) { lwRaw(html.charAt(m2)); m2 += 1 }
              k = semi + 1
            } else { text(c); lwRaw(c); k += 1 }
          } else { text(c); lwRaw(c); k += 1 }
        } else { text(c); lwRaw(c); k += 1 }
      }
      Block("table", 0, sb.toString, w, lw, html.substring(tStart, tEnd))
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) { addRun(i, n); i = n }
          else {
            val isEnd = i + 1 < n && html.charAt(i + 1) == '/'
            val nameStart = if (isEnd) i + 2 else i + 1
            nameBuf.setLength(0)
            var ne = nameStart
            while (ne < close && !Character.isWhitespace(html.charAt(ne)) &&
              html.charAt(ne) != '/') {
              nameBuf.append(Character.toLowerCase(html.charAt(ne)))
              ne += 1
            }
            val rawName = nameBuf.toString
            if (!isEnd && SkipTags.contains(rawName)) {
              // skip to matching close tag (no nesting of raw-text tags)
              val endTag = "</" + rawName
              val e = indexOfIC(endTag, close + 1)
              i = if (e < 0) n else html.indexOf('>', e) match {
                case -1 => n
                case k  => k + 1
              }
            } else {
              if (rawName == "table" && !isEnd) {
                // flush pending text, capture the table verbatim
                flush(if (headingLevel > 0) "heading" else "paragraph",
                  headingLevel)
                val e = indexOfIC("</table", close + 1)
                val tableEnd =
                  if (e < 0) n
                  else html.indexOf('>', e) match {
                    case -1 => n
                    case k  => k + 1
                  }
                out += scanTable(i, tableEnd)
                i = tableEnd
              } else {
                if (rawName == "a") {
                  if (isEnd) anchorDepth = math.max(0, anchorDepth - 1)
                  else if (html.charAt(close - 1) != '/') anchorDepth += 1
                }
                if (BlockTags.contains(rawName)) {
                  flush(if (headingLevel > 0) "heading" else "paragraph",
                    headingLevel)
                  if (rawName.length == 2 && rawName.charAt(0) == 'h' &&
                      rawName.charAt(1).isDigit) {
                    headingLevel =
                      if (isEnd) 0 else rawName.charAt(1) - '0'
                  }
                }
                i = close + 1
              }
            }
          }
        }
      } else {
        val nextTag = html.indexOf('<', i)
        val end = if (nextTag < 0) n else nextTag
        addRun(i, end)
        i = end
      }
    }
    flush(if (headingLevel > 0) "heading" else "paragraph", headingLevel)
    out.toSeq
  }

  /** Boilerpipe NumWordsRulesClassifier (published decision rules) for
    * paragraphs; explicit deterministic rules for headings and tables.
    */
  def isContent(prev: Option[Block], curr: Block, next: Option[Block]): Boolean =
    curr.kind match {
      case "heading" => curr.linkDensity <= 1.0 / 3.0
      case "table"   => curr.linkDensity <= 0.5
      case _ =>
        val pW = prev.map(_.words).getOrElse(0)
        val nW = next.map(_.words).getOrElse(0)
        val pLd = prev.map(_.linkDensity).getOrElse(0.0)
        if (curr.linkDensity > 1.0 / 3.0) false
        else if (pLd <= 0.555556)
          curr.words > 16 || nW > 15 || pW > 4
        else
          curr.words > 40 || nW > 17
    }

  /** Full extraction for one page payload.
    *
    * @param needMain when false, skip assembling the boilerplate-stripped
    *                 main_text + spans (the records pipeline only needs
    *                 page_md — saves ~a third of the string work)
    */
  def extract(htmlBytes: Array[Byte], needMain: Boolean = true): ExtractedContent = {
    val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    // blank check without the trim copy
    var bi = 0
    while (bi < html.length && html.charAt(bi) <= ' ') bi += 1
    if (bi == html.length)
      return ExtractedContent("", "", Nil, 0, "empty", "")
    val bs = blocks(html)
    // page_md: ALL blocks, markdown-ized (full-page transcription)
    val md = new StringBuilder(html.length / 2 + 16)
    bs.foreach { b =>
      if (md.nonEmpty) md.append("\n\n")
      b.kind match {
        case "heading" => md.append("#" * math.max(1, b.level)).append(' ')
          .append(b.text)
        case "table" => md.append(b.raw)
        case _       => md.append(b.text)
      }
    }
    if (!needMain)
      return ExtractedContent(md.toString, "", Nil, bs.length, "html", "")
    // main_text + spans: content blocks only
    val mainBuf = new StringBuilder
    val spans = ArrayBuffer.empty[Span]
    var bid = 0
    bs.zipWithIndex.foreach { case (b, idx) =>
      val prev = if (idx > 0) Some(bs(idx - 1)) else None
      val next = if (idx + 1 < bs.length) Some(bs(idx + 1)) else None
      if (isContent(prev, b, next)) {
        if (mainBuf.nonEmpty) mainBuf.append('\n')
        val start = mainBuf.length
        mainBuf.append(b.text)
        spans += Span(start, mainBuf.length, b.kind, bid)
      }
      bid += 1
    }
    ExtractedContent(md.toString, mainBuf.toString, spans.toSeq, bs.length,
      "html", "")
  }
}
