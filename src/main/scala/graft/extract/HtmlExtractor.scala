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
  * (mapPartitions) with no per-row allocation beyond the output.
  */
object HtmlExtractor {

  private val BlockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "blockquote", "pre", "article", "section", "nav",
    "header", "footer", "aside", "main", "figure", "figcaption", "tr",
    "br", "hr", "title")

  private val SkipTags = Set("script", "style", "noscript", "svg", "iframe")

  /** Minimal entity decode — the same four entities the reference decodes
    * (pipeline/utils.py:13-24) plus &quot;/&#39; and numeric refs.
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
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "nbsp" => " "
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "#39" | "apos" => "'"
            case e if e.startsWith("#") =>
              try String.valueOf(Integer.parseInt(e.drop(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def countWords(s: String): Int = {
    var n = 0; var inWord = false; var i = 0
    while (i < s.length) {
      if (s.charAt(i).isWhitespace) inWord = false
      else if (!inWord) { n += 1; inWord = true }
      i += 1
    }
    n
  }

  /** Tokenize + build the flat block sequence. Malformed HTML never
    * throws: stray '<' is text, unclosed tags close at EOF.
    */
  def blocks(html: String): Seq[Block] = {
    val out = ArrayBuffer.empty[Block]
    val textBuf = new StringBuilder
    var wordCount = 0
    var linkWordCount = 0
    var anchorDepth = 0
    var headingLevel = 0 // >0 while inside h1..h6

    def flush(kind: String, level: Int): Unit = {
      val decoded = decodeEntities(textBuf.toString)
      // collapse whitespace runs without regex-split garbage
      val sb = new StringBuilder(decoded.length)
      var j = 0; var pendingSpace = false
      while (j < decoded.length) {
        val ch = decoded.charAt(j)
        if (ch.isWhitespace) { if (sb.nonEmpty) pendingSpace = true }
        else { if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(ch) }
        j += 1
      }
      val t = sb.toString
      if (t.nonEmpty)
        out += Block(kind, level, t, wordCount, linkWordCount, "")
      textBuf.clear(); wordCount = 0; linkWordCount = 0
    }
    def addText(t: String): Unit = {
      val decoded = t
      val w = countWords(decodeEntities(decoded))
      if (w > 0) {
        if (textBuf.nonEmpty && !textBuf.last.isWhitespace) textBuf.append(' ')
        textBuf.append(decoded.trim)
        wordCount += w
        if (anchorDepth > 0) linkWordCount += w
      }
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
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) { addText(html.substring(i)); i = n }
          else {
            val inner = html.substring(i + 1, close)
            val isEnd = inner.startsWith("/")
            val rawName = (if (isEnd) inner.drop(1) else inner)
              .takeWhile(ch => !ch.isWhitespace && ch != '/').toLowerCase
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
                val rawTable = html.substring(i, tableEnd)
                val cellText = decodeEntities(
                  rawTable.replaceAll("<[^>]+>", " "))
                  .split("\\s+").filter(_.nonEmpty).mkString(" ")
                val w = countWords(cellText)
                // link words inside the table: approximate by counting
                // words within <a>…</a> regions of the raw markup
                val lw = {
                  var acc = 0
                  val m = java.util.regex.Pattern
                    .compile("(?is)<a\\b[^>]*>(.*?)</a>").matcher(rawTable)
                  while (m.find())
                    acc += countWords(m.group(1).replaceAll("<[^>]+>", " "))
                  acc
                }
                out += Block("table", 0, cellText, w, lw, rawTable)
                i = tableEnd
              } else {
                if (rawName == "a") {
                  if (isEnd) anchorDepth = math.max(0, anchorDepth - 1)
                  else if (!inner.endsWith("/")) anchorDepth += 1
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
        addText(html.substring(i, end))
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
    if (html.trim.isEmpty)
      return ExtractedContent("", "", Nil, 0, "empty", "")
    val bs = blocks(html)
    // page_md: ALL blocks, markdown-ized (full-page transcription)
    val md = new StringBuilder
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
