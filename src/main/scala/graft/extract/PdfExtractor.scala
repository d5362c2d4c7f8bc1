package graft.extract

import graft.model.{ExtractedContent, Span}
import scala.collection.mutable.ArrayBuffer

/** X2 — minimal PDF layout parsing into reading-order text spans
  * (SURVEY §2.11). Replaces the reference's rasterize+OCR front end
  * (/root/reference/soa_extractor/ocr_service.py:43-51, 72-114) with a
  * deterministic parser.
  *
  * Scope (SURVEY §7.4-5): uncompressed content streams using the standard
  * text operators (BT/ET, Td, TD, Tm, T*, Tj, TJ, ') with literal
  * `(…)` strings — the subset our deterministic generator emits plus any
  * similarly simple PDF. Anything else degrades gracefully to an error
  * event row, never a crash.
  *
  * Reading order: lines sorted by descending y (PDF origin is bottom-left),
  * items within a line by ascending x, joined with single spaces.
  */
object PdfExtractor {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F'

  private case class Item(y: Double, x: Double, text: String)

  /** Parse one content stream's text operators. */
  private def parseStream(s: String, out: ArrayBuffer[Item]): Unit = {
    var i = 0
    val n = s.length
    var inText = false
    var tx = 0.0; var ty = 0.0
    var leading = 12.0
    // operand stack of recently-seen numbers / strings
    val nums = ArrayBuffer.empty[Double]
    var lastString: String = null
    val tjParts = ArrayBuffer.empty[String]
    var inArray = false

    def emit(text: String): Unit =
      if (text.nonEmpty) out += Item(ty, tx, text)

    def readString(): String = {
      // s(i) == '(' on entry
      val sb = new StringBuilder
      var depth = 1
      i += 1
      while (i < n && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < n) {
          val e = s.charAt(i + 1)
          e match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var oct = 0; var k = 0; i += 1
              while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                oct = oct * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append(oct.toChar)
            case other => sb.append(other); i += 2
          }
        } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') {
          depth -= 1; if (depth > 0) sb.append(c); i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val str = readString()
        if (inArray) tjParts += str else lastString = str
      } else if (c == '[') { inArray = true; tjParts.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == '-' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        try { val v = s.substring(start, i).toDouble
          if (!inArray) { nums += v; if (nums.length > 6) nums.remove(0) }
        } catch { case _: Exception => }
      } else {
        // operator token
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '(' &&
          s.charAt(i) != '[' && s.charAt(i) != ']') i += 1
        val op = s.substring(start, i)
        op match {
          case "BT" => inText = true; tx = 0; ty = 0; nums.clear()
          case "ET" => inText = false; nums.clear()
          case "Td" if inText && nums.length >= 2 =>
            tx += nums(nums.length - 2); ty += nums(nums.length - 1)
            nums.clear()
          case "TD" if inText && nums.length >= 2 =>
            leading = -nums(nums.length - 1)
            tx += nums(nums.length - 2); ty += nums(nums.length - 1)
            nums.clear()
          case "Tm" if inText && nums.length >= 6 =>
            tx = nums(nums.length - 2); ty = nums(nums.length - 1)
            nums.clear()
          case "TL" if nums.nonEmpty =>
            leading = nums.last; nums.clear()
          case "T*" if inText =>
            ty -= leading; nums.clear()
          case "Tj" if inText && lastString != null =>
            emit(lastString); lastString = null; nums.clear()
          case "'" if inText =>
            ty -= leading
            if (lastString != null) { emit(lastString); lastString = null }
            nums.clear()
          case "TJ" if inText =>
            emit(tjParts.mkString("")); tjParts.clear(); nums.clear()
          case _ => // Tf, Tc, Tw, colors, graphics ops: ignore operands
            if (!inArray) nums.clear()
        }
      }
    }
  }

  def extract(bytes: Array[Byte]): ExtractedContent = {
    try {
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      // One content stream per page (the deterministic subset's layout;
      // the reference likewise iterates pages one at a time,
      // ocr_service.py:116-133). Streams are parsed separately so the
      // y-sort never interleaves lines of DIFFERENT pages that happen to
      // share coordinates; pages keep file order.
      val pages = ArrayBuffer.empty[ArrayBuffer[Item]]
      var idx = 0
      while (idx >= 0) {
        val sIdx = raw.indexOf("stream", idx)
        if (sIdx < 0) idx = -1
        else {
          // skip "stream" keyword + EOL
          var cStart = sIdx + "stream".length
          if (cStart < raw.length && raw.charAt(cStart) == '\r') cStart += 1
          if (cStart < raw.length && raw.charAt(cStart) == '\n') cStart += 1
          val eIdx = raw.indexOf("endstream", cStart)
          if (eIdx < 0) idx = -1
          else {
            val items = ArrayBuffer.empty[Item]
            parseStream(raw.substring(cStart, eIdx), items)
            if (items.nonEmpty) pages += items
            idx = eIdx + "endstream".length
          }
        }
      }
      if (pages.isEmpty)
        return ExtractedContent("", "", Nil, 0, "pdf", "PDF_NO_TEXT")
      // per page: group into lines (same y within tolerance), reading order
      val lineTexts = pages.flatMap { items =>
        val sorted = items.sortBy(it => (-it.y, it.x))
        val lines = ArrayBuffer.empty[ArrayBuffer[Item]]
        sorted.foreach { it =>
          if (lines.nonEmpty && math.abs(lines.last.head.y - it.y) <= 2.0)
            lines.last += it
          else lines += ArrayBuffer(it)
        }
        lines.map(_.sortBy(_.x).map(_.text.trim)
          .filter(_.nonEmpty).mkString(" ")).filter(_.nonEmpty)
      }
      val pageMd = lineTexts.mkString("\n")
      val mainBuf = new StringBuilder
      val spans = ArrayBuffer.empty[Span]
      lineTexts.zipWithIndex.foreach { case (t, i) =>
        if (mainBuf.nonEmpty) mainBuf.append('\n')
        val start = mainBuf.length
        mainBuf.append(t)
        spans += Span(start, mainBuf.length, "line", i)
      }
      ExtractedContent(pageMd, mainBuf.toString, spans.toSeq, lineTexts.length,
        "pdf", "")
    } catch {
      case e: Exception =>
        ExtractedContent("", "", Nil, 0, "error",
          s"PAGE_PDF_PARSE: ${e.getClass.getSimpleName}")
    }
  }
}
