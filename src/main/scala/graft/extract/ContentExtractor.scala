package graft.extract

import graft.model.{ExtractedContent, Page, PageText}

/** Front door for stage-1 content extraction: dispatches a page payload
  * to the HTML (X1) or PDF (X2) kernel. The blank-page skip is the
  * analogue of the reference's white-ratio check
  * (/root/reference/run_ocr.py:126-145) — here a trivial byte check,
  * applied BEFORE the expensive parse.
  */
object ContentExtractor {

  def extract(bytes: Array[Byte], needMain: Boolean = true): ExtractedContent = {
    if (bytes == null || bytes.isEmpty)
      ExtractedContent("", "", Nil, 0, "empty", "")
    else if (PdfExtractor.isPdf(bytes)) PdfExtractor.extract(bytes)
    else
      try HtmlExtractor.extract(bytes, needMain)
      catch {
        case e: Exception =>
          ExtractedContent("", "", Nil, 0, "error",
            s"PAGE_HTML_PARSE: ${e.getClass.getSimpleName}")
      }
  }

  def extractPage(p: Page, needMain: Boolean = true): PageText = {
    val c = extract(p.html, needMain)
    PageText(p.url, p.warc_ts, p.lang, c.page_md, c.main_text, c.spans,
      c.n_blocks, c.content_kind, c.error)
  }
}
