package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mapping from this engine's short event codes to the reference's
  * error-code vocabulary (`SOA-<FAMILY>-<NAME>-<nnn>` strings,
  * /root/reference/soa_extractor/error_system.py:13-54), so event logs
  * diff cleanly across the two systems. INFO-level outcome events
  * (PAGE_OK_*, REC_ROUTE_OK, REC_STITCH_MERGED on the happy path) are a
  * graft addition — the reference only logs problems — and map to the
  * stage's family code where one exists.
  */
object ErrorCodes {

  /** (our prefix → reference code), first match wins. */
  val Families: Seq[(String, String)] = Seq(
    "PAGE_EMPTY" -> "SOA-PAGE-SPLIT-003",
    "PAGE_HTML_PARSE" -> "SOA-PAGE-HEADER-001",
    "PAGE_PDF_PARSE" -> "SOA-PAGE-HEADER-001",
    "PAGE_OK" -> "SOA-PAGE-CLASS-002",
    "REC_ROUTE" -> "SOA-REC-ROUTE-003",
    "REC_STITCH" -> "SOA-REC-STITCH-002",
    "REC_DUP" -> "SOA-REC-DUP-004",
    "REC_NOISE" -> "SOA-REC-NOISE-005",
    "VAL_ISIN" -> "SOA-VAL-ISIN-004",
    "VAL_NUM" -> "SOA-VAL-NUM-005",
    "VAL_RANGE" -> "SOA-VAL-RANGE-006",
    "VAL_DATE" -> "SOA-VAL-DATE-002",
    "VAL_CURR" -> "SOA-VAL-CURR-003",
    "VAL_CONFLICT" -> "SOA-VAL-CONFLICT-007",
    "VAL_SCHEMA" -> "SOA-VAL-SCHEMA-001")

  /** Scalar twin. "" when the code has no reference analogue. */
  def refCode(code: String): String =
    Families.collectFirst {
      case (p, r) if code != null && code.startsWith(p) => r
    }.getOrElse("")

  /** Column twin — a when-chain over the same prefix table. */
  def refCodeCol(code: Column): Column =
    Families.foldRight(lit("")) { case ((p, r), els) =>
      when(code.startsWith(p), lit(r)).otherwise(els)
    }
}
