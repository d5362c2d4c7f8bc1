package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-style archive serialization — the container format
  * Common-Crawl-shaped corpora arrive in (one "WARC/1.0" record per
  * captured page: header lines, a blank line, then the payload). This
  * is a from-scratch text subset of ISO 28500: the three headers a
  * text pipeline consumes (WARC-Target-URI, WARC-Date, Content-Length)
  * and LF-tolerant payloads, written and parsed entirely with
  * DataFrame Columns.
  *
  * Scale shape — the whole point of the format on Spark:
  *
  *  - READ is a *splittable* text scan: records are separated by the
  *    fixed byte sequence [[RecordSep]], passed to the text source as
  *    `lineSep`, which Hadoop's LineRecordReader uses as the record
  *    delimiter. A single 100 GB archive file therefore parallelizes
  *    into `spark.sql.files.maxPartitionBytes`-sized input splits with
  *    no index and no coordination — each task scans forward to the
  *    first delimiter ending inside its split and owns the records up
  *    to the first delimiter ending in the next one (standard
  *    mid-split record-boundary semantics, same as reading huge CSVs).
  *  - PARSE is per-row: header regexes plus a Content-Length-bounded
  *    substring cut for the payload. The length cut (not the record
  *    boundary) defines the payload, so trailing separator bytes and
  *    end-of-file junk never leak into it.
  *  - Contract (documented subset): payloads must not contain the
  *    record-boundary byte sequence `\r\n\nWARC/1.0\r\n` — true for
  *    any LF-only text payload (WET-style extracts, HTML with Unix
  *    newlines). Binary payloads need a Content-Length-aware custom
  *    RecordReader instead of a content-defined boundary; the parser
  *    side here is already length-based, so only the split layer would
  *    change.
  *
  * Lengths are measured in characters (the payloads of this subset are
  * strings), applied consistently by writer, parser and the DuckDB
  * oracle; byte-exact ISO 28500 would measure octets.
  */
object Warc {

  /** Byte sequence separating two serialized records as laid out by
    * [[writeWarc]]: the record's trailing CRLF, the text writer's
    * row separator, and the next record's version line.
    */
  val RecordSep: String = "\r\n\nWARC/1.0\r\n"

  /** Serialize (url, payload) rows as WARC-style response records,
    * one text row per record (the text writer's `\n` row separator is
    * part of [[RecordSep]]). Partitioning is the caller's: each
    * partition becomes one archive file, the shape crawl dumps ship
    * in.
    */
  def writeWarc(df: DataFrame, urlCol: String, payloadCol: String,
      dir: String, tsCol: Option[String] = None): Unit = {
    val date = tsCol.map(c => concat(lit("WARC-Date: "),
        date_format(col(c), "yyyy-MM-dd'T'HH:mm:ss'Z'"), lit("\r\n")))
      .getOrElse(lit(""))
    df.select(concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        col(urlCol), lit("\r\n"), date,
        lit("Content-Length: "),
        length(col(payloadCol)).cast("string"),
        lit("\r\n\r\n"), col(payloadCol), lit("\r\n")).as("value"))
      .write.mode("overwrite").text(dir)
  }

  /** Parse a directory of [[writeWarc]]-shaped archives back into
    * (url, content_length, payload) rows. Splittable (see object
    * scaladoc); records arrive in arbitrary order, as any distributed
    * scan's do.
    */
  def readWarc(spark: SparkSession, dir: String): DataFrame =
    parseRecords(spark.read.option("lineSep", RecordSep).text(dir))

  /** Streaming twin of [[readWarc]]: the file streaming source with
    * the same record delimiter — new archive files dropped into `dir`
    * become micro-batches of parsed records. Identical per-record
    * semantics (same parse Columns); pair with the streaming curation
    * gate for a live crawl-ingestion pipeline.
    */
  def readWarcStream(spark: SparkSession, dir: String): DataFrame =
    parseRecords(spark.readStream.option("lineSep", RecordSep).text(dir))

  /** Per-row record parse shared by the batch and streaming readers:
    * header regexes + the Content-Length-bounded payload cut.
    */
  def parseRecords(raw: DataFrame): DataFrame = {
    val rec = regexp_replace(col("value"), "^WARC/1\\.0\r\n", "")
    val url = regexp_extract(rec, "WARC-Target-URI: ([^\r\n]*)", 1)
    val clen = regexp_extract(rec, "Content-Length: ([0-9]+)", 1)
      .cast("long")
    // everything after the first blank line, cut to Content-Length
    val body = regexp_replace(rec, "(?s)^.*?\r\n\r\n", "")
    raw.filter(length(col("value")) > 0)
      .select(url.as("url"), clen.as("content_length"),
        body.substr(lit(1), clen).as("payload"))
  }
}
