package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (codegen'd, shuffle-free, oracle-portable).
  */
object TextAnalysis {

  /** Whitespace token count (0 for blank). */
  def tokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: letter runs, digit runs, single punctuation —
    * the standard pre-tokenizer regex family.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Stopword-list hits for a language (token-boundary matches). */
  private def stopwordHits(text: Column, words: Seq[String]): Column =
    words.map(w =>
      size(regexp_extract_all(text, lit(s"(^|\\s)${w}(\\s|$$)"), lit(0))))
      .reduce(_ + _)

  val StopEn = Seq("the", "and", "of", "to", "a", "is", "in")
  val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val StopFr = Seq("le", "la", "les", "et", "est", "une", "dans")
  val StopEs = Seq("el", "los", "las", "y", "es", "una", "que")

  /** Heuristic language ID: the language whose stopword list hits most
    * (priority order en > de > fr > es on ties); "und" when no hits.
    */
  def langId(textRaw: Column): Column = {
    val text = lower(textRaw)
    val en = stopwordHits(text, StopEn)
    val de = stopwordHits(text, StopDe)
    val fr = stopwordHits(text, StopFr)
    val es = stopwordHits(text, StopEs)
    val mx = greatest(en, de, fr, es)
    when(mx === 0, lit("und"))
      .when(en === mx, lit("en"))
      .when(de === mx, lit("de"))
      .when(fr === mx, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality features: length, token stats, character-class ratios,
    * stopword ratio — the usual pretraining-corpus filters.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val letters = length(regexp_replace(lower(text), "[^a-z]", ""))
      .cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
      .cast("double")
    val stops = stopwordHits(lower(text), StopEn).cast("double")
    Seq(
      "n_chars_m" -> len,
      "n_tokens" -> toks,
      "mean_token_len" ->
        when(toks > 0, round(len / toks, 6)).otherwise(lit(0.0)),
      "alpha_ratio" -> when(len > 0, round(letters / len, 6))
        .otherwise(lit(0.0)),
      "digit_ratio" -> when(len > 0, round(digits / len, 6))
        .otherwise(lit(0.0)),
      "punct_ratio" -> when(len > 0, round(punct / len, 6))
        .otherwise(lit(0.0)),
      "stopword_ratio" -> when(toks > 0, round(stops / toks, 6))
        .otherwise(lit(0.0)))
  }

  /** Composite quality score in [0,1] (deterministic linear blend). */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    round(least(lit(1.0), greatest(lit(0.0),
      f("alpha_ratio") * 0.5 + f("stopword_ratio") * 0.3 +
        when(f("n_tokens") >= 20, 0.2).otherwise(f("n_tokens") / 100.0))), 6)
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text (engine-portable).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style robust fingerprint: min token-shingle hash per
    * window — here simplified to the k smallest shingle hashes joined.
    */
  def shingleSketch(text: Column, n: Int = 3, k: Int = 4): Column = {
    val toks = Dedup.tokens(text)
    val shingles = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => Dedup.tokHash(array_join(slice(toks, i + 1, lit(n)), " ")))
    array_join(slice(array_sort(array_distinct(shingles)), 1, k), "-")
  }
}
