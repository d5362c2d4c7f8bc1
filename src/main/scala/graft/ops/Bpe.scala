package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training and
  * serving (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units") — the tokenizer-induction step of a
  * pre-training pipeline, downstream of [[Curation.topNgrams]]'s
  * phrase report and upstream of sequence packing.
  *
  * Scale shape — the part that matters at 100 TB: BPE merges never
  * cross word boundaries, so training operates on the WORD-FREQUENCY
  * table, not the corpus. One aggregation (shuffle on the word — the
  * only corpus-sized pass) reduces 10^12 documents to ~10^8-10^9
  * distinct words; every merge iteration then runs on that
  * vocabulary-sized table: adjacent-pair counts as one partial-agg
  * groupBy (thin (pa, pb, n) rows), a SINGLE-ROW collect for the
  * argmax pair (deterministic tie-break: count desc, then pair
  * lexicographic), and a pure per-row array fold applying the merge.
  * Loop state is localCheckpoint'ed per round and the previous round's
  * blocks are released — the same iterative-fixpoint discipline as
  * [[Dedup.canonicalize]].
  *
  * Determinism: counts are exact longs; the argmax tie-break is total;
  * the merge fold is greedy left-to-right (the reference semantics) —
  * so the merge table is a pure function of the corpus across runs,
  * partitionings and parallelism levels (golden-tested against a
  * scalar reference implementation).
  */
object Bpe {

  /** One learned merge: `left` + `right` -> `merged`, with the pair
    * count that won the step (0-based `step`).
    */
  final case class Merge(step: Int, left: String, right: String,
      merged: String, pairCount: Long)

  /** Word-frequency table (word, n) — the one corpus-sized pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence of a word: its characters plus the
    * standard end-of-word marker as a final symbol (so merges can
    * learn suffix units distinct from in-word units).
    */
  val EndOfWord = "</w>"
  def initSyms(w: Column): Column =
    concat(
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** Adjacent symbol pairs of a symbol array, as (pa, pb) structs. */
  def adjacentPairs(syms: Column): Column = {
    val n = size(syms)
    when(n >= 2, transform(sequence(lit(1), n - 1),
      i => struct(element_at(syms, i).as("pa"),
        element_at(syms, i + 1).as("pb"))))
      .otherwise(array().cast("array<struct<pa:string,pb:string>>"))
  }

  /** Greedy left-to-right application of ONE merge (a, b) -> a+b to a
    * symbol array, as a pure Column fold: state = (acc, carry) where
    * carry is the last symbol not yet committed; a carry of `a`
    * followed by `b` commits the merged symbol, anything else commits
    * the carry. "a a a" under (a,a) yields ["aa","a"] — the reference
    * greedy semantics.
    */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("carry"))
    val commitCarry = (st: Column) =>
      when(st("carry").isNotNull, concat(st("acc"), array(st("carry"))))
        .otherwise(st("acc"))
    aggregate(syms, zero,
      (st, s) =>
        when(st("carry").isNotNull && st("carry") === a && s === b,
          struct(concat(st("acc"), array(lit(a + b))).as("acc"),
            lit(null).cast("string").as("carry")))
          .otherwise(struct(commitCarry(st).as("acc"), s.as("carry"))),
      st => commitCarry(st))
  }

  /** The word-frequency table expanded to initial symbol sequences —
    * the training loop's round-0 state (n, syms).
    */
  def initialSymbolTable(df: DataFrame, textCol: String): DataFrame =
    wordCounts(df, textCol)
      .select(col("n"), initSyms(col("word")).as("syms"))

  /** Adjacent-pair counts of a symbol table (pa, pb, cnt) — the
    * quantity each training iteration takes the argmax of. One
    * partial-agg groupBy over vocabulary-sized thin rows.
    */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.select(col("n"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("n")).as("cnt"))

  /** Train `numMerges` BPE merges over the corpus. Stops early when no
    * remaining pair reaches `minPairCount` (a merge seen once is
    * noise). Each iteration: pair counts (vocabulary-sized partial-agg
    * groupBy) -> 1-row argmax collect -> per-row fold. Returns the
    * ordered merge table.
    */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0)
    var syms = initialSymbolTable(df, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var done = numMerges == 0
    while (!done) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minPairCount) match {
        case Some(r) =>
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += Merge(step, a, b, a + b, c)
          val next = syms
            .withColumn("syms", applyMerge(col("syms"), a, b))
            .localCheckpoint()
          unpersistCheckpoint(syms)
          syms = next
          step += 1
          done = step >= numMerges
        case None => done = true
      }
    }
    unpersistCheckpoint(syms)
    merges.result()
  }

  /** Encode documents with a trained merge table: tokenize, expand
    * each word to its initial symbols, apply the merges IN TRAINING
    * ORDER (the reference encoder), flatten. Appends `bpe_tokens` and
    * `n_bpe_tokens`. The fold nests one array-aggregate per merge —
    * fine for the tens-of-merges demonstration scale here; a
    * production encoder for a 30k-merge vocabulary belongs in a
    * per-partition kernel with a rank-priority heap, slotting in
    * exactly like the multimodal codec seam.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge])
      : DataFrame = {
    val perWord = (w: Column) =>
      merges.foldLeft(initSyms(w)) { case (s, m) =>
        applyMerge(s, m.left, m.right)
      }
    df.withColumn("bpe_tokens",
        flatten(transform(Dedup.tokens(col(textCol)), w => perWord(w))))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Inverse of [[encode]]: concatenate the symbol stream and turn
    * each end-of-word marker back into one space — the exact
    * round-trip of the whitespace-normalized lowercase token stream
    * encode consumed (BPE merges only ever regroup characters inside
    * a word, so decode is merge-table-free). Pure per-row Columns.
    */
  def decode(bpeTokens: Column): Column =
    trim(replace(concat_ws("", bpeTokens), lit(EndOfWord), lit(" ")))

  /** Merge table as a DataFrame (step, left, right, merged,
    * pair_count) — the persistable tokenizer artifact.
    */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.step, m.left, m.right, m.merged, m.pairCount))
      .toDF("step", "left", "right", "merged", "pair_count")
  }

  /** Release the RDD blocks behind a localCheckpoint'ed frame (safe
    * once nothing downstream re-reads it).
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
