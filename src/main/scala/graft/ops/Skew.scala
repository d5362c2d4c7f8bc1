package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (X4): salted two-stage aggregation and salted
  * repartition for hot keys (e.g. one host with millions of pages).
  * AQE's skew-join splitting complements this at runtime; salting is the
  * static guarantee.
  */
object Skew {

  /** Deterministic per-row salt in [0, salt): a hash of the ROW CONTENT
    * (all columns), never of a physical row position — the salt must be
    * stable across runs, task retries and repartitionings, exactly like
    * hashSplit/sampledByHash are (monotonically_increasing_id would
    * re-draw on every retry, and a retried shuffle-map task re-drawing
    * salts can double/zero-count rows under fetch-failure recompute).
    *
    * Rows IDENTICAL in every column share a salt bucket — no pure
    * function of content can spread them. For [[saltedSum]] this is
    * harmless even when one hot key is a billion identical rows:
    * partial aggregation collapses them to one row per (key, salt) per
    * input partition map-side, so the reducer sees at most
    * partitions × salt rows per key regardless. For
    * [[saltedRepartition]] — a physical spread with no combine step —
    * duplicate-heavy hot keys need a genuinely distinct column: pass
    * `stable = Some(uniqueIdCol)` (also cheaper than hashing every
    * column).
    */
  def rowSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt))

  /** Salted repartition: spread each key over up to `salt` partitions.
    * Use before per-key heavy work when key cardinality is low/skewed.
    * `stable` = a deterministic per-row column (e.g. the unique id) to
    * salt on; defaults to the full-row hash.
    */
  def saltedRepartition(df: DataFrame, key: Column, salt: Int,
      partitions: Int, stable: Option[Column] = None): DataFrame =
    df.repartition(partitions, key,
      stable.map(c => pmod(xxhash64(c), lit(salt)))
        .getOrElse(rowSalt(df, salt)))

  /** Two-stage salted aggregation: partial agg on (key, salt), final agg
    * on key. Correct for decomposable aggregates, and deterministic:
    * the salt derives from row content (or the `stable` id column), not
    * from a physical position.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Int,
      out: String, stable: Option[Column] = None): DataFrame = {
    val salted = df.withColumn("_salt",
      stable.map(c => pmod(xxhash64(c), lit(salt)))
        .getOrElse(rowSalt(df, salt)))
    salted
      .groupBy(key.as("_k"), col("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col("_k"))
      .agg(sum(col("_partial")).as(out), sum(col("_pn")).as(s"${out}_n"))
  }

  /** EXACT distinct-id count per key under hot keys: salt by a hash of
    * the id ITSELF, so every distinct id lands in exactly one
    * (key, salt) bucket and the per-bucket distinct counts SUM exactly
    * (unlike a random salt, which would double-count ids split across
    * buckets). A viral key — one boilerplate paragraph shared by 10^9
    * documents — spreads its distinct-count work over `buckets`
    * reducers instead of melting one. Output: (_k, `out`).
    */
  def saltedDistinctCount(df: DataFrame, key: Column, id: Column,
      buckets: Int, out: String): DataFrame =
    df.groupBy(key.as("_k"), pmod(xxhash64(id), lit(buckets)).as("_b"))
      .agg(countDistinct(id).as("_d"))
      .groupBy(col("_k"))
      .agg(sum(col("_d")).as(out))

  /** Hot-key report: keys whose row count exceeds `threshold`. */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)

  /** Bounded-shuffle heavy-hitter detection: all keys with >= `minCount`
    * occurrences, WITHOUT a corpus-wide groupBy on the key.
    *
    * [[hotKeys]] is exact but its map-side partial aggregation emits one
    * row per DISTINCT KEY per task — at the 10^12-doc design scale with
    * ~10^11 distinct paragraphs, that is a 10^11-row shuffle to find the
    * handful of viral ones. This two-pass form bounds the shuffle by
    * construction (the same prefilter + exact-confirm discipline as the
    * Bloom decontamination):
    *
    *   pass 1 — count hash BUCKETS, not keys: groupBy on
    *     md5(key:salt) % width. Map-side combine caps each task's
    *     partial output at `width` rows no matter how many distinct
    *     keys it saw; the reducer sees <= tasks * width thin
    *     (bucket, count) rows. Buckets reaching `minCount` are
    *     collected — bounded by min(width, totalRows / minCount) ids.
    *   pass 2 — exact confirm: rows are filtered to candidate buckets
    *     by a broadcast join (map-side, no shuffle of the corpus), and
    *     only the survivors' keys are grouped exactly. Key text moves
    *     ONLY for candidate-bucket rows.
    *
    * No false negatives: bucket_count >= count(key) for every member
    * key, so a heavy key's bucket always passes pass 1. False positives
    * (light keys sharing a bucket with a heavy one, or many light keys
    * summing past the threshold) are killed by the exact confirm.
    * Expected pass-2 input beyond true hitters is rows/width per
    * candidate bucket — size `width` so that totalRows / width <<
    * minCount. Null keys are excluded (a null is not a key).
    * Deterministic: the bucket is a content hash, stable across runs,
    * retries and partitionings. Output: (`out` = key, n).
    */
  def heavyHitters(df: DataFrame, key: Column, minCount: Long,
      width: Int = 1 << 14, salt: String = "hh",
      out: String = "key"): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val bucket = pmod(graft.functions.Md5Prefix32(
      concat(key.cast("string"), lit(":" + salt))), lit(width))
    val keyed = df.filter(key.isNotNull)
      .select(key.as("_hk"), bucket.as("_hb"))
    val cands = keyed.groupBy(col("_hb"))
      .agg(count(lit(1)).as("_bc"))
      .filter(col("_bc") >= minCount)
      .select(col("_hb"))
    keyed.join(broadcast(cands), "_hb")
      .groupBy(col("_hk"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("_hk").as(out), col("n"))
  }
}
