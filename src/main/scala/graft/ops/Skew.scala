package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (X4): salted two-stage aggregation and salted
  * repartition for hot keys (e.g. one host with millions of pages).
  * AQE's skew-join splitting complements this at runtime; salting is the
  * static guarantee.
  */
object Skew {

  /** Salted repartition: spread each key over up to `salt` partitions.
    * Use before per-key heavy work when key cardinality is low/skewed.
    */
  def saltedRepartition(df: DataFrame, key: Column, salt: Int,
      partitions: Int): DataFrame =
    df.repartition(partitions, key,
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))

  /** Two-stage salted aggregation: partial agg on (key, salt), final agg
    * on key. `aggs` are (partialExpr, finalExpr-from-partial) pairs over
    * the named value column. Correct for decomposable aggregates.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Int,
      out: String): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
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

  /** Host extraction from a url (for host-level skew statistics). */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)/", 1)

  /** Hot-key report: keys whose row count exceeds `threshold`. */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
}
