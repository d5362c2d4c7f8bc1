package graft.io

import org.apache.spark.sql.DataFrame

/** Spark SQL bucketing — the STORAGE-level co-location tool for the
  * joins a pipeline repeats on the same key (doc_id, url hash): both
  * sides land pre-hash-partitioned (and per-file sorted) on disk, so a
  * same-key equi-join or aggregation plans with ZERO shuffle exchanges
  * — the scan itself reports the hash partitioning. At 100 TB this is
  * the difference between re-shuffling the corpus per join and never
  * shuffling it at all: write the pages/doc tables bucketed by the id
  * every downstream operator joins on (`BucketingSpec` locks the
  * exchange-free plan shape).
  *
  * Complements the two other partitioning tools in this repo: the
  * url-hash bucket SLICES TableIO commits (resume/lineage units) and
  * the transient `repartition` inside operators; bucketing is the
  * durable, catalog-visible variant.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and per-file
    * sorted) by `key`. Bucket counts must match across tables meant to
    * co-join (Spark only elides the exchange for equal counts).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(buckets > 0)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
