package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional file clustering (Z-order / Morton curve) for
  * data-skipping file layouts.
  *
  * At the 10^12-document design scale the scan-side win that matters
  * most AFTER predicate pushdown is FILE skipping: table formats
  * (Iceberg manifests, Delta stats, plain parquet footers) record
  * per-file min/max per column, and the planner prunes every file whose
  * range excludes the predicate. Those stats are only selective if each
  * file covers a small box of the value space. A linear sort makes
  * files selective on ONE column and useless on every other — a
  * predicate on the second column still touches every file. The Z-order
  * curve (Morton code: bit-interleave of fixed-width per-column codes —
  * Morton 1966, the layout Delta OPTIMIZE ZORDER and Iceberg
  * rewrite-with-zorder apply) gives every clustered column locality at
  * once: consecutive z-values differ in low-order interleaved bits, so
  * a z-contiguous file spans a small range in EVERY dimension.
  *
  * Everything here is exact integer Column arithmetic (integral DIV +
  * shift/mask), codegen-friendly, no UDFs; the only actions are a
  * 4-long min/max collect per clustered column (an agg the scan
  * computes map-side). The write path is `repartitionByRange` on the
  * z-value — Spark's sampled range partitioner splits skewed z-regions
  * by ROW COUNT, which equal-width z-buckets would not — followed by
  * `sortWithinPartitions` so parquet row-group stats inside each file
  * are tight too (row-group pruning nests inside file pruning).
  */
object Layout {

  /** Exact linear code of `v` from [lo, hi] into [0, 2^bits): integral
    * DIV (exact at any magnitude — no double rounding), clamped so
    * out-of-bounds values land on the boundary cells rather than
    * corrupting the interleave. Caller contract: (hi - lo) * (2^bits - 1)
    * must fit a signed long — at the default 16 bits that allows value
    * ranges up to ~1.4e14, far past any length/score/timestamp-micros
    * column this engine clusters on.
    */
  def rangeCode(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    val levels = (1L << bits) - 1
    val range = math.max(1L, hi - lo)
    val scaled = call_function("div",
      (v.cast("long") - lit(lo)) * lit(levels), lit(range))
    least(lit(levels), greatest(lit(0L), scaled))
  }

  /** Morton z-value: interleave the low `bits` of each code column.
    * Code j's bit b lands at output bit b * n + (n - 1 - j), so the
    * FIRST column owns the most-significant bit of each group — column
    * order is a (mild) priority order, as in every Z-order
    * implementation. n * bits must be <= 63. Pure shift/mask Column
    * fold: bits * n codegen'd terms, no UDF.
    */
  def zValue(codes: Seq[Column], bits: Int): Column = {
    val n = codes.size
    require(n >= 1, "zValue needs at least one code column")
    require(n * bits <= 63, s"n*bits = ${n * bits} exceeds 63")
    val terms = for {
      b <- 0 until bits
      (c, j) <- codes.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)),
      b * n + (n - 1 - j))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Column bounds for the clustered columns: one map-side-combined agg,
    * collected as 2 longs per column (the same stats a table format
    * already tracks — on Iceberg these come free from the manifest).
    * An empty frame (or an all-null column) yields (0, 0) — the
    * degenerate-but-valid bounds [[rangeCode]] already handles — so an
    * empty incremental batch clusters to zero files instead of NPEing
    * at the finish line.
    */
  def columnBounds(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def at(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    cols.indices.map(i => (at(2 * i), at(2 * i + 1)))
  }

  /** Add the Morton z-value of `cols` as `zCol` (given precomputed
    * bounds — pass [[columnBounds]] output, or the table format's
    * manifest stats to avoid the extra scan).
    */
  def withZValue(df: DataFrame, cols: Seq[String],
      bounds: Seq[(Long, Long)], bits: Int = 16,
      zCol: String = "_z"): DataFrame = {
    require(cols.size == bounds.size, "one (lo, hi) per column")
    val codes = cols.zip(bounds).map { case (c, (lo, hi)) =>
      rangeCode(col(c), lo, hi, bits)
    }
    df.withColumn(zCol, zValue(codes, bits))
  }

  /** Write `df` as `nFiles` z-clustered parquet files: range-partition
    * on the z-value (sampled boundaries — equal ROWS per file even when
    * the value space is skewed), sort within each file so row-group
    * stats nest tightly, drop the helper column on disk.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], nFiles: Int,
      path: String, bits: Int = 16): Unit = {
    val bounds = columnBounds(df, cols)
    withZValue(df, cols, bounds, bits)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max stats over `cols` for a written table — exactly
    * what an Iceberg manifest / Delta stats column stores per data
    * file, reconstructed here with one grouped scan so tests (and
    * operators without a manifest) can measure skipping selectivity.
    */
  def fileStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"${c}_min"),
      max(col(c).cast("long")).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** How many files a conjunctive range predicate must read under the
    * given per-file stats — the manifest-pruning count. `ranges` maps
    * column -> inclusive [lo, hi]; a file survives if every column's
    * stats interval intersects its range.
    */
  def filesTouched(stats: DataFrame,
      ranges: Seq[(String, (Long, Long))]): Long = {
    val cond = ranges.map { case (c, (lo, hi)) =>
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi)
    }.reduce(_ && _)
    stats.filter(cond).count()
  }

  // ---- CDX-style crawl index layout (SURT-keyed, range-clustered) ----

  /** Write a CDX-style crawl index: one row per capture, keyed by
    * ([[Curation.surtKey]], capture timestamp), laid out as `nFiles`
    * range-clustered parquet files sorted within each file — the
    * web-archive index layout (OpenWayback/pywb CDXJ, the Common-Crawl
    * URL index) rebuilt as a Spark table. Because SURT reverses host
    * labels, one host — and one registrable domain — is a CONTIGUOUS
    * key range, so a per-host or per-domain lookup binary-searches the
    * file manifest ([[fileKeyStats]]) to a handful of files instead of
    * scanning the corpus; `repartitionByRange`'s sampled boundaries
    * keep files row-balanced even though key space is wildly skewed
    * toward big hosts. Scale shape: one range exchange + local sort,
    * no corpus-sized window, no collect.
    */
  def writeCdxIndex(pages: DataFrame, urlCol: String, tsCol: String,
      nFiles: Int, path: String): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    pages
      .withColumn("surt_key", Curation.surtKey(col(urlCol)))
      .repartitionByRange(nFiles, col("surt_key"), col(tsCol))
      .sortWithinPartitions("surt_key", tsCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max of a STRING key for a written table — the
    * manifest row a SURT-range lookup prunes on (the string twin of
    * [[fileStats]], which casts to long).
    */
  def fileKeyStats(spark: SparkSession, path: String,
      keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))

  /** How many files a key-PREFIX lookup (one host: "com,example)",
    * one domain: "com,example") must read under the given per-file key
    * stats. Keys with prefix p lie in [p, p + "￿"] for any
    * ASCII-keyed index (SURT keys are ASCII by construction — they come
    * out of lowercased authority/path bytes), so a file survives iff
    * its [key_min, key_max] intersects that interval.
    */
  def filesForPrefix(stats: DataFrame, prefix: String): Long =
    stats.filter(col("key_max") >= lit(prefix) &&
      col("key_min") <= lit(prefix + "￿")).count()

  // ---- byte-balanced output shards ----

  /** Assign every document to one of `nShards` byte-balanced output
    * shards — the "write 100 TB as N equal-weight files" primitive
    * (token-balanced training shards, size-capped export files). A
    * row-count split (`repartition(n)`) skews wildly when document
    * sizes do (a shard of 10 KB pages vs a shard of 10 MB PDFs);
    * this assigns by CUMULATIVE WEIGHT: rows are ordered by a
    * deterministic md5 hash of the id (uniform, engine-stable — so
    * shard contents are a random-but-reproducible mix, not correlated
    * with crawl order), the inclusive running weight sum is computed
    * via [[ScaleWindow.shardedRunningSum]] (NO corpus-sized window
    * partition), and shard = exclusive-prefix DIV ceil(total/n),
    * clamped to n−1. Every shard's weight lands within one max-document
    * of the target — exact bin boundaries, not sampled approximations.
    *
    * Appends `cum_bytes` (inclusive running weight), `total_bytes`
    * (corpus total) and `shard` (0-based). `weight` is any non-negative
    * integer cost column (bytes, token count); negative values clamp
    * to 0. Deterministic across runs, partitionings and engines —
    * the DuckDB twin is a plain global-window running sum with the
    * same DIV arithmetic.
    */
  def balancedShards(df: DataFrame, idCol: String, weight: Column,
      nShards: Int, salt: String = "shard", shards: Int = 0): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val withW = df
      .withColumn("_bs_w", greatest(weight.cast("long"), lit(0L)))
      .withColumn("_bs_h", graft.functions.Md5Prefix32(
        concat(col(idCol).cast("string"), lit(":" + salt))))
    val summed = ScaleWindow.shardedRunningSum(withW, Seq.empty,
      Seq(col("_bs_h"), col(idCol)), col("_bs_w"),
      "cum_bytes", "total_bytes", shards)
    val target = greatest(call_function("div",
      col("total_bytes") + lit(nShards.toLong - 1L), lit(nShards.toLong)),
      lit(1L))
    summed
      .withColumn("shard", least(lit(nShards.toLong - 1L),
        call_function("div", col("cum_bytes") - col("_bs_w"), target)))
      .drop("_bs_w", "_bs_h")
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998, the consistent-placement scheme behind cache
    * rings and shard maps: shard(key) = argmax over shards of
    * h(key, shard). The property a 10^12-key corpus reshards on:
    * growing n → n+1 shards moves ONLY the keys the new shard wins
    * (≈ 1/(n+1) of them, all moving TO the new shard) — a mod-n
    * assignment moves n/(n+1) of everything. Pure per-row Columns:
    * n md5-prefix hashes + a greatest() over (hash, shard) structs
    * (field-order comparison; hash ties — 2^-32 per pair — break to
    * the higher shard, mirrored in the oracle). n is the SHARD count
    * (bounded), not the corpus.
    */
  def rendezvousShard(key: Column, nShards: Int,
      salt: String = "rdv"): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards in [1,4096], got $nShards")
    val scored = (0 until nShards).map(s => struct(
      graft.functions.Md5Prefix32(
        concat(key.cast("string"), lit(s":$salt:$s"))).as("h"),
      lit(s.toLong).as("s")))
    greatest(scored: _*).getField("s")
  }

  /** Zone maps: per-shard min/max of each pruning column — EXACTLY the
    * stats a table format keeps per file (parquet footers, Iceberg
    * manifest ranges, Delta stats), as a queryable sidecar table of
    * one thin row per shard. Map-side-combinable min/max agg; columns
    * come back as `<col>_min` / `<col>_max` longs.
    */
  def zoneMaps(df: DataFrame, shardCol: String,
      cols: Seq[String]): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(cols.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"${c}_min"),
          max(col(c).cast("long")).as(s"${c}_max")))
        .head, cols.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"${c}_min"),
          max(col(c).cast("long")).as(s"${c}_max"))).tail: _*)

  /** Shards a conjunctive box predicate must touch: zone [min,max]
    * intersects [lo,hi] on EVERY predicate column. The planner-side
    * file-skipping decision over the zone-map sidecar — shard COUNT
    * here is the figure of merit a layout (z-order vs linear) is
    * judged by.
    */
  def zonesTouched(zones: DataFrame,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "at least one predicate range")
    zones.where(ranges.map { case (c, lo, hi) =>
      col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    }.reduce(_ && _))
  }
}
