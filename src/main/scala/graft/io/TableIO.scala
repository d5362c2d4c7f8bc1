package graft.io

import graft.model.Page
import graft.pipeline.ExtractionPipeline
import graft.rules.{RuleSet, RuleSets}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Iceberg-semantics emulation over partitioned Parquet (SURVEY §4.3):
  * per-partition commit log (`_lineage/`) with atomic temp-file+rename
  * commits, idempotent bucket outputs, and resume that skips COMMITTED
  * buckets. The seam is deliberately small so a real Iceberg catalog
  * can replace it unchanged (no iceberg-spark-runtime jar ships in this
  * environment — verified absent).
  *
  * Layout:
  *   out/data/bucket=[id]/ parquet files (overwritten per attempt)
  *   out/_lineage/bucket-[id].json       (atomic rename commit)
  *   out/_metrics/                       (pipeline events, append)
  */
object TableIO {

  case class Lineage(bucket: Int, status: String, attempt: Int,
      inputRows: Long, outputRows: Long, contentHash: Long,
      startedMs: Long, finishedMs: Long)

  private def lineageDir(out: String): Path = Paths.get(out, "_lineage")

  def readLineage(out: String): Map[Int, Lineage] = {
    val dir = lineageDir(out)
    if (!Files.exists(dir)) return Map.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap { p =>
        try {
          val s = Files.readString(p)
          def f(k: String): String =
            s.split("\"" + k + "\":").last.takeWhile(c =>
              c != ',' && c != '}').trim.stripPrefix("\"").stripSuffix("\"")
          Some(Lineage(f("bucket").toInt, f("status"), f("attempt").toInt,
            f("inputRows").toLong, f("outputRows").toLong,
            f("contentHash").toLong, f("startedMs").toLong,
            f("finishedMs").toLong))
        } catch { case _: Exception => None }
      }
      .map(l => l.bucket -> l).toMap
  }

  /** Atomic write: temp file in the same directory + ATOMIC_MOVE rename. */
  def writeLineage(out: String, l: Lineage): Unit = {
    val dir = lineageDir(out)
    Files.createDirectories(dir)
    val json =
      s"""{"bucket":${l.bucket},"status":"${l.status}","attempt":${l.attempt},""" +
        s""""inputRows":${l.inputRows},"outputRows":${l.outputRows},""" +
        s""""contentHash":${l.contentHash},"startedMs":${l.startedMs},""" +
        s""""finishedMs":${l.finishedMs}}"""
    val tmp = Files.createTempFile(dir, s".bucket-${l.bucket}", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"bucket-${l.bucket}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Scala twin of the `pmod(xxhash64(url), buckets)` Column — used for
    * accumulator bucketing inside the extraction job (equality with the
    * Column is asserted in ResumeSpec).
    */
  def bucketFor(url: String, buckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(url)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    (((h % buckets) + buckets) % buckets).toInt
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

  /** Resumable extraction run: processes only buckets not yet COMMITTED,
    * in WAVES of `waveSize` buckets — one Spark job per wave (not per
    * bucket: a job per bucket would rescan the input `buckets` times; a
    * single all-bucket job would make the commit unit the whole run).
    * With a real Iceberg/partitioned source the wave filter prunes to
    * just the wave's partitions; here it predicate-filters the scan.
    *
    * Commit protocol per wave: delete stale (uncommitted) wave bucket
    * dirs, write all wave buckets in one job (each bucket an idempotent
    * overwrite of its own directory), compute per-bucket output stats in
    * ONE follow-up job over the written files, then atomically commit
    * one lineage file per bucket — including 0-row lineage for buckets
    * whose pages produced no records (a missing directory is a valid
    * outcome, not an error). A kill mid-wave leaves no lineage for the
    * wave's buckets → the next run redoes exactly that wave.
    *
    * Input counts ride a per-bucket accumulator inside the extraction
    * job — the input is scanned ONCE per wave. (Accumulators can
    * over-count under task retries; counts are metrics-grade, the
    * commit decision never depends on them.)
    *
    * @param buckets   total url-hash buckets (the resume granularity)
    * @param waveSize  buckets per Spark job
    * @param failAfter TEST HOOK: abort (like a kill) after committing
    *                  this many buckets this run (-1 = never)
    * @return number of buckets committed this run
    */
  def runResumable(pages: Dataset[Page], out: String, buckets: Int = 16,
      waveSize: Int = 4, rs: RuleSet = RuleSets.plugin,
      failAfter: Int = -1): Int = {
    val spark = pages.sparkSession
    val existing = readLineage(out)
    val pending = (0 until buckets)
      .filter(b => !existing.get(b).exists(_.status == "COMMITTED"))
    if (pending.isEmpty) return 0

    val bucketOf = pmod(xxhash64(col("url")), lit(buckets))
    var done = 0
    pending.grouped(waveSize).foreach { wave =>
      if (failAfter >= 0 && done >= failAfter)
        throw new RuntimeException(s"injected failure after $done buckets")
      val t0 = System.currentTimeMillis()
      // stale dirs from a failed attempt carry no lineage; removing them
      // makes the post-write listing exactly this attempt's output even
      // when the retry produces zero rows for a previously-written bucket
      wave.foreach { b =>
        deleteRecursively(Paths.get(s"$out/data/bucket=$b"))
        deleteRecursively(Paths.get(s"$out/_metrics/bucket=$b"))
      }
      val nb = buckets
      val accs = wave.map(b =>
        b -> spark.sparkContext.longAccumulator(s"graft_in_$b")).toMap
      val slice = pages.withColumn("_bucket", bucketOf)
        .filter(col("_bucket").isin(wave: _*))
        .drop("_bucket").as[Page](pages.encoder)
        .mapPartitions { it =>
          it.map { p => accs(bucketFor(p.url, nb)).add(1L); p }
        }(pages.encoder)
      val recs = ExtractionPipeline.records(slice, rs,
        partitions = math.max(4, waveSize * 4))
        .withColumn("bucket", bucketOf)
      // ONE write job for the wave; dynamic partition overwrite touches
      // only the wave's bucket directories (idempotent on retry)
      recs.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(s"$out/data")
      // stats from what actually landed — ONE job over the wave's dirs
      val writtenDirs = wave
        .filter(b => Files.exists(Paths.get(s"$out/data/bucket=$b")))
        .map(b => s"$out/data/bucket=$b")
      val stats: Map[Int, (Long, Long)] =
        if (writtenDirs.isEmpty) Map.empty
        else spark.read.option("basePath", s"$out/data")
          .parquet(writtenDirs: _*)
          .groupBy(col("bucket"))
          // bit_xor: order-independent content hash, no ANSI overflow
          .agg(count(lit(1)).as("n"),
            coalesce(expr("bit_xor(xxhash64(url, row_text))"), lit(0L))
              .as("h"))
          .collect()
          .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      // S10 event-log sink, resume-idempotent: record-stage events are
      // derived from the wave's FRESHLY-WRITTEN records (no second
      // extraction pass) and land bucket-partitioned under _metrics with
      // the same dynamic-overwrite semantics as the data — a resumed run
      // reproduces exactly the killed run's missing event partitions,
      // never appends duplicates
      if (writtenDirs.nonEmpty)
        ExtractionPipeline.recordEvents(
          spark.read.option("basePath", s"$out/data")
            .parquet(writtenDirs: _*))
          .withColumn("bucket", bucketOf)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(s"$out/_metrics")
      wave.foreach { b =>
        val (n, h) = stats.getOrElse(b, (0L, 0L))
        writeLineage(out, Lineage(b, "COMMITTED",
          existing.get(b).map(_.attempt + 1).getOrElse(1),
          accs(b).value, n, h, t0, System.currentTimeMillis()))
        done += 1
      }
    }
    done
  }

  /** Read the committed dataset (only COMMITTED buckets). A committed
    * bucket with zero output rows has no directory — skipped, not an
    * error.
    */
  def readCommitted(spark: SparkSession, out: String): DataFrame =
    readPartitioned(spark, s"$out/data", committedBuckets(out))

  /** Read the committed event log (record-stage events written per wave
    * by runResumable). Same committed-bucket pruning as readCommitted.
    */
  def readEvents(spark: SparkSession, out: String): DataFrame =
    readPartitioned(spark, s"$out/_metrics", committedBuckets(out))

  private def committedBuckets(out: String): Seq[Int] =
    readLineage(out).values
      .filter(_.status == "COMMITTED").map(_.bucket).toSeq.sorted

  private def readPartitioned(spark: SparkSession, base: String,
      buckets: Seq[Int]): DataFrame = {
    val paths = buckets.map(b => s"$base/bucket=$b")
      .filter(p => Files.exists(Paths.get(p)))
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", base).parquet(paths: _*)
  }
}
