package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Stage-level checkpoint/resume for corpus-GLOBAL pipelines.
  *
  * `TableIO.runResumable`'s bucket-wave protocol fits per-document
  * work, where the url-hash bucket is a valid commit unit. Corpus-wide
  * stages (paragraph dedup, minhash clustering) have cross-bucket
  * dependencies — their natural commit unit is the STAGE: each stage
  * writes its full output as a parquet table plus an atomically-renamed
  * commit marker; a resumed run reuses every committed stage's table
  * and recomputes only from the first uncommitted stage. This is the
  * intermediate-table checkpointing a 100 TB multi-stage curation job
  * does between its global barriers (on a cluster: Iceberg snapshot
  * commits; here: parquet dir + marker, same protocol shape as
  * TableIO's `_lineage`).
  *
  * A kill mid-write leaves no marker → the stage reruns and its
  * Overwrite replaces any partial files. Markers record rows/attempt/
  * timing for lineage-style reporting.
  */
object StagedJob {

  def markerPath(out: String, name: String) =
    Paths.get(out, s"stage_$name", "_COMMITTED")

  def committed(out: String, name: String): Boolean =
    Files.exists(markerPath(out, name))

  /** Run (or reuse) one named stage. `f` is only evaluated when the
    * stage is not yet committed. Returns the stage's table, always read
    * back from disk so downstream stages depend on the committed bytes,
    * not on in-memory lineage.
    *
    * @param requiredCols columns the CURRENT code expects in this
    *                     stage's output. A committed table missing any
    *                     of them was written by an older pipeline
    *                     version (e.g. the gate's `_red` → `_paras`
    *                     format change) — reusing it would fail many
    *                     stages later with an unresolved-column error,
    *                     so the stale commit is invalidated and the
    *                     stage recomputed instead.
    */
  def stage(spark: SparkSession, out: String, name: String,
      requiredCols: Seq[String] = Nil)
      (f: => DataFrame): DataFrame = {
    val dir = s"$out/stage_$name"
    val marker = markerPath(out, name)
    if (Files.exists(marker) && requiredCols.nonEmpty) {
      val cols = spark.read.parquet(dir).columns.toSet
      val missing = requiredCols.filterNot(cols.contains)
      if (missing.nonEmpty) {
        System.err.println(s"[graft] stage $name was committed by an " +
          s"older pipeline version (missing ${missing.mkString(", ")}); " +
          "recomputing")
        Files.delete(marker)
      }
    }
    if (!Files.exists(marker)) {
      val t0 = System.currentTimeMillis()
      f.write.mode(SaveMode.Overwrite).parquet(dir)
      val rows = spark.read.parquet(dir).count()
      val tmp = Paths.get(dir, "_COMMITTED.tmp")
      Files.write(tmp,
        s"""{"stage":"$name","rows":$rows,"start_ms":$t0,"end_ms":${System.currentTimeMillis()}}"""
          .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
    }
    spark.read.parquet(dir)
  }

  /** Rows recorded in a committed stage's marker. */
  def readRows(out: String, name: String): Option[Long] = {
    val m = markerPath(out, name)
    if (!Files.exists(m)) None
    else {
      val s = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      """"rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }
  }
}
