package graft

import graft.ops.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the composed curation pipeline
  * (diagnosis tool, same role as BenchStages for extraction).
  * Usage: runMain graft.BenchCurate <cpus> <sfDir>
  */
object BenchCurate {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val sfDir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // OFF: alias-substitution in constraint propagation goes
      // exponential on deep multi-referenced text-feature projections
      // (e.g. the curation gate) and we never benefit from inferred
      // filters; see Curation.curate scaladoc
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    // same planted workload shape as the scaling bench's generator
    val aug = graft.gen.DocsGen.plantedText(
      col("doc_id").cast("long"), col("text"))
    val in = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), aug.as("aug"))

    time("input count")(in.count())
    val txt = col("aug")
    val rep = Curation.repetitionFeatures(txt).toMap
    time("langId inline-Column form")(in.select(TextAnalysis.langId(txt).as("l")).filter(col("l").isNotNull).count())
    time("langId materialized form")(TextAnalysis.withLangId(in, "aug").filter(col("lang").isNotNull).count())
    time("dup_line_ppm only")(in.select(rep("dup_line_ppm").as("d")).agg(sum("d")).collect())
    time("tokenCount only")(in.select(TextAnalysis.tokenCount(txt).as("t")).agg(sum("t")).collect())
    time("piiRedact only")(in.select(length(Curation.piiRedact(txt)).as("l")).agg(sum("l")).collect())
    val gate = Curation.gateStage(in, "doc_id", "aug", 10, 300000L)
    time("gate stage (all of the above)")(gate.count())
    val gateC = gate.localCheckpoint()
    time("gate localCheckpoint")(gateC.count())
    val deb0 = Curation.deboilStage(gateC, "doc_id", 3)
    time("deboil stage (count-pruned)")(deb0.count())
    val deb = deb0.localCheckpoint()
    time("deboil localCheckpoint")(deb.count())
    val exact = Curation.exactStage(deb, "doc_id")
    time("exact stage (thin fp + semi-join)")(exact.count())
    val exactC = exact.localCheckpoint()
    time("exact localCheckpoint")(exactC.count())
    val pairs = Dedup.minhashLshPairs(exactC, "doc_id", "clean_text",
      k = 16, bands = 8, minEstJaccard = 0.5, shingleN = 3, maxBucket = 0)
    time("lsh pairs")(pairs.count())
    val surv = Dedup.canonicalize(exactC, "doc_id", pairs)
      .filter(col("id") === col("canonical_id"))
    time("canonicalize fixpoint")(surv.count())
    time("full curate (end to end, fresh)")(
      Curation.curate(in, "doc_id", "aug").count())
    spark.stop()
  }
}
