package graft.tools

import graft.ops.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the composed curation pipeline (diagnosis
  * tool; mirrors Curation.curate's internals over the q43 synth corpus).
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // OFF: alias-substitution in constraint propagation goes
      // exponential on deep multi-referenced text-feature projections
      // (e.g. the curation gate) and we never benefit from inferred
      // filters; see Curation.curate scaladoc
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val did = col("doc_id").cast("long")
    val aug = concat_ws("\n\n", col("text"),
      concat(lit("Contact user"), pmod(did, lit(7)).cast("string"),
        lit("@example.com")))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), aug.as("aug"))
    val txt = col("aug")
    val rep = Curation.repetitionFeatures(txt).toMap
    for (_ <- 1 to 2) {
      time("gate (lang+rep+redact)") {
        docs.withColumn("lang", TextAnalysis.langId(txt))
          .withColumn("_toks", TextAnalysis.tokenCount(txt).cast("long"))
          .withColumn("_dlp", rep("dup_line_ppm"))
          .filter(col("lang") =!= "und" && col("_toks") >= 10 &&
            col("_dlp") <= 300000)
          .withColumn("_red", Curation.piiRedact(txt))
          .count()
      }
      val gated = docs.withColumn("lang", TextAnalysis.langId(txt))
        .withColumn("_red", Curation.piiRedact(txt)).localCheckpoint()
      time("para dedup") {
        Curation.dropDuplicatedParagraphs(gated, "doc_id", "_red", 3).count()
      }
      val deb = Curation.dropDuplicatedParagraphs(gated, "doc_id", "_red", 3)
      val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
      time("exact window") {
        deb.withColumn("_fp", md5(col("clean_text")))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).count()
      }
      val exact = deb.withColumn("_fp", md5(col("clean_text")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).localCheckpoint()
      time("minhash pairs") {
        Dedup.minhashLshPairs(exact, "doc_id", "clean_text",
          k = 16, bands = 8, minEstJaccard = 0.5, shingleN = 3).count()
      }
      val pairs = Dedup.minhashLshPairs(exact, "doc_id", "clean_text",
        k = 16, bands = 8, minEstJaccard = 0.5, shingleN = 3)
      time("canonicalize") {
        Dedup.canonicalize(exact, "doc_id", pairs).count()
      }
      time("curate total") {
        Curation.curate(docs, "doc_id", "aug").count()
      }
      time("q43 full") {
        graft.SparkEntry.queries("q43_curate")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
