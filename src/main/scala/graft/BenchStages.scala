package graft

import graft.gen.PagesGen
import graft.pipeline.{ExtractionPipeline => EP}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe (diagnosis tool). */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
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
    import spark.implicits._
    time("gen only")(PagesGen.pages(spark, n, 42, cpus)
      .map(p => p.html.length.toLong).reduce(_ + _))
    time("gen+extract")(EP.pageTexts(PagesGen.pages(spark, n, 42, cpus), cpus)
      .map(_.page_md.length.toLong).reduce(_ + _))
    time("gen+extract+classify")(
      EP.classifyPages(EP.pageTexts(PagesGen.pages(spark, n, 42, cpus), cpus))
        .groupBy(col("page_type")).count().collect().toSeq)
    time("full records")(
      EP.records(PagesGen.pages(spark, n, 42, cpus), partitions = cpus).count())
    spark.stop()
  }
}
