package graft

import graft.gen.PagesGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints formatted plans for the pipeline and key
  * queries, and the exchange count of the pipeline plan.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // OFF: alias-substitution in constraint propagation goes
      // exponential on deep multi-referenced text-feature projections
      // (e.g. the curation gate) and we never benefit from inferred
      // filters; see Curation.curate scaladoc
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = if (args.nonEmpty) args(0) else "pipeline"
    which match {
      case "pipeline" =>
        val df = ExtractionPipeline.records(PagesGen.pages(spark, 100, 42, 4),
          partitions = 4)
        df.explain("formatted")
      case q =>
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .explain("formatted")
    }
    spark.stop()
  }
}
