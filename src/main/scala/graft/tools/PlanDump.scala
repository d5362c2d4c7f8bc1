package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of queries to files:
  *   runMain graft.tools.PlanDump <outDir> <suffix> q95 q101 ...
  * writes <outDir>/<query>_<suffix>.txt for each query. Session config
  * mirrors Bench (shuffle partitions aside — plan shape, not timing,
  * is what these files pin).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>…")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { prefix =>
      val name = graft.SparkEntry.queries.keys.toSeq.sorted
        .find(_.startsWith(prefix))
        .getOrElse(sys.error(s"no query matches '$prefix'"))
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
