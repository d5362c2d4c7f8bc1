package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Repeat-timing probe for individual catalog queries (diagnosis tool:
  * separates host drift from real regressions — each query is warmed
  * once then timed `reps` times; report min + all samples. The min of
  * several samples is the drift-robust statistic on this host).
  *
  * Usage: runMain graft.tools.BenchProbe <sfDir> <reps> <q1> [q2 ...]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // OFF: alias-substitution in constraint propagation goes
      // exponential on deep multi-referenced text-feature projections
      // (e.g. the curation gate) and we never benefit from inferred
      // filters; see Curation.curate scaladoc
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val rows = fn(spark, sfDir).count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min=${ts.min}%.3f  rows=$rows  samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
