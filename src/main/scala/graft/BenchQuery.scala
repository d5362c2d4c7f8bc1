package graft

/** Single-query timing probe: `runMain graft.BenchQuery <sfDir> q98 q99 …`.
  * Same session config and warm-then-min-of-3 protocol as the Bench
  * headline loop, for isolating one query's cost while iterating
  * (Bench itself times the whole 60-query headline).
  */
object BenchQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchQuery <sfDir> <query>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-query")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { prefix =>
      val name = SparkEntry.queries.keys.find(_.startsWith(prefix))
        .getOrElse(sys.error(s"no query matches '$prefix'"))
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val probes = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: first=${probes.head}%.3f s min3=${probes.min}%.3f s" +
        probes.map(p => f"$p%.2f").mkString("  [", ", ", "]"))
    }
    spark.stop()
  }
}
