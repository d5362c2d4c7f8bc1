package graft

import java.io.File
import scala.sys.process._

/** Multi-process scaling evidence: N vs 4N "executors", each a separate
  * JVM (local[threads]) processing a DISJOINT slice of the same
  * materialized pages table — the faithful sandbox analogue of a real
  * N- vs 4N-executor cluster (executors are separate JVMs; a single
  * shared JVM adds GC/futex contention a cluster doesn't have).
  *
  * Each child warms up, then measures its slice; the cluster job time is
  * max(child measured times) — executor provisioning (JVM start) is
  * excluded, as on a long-lived cluster.
  *
  * Usage: BenchCluster <pagesPath> <executors> <threadsPerExec>
  * Child mode: BenchCluster --child <pagesPath> <threads> <slice> <of>
  */
object BenchCluster {

  def childMain(pagesPath: String, threads: Int, slice: Int, of: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-exec-$slice")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // disjoint slice: files are bucketed by directory (bucket=<id>)
    val dirs = new File(pagesPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toInt).sorted
      .filter(_ % of == slice)
      .map(b => s"$pagesPath/bucket=$b")
    def job(): Long = {
      val pages = spark.read.parquet(dirs: _*).as[graft.model.Page]
      graft.pipeline.ExtractionPipeline.records(pages, partitions = 0).count()
    }
    job() // warmup (JIT)
    val t0 = System.nanoTime()
    val n = job()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CHILD_RESULT $slice $sec%.3f $n")
    spark.stop()
    sys.exit(0)
  }

  /** Materialize the bucketed pages table (64 bucket dirs). */
  def ensureBucketedTable(nPages: Long, boost: Int): String = {
    // tmpfs: the sandbox virtio disk caps at ~200 MB/s and both fleet
    // widths saturate it; a real cluster's input bandwidth scales with
    // nodes, so the engine benchmark reads from RAM-backed storage
    val path = s"/dev/shm/graft_bench_bucketed_${nPages}_$boost"
    if (!new File(path + "/_SUCCESS").exists()) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import org.apache.spark.sql.functions._
      graft.gen.PagesGen.pages(spark, nPages, 42, 64, boost)
        .withColumn("bucket", pmod(xxhash64(col("url")), lit(64)))
        .write.partitionBy("bucket").mode("overwrite").parquet(path)
      spark.stop()
    }
    path
  }

  def runFleet(pagesPath: String, executors: Int, threads: Int,
      heap: String): Seq[Double] = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    val addOpens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val procs = (0 until executors).map { i =>
      // ActiveProcessorCount = the executor's core allowance — without it
      // every child sizes GC/JIT/netty pools for all 32 host cores and
      // 8 children oversubscribe the box (a real cluster pins a cpuset)
      val cmd = Seq(javaBin, s"-Xmx$heap", s"-Xms$heap",
        "-XX:+AlwaysPreTouch", s"-XX:ActiveProcessorCount=$threads",
        "-Dspark.ui.enabled=false") ++ addOpens ++
        Seq("-cp", cp, "graft.BenchCluster", "--child", pagesPath,
          threads.toString, i.toString, executors.toString)
      val sb = new StringBuilder
      val p = Process(cmd).run(ProcessLogger(l => sb.append(l).append('\n'),
        _ => ()))
      (p, sb)
    }
    procs.map { case (p, sb) =>
      p.exitValue()
      val line = sb.toString.linesIterator
        .find(_.startsWith("CHILD_RESULT"))
        .getOrElse(sys.error(s"child failed: ${sb.toString.take(500)}"))
      line.split(" ")(2).toDouble
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "--child") {
      childMain(args(1), args(2).toInt, args(3).toInt, args(4).toInt)
      return
    }
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "800000").toLong
    val boost = sys.env.getOrElse("SPARK_GRAFT_BENCH_BOOST", "8").toInt
    val threads = sys.env.getOrElse("SPARK_GRAFT_EXEC_THREADS", "4").toInt
    val execN = sys.env.getOrElse("SPARK_GRAFT_EXEC_N", "2").toInt
    val heap = sys.env.getOrElse("SPARK_GRAFT_EXEC_HEAP", "6g")
    val path = ensureBucketedTable(nPages, boost)
    // N executors vs 4N executors, same threads/heap per executor.
    // Interleaved median-of-k: the host shows multi-x noise spikes.
    val k = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val trials = (1 to k).map { _ =>
      val a = runFleet(path, execN, threads, heap).max
      val b = runFleet(path, execN * 4, threads, heap).max
      System.err.println(f"[cluster] trial tN=$a%.2f t4N=$b%.2f")
      (a, b)
    }
    val tN = median(trials.map(_._1))
    val t4N = median(trials.map(_._2))
    val eff = (tN / t4N) / 4.0
    println(f"""{"mode":"multi-process","pages":$nPages,"boost":$boost,"executors_N":$execN,"executors_4N":${execN * 4},"threads_per_exec":$threads,"sec_N":$tN%.3f,"sec_4N":$t4N%.3f,"docs_per_sec_N":${nPages / tN}%.1f,"docs_per_sec_4N":${nPages / t4N}%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}
