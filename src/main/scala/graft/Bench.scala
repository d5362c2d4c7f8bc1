package graft

import graft.gen.PagesGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): prints ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Two parts:
  *  1. headline operator queries at SPARK_GRAFT_SF_DIR (local[cpus]);
  *  2. the north-rule scaling evidence: the identical extraction
  *     pipeline on the identical synthetic pages input at local[8] and
  *     local[32] — throughput at both + efficiency (t8/t32)/4
  *     (sandbox adaptation of the N vs 4N executor criterion).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // split the pages scan finely enough to feed all threads (the
      // 128 MB default gives ~8 splits for the bench table → starved
      // local[32]); same rule as sizing input splits on a real cluster
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Pipeline wall time for n synthetic pages at given parallelism.
    * boost=8 makes pages ~15-20 KB — representative Common-Crawl sizes —
    * so the measurement is dominated by real per-page work, not job
    * fixed costs.
    */
  /** Materialize the benchmark pages table once (parquet, like the real
    * input), so the measured job is read → extract → records — the
    * actual pipeline — not synthetic-page generation.
    */
  private def ensurePagesTable(spark: SparkSession, n: Long, boost: Int): String = {
    val path = s"/dev/shm/graft_bench_pages_${n}_$boost"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      PagesGen.pages(spark, n, 42, 128, boost)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  private def pipelineRun(spark: SparkSession, path: String, n: Long,
      partitions: Int): Double = {
    import spark.implicits._
    def job(): Long = {
      val pages = spark.read.parquet(path).as[graft.model.Page]
      // partitions = 0: the parquet scan's even splits feed extraction
      // directly; the window shuffle is the pipeline's only exchange
      ExtractionPipeline.records(pages, partitions = 0).count()
    }
    // serious warmup: the first jobs in a JVM pay multi-second JIT of the
    // kernels + codegen; measure only warm throughput
    job()
    time { job() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "30000").toLong
    val boost = sys.env.getOrElse("SPARK_GRAFT_BENCH_BOOST", "8").toInt

    val headline = Seq("q01_agg", "q02_join", "q04_window", "q09_dedup_exact",
      "q12_segment", "q14_minhash", "q15_simhash", "q17_cosine_topk",
      "q20_langid", "q24_sessionize", "q25_salted_agg", "q22_pipeline_extract")

    // Part 1: headline queries (skippable for scaling-only iteration)
    val skipHeadline = sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("scaling")
    val s1 = session(cpus)
    val results: Seq[(String, Double)] =
      (if (skipHeadline) Seq.empty[String] else headline).map { name =>
      val fn = SparkEntry.queries(name)
      // warmup-lite: plan + run once counts as the measurement (cold, like
      // a fresh executor); queries are deterministic batch jobs.
      val sec = time { fn(s1, sfDir).count() }
      name -> sec
    }
    s1.stop()

    // Part 2: scaling evidence local[8] vs local[32] (same input, same
    // job). The sandbox host shows heavy run-to-run noise (shared
    // hypervisor), so the levels are interleaved and the per-level MEDIAN
    // of 3 trials is reported.
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val nTrials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    val sPrep = session(cpus)
    val pagesPath = ensurePagesTable(sPrep, nPages, boost)
    sPrep.stop()
    val trials = (1 to nTrials).map { _ =>
      val s8 = session(8)
      val a = pipelineRun(s8, pagesPath, nPages, 8)
      s8.stop()
      val s32 = session(32)
      val b = pipelineRun(s32, pagesPath, nPages, 32)
      s32.stop()
      System.err.println(f"[bench] trial t8=$a%.2f t32=$b%.2f")
      (a, b)
    }
    val t8 = median(trials.map(_._1))
    val t32 = median(trials.map(_._2))
    val eff = (t8 / t32) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f""""""" + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"pages":$nPages,"boost":$boost,"sec_local8":$t8%.3f,"sec_local32":$t32%.3f,""" +
        f""""docs_per_sec_local8":${nPages / t8}%.1f,""" +
        f""""docs_per_sec_local32":${nPages / t32}%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","extraction_scaling":$scaling}""")
  }
}
