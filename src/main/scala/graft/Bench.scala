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

  /** Pipeline wall time for n synthetic pages at given parallelism. */
  private def pipelineRun(spark: SparkSession, n: Long, partitions: Int): Double = {
    // small warmup to JIT/codegen before the measured run
    ExtractionPipeline.records(PagesGen.pages(spark, 200, 7, partitions),
      partitions = partitions).count()
    time {
      ExtractionPipeline.records(PagesGen.pages(spark, n, 42, partitions),
        partitions = partitions).count()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong

    val headline = Seq("q01_agg", "q02_join", "q04_window", "q09_dedup_exact",
      "q12_segment", "q14_minhash", "q15_simhash", "q17_cosine_topk",
      "q20_langid", "q24_sessionize", "q25_salted_agg", "q22_pipeline_extract")

    // Part 1: headline queries
    val s1 = session(cpus)
    val results: Seq[(String, Double)] = headline.map { name =>
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
    val trials = (1 to 3).map { _ =>
      val s8 = session(8)
      val a = pipelineRun(s8, nPages, 8)
      s8.stop()
      val s32 = session(32)
      val b = pipelineRun(s32, nPages, 32)
      s32.stop()
      (a, b)
    }
    val t8 = median(trials.map(_._1))
    val t32 = median(trials.map(_._2))
    val eff = (t8 / t32) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f""""""" + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"pages":$nPages,"sec_local8":$t8%.3f,"sec_local32":$t32%.3f,""" +
        f""""docs_per_sec_local8":${nPages / t8}%.1f,""" +
        f""""docs_per_sec_local32":${nPages / t32}%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","extraction_scaling":$scaling}""")
  }
}
