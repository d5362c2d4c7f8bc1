package graft

import graft.gen.PagesGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

/** Single-measurement helper: run the extraction pipeline once at a given
  * parallelism in a FRESH JVM (invoked per-level so the two scaling
  * measurements don't share JIT/GC state). Prints one JSON line.
  */
object BenchPipeline {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val boost = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pipe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
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
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.SessionTuning(spark)
    // warmup (JIT + codegen), then measured run
    ExtractionPipeline.records(PagesGen.pages(spark, 500, 7, cpus, boost),
      partitions = cpus).count()
    val t0 = System.nanoTime()
    val cnt = ExtractionPipeline.records(PagesGen.pages(spark, n, 42, cpus, boost),
      partitions = cpus).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"cpus":$cpus,"pages":$n,"records":$cnt,"sec":$sec%.3f,"docs_per_sec":${n / sec}%.1f}""")
    spark.stop()
  }
}
