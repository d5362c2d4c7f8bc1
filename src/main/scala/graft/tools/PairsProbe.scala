package graft.tools

import graft.ops.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: inspect the near-dup candidate graph of DocsGen. */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.gen.DocsGen.docs(spark, n)
    val gate = Curation.gateStage(docs, "doc_id", "text", 10, 300000L)
      .localCheckpoint()
    println("gated: " + gate.count())
    val exact = Curation.exactStage(
      Curation.deboilStage(gate, "doc_id", 3), "doc_id").localCheckpoint()
    println("exact survivors: " + exact.count())
    val pairs = Dedup.minhashLshPairs(exact, "doc_id", "clean_text",
      k = 16, bands = 8, minEstJaccard = 0.5, shingleN = 3, maxBucket = 0)
      .localCheckpoint()
    println("pairs: " + pairs.count())
    println("distinct clean_text among survivors: " +
      exact.select(md5(col("clean_text"))).distinct().count())
    // degree distribution + sample of the highest-degree nodes
    val deg = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id")))
      .groupBy("id").count().orderBy(desc("count"))
    deg.show(5, false)
    // sample a high-degree node's text + a few neighbors
    val top = deg.limit(1).collect()(0).getLong(0)
    val nbrs = pairs.filter(col("a") === top || col("b") === top)
      .limit(4).collect()
    nbrs.foreach(println)
    val ids = top +: nbrs.map(r =>
      if (r.getLong(0) == top) r.getLong(1) else r.getLong(0)).take(3)
    exact.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), substring(col("clean_text"), 1, 100))
      .show(false)
    // exact-dup sanity: docs 10 and 11 share a body; what survived?
    Curation.deboilStage(gate, "doc_id", 3)
      .filter(col("doc_id").isin(10L, 11L, 20L, 21L))
      .select(col("doc_id"), col("clean_text")).show(false)
    spark.stop()
  }
}
