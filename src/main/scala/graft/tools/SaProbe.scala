package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the suffix-array query (q155) and the
  * containment query (q95): times each phase with a noop-style count so
  * the next optimization targets the real pot. Bench-identical session.
  */
object SaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        if (sys.env.get("SA_PROBE_NOINFER").contains("1"))
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
        else "")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (sys.env.get("SA_PROBE_PHASES").contains("1")) {
      // phase-timed inline copy of doublingTables + saWithLcp (same
      // code path shapes; prints where the seconds go)
      import graft.ops.{Dedup, ScaleWindow}
      import org.apache.spark.sql.expressions.Window
      def denseRank(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
          out: String) = {
        val dr = df.select(keys.map(col): _*).distinct()
        val ranked = ScaleWindow.shardedRank(dr, Seq.empty,
            keys.map(col), out, "_sa_n", 0).drop("_sa_n")
        df.join(ranked, keys)
      }
      graft.ops.SuffixArray.saWithLcp(docs, "doc_id", "text").count() // warm
      val t0 = System.nanoTime()
      def lap(l: String) = println(f"[phase] $l: ${(System.nanoTime()-t0)/1e9}%.2f s cum")
      val pos = docs.select(col("doc_id").cast("long").as("id"),
          Dedup.tokens(col("text")).as("_tk"))
        .select(col("id"), size(col("_tk")).cast("long").as("dl"),
          posexplode_outer(col("_tk")).as(Seq("pos", "tok")))
        .filter(col("pos").isNotNull)
        .withColumn("pos", col("pos").cast("long"))
      val agg0 = pos.agg(max(col("dl")), count(lit(1))).collect()(0)
      lap("agg0")
      val maxLen = agg0.getLong(0); val n = agg0.getLong(1)
      var r = denseRank(pos, Seq("tok"), "rank")
        .select(col("id"), col("pos"), col("dl"), col("rank"))
        .localCheckpoint()
      lap("initial tok rank")
      var h = 1L
      var dense = true
      while (h < maxLen) {
        val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
        val paired = r.select(col("id"), col("pos"), col("dl"),
          col("rank").as("_ra"),
          coalesce(lead(col("rank"), h.toInt).over(wDoc), lit(-1L)).as("_rb"))
        if (dense) {
          r = paired.select(col("id"), col("pos"), col("dl"),
            (col("_ra") * (n + 2L) + col("_rb") + 1L).as("rank"))
            .localCheckpoint()
          dense = false
        } else {
          r = denseRank(paired, Seq("_ra", "_rb"), "rank")
            .select(col("id"), col("pos"), col("dl"), col("rank"))
            .localCheckpoint()
          dense = true
        }
        h *= 2
        lap(s"round h=$h dense=$dense")
        if (h >= 16 && h < maxLen && dense)
          { r.agg(max(col("rank"))).collect(); lap(s"probe h=$h") }
      }
      val sa = ScaleWindow.shardedRank(r, Seq.empty,
          Seq(col("rank"), col("id"), col("pos")), "sa_rank", "_sa_n", 0)
        .drop("_sa_n").localCheckpoint()
      lap("final sa shardedRank")
      // variant experiment on ONE densify-shaped round (input = final r,
      // packed to non-dense then re-ranked): where do the 2 s go?
      val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
      def mkPaired(rr: org.apache.spark.sql.DataFrame) =
        rr.select(col("id"), col("pos"), col("dl"),
          col("rank").as("_ra"),
          coalesce(lead(col("rank"), 3).over(wDoc), lit(-1L)).as("_rb"))
      (1 to 2).foreach { i =>
        var t = System.nanoTime()
        def lap2(l: String) = {
          println(f"[variant] $l: ${(System.nanoTime()-t)/1e9}%.2f s")
          t = System.nanoTime()
        }
        denseRank(mkPaired(r), Seq("_ra", "_rb"), "rank2")
          .select(col("id"), col("pos"), col("dl"), col("rank2"))
          .localCheckpoint()
        lap2(s"V1 today pass$i")
        val pf = mkPaired(r).localCheckpoint()
        lap2(s"V2a fence paired pass$i")
        denseRank(pf, Seq("_ra", "_rb"), "rank2")
          .select(col("id"), col("pos"), col("dl"), col("rank2"))
          .localCheckpoint()
        lap2(s"V2b denseRank over fence pass$i")
        val dr2 = pf.select(col("_ra"), col("_rb")).distinct()
        lap2(s"V3a distinct only (lazy) pass$i")
        val drf = dr2.localCheckpoint()
        lap2(s"V3b distinct fence pass$i")
        val ranked2 = ScaleWindow.shardedRank(drf, Seq.empty,
          Seq(col("_ra"), col("_rb")), "rank2", "_sa_n", 0).drop("_sa_n")
        val rkf = ranked2.localCheckpoint()
        lap2(s"V3c shardedRank over fenced distinct pass$i")
        pf.join(rkf, Seq("_ra", "_rb"))
          .select(col("id"), col("pos"), col("dl"), col("rank2"))
          .localCheckpoint()
        lap2(s"V3d join-back pass$i")
      }
      spark.stop(); return
    }
    val skipSa = sys.env.get("SA_PROBE_SKIP_SA").contains("1")
    if (!skipSa) {
      // warm
      graft.ops.SuffixArray.saWithLcp(docs, "doc_id", "text").count()
      (1 to 2).foreach { i =>
        time(s"sa: doublingTables pass$i") {
          val ts = graft.ops.SuffixArray.doublingTables(docs, "doc_id", "text")
          println(s"[probe]   rounds=${ts.size} (h=${ts.map(_._1).mkString(",")})")
          ts.last._2.count()
        }
        time(s"sa: saWithLcp full pass$i") {
          graft.ops.SuffixArray.saWithLcp(docs, "doc_id", "text").count()
        }
      }
    }
    // q95 phases
    val base = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val subs = base.filter(pmod(col("id"), lit(10)) === 5)
      .select((col("id") + 1000000L).as("id"),
        array_join(slice(graft.ops.Dedup.tokens(col("text")), 1, 12),
          " ").as("text"))
    val u = base.union(subs)
    graft.ops.Dedup.containmentPairs(u, "id", "text", 3, 16, 900000L).count()
    if (sys.env.get("SA_PROBE_PLAN").contains("1")) {
      val sh = u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
        .select(col("id"),
          filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
            s => length(s) > 0).as("sh"))
      val q = sh.select(col("id"), explode(col("sh")).as("_s"))
        .select(sum(length(col("_s"))))
      println("[probe] ==== q95c0 optimized logical ====")
      println(q.queryExecution.optimizedPlan.treeString.take(8000))
      println("[probe] ==== q95c0 executed ====")
      println(q.queryExecution.executedPlan.treeString.take(8000))
      spark.stop(); return
    }
    (1 to 2).foreach { i =>
      time(s"q95a: tokens only pass$i") {
        u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(sum(size(col("tk")))).collect()(0).getLong(0)
      }
      time(s"q95b: +shingles (no hash) pass$i") {
        u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
          .select(sum(size(col("sh")))).collect()(0).getLong(0)
      }
      time(s"q95c0: +explode only (string lengths) pass$i") {
        val sh = u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
        sh.select(col("id"), explode(col("sh")).as("_s"))
          .select(sum(length(col("_s")))).collect()(0).getLong(0)
      }
      time(s"q95c1: +explode+xxhash64 pass$i") {
        val sh = u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
        sh.select(col("id"), explode(col("sh")).as("_s"))
          .select(col("id"), xxhash64(col("_s")).as("_h"))
          .select(sum(pmod(col("_h"), lit(1000000)))).collect()(0).getLong(0)
      }
      time(s"q95c2: hash inside transform (no explode) pass$i") {
        u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
          .select(col("id"), transform(col("sh"),
            s => graft.ops.Dedup.tokHash(s)).as("hs"))
          .select(explode(col("hs")).as("_h"))
          .select(sum(pmod(col("_h"), lit(1000000)))).collect()(0).getLong(0)
      }
      time(s"q95c: +explode+md5 (no distinct) pass$i") {
        val sh = u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
        sh.select(col("id"), explode(col("sh")).as("_s"))
          .select(col("id"), graft.ops.Dedup.tokHash(col("_s")).as("_h"))
          .select(sum(pmod(col("_h"), lit(1000000)))).collect()(0).getLong(0)
      }
      time(s"q95: thin table only pass$i") {
        val sh = u.select(col("id"), graft.ops.Dedup.tokens(col("text")).as("tk"))
          .select(col("id"),
            filter(graft.ops.Dedup.shinglesOf(col("tk"), 3),
              s => length(s) > 0).as("sh"))
        sh.select(col("id"), explode(col("sh")).as("_s"))
          .select(col("id"), graft.ops.Dedup.tokHash(col("_s")).as("_h"))
          .distinct().count()
      }
      time(s"q95: containmentPairs full pass$i") {
        graft.ops.Dedup.containmentPairs(u, "id", "text", 3, 16, 900000L)
          .count()
      }
    }
    spark.stop()
  }
}
