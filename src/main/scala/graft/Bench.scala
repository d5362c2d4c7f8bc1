package graft

import graft.ops.SimSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Three parts:
  *  1. headline operator queries at SPARK_GRAFT_SF_DIR (local[cpus]),
  *     each measured WARM immediately after its own untimed warm run
  *     (see the loop comment for why warm-per-query, not warm-the-set);
  *  2. the north-rule scaling evidence: N vs 4N executor fleets, each
  *     executor a separate cpuset-pinned JVM over a disjoint slice of
  *     the same materialized pages table, measured as paired
  *     alternating passes (BenchCluster) — throughput at both widths +
  *     efficiency (tN/t4N)/4 (sandbox adaptation of the N- vs
  *     4N-executor criterion; see also BenchStandalone for the
  *     real-cluster variant);
  *  3. ANN quality: recall@5 of the multi-probe LSH path vs the exact
  *     brute-force baseline on the sf embeddings;
  *  4. curation-job scaling: the composed curation pipeline at two
  *     parallelism levels in fresh pinned JVMs (BenchCurateScale —
  *     corpus-global stages rule out the disjoint-slice protocol);
  *     skip with SPARK_GRAFT_CURATE_PAIRS=0.
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
      // AQE coalesces shuffle reads down to minPartitionSize (1 MB
      // default) BEFORE parallelism once partitions are small — but
      // this engine's shuffles are deliberately THIN (ids + 32-bit
      // hashes standing in for text), so "1 MB" of candidate pairs is
      // ~50k rows of CPU-heavy exact-verify work squeezed onto 1-4
      // cores (measured: q95's 1M-pair block join ran 4-way). 64 KB
      // keeps thin stages at full parallelism; corpus-sized shuffles
      // never see this floor.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // OFF: alias-substitution in constraint propagation goes
      // exponential on deep multi-referenced text-feature projections
      // (e.g. the curation gate) and we never benefit from inferred
      // filters; see Curation.curate scaladoc
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val headline = Seq("q01_agg", "q02_join", "q04_window", "q09_dedup_exact",
      "q12_segment", "q14_minhash", "q15_simhash", "q17_cosine_topk",
      "q20_langid", "q24_sessionize", "q25_salted_agg", "q28_minhash_lsh",
      "q31_route_records", "q32_dedup_cluster", "q22_pipeline_extract",
      "q38_pii", "q40_para_dedup", "q42_ann_ivf", "q43_curate",
      "q45_decontam", "q47_token_budget", "q48_url_canon",
      "q49_temp_resample", "q50_profile", "q51_ivf_refine", "q52_chunk",
      "q53_token_df", "q54_vocab", "q55_span_dedup", "q56_line_dedup",
      "q57_token_clf", "q58_blocklist", "q59_bloom_decontam",
      "q60_snapshot", "q61_host_blocklist", "q62_dedup_star", "q63_scrub_contam",
      "q64_top_quantile", "q65_split_leakage", "q66_incr_dedup",
      "q67_profile_approx", "q68_bigram_fluency", "q69_semantic_dedup",
      "q70_bpe_pairs", "q71_host_cap", "q72_rank_auc", "q73_web_degrees",
      "q74_pagerank", "q75_link_extract", "q76_link_graph", "q77_warc",
      "q78_anchor_stats", "q79_host_boilerplate", "q80_robots",
      "q81_page_meta", "q82_host_components", "q83_crawl_frontier",
      "q84_sitemap", "q85_soft_errors", "q86_charset",
      "q87_canonical_collapse", "q88_ccnet_buckets", "q89_reg_domain",
      "q90_redirects", "q91_c4_clean", "q92_snapshot_diff",
      "q93_extract_score", "q94_hits", "q95_containment",
      "q96_span_dedup_confirmed", "q97_bm25", "q98_edit_verified",
      "q99_trustrank", "q100_dsir", "q101_winnow", "q102_margin_mining",
      "q103_ann_ivfpq", "q104_jsonld", "q105_hreflang",
      "q106_translation_clusters", "q107_feeds", "q108_zorder",
      "q109_heavy_hitters", "q110_recrawl", "q111_keep_best",
      "q112_nfc", "q113_strat_sample", "q114_url_features",
      "q115_crawl_delay", "q116_feed_discovery", "q117_surt",
      "q118_balanced_shards", "q119_sitemap_directive", "q120_idn",
      "q121_term_gate", "q122_kmv_overlap", "q123_collocations",
      "q124_f1_threshold", "q125_weighted_sample",
      "q126_robots_wildcards", "q127_cc_redact", "q128_jl_project",
      "q129_entropy", "q130_cluster_eval", "q131_hll",
      "q132_mix_waterfill", "q133_bloom_index", "q134_rrf_fusion",
      "q135_homoglyph", "q136_zone_maps", "q137_rendezvous",
      "q138_phrase", "q139_cms", "q140_textrank", "q141_cocitation",
      "q142_kwic", "q143_triangles", "q144_kcore", "q145_hyperanf",
      "q146_hll_by_source", "q147_pagerank_weighted",
      "q148_code_switch", "q149_ndcg", "q150_bm25f",
      "q151_prf_expand", "q152_mrr", "q153_simhash_pairs",
      "q154_query_likelihood", "q155_suffix_array", "q156_sa_dup_spans",
      "q157_anchor_bm25", "q158_lexrank", "q159_readability", "q160_kendall_tau", "q161_eff_diameter", "q162_proximity", "q163_moore_lewis", "q164_rake", "q165_cdc_chunks",
      "q166_chunk_dedup", "q167_simhash_cluster", "q168_chunk_neardup", "q169_spearman", "q170_calibration", "q171_kappa",
      "q172_host_gini", "q173_semantic_leakage", "q174_burstiness",
      "q175_dispersion", "q176_stopword_induction", "q177_yule_k", "q178_term_drift",
      // q179_sa_scrub is NOT in the headline: it re-runs the full
      // suffix-array construction (on plant-augmented text, so the
      // shared-SA memo cannot serve it) — the build cost is already
      // timed once by q155, and q179 exists for oracle coverage of
      // the scrub composition (Verify still runs it every round)
      "q180_bpe_encode", "q181_margin_ann")

    // Part 1: headline queries (skippable for scaling-only iteration)
    val skipHeadline = sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("scaling")
    val s1 = session(cpus)
    val names = if (skipHeadline) Seq.empty[String] else headline
    // Warm IMMEDIATELY before timing, per query — not one warm pass for
    // the whole set: 14 queries generate more codegen units than the
    // JVM-wide codegen cache holds (default 100 entries), so a global
    // warm pass lets later queries evict earlier ones' compiled classes
    // and the timed pass re-pays multi-second Janino compiles for the
    // wide-projection queries (q22 measured 10.7 s set-warmed vs 2 s
    // self-warmed).
    // Each query reports its FIRST timed pass (comparable with earlier
    // rounds) and the min of 3 timed passes: on this drifting
    // shared-hypervisor host the single-pass number mixes host noise
    // into cross-round comparisons — min-of-3 is the repeatable signal
    // (the protocol BASELINE.md already used for q22/q31 spot checks).
    val results: Seq[(String, Double, Double)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      fn(s1, sfDir).count() // warm: codegen, JIT, parquet footers
      val probes = (1 to 3).map(_ => time { fn(s1, sfDir).count() })
      (name, probes.head, probes.min)
    }

    // Part 3 (same session): multi-probe ANN recall vs brute force
    val annRecall: Double =
      if (skipHeadline) -1.0
      else {
        val emb = s1.read.parquet(s"$sfDir/embeddings.parquet")
        val qs = emb.filter(col("vec_id") < 10)
        val brute = SimSearch
          .bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lsh = SimSearch.lshTopK(emb, qs, "vec_id", "embedding", 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        if (brute.isEmpty) 1.0
        else (brute & lsh).size.toDouble / brute.size
      }
    s1.stop()

    def queriesJson(pick: ((String, Double, Double)) => Double): String =
      results.map { r => "\"" + r._1 + "\":" + f"${pick(r)}%.3f" }
        .mkString("{", ",", "}")
    if (sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("headline")) {
      println(s"""{"metric":"total","value":${f"${results.map(_._2).sum}%.3f"},"unit":"sec","queries":${queriesJson(_._2)},"queries_min3":${queriesJson(_._3)},"total_min3":${f"${results.map(_._3).sum}%.3f"},"sf":"$sfDir","ann_recall":${f"$annRecall%.3f"}}""")
      return
    }

    // Part 2: N vs 4N executor fleets (separate pinned JVMs, disjoint
    // slices, paired alternating passes) — BenchCluster.
    // N=1 executor x 4 cores vs 4N=4 executors x 4 cores, each executor
    // taskset-pinned to a disjoint cpuset (what YARN/k8s does). 2x4 vs
    // 8x4 was rejected: at 32 active threads the single sandbox box
    // saturates its one memory controller (the 4N fleet burned 25-33%
    // more CPU for the same work), an artifact a real 4N-node cluster
    // does not have; at 4-vs-16 cores the box scales cleanly (measured
    // eff 0.98 with cpu_util 0.94/0.92).
    // 400k boost-8 pages (~6.5 GB of HTML): a pair of passes completes
    // in ~1 minute, so 8 pairs sample 8 distinct host windows — on this
    // drifting shared-hypervisor box, sampling MORE windows beats
    // making each window longer.
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400000").toLong
    val boost = sys.env.getOrElse("SPARK_GRAFT_BENCH_BOOST", "8").toInt
    val threads = sys.env.getOrElse("SPARK_GRAFT_EXEC_THREADS", "4").toInt
    val execN = sys.env.getOrElse("SPARK_GRAFT_EXEC_N", "1").toInt
    val heap = sys.env.getOrElse("SPARK_GRAFT_EXEC_HEAP", "2g")
    val young = sys.env.getOrElse("SPARK_GRAFT_EXEC_YOUNG", "1500m")
    val pairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "8").toInt
    new java.io.File(BenchCluster.ShmLocalDir).mkdirs()
    val path = BenchCluster.ensureBucketedTable(nPages, boost)
    val ts = BenchCluster.pairedTrials(path, execN, threads, heap, young,
      pairs)

    // Part 4: curation-job scaling (same job, two parallelism levels,
    // fresh pinned JVMs, time-adjacent pairs) — BenchCurateScale. The
    // corpus-global stages make the disjoint-slice fleet protocol
    // inapplicable; see BenchCurateScale scaladoc.
    val curateDocs = sys.env.getOrElse("SPARK_GRAFT_CURATE_DOCS", "60000").toLong
    val curatePairs = sys.env.getOrElse("SPARK_GRAFT_CURATE_PAIRS", "2").toInt
    val curateScaling =
      if (curatePairs <= 0) """{"skipped":true}"""
      else {
        val (cps, kept) = BenchCurateScale.pairedRuns(curateDocs, curatePairs)
        BenchCurateScale.scalingJson(curateDocs, cps, kept)
      }

    val total = results.map(_._2).sum
    val scaling = BenchCluster.scalingJson(nPages, boost, execN, threads, ts)
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":${queriesJson(_._2)},"queries_min3":${queriesJson(_._3)},"total_min3":${f"${results.map(_._3).sum}%.3f"},"sf":"$sfDir","ann_recall":${f"$annRecall%.3f"},"extraction_scaling":$scaling,"curation_scaling":$curateScaling}""")
  }
}
