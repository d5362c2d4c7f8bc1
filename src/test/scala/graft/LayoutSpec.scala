package graft

import graft.ops.{Layout, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton-code math, and the data-skipping property the
  * layout exists for — per-file min/max stats (what an Iceberg manifest
  * stores) prune far more files under the z-layout than under a linear
  * sort when the predicate touches the non-sorted dimension.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("zValue: interleave is exact and column 0 owns the high bit") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val z = df.select(col("a"), col("b"),
      Layout.zValue(Seq(col("a"), col("b")), 3).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // bit of a at position 2k+1, bit of b at 2k
    assert(z((0L, 0L)) === 0L)
    assert(z((1L, 0L)) === 2L) // a bit0 -> out bit1
    assert(z((0L, 1L)) === 1L) // b bit0 -> out bit0
    assert(z((1L, 1L)) === 3L)
    // a=3 (011), b=5 (101): out = a0<<1|b0<<0|a1<<3|b1<<2|a2<<5|b2<<4
    //  = 2 + 1 + 8 + 0 + 0 + 16 = 27
    assert(z((3L, 5L)) === 27L)
  }

  test("rangeCode: exact integral mapping, boundary clamp") {
    import spark.implicits._
    val df = Seq(0L, 50L, 100L, -7L, 200L).toDF("v")
    val got = df.select(col("v"),
        Layout.rangeCode(col("v"), 0L, 100L, 8).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 0L)
    assert(got(50L) === (50L * 255L) / 100L) // exact integral, 127
    assert(got(100L) === 255L)
    assert(got(-7L) === 0L)   // clamped low
    assert(got(200L) === 255L) // clamped high
  }

  test("z-layout skips files a linear sort cannot: second-dim predicate") {
    import spark.implicits._
    // two independent uniform dims — deterministic hash spread
    val n = 4096
    val rows = (0 until n).map { i =>
      val a = (i * 2654435761L) % 1000
      val b = (i * 40503L + 17L) % 1000
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"
    val nFiles = 16
    Layout.writeZOrdered(df, Seq("a", "b"), nFiles, zPath, bits = 10)
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linPath)

    val zStats = Layout.fileStats(spark, zPath, Seq("a", "b"))
    val linStats = Layout.fileStats(spark, linPath, Seq("a", "b"))
    assert(zStats.count() === nFiles.toLong)
    assert(linStats.count() === nFiles.toLong)

    // predicate on b ONLY (the dim the linear layout did not sort by):
    // linear files all span ~the full b range -> no pruning; z files
    // cover small b boxes -> most files pruned
    val bOnly = Seq("b" -> (0L, 99L))
    val zTouch = Layout.filesTouched(zStats, bOnly)
    val linTouch = Layout.filesTouched(linStats, bOnly)
    assert(linTouch === nFiles.toLong,
      s"linear layout should be unprunable on b (got $linTouch)")
    assert(zTouch * 2 <= nFiles,
      s"z layout should prune >= half the files on a b-range " +
        s"(touched $zTouch of $nFiles)")

    // the stats-based count never under-reads: every row matching the
    // predicate lives in a touched file (no false pruning) — verify by
    // reading through the pruned file set
    val touchedFiles = zStats
      .filter(col("b_max") >= 0L && col("b_min") <= 99L)
      .select("file").collect().map(_.getString(0))
    val viaPruned = spark.read.parquet(touchedFiles: _*)
      .filter(col("b") <= 99L).count()
    val exact = df.filter(col("b") <= 99L).count()
    assert(viaPruned === exact)

    // rectangle predicate on BOTH dims: z prunes at least as well as
    // linear (locality in every clustered dim, not just the first)
    val rect = Seq("a" -> (0L, 249L), "b" -> (0L, 249L))
    val zRect = Layout.filesTouched(zStats, rect)
    val linRect = Layout.filesTouched(linStats, rect)
    assert(zRect <= linRect,
      s"z rectangle pruning ($zRect) worse than linear ($linRect)")
  }

  test("heavyHitters: bounded two-pass equals exact groupBy; " +
    "no false negatives under adversarial bucket sharing") {
    import spark.implicits._
    // 2 heavy keys (>= 50), many light keys; width 8 forces bucket
    // sharing so pass-1 false positives exist and must be confirmed away
    val data = Seq.fill(60)("viral-footer") ++ Seq.fill(55)("promo-line") ++
      (0 until 400).map(i => s"light-$i")
    val df = data.toDF("k")
    val got = Skew.heavyHitters(df, col("k"), minCount = 50L, width = 8,
        out = "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").count().filter(col("count") >= 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
    assert(got === Map("viral-footer" -> 60L, "promo-line" -> 55L))
    // nulls are not keys
    val withNulls = (data.map(Option(_)) ++ Seq.fill(100)(None))
      .toDF("k")
    val got2 = Skew.heavyHitters(withNulls, col("k"), minCount = 50L,
      width = 8, out = "k").collect()
    assert(got2.map(_.getString(0)).toSet === Set("viral-footer",
      "promo-line"))
  }

  test("columnBounds: empty frames and all-null columns yield (0,0) " +
      "instead of NPE — the empty-incremental-batch zorder path") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Layout.columnBounds(empty, Seq("a", "b"))
      === Seq((0L, 0L), (0L, 0L)))
    val allNull = Seq((Option.empty[Long], 5L), (None, 9L))
      .toDF("a", "b")
    assert(Layout.columnBounds(allNull, Seq("a", "b"))
      === Seq((0L, 0L), (5L, 9L)))
    // degenerate bounds still produce a usable (constant-zero) z-key
    val z = Layout.withZValue(allNull, Seq("a", "b"),
      Seq((0L, 0L), (5L, 9L)), bits = 4).collect()
    assert(z.length === 2)
  }

  test("cdx index layout: disjoint file key ranges, prefix lookup prunes") {
    import spark.implicits._
    val hosts = Seq("alpha.com", "beta.org", "gamma.net", "delta.io")
    val pages = (0 until 400).map { i =>
      (s"http://${hosts(i % 4)}/p/${i / 4}", i.toLong)
    }.toDF("url", "warc_ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx").toString
    Layout.writeCdxIndex(pages, "url", "warc_ts", nFiles = 8, dir)
    val stats = Layout.fileKeyStats(spark, dir, "surt_key").collect()
    val nFiles = stats.length
    assert(nFiles >= 4, s"range split produced only $nFiles files")
    // files cover DISJOINT key ranges: sorted by min, each file's min
    // is >= the previous file's max (ties only at exact boundaries)
    val sorted = stats.map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(bMin >= aMax, s"overlapping file ranges: $aMax vs $bMin")
      case _ =>
    }
    // one host = one contiguous range: the prefix lookup touches a
    // strict subset of files, and the pruned read still sees ALL of
    // the host's rows
    val statsDf = Layout.fileKeyStats(spark, dir, "surt_key")
    val touched = Layout.filesForPrefix(statsDf, "com,alpha)")
    assert(touched >= 1 && touched < nFiles,
      s"prefix lookup touched $touched of $nFiles")
    val viaPrefix = spark.read.parquet(dir)
      .filter(col("surt_key").startsWith("com,alpha)")).count()
    assert(viaPrefix === 100L)
  }

  test("balancedShards: byte-balanced bins, skew-safe, deterministic") {
    import spark.implicits._
    // skewed sizes: one 50 KB whale among 10-100 B pages
    val rows = (0L until 300L).map(i =>
      (i, if (i == 7L) 50000L else 10L + i % 91L))
    val df = rows.toDF("doc_id", "w")
    val out = Layout.balancedShards(df, "doc_id", col("w"), nShards = 4)
      .select("doc_id", "cum_bytes", "total_bytes", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 300)
    val total = rows.map(_._2).sum
    assert(out.forall(_._3 === total), "total_bytes = corpus total everywhere")
    val target = (total + 3) / 4
    val wById = rows.toMap
    val byShard = out.groupBy(_._4)
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    // every shard's weight <= target + its largest single doc (a bin
    // overflows by at most the doc that crosses its boundary)
    byShard.foreach { case (sh, members) =>
      val ws = members.map(m => wById(m._1))
      assert(ws.sum <= target + ws.max,
        s"shard $sh weight ${ws.sum} > $target + ${ws.max}")
    }
    // cum is an exact inclusive running sum: its max is the total
    assert(out.map(_._2).max === total)
    // deterministic under arbitrary pre-partitioning
    val out2 = Layout.balancedShards(df.repartition(7), "doc_id",
        col("w"), nShards = 4)
      .select("doc_id", "cum_bytes", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out2 === out.map(t => (t._1, t._2, t._4)).sortBy(_._1))
    // nShards = 1: everything lands in shard 0
    val one = Layout.balancedShards(df, "doc_id", col("w"), nShards = 1)
      .select("shard").distinct().collect().map(_.getLong(0))
    assert(one.toSeq === Seq(0L))
  }
}
