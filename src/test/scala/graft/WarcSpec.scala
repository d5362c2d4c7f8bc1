package graft

import graft.io.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    s"$d/warc"
  }

  test("round trip: multi-file archive preserves every (url, payload)") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      (s"http://h$i.com/p", s"payload $i\nwith a second line <b>$i</b>"))
    val dir = tmpDir("warc_rt")
    Warc.writeWarc(rows.toDF("url", "payload").repartition(5),
      "url", "payload", dir)
    val back = Warc.readWarc(spark, dir)
      .select("url", "payload").as[(String, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("tricky payloads: empty, LF-only WARC/1.0 lookalike, long") {
    import spark.implicits._
    val rows = Seq(
      ("http://a.com/", ""),
      // "\nWARC/1.0\r\n" inside a payload is NOT the record boundary
      // (no preceding CRLF+LF) and must survive
      ("http://b.com/", "x\nWARC/1.0\r\nWARC-Target-URI: fake\n"),
      ("http://c.com/", "y" * 10000))
    val dir = tmpDir("warc_trick")
    Warc.writeWarc(rows.toDF("url", "payload").coalesce(1),
      "url", "payload", dir)
    val back = Warc.readWarc(spark, dir)
      .select("url", "payload").as[(String, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("splittability: one big file parses identically under tiny " +
    "maxPartitionBytes (records cross input-split boundaries)") {
    import spark.implicits._
    val rows = (0 until 400).map(i =>
      (s"http://h${i % 7}.com/d$i", s"body $i " + ("w" * (i % 50))))
    val dir = tmpDir("warc_split")
    Warc.writeWarc(rows.toDF("url", "payload").coalesce(1),
      "url", "payload", dir)
    val prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = Warc.readWarc(spark, dir)
      assert(df.rdd.getNumPartitions > 1,
        "tiny maxPartitionBytes must force multiple input splits")
      val back = df.select("url", "payload")
        .as[(String, String)].collect().toSet
      assert(back === rows.toSet)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("content_length is the parsed header value and bounds the cut") {
    import spark.implicits._
    val dir = tmpDir("warc_len")
    Warc.writeWarc(Seq(("http://a.com/", "abcde"))
      .toDF("url", "payload"), "url", "payload", dir)
    val r = Warc.readWarc(spark, dir).head()
    assert(r.getAs[Long]("content_length") === 5L)
    assert(r.getAs[String]("payload") === "abcde")
  }
}
