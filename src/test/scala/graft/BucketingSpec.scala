package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Locks the storage-level co-location property: tables bucketed on the
  * join key plan same-key joins and aggregations with ZERO shuffle
  * exchanges (broadcast disabled so the elision is attributable to
  * bucketing, AQE disabled so the planner's exchanges are visible).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }

  test("bucketed tables co-locate: same-key join + agg without shuffle") {
    import spark.implicits._
    val docs = (0L until 256L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val scores = (0L until 256L).map(i => (i, i % 7))
      .toDF("doc_id", "score")
    graft.io.Bucketing.writeBucketed(docs, "b_docs", "doc_id", 8)
    graft.io.Bucketing.writeBucketed(scores, "b_scores", "doc_id", 8)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("b_docs").join(spark.table("b_scores"),
        "doc_id")
      assert(shuffles(j).isEmpty, "bucketed equi-join must not shuffle")
      assert(j.count() === 256L)
      val g = spark.table("b_docs").groupBy("doc_id").count()
      assert(shuffles(g).isEmpty, "bucketed groupBy must not shuffle")
      assert(g.count() === 256L)
      // control: the same join over unbucketed frames DOES exchange
      val plain = docs.join(scores, "doc_id")
      assert(shuffles(plain).nonEmpty,
        "control: unbucketed join should shuffle")
    } finally {
      // restore the PRIOR values (not hardcoded ones) and drop the
      // managed tables so the shared warehouse stays clean for other
      // suites
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }
}
