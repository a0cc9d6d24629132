package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables equi-join with NO shuffle exchange") {
    val facts = (1 to 5000).map(i => (i.toLong % 500, i * 1.0)).toDF("k", "v")
    val dims = (0 to 499).map(i => (i.toLong, s"name_$i")).toDF("k", "label")
    Bucketing.writeBucketed(facts, "bkt_facts", "k", numBuckets = 8)
    Bucketing.writeBucketed(dims, "bkt_dims", "k", numBuckets = 8)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // disable AQE (stable plan inspection) and broadcast (force the
      // join to actually rely on bucketing)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dims"), Seq("k"))
        .groupBy($"label").agg(sum($"v".cast("decimal(18,2)")).cast("double").as("s"))

      val shufflesBeforeAgg = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // exactly ONE exchange (the final groupBy on label); the join
      // itself is co-located by the shared bucketing — zero join-side
      // shuffles
      assert(shufflesBeforeAgg.size == 1,
        joined.queryExecution.executedPlan.toString)

      // and the result is right
      assert(joined.count() == 500)
      val one = joined.where($"label" === "name_1").select("s").as[Double].head()
      val expected = (1 to 5000).filter(_ % 500 == 1).map(_ * 1.0).sum
      assert(one == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}
