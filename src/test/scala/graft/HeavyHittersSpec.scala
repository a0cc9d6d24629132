package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** The frequent-items definition, stated directly. */
  private def brute(df: DataFrame, k: Int): Set[(String, Long, Long)] = {
    val n = df.where($"value".isNotNull).count()
    df.where($"value".isNotNull).groupBy("value").agg(count(lit(1)).as("cnt"))
      .where($"cnt" * k > n).withColumn("total", lit(n))
      .as[(String, Long, Long)].collect().toSet
  }

  private def got(df: DataFrame, k: Int): Set[(String, Long, Long)] =
    HeavyHitters.frequentValues(df, "value", k)
      .as[(String, Long, Long)].collect().toSet

  /** Skewed fixture with a vocabulary far above k, forcing MG
    * evictions: 20% "hot", 10% "warm", the rest spread over 2000 cold
    * values. */
  private def skewed(rows: Int): DataFrame =
    (0 until rows).map { i =>
      if (i % 5 == 0) "hot" else if (i % 10 == 1) "warm" else s"cold${i % 2000}"
    }.toDF("value")

  test("exact frequent items above n/k, vocabulary >> k") {
    val df = skewed(10000)
    val r = got(df, 8)
    assert(r == brute(df, 8))
    assert(r.exists(_._1 == "hot") && !r.exists(_._1 == "warm"),
      s"hot (20% > 1/8) in, warm (10% < 1/8) out: $r")
  }

  test("output is partitioning-invariant (sketch counters are not, membership is)") {
    val base = skewed(10000)
    val expected = got(base.repartition(1), 8)
    Seq(3, 7, 32).foreach { p =>
      assert(got(base.repartition(p), 8) == expected, s"parts=$p diverged")
    }
  }

  test("adversarial interleaving cannot evict a true heavy hitter") {
    // the heavy item arrives scattered among 600 distinct decoys with
    // k=4 — the MG bound (undercount ≤ n/(k+1)) must still surface it
    val rows = (0 until 1200).map(i => if (i % 2 == 0) "heavy" else s"d$i")
    val df = rows.toDF("value").repartition(5)
    val r = got(df, 4)
    assert(r == brute(df, 4) && r.exists(_._1 == "heavy"))
  }

  test("nulls are excluded; empty and no-hitter inputs yield empty frames") {
    val withNulls = Seq("a", null, "a", "b", null).toDF("value")
    assert(got(withNulls, 2) == Set(("a", 2L, 3L))) // n=3 non-null; 2*2>3
    assert(got(Seq.empty[String].toDF("value"), 4).isEmpty)
    // perfectly uniform 8 values with k=8: nothing exceeds n/8
    val uniform = (0 until 800).map(i => s"u${i % 8}").toDF("value")
    assert(got(uniform, 8).isEmpty)
  }

  test("frequentTokens: token-level heavy hitters over text") {
    val df = Seq(
      "the quick the lazy the end",
      "the cat the dog",
      "something else entirely").toDF("text")
    val r = HeavyHitters.frequentTokens(df, "text", k = 4)
      .as[(String, Long, Long)].collect().toSet
    // 13 tokens, threshold 13/4: only "the" (5) exceeds it
    assert(r == Set(("the", 5L, 13L)))
  }
}
