package graft

import org.apache.spark.sql.functions.col

import graft.functions.{DBSCAN, DateSniffer}
import graft.profiler.{Profiler, SemClusters}

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("type rules: str key demotes int key back to int (spreadsheet.py:89-99)") {
    // 20 rows: id (int, all distinct), name (str, all distinct),
    // seg (str, 1 distinct ≤ 5%), v (real)
    val df = (1 to 20).map(i => (i.toLong, s"name_$i", "only", i * 1.5))
      .toDF("id", "name", "seg", "v")
    val (_, p) = Profiler.profile(df)
    assert(p.keyColumn.contains("name"))
    assert(p.column("name").get.logicalType == LogicalType.Str)
    assert(p.column("name").get.isKey)
    // id was key (→nominal), then demoted by the str key → back to int
    assert(p.column("id").get.logicalType == LogicalType.Int)
    assert(!p.column("id").get.isKey)
    assert(p.column("seg").get.logicalType == LogicalType.Nominal)
    assert(p.column("v").get.logicalType == LogicalType.Real)
  }

  test("int key without str competitor becomes nominal key") {
    val df = (1 to 20).map(i => (i.toLong, "dup", i * 1.5)).toDF("id", "s", "v")
    val (_, p) = Profiler.profile(df)
    assert(p.keyColumn.contains("id"))
    assert(p.column("id").get.logicalType == LogicalType.Nominal)
    assert(p.column("id").get.isKey)
  }

  test("no key → synthetic defaultindex appended") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("s", "v")
    val (out, p) = Profiler.profile(df)
    assert(p.keyColumn.contains("defaultindex"))
    assert(out.columns.contains("defaultindex"))
    val idx = out.select("defaultindex").as[Long].collect().sorted
    assert(idx.toSeq == Seq(0L, 1L, 2L))
  }

  test("date sniffing routes string date columns to Date") {
    val df = Seq(("12/24/2019", 1.0), ("1/3/2020", 2.0), ("07/14/2021", 3.0))
      .toDF("d", "v")
    val (_, p) = Profiler.profile(df)
    assert(p.column("d").get.logicalType == LogicalType.Date)
  }

  test("DateSniffer matches reference formats") {
    assert(DateSniffer.sniff("12.24.2019").get.toString == "2019-12-24")
    assert(DateSniffer.sniff("2019-12-24").get.toString == "2019-12-24")
    assert(DateSniffer.sniff("8-January-2019").get.toString == "2019-01-08")
    assert(DateSniffer.sniff("Dec 31 19").get.toString == "2019-12-31")
    assert(DateSniffer.sniff("1998").get.toString == "1998-01-01")
    assert(DateSniffer.sniff("1/24/20").get.toString == "2020-01-24")
    assert(DateSniffer.sniff("31 Dec 99").get.toString == "1999-12-31")
    assert(DateSniffer.sniff("hello").isEmpty)
    assert(DateSniffer.sniff("123456").isEmpty)
  }

  test("DBSCAN: two blobs + noise, sklearn-compatible labels") {
    val pts = Array(
      Array(0.0, 0.0), Array(0.1, 0.0), Array(0.0, 0.1), Array(0.1, 0.1), Array(0.05, 0.05),
      Array(5.0, 5.0), Array(5.1, 5.0), Array(5.0, 5.1), Array(5.1, 5.1), Array(5.05, 5.05),
      Array(100.0, 100.0))
    val labels = DBSCAN.fitPoints(pts, eps = 0.5, minPts = 5)
    assert(labels.take(5).forall(_ == 0))
    assert(labels.slice(5, 10).forall(_ == 1))
    assert(labels(10) == -1)
  }

  test("approx-distinct profiling reaches the same types and key as exact") {
    val df = (1 to 2000).map(i => (i.toLong, s"name_$i", s"seg${i % 5}", i * 1.5))
      .toDF("id", "name", "seg", "v")
    val exact = Profiler.profile(df)._2
    val approx = Profiler.profile(df, EngineConfig(approxDistinct = true))._2
    assert(approx.keyColumn == exact.keyColumn)
    exact.columns.zip(approx.columns).foreach { case (e, a) =>
      assert(a.logicalType == e.logicalType, e.name)
      assert(a.isKey == e.isKey, e.name)
    }
  }

  test("approx-distinct boundary re-check holds on a real table (customer sf0.1, 15k rows)") {
    // the scale path: HLL counts in the main pass, exact re-count only
    // for columns near a decision boundary (key detection / nominal
    // threshold). On real data every type/key decision must match the
    // exact pass — this is the evidence for flipping approxDistinct on
    // at cluster scale (see ARCHITECTURE.md).
    val df = graft.sources.Tables.customer(spark, "/root/testdata/sf0.1")
    val exact = Profiler.profile(df)._2
    val approx = Profiler.profile(df, EngineConfig(approxDistinct = true))._2
    assert(approx.rows == exact.rows)
    assert(approx.keyColumn == exact.keyColumn)
    exact.columns.zip(approx.columns).foreach { case (e, a) =>
      assert(a.logicalType == e.logicalType, e.name)
      assert(a.isKey == e.isKey, e.name)
    }
  }

  test("approx-distinct auto-routes on plan size; fixtures stay exact (round 11)") {
    // A caller who never heard of approxDistinct must not hit the
    // expand-based exact countDistinct on a 100 TB ingest: when
    // Catalyst's size estimate exceeds approxDistinctAboveBytes the
    // profiler takes the HLL + boundary-re-count path on its own.
    val df = (1 to 2000).map(i => (i.toLong, s"name_$i", s"seg${i % 5}", i * 1.5))
      .toDF("id", "name", "seg", "v")
    val exact = Profiler.profile(df)._2
    // threshold 0 forces the auto-route even on this tiny frame; every
    // decision must still match the exact pass (boundary re-count)
    val routed = Profiler.profile(df,
      EngineConfig(approxDistinctAboveBytes = 0L))._2
    assert(routed.keyColumn == exact.keyColumn)
    exact.columns.zip(routed.columns).foreach { case (e, a) =>
      assert(a.logicalType == e.logicalType, e.name)
      assert(a.isKey == e.isKey, e.name)
    }
    // and the default 1 GiB threshold keeps this fixture on the exact
    // path: non-boundary distinct counts are exact, not HLL estimates
    // (seg has 5 distinct — far from both decision boundaries, so an
    // HLL pass would have had no exact re-count to correct it)
    assert(exact.column("seg").get.distinctCount == 5L)
    // routing decision, probed directly: known-small stays exact,
    // threshold-0 routes, and a STAT-LESS source (LogicalRDD reports
    // the spark.sql.defaultSizeInBytes placeholder) must NOT route —
    // at-or-past the sentinel means unknown, not huge
    assert(!Profiler.shouldApproxDistinct(df, EngineConfig()))
    assert(Profiler.shouldApproxDistinct(df,
      EngineConfig(approxDistinctAboveBytes = 0L)))
    val rddDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 100).map(i => org.apache.spark.sql.Row(i.toLong))),
      new org.apache.spark.sql.types.StructType()
        .add("v", org.apache.spark.sql.types.LongType))
    assert(!Profiler.shouldApproxDistinct(rddDf,
      EngineConfig(approxDistinctAboveBytes = 0L)),
      "a stat-less source must keep the exact path even at threshold 0")
    // the porous-guard case: Catalyst SCALES the placeholder through
    // projections (output-row-size / input-row-size ratio), so the
    // top-of-plan estimate of a NARROWING projection over a stat-less
    // frame drops BELOW the sentinel and a top-level check would read
    // it as known-huge. Unknown-ness must be decided at the leaves
    val rddWide = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 100).map(i => org.apache.spark.sql.Row(i.toLong, "x" * 50))),
      new org.apache.spark.sql.types.StructType()
        .add("v", org.apache.spark.sql.types.LongType)
        .add("s", org.apache.spark.sql.types.StringType))
    val projected = rddWide.select(col("v"))
    assert(projected.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(Long.MaxValue),
      "precondition: the narrowing projection scales the placeholder below the sentinel")
    assert(!Profiler.shouldApproxDistinct(projected,
      EngineConfig(approxDistinctAboveBytes = 0L)),
      "a PROJECTED stat-less frame must keep the exact path (leaf-level detection)")
  }

  test("quantile signatures drive Wasserstein distances") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble, i.toDouble + 100.0, s"n$i"))
      .toDF("id", "a", "b", "nm")
    val (_, p) = Profiler.profile(df)
    val d = p.distanceMatrix(("a", "b"))
    assert(math.abs(d - 100.0) < 2.0) // shifted distribution: W1 = shift
    assert(p.distanceMatrix(("a", "a")) == 0.0)
  }

  test("semantic name clusters: synthetic embedding file groups synonyms") {
    import java.nio.file.Files
    // 5 money-ish tokens packed within eps=0.5 of each other, two far
    // outliers — matches the reference's DBSCAN(eps=0.5, minPts=5)
    // over first-token vectors (spreadsheet.py:238-246)
    val emb = Files.createTempFile("w2v", ".txt")
    val money = Seq("price", "cost", "value", "total", "amount").zipWithIndex
      .map { case (w, i) => s"$w ${1.0 + i * 0.01} 0.0 0.0" }
    val far = Seq("weight -5.0 3.0 0.0", "height 4.0 -6.0 1.0", "TOKEN 9.0 9.0 9.0")
    Files.writeString(emb, (money ++ far).mkString("\n"))
    val names = Seq("price_usd", "cost (usd)", "Value2", "total-sum", "amount",
      "weight", "height")
    val got = SemClusters.cluster(names, Some(emb.toString))
    assert(got == Seq(Seq("price_usd", "cost (usd)", "Value2", "total-sum", "amount")))
    Files.delete(emb)
  }

  test("semantic name clusters: hashed fallback groups same leading token") {
    // no embedding file: identical first tokens are distance 0, distinct
    // tokens near-orthogonal 16-d hashes (far beyond eps) → degraded
    // mode clusters exactly "same leading token"
    val names = Seq("sales_1", "sales_2", "sales_3", "sales_4", "sales_5",
      "profit", "margin")
    val got = SemClusters.cluster(names, None)
    assert(got == Seq(Seq("sales_1", "sales_2", "sales_3", "sales_4", "sales_5")))
  }

  test("semanticNameClusters flag feeds nameClusters ahead of substring clusters") {
    val df = (1 to 50).map(i => (i.toLong, i * 1.0, i * 2.0, i * 3.0, i * 4.0, i * 5.0))
      .toDF("id", "rev a", "rev b", "rev c", "rev d", "rev e")
    val on = Profiler.profile(df, EngineConfig(semanticNameClusters = true))._2
    // all five share first token "rev": one semantic cluster — and the
    // substring path finds the same member set, deduped by clean()
    assert(on.nameClusters.exists(_.toSet ==
      Set("rev a", "rev b", "rev c", "rev d", "rev e")))
    val off = Profiler.profile(df)._2
    assert(off.nameClusters == on.nameClusters.distinct)
  }

  test("dotted column names profile instead of parsing as nested-field access") {
    // bare col("price.usd") is struct access in Spark; the profiler
    // must backtick-quote (cfg.potentialIdx even anticipates "no.")
    import spark.implicits._
    val df = (1 to 40).map(i => (s"r$i", i * 1.5, i % 7))
      .toDF("No.", "price.usd", "qty.ordered")
    val (_, prof) = Profiler.profile(df)
    assert(prof.columns.map(_.name).toSet == Set("No.", "price.usd", "qty.ordered"))
    val priceCol = prof.columns.find(_.name == "price.usd").get
    assert(priceCol.max.contains(60.0), s"numeric stats must profile: $priceCol")
  }
}
