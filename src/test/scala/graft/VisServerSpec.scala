package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

/** In-process drive of the four HTTP endpoints (SURVEY §3.1-3.3 /
  * main.py:40-138 parity): csv ingest+profile → search → addT → addV,
  * all against one server instance holding the session sheet. */
class VisServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val server = new graft.api.VisServer(spark)
  private lazy val port = server.start()
  private lazy val http = HttpClient.newHttpClient()

  private def post(path: String, body: String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private val csvBody = {
    val headers = """["name","price","cost","size"]"""
    val rows = (1 to 40).map { i =>
      s"""["item$i", ${i * 10.0}, ${i * 7.0 + 3}, ${(i % 5) * 1.0}]"""
    }.mkString("[", ",", "]")
    s"""{"headers": $headers, "body": $rows}"""
  }

  test("POST /vis/csv profiles and installs the sheet") {
    val (code, r) = post("/vis/csv", csvBody)
    assert(code == 200, r.toString)
    assert(r.get("rows").asLong() == 40)
    assert(r.get("key").asText() == "name")
    val cols = r.get("columns").elements()
    val names = Iterator.continually(cols).takeWhile(_.hasNext)
      .map(_.next().get(0).asText()).toSet
    assert(names == Set("name", "price", "cost", "size"))
    // price/cost form a dimension cluster (same scale family)
    assert(r.get("dimclusters").size() >= 1)
  }

  test("POST /vis/search returns scored charts over the sheet") {
    post("/vis/csv", csvBody)
    val (code, r) = post("/vis/search", """{"charts": ["scatter", "bar"]}""")
    assert(code == 200, r.toString)
    assert(r.get("vislist").size() > 0)
    val first = r.get("vislist").get(0)
    assert(first.has("type") && first.has("score") && first.get("data").size() > 0)
    assert(r.get("graph").isObject || r.get("graph").isArray)
  }

  test("POST /vis/search honors tlist restriction and cluster overrides (main.py:91-99)") {
    post("/vis/csv", csvBody)
    // tlist restricted to pca: no kmeans/dbscan/lda channel may appear
    // (null passthroughs stay admitted, like the reference appends them)
    val (c1, r1) = post("/vis/search",
      """{"charts": ["scatter", "bar"], "tlist": ["pca"]}""")
    assert(c1 == 200, r1.toString)
    val channels = r1.get("vislist").elements().asScalaAll
      .flatMap(_.get("channels").elements().asScalaAll.map(_.asText()))
    assert(channels.nonEmpty)
    assert(!channels.exists(ch => Seq("kmeans", "dbscan", "lda", "mds").exists(ch.startsWith)),
      channels.toString)
    // cluster override: enumeration only sees the client's cluster, so
    // every select draws from {price, size} (+derived), never cost
    val (c2, r2) = post("/vis/search",
      """{"charts": ["scatter"], "dim_clusters": [["price", "size"]], "sem_clusters": []}""")
    assert(c2 == 200, r2.toString)
    val chans2 = r2.get("vislist").elements().asScalaAll
      .flatMap(_.get("channels").elements().asScalaAll.map(_.asText()))
    assert(chans2.nonEmpty)
    assert(!chans2.exists(_.contains("cost")), chans2.toString)
    // slist toggles (reference {name: bool} form): all metrics off →
    // every chart scores 0 (mean of enabled = safe mean of empty)
    val (c3, r3) = post("/vis/search",
      """{"charts": ["bar"], "slist": {"lin_outstanding1": false}}""")
    assert(c3 == 200, r3.toString)
    val scores = r3.get("vislist").elements().asScalaAll.map(_.get("score").asDouble())
    assert(scores.nonEmpty && scores.forall(_ == 0.0), scores.toString)
    // and the same charts score > 0 with the default slist
    val (_, r4) = post("/vis/search", """{"charts": ["bar"]}""")
    val scores4 = r4.get("vislist").elements().asScalaAll.map(_.get("score").asDouble())
    assert(scores4.exists(_ > 0.0), scores4.toString)
  }

  private implicit class IterOps(it: java.util.Iterator[com.fasterxml.jackson.databind.JsonNode]) {
    def asScalaAll: Seq[com.fasterxml.jackson.databind.JsonNode] =
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
  }

  test("POST /vis/addT extends a lineage; /vis/addV runs a terminal transform") {
    post("/vis/csv", csvBody)
    val (c1, r1) = post("/vis/addT",
      """{"lineage": "[]", "t": {"op": "sum", "incols": ["price", "cost"]}}""")
    assert(c1 == 200, r1.toString)
    val lineage = r1.get("lineage").asText()
    assert(lineage.nonEmpty && r1.get("data").size() == 40)
    // replay the produced lineage and add a terminal core transform
    val (c2, r2) = post("/vis/addV",
      s"""{"lineage": ${mapper.writeValueAsString(lineage)}, "coret": "null_num"}""")
    assert(c2 == 200, r2.toString)
    assert(r2.get("ok").asBoolean())
    assert(r2.get("data").size() == 40)
  }

  test("POST /vis/addV builds a chart from vtype + channels (main.py:132-134)") {
    post("/vis/csv", csvBody)
    // sum_bar: x = kmeans categories over the numeric cluster,
    // y = a summed series — the reference's interactive chart assembly
    val (code, r) = post("/vis/addV",
      """{"vtype": "sum_bar", "channels": {
        |  "x": {"lineage": "[]", "coret": "kmeans"},
        |  "y": {"lineage": "[]", "coret": "null_num"}
        |}}""".stripMargin)
    assert(code == 200, r.toString)
    assert(r.get("ok").asBoolean(), r.toString)
    assert(r.get("vtype").asText() == "sum_bar")
    // grouped output: one row per kmeans category, SUM(...) columns
    assert(r.get("data").size() >= 2 && r.get("data").size() <= 3, r.toString)
    val fns = r.get("data").get(0).fieldNames()
    val fieldNames = Iterator.continually(fns).takeWhile(_.hasNext).map(_.next()).toSeq
    assert(fieldNames.exists(_.startsWith("SUM(")), fieldNames.toString)
  }

  test("explicit JSON nulls fall back to defaults, not empty overrides (Jackson NullNode)") {
    post("/vis/csv", csvBody)
    // {"slist": null} once read as Some(empty set) → every metric
    // disabled → all charts 0.0; {"tlist": null} as Some(empty) → only
    // null passthroughs. All must behave exactly like absence.
    val (code, r) = post("/vis/search",
      """{"charts": ["scatter", "bar"], "tlist": null, "slist": null,
        |  "dim_clusters": null, "sem_clusters": null, "beautify": null}""".stripMargin)
    assert(code == 200, r.toString)
    val (_, rDefault) = post("/vis/search", """{"charts": ["scatter", "bar"]}""")
    assert(r.get("vislist").size() == rDefault.get("vislist").size(), r.toString)
    val scores = r.get("vislist").elements().asScalaAll.map(_.get("score").asDouble())
    assert(scores.exists(_ > 0.0), scores.toString)
  }

  test("request handling discharges CacheScope: no tracked frames outlive a request") {
    post("/vis/csv", csvBody)
    CacheScope.releaseAll() // isolate from frames other suites left behind
    // the full endpoint surface: search (recommender), addT, addV
    post("/vis/search", """{"charts": ["scatter", "line", "bar"]}""")
    post("/vis/addT", """{"lineage": "[]", "t": {"op": "sum", "incols": ["price", "cost"]}}""")
    post("/vis/addV", """{"lineage": "[]", "coret": "lda"}""")
    assert(CacheScope.releaseAll() == 0,
      "a serving request left operator-persisted frames tracked past the request boundary")
    // and the wrapper the handler uses provably releases frames from an
    // operator that DOES track (dedup persists its self-join inputs) —
    // today's endpoints reach no dedup op, but the boundary must hold
    // when one does
    import spark.implicits._
    val docs = (1 to 30).map(i => (i.toLong, s"shared shingle text body number ${i % 7}"))
      .toDF("id", "text")
    CacheScope.withCached {
      val sigs = graft.operators.Dedup.minhashSignatures(docs, "id", "text")
      graft.operators.Dedup.minhashCandidatePairs(sigs).count()
    }
    assert(CacheScope.releaseAll() == 0, "withCached left dedup frames tracked")
  }

  test("POST /vis/search without a sheet is a clean 400") {
    val fresh = new graft.api.VisServer(spark)
    val p = fresh.start()
    try {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/vis/search"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 400)
      assert(mapper.readTree(resp.body()).get("error").asText().contains("/vis/csv"))
    } finally fresh.stop()
  }
}
