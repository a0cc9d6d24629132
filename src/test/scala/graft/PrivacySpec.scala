package graft

import graft.operators.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("US", "A"), ("US", "A"), ("US", "A"),   // class of 3
    ("US", "B"),                             // singleton
    ("DE", "A"), ("DE", "A"))                // class of 2
    .toDF("nation", "segment")

  test("audit: class count, violators, rows at risk, worst size") {
    val (nc, nv, rar, mcs) = Privacy.kAnonymityAudit(rows,
        Seq("nation", "segment"), k = 3L)
      .as[(Long, Long, Long, Long)].head()
    assert((nc, nv, rar, mcs) == ((3L, 2L, 3L, 1L)))
    // k-anonymous at k=1: nothing violates
    val ok = Privacy.kAnonymityAudit(rows, Seq("nation", "segment"), 1L)
      .as[(Long, Long, Long, Long)].head()
    assert(ok._2 == 0L && ok._3 == 0L)
  }

  test("violations list: riskiest first, total order, capped") {
    val v = Privacy.kAnonymityViolations(rows, Seq("nation", "segment"), 3L)
      .as[(String, String, Long)].collect().toSeq
    assert(v == Seq(("US", "B", 1L), ("DE", "A", 2L)))
    assert(Privacy.kAnonymityViolations(rows, Seq("nation", "segment"), 3L,
      top = 1).count() == 1)
  }
}
