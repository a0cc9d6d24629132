package graft

/** Value-level pin for q_recommend_charts — the one gate query whose
  * driver check is rows-only by design (the full search pipeline has
  * no tractable SQL oracle). This pins the EXACT chart set the gate
  * fixture (customer at sf0.01, default config) must produce:
  * signatures AND scores. Everything feeding these numbers is
  * deterministic by construction (canonical-order fits, seeded draws,
  * partition-independent rank/nominalize), so an exact match is the
  * correct expectation — a drift here means the search pipeline's
  * semantics changed, and the pin should only be regenerated for a
  * deliberate change (dump /tmp/out/q_recommend_charts from Verify).
  */
class RecommendGoldenSpec extends SparkSpec {

  // Regenerated round 6 for two deliberate scoring-parity changes:
  // sca_striated joined the default metric set (the reference's default
  // slist enables it, score.py:21), and every line/bar kind now scores
  // the full cs-dict mean — outno1 + lincor as per-series means, cor as
  // mean pairwise correlation for ≥2 series (search.py:978-990,
  // 1073-1084, 1204-1214) — instead of a single-metric shortcut.
  private val expected: Map[String, Double] = Map(
    "cat_scatter::color=dbscan:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 41.21358284984889,
    "cat_scatter::color=dbscan:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 41.21356133897489,
    "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 52.61358284984889,
    "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 52.755228005641555,
    "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 53.14136062762667,
    "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 53.17467245008601,
    "count_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#" -> 99.99353486475039,
    "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 47.101237542684444,
    "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 47.10121295882845,
    // line FAMILY cap (search.py:1274-1278): ord+rel lines pool into one
    // buffer of 3 — the two 0.0-score pca lines fall below the cut
    "ord_line::y=mds:select#==#c_custkey,c_acctbal#new_table#" -> 0.012623809777534412,
    "ord_line::y=null_num:select#==#c_acctbal#new_table#" -> 99.3829000550914,
    "rel_line::x=null_num:select#==#c_acctbal#new_table#|y=mds:select#==#c_custkey,c_acctbal#new_table#" -> 0.012623809777534412,
    "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=null_num:select#==#c_acctbal#new_table#" -> 99.9999999999826,
    "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=pca:select#==#c_custkey,c_acctbal#new_table#" -> 69.30409673660857,
    "sum_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#|y=null_num:select#==#c_acctbal#new_table#" -> 99.99999999998677)

  test("golden: q_recommend_charts gate fixture — exact signature + score set") {
    val df = AssemblyQueries.queries("q_recommend_charts")(spark, "/root/testdata/sf0.01")
    val got = df.select("signature", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet,
      s"signature drift:\n+${(got.keySet -- expected.keySet).mkString("\n+")}" +
        s"\n-${(expected.keySet -- got.keySet).mkString("\n-")}")
    expected.foreach { case (sig, score) =>
      assert(got(sig) == score, s"score drift for $sig: ${got(sig)} vs $score")
    }
  }
}
