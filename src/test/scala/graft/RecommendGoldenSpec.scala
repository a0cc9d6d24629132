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

  private val expected: Map[String, Double] = Map(
    "cat_scatter::color=dbscan:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 38.135029581427204,
    "cat_scatter::color=dbscan:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 38.1350049975797,
    "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 51.16360100999863,
    "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 51.32548118805589,
    "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 51.76677561317324,
    "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 51.80484626742096,
    "count_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#" -> 99.99680832557904,
    "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#" -> 44.490867844998405,
    "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#" -> 44.490839163842985,
    // line FAMILY cap (search.py:1274-1278): ord+rel lines pool into one
    // buffer of 3 — the two 0.0-score pca lines fall below the cut
    "ord_line::y=mds:select#==#c_custkey,c_acctbal#new_table#" -> 0.037871429332603235,
    "ord_line::y=null_num:select#==#c_acctbal#new_table#" -> 99.35364251510374,
    "rel_line::x=null_num:select#==#c_acctbal#new_table#|y=mds:select#==#c_custkey,c_acctbal#new_table#" -> 0.037871429332603235,
    "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=mds:select#==#c_custkey,c_acctbal#new_table#" -> 99.99821994701999,
    "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=null_num:select#==#c_acctbal#new_table#" -> 99.99999999999142,
    "sum_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#|y=null_num:select#==#c_acctbal#new_table#" -> 99.99999999999348)

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
