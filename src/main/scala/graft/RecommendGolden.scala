package graft

/** The pinned q_recommend_charts gate output — single source of truth
  * for BOTH the ScalaTest golden pin (RecommendGoldenSpec) and the
  * driver's DuckDB oracle (a VALUES literal built here, so the two can
  * never drift apart).
  *
  * The full search pipeline has no tractable relational oracle — but
  * its output on the gate fixture (customer at sf0.01, default config)
  * is exactly reproducible: canonical-order fits, seeded draws,
  * partition-independent rank/nominalize (see RecommendGoldenSpec's
  * header for the determinism argument). So a VALUES-literal replay IS
  * a value-exact oracle for the gate, locking the reference's
  * sort/dedupe/top-k semantics (search.py:1261-1299) end to end.
  *
  * Regenerate (ONLY for a deliberate semantics change): run
  * `runMain graft.Verify /root/testdata/sf0.01 /tmp/out
  * q_recommend_charts` and transcribe the 17 rows.
  */
object RecommendGolden {

  /** (chart_type, score, signature, channels) — sf0.01 customer,
    * sorted by signature. Regenerated round 7 (searchEmbedSampleFit
    * default-on); see RecommendGoldenSpec for the change log. */
  val rows: Seq[(String, Double, String, String)] = Seq(
    ("cat_scatter", 54.01267279164056, "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#",
      "color=kmeans | select#==#c_custkey,c_acctbal#new_table#; xy=mds | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 52.755228005641555, "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#",
      "color=kmeans | select#==#c_custkey,c_acctbal#new_table#; xy=pca | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 52.418211156385325, "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=tsne:select#==#c_custkey,c_acctbal#new_table#",
      "color=kmeans | select#==#c_custkey,c_acctbal#new_table#; xy=tsne | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 54.7858554181792, "cat_scatter::color=kmeans:select#==#c_custkey,c_acctbal#new_table#|xy=umap:select#==#c_custkey,c_acctbal#new_table#",
      "color=kmeans | select#==#c_custkey,c_acctbal#new_table#; xy=umap | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 54.47656168052945, "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#",
      "color=lda | select#==#c_custkey,c_acctbal#new_table#; xy=mds | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 53.17467245008601, "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=pca:select#==#c_custkey,c_acctbal#new_table#",
      "color=lda | select#==#c_custkey,c_acctbal#new_table#; xy=pca | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 52.70710004527421, "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=tsne:select#==#c_custkey,c_acctbal#new_table#",
      "color=lda | select#==#c_custkey,c_acctbal#new_table#; xy=tsne | select#==#c_custkey,c_acctbal#new_table#"),
    ("cat_scatter", 55.02196652929032, "cat_scatter::color=lda:select#==#c_custkey,c_acctbal#new_table#|xy=umap:select#==#c_custkey,c_acctbal#new_table#",
      "color=lda | select#==#c_custkey,c_acctbal#new_table#; xy=umap | select#==#c_custkey,c_acctbal#new_table#"),
    ("count_bar", 99.99353486475039, "count_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#",
      "x=kmeans | sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#"),
    ("num_scatter", 48.59543557139874, "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=mds:select#==#c_custkey,c_acctbal#new_table#",
      "color=null_num | select#==#c_acctbal#new_table#; xy=mds | select#==#c_custkey,c_acctbal#new_table#"),
    ("num_scatter", 49.42193000172862, "num_scatter::color=null_num:select#==#c_acctbal#new_table#|xy=umap:select#==#c_custkey,c_acctbal#new_table#",
      "color=null_num | select#==#c_acctbal#new_table#; xy=umap | select#==#c_custkey,c_acctbal#new_table#"),
    ("ord_line", 99.3829000550914, "ord_line::y=null_num:select#==#c_acctbal#new_table#",
      "y=null_num | select#==#c_acctbal#new_table#"),
    ("ord_line", 27.807423994306543, "ord_line::y=tsne:select#==#c_custkey,c_acctbal#new_table#",
      "y=tsne | select#==#c_custkey,c_acctbal#new_table#"),
    ("ord_line", 33.33333330909853, "ord_line::y=umap:select#==#c_custkey,c_acctbal#new_table#",
      "y=umap | select#==#c_custkey,c_acctbal#new_table#"),
    ("sum_bar", 70.57960594779476, "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=mds:select#==#c_custkey,c_acctbal#new_table#",
      "x=kmeans | select#==#c_custkey,c_acctbal#new_table#; y=mds | select#==#c_custkey,c_acctbal#new_table#"),
    ("sum_bar", 99.9999999999826, "sum_bar::x=kmeans:select#==#c_custkey,c_acctbal#new_table#|y=null_num:select#==#c_acctbal#new_table#",
      "x=kmeans | select#==#c_custkey,c_acctbal#new_table#; y=null_num | select#==#c_acctbal#new_table#"),
    ("sum_bar", 99.99999999998677, "sum_bar::x=kmeans:sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#|y=null_num:select#==#c_acctbal#new_table#",
      "x=kmeans | sum#==#c_custkey,c_acctbal#append#sum: () - select#==#c_custkey,c_acctbal,sum: ()#new_table#; y=null_num | select#==#c_acctbal#new_table#"))

  /** Exact double → DuckDB SQL literal. Decimal round-trip literals
    * are NOT safe here: DuckDB's string→double parse is fast-path
    * approximate and lands 1 ulp off on 2 of these 17 scores (measured
    * on shortest-roundtrip reprs, DuckDB 1.0). Instead emit the IEEE
    * integer ratio n / 2^k: both sides are exactly representable and
    * IEEE division is correctly rounded, so the oracle reproduces the
    * Spark double BIT-FOR-BIT regardless of parser behavior. */
  private def doubleLit(x: Double): String = {
    require(java.lang.Double.isFinite(x), s"non-finite pin score $x")
    val bits = java.lang.Double.doubleToLongBits(x)
    val negative = bits < 0
    val biased = ((bits >> 52) & 0x7ffL).toInt
    val frac = bits & 0xfffffffffffffL
    var m = if (biased == 0) frac else frac | (1L << 52)
    var e = (if (biased == 0) 1 else biased) - 1075 // x = ±m · 2^e
    while (m != 0 && (m & 1L) == 0 && e < 0) { m >>= 1; e += 1 }
    val n = if (negative) -m else m
    if (m == 0) "CAST(0 AS DOUBLE)"
    else if (e >= 0) {
      require(e < 10, s"pin score $x too large for exact BIGINT literal")
      s"CAST(${n << e} AS DOUBLE)"
    } else {
      require(e >= -62, s"pin score $x denominator exceeds BIGINT")
      s"(CAST($n AS DOUBLE) / ${1L << -e})"
    }
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** VALUES-literal DuckDB oracle for q_recommend_charts. */
  def valuesOracle: String = oracleFor(rows)

  /** The same oracle with row `i`'s score moved by exactly 1 ulp —
    * test hook for RecommendGoldenSpec's end-to-end exactness probe:
    * if the gate compare still passes against a 1-ulp-perturbed
    * oracle, the doubleLit path is silently tolerant and the pin is
    * not actually value-exact. */
  private[graft] def perturbedOracle(i: Int): String = {
    val (ct, score, sig, ch) = rows(i)
    oracleFor(rows.updated(i, (ct, Math.nextUp(score), sig, ch)))
  }

  private def oracleFor(rs: Seq[(String, Double, String, String)]): String =
    rs.map { case (ct, score, sig, ch) =>
      s"  (${sqlStr(ct)}, ${doubleLit(score)}, ${sqlStr(sig)}, ${sqlStr(ch)})"
    }.mkString("SELECT * FROM (VALUES\n", ",\n",
      ") AS t(chart_type, score, signature, channels)")
}
