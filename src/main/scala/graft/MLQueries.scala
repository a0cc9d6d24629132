package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreT
import graft.sources.Tables

/** Declared queries for the core (ML) transforms — SURVEY §2.8.
  *
  * The iterative/eigen-based transforms are not SQL-expressible, so
  * the driver records rows-only checks for them (cross-ecosystem
  * determinism — sklearn vs our fits — makes value equality
  * meaningless anyway; invariants are asserted in CoreTSpec).
  * DBSCAN is the exception: see [[oracles]].
  *
  * Output column names are the reference's ("Category by KMeans", PC1…)
  * sanitized to snake_case where parquet forbids spaces.
  */
object MLQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_coret_pca" -> ((s, dir) => {
      CoreT.pca(Tables.lineitem(s, dir),
        features = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        carry = Seq("l_orderkey", "l_linenumber")).get
    }),
    "q_coret_kmeans" -> ((s, dir) => {
      // fitCap pinned to 2000 so the oracle's fixed-iteration Lloyd
      // replay (ordered folds over the sample lists) stays cheap at
      // gate scale; the operator default stays 50000
      CoreT.kmeans(Tables.lineitem(s, dir),
        features = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        carry = Seq("l_orderkey", "l_linenumber"), fitCap = 2000).get
        .withColumnRenamed("Category by KMeans", "category_kmeans")
    }),
    "q_coret_lda" -> ((s, dir) => {
      CoreT.lda(Tables.part(s, dir),
        features = Seq("p_size", "p_retailprice"),
        carry = Seq("p_partkey")).get
        .withColumnRenamed("Category by LDA", "category_lda")
    }),
    "q_coret_dbscan" -> ((s, dir) => {
      // key-bounded input (chart-feeder scale, like the reference's
      // 400-row cap): keeps the oracle's transitive closure O(bound²)
      // at every scale factor; the operator itself is unbounded
      CoreT.dbscan(Tables.part(s, dir).where(col("p_partkey") <= 2000),
        features = Seq("p_size", "p_retailprice"),
        carry = Seq("p_partkey")).get
        .withColumnRenamed("Category by DBSCAN", "category_dbscan")
    }),
    "q_coret_tsne" -> ((s, dir) => {
      CoreT.tsne(Tables.supplier(s, dir),
        features = Seq("s_nationkey", "s_acctbal"),
        carry = Seq("s_suppkey")).get
        .withColumnRenamed("tSNE-1", "tsne_1").withColumnRenamed("tSNE-2", "tsne_2")
    }),
    "q_coret_mds" -> ((s, dir) => {
      CoreT.mds(Tables.supplier(s, dir),
        features = Seq("s_nationkey", "s_acctbal"),
        carry = Seq("s_suppkey")).get
        .withColumnRenamed("MDS-1", "mds_1").withColumnRenamed("MDS-2", "mds_2")
    }),
    "q_coret_umap" -> ((s, dir) => {
      CoreT.umap(Tables.supplier(s, dir),
        features = Seq("s_nationkey", "s_acctbal"),
        carry = Seq("s_suppkey")).get
        .withColumnRenamed("UMAP-1", "umap_1").withColumnRenamed("UMAP-2", "umap_2")
    })
  )

  /** q_coret_kmeans oracle: a bit-exact DuckDB replay of the
    * deterministic Lloyd fit. The fit sample is the 2000 rows with
    * the smallest md5(key:seed) digest (feature-value tie-break for
    * duplicate keys), init = first 3 points of that order, and each
    * of the fixed 30 iterations recomputes assignments (strict-less
    * argmin) and per-cluster means with ordered left folds — the same
    * IEEE-754 operation sequence as [[CoreT.lloyd]], so the final
    * centers and therefore every label hash-match. (The Scala side
    * early-stops at a fixed point, where recomputed centers are
    * bit-identical — a fixed-iteration replay lands on the same
    * values.) */
  private def kmeansOracle: String = {
    val fs = 1 to 4
    def sdist(c: Int) =
      fs.map(f => s"(x$f[j] - cs[$c][$f])*(x$f[j] - cs[$c][$f])").mkString("(", " + ", ")")
    def dist(c: Int) =
      fs.map(f => s"(f$f - cs[$c][$f])*(f$f - cs[$c][$f])").mkString("(", " + ", ")")
    val newc = (1 to 3).map { c =>
      fs.map { f =>
        s"CASE WHEN len(ixs[$c]) = 0 THEN cs[$c][$f] " +
          s"ELSE list_reduce(list_prepend(0.0, [x$f[j] FOR j IN ixs[$c]]), (a,v) -> a + v) / len(ixs[$c]) END"
      }.mkString("[", ", ", "]")
    }.mkString(", ")
    val ord = "h, f1, f2, f3, f4"
    s"""WITH RECURSIVE
       |src AS (SELECT l_orderkey AS k1, l_linenumber AS k2,
       |               CAST(l_quantity AS DOUBLE) AS f1, CAST(l_extendedprice AS DOUBLE) AS f2,
       |               CAST(l_discount AS DOUBLE) AS f3, CAST(l_tax AS DOUBLE) AS f4 FROM lineitem),
       |mm AS (SELECT MIN(f1) lo1, MAX(f1) hi1, MIN(f2) lo2, MAX(f2) hi2,
       |              MIN(f3) lo3, MAX(f3) hi3, MIN(f4) lo4, MAX(f4) hi4 FROM src),
       |n AS (SELECT k1, k2,
       |        CASE WHEN hi1 = lo1 THEN 0.0 ELSE (f1 - lo1) / (hi1 - lo1) END AS f1,
       |        CASE WHEN hi2 = lo2 THEN 0.0 ELSE (f2 - lo2) / (hi2 - lo2) END AS f2,
       |        CASE WHEN hi3 = lo3 THEN 0.0 ELSE (f3 - lo3) / (hi3 - lo3) END AS f3,
       |        CASE WHEN hi4 = lo4 THEN 0.0 ELSE (f4 - lo4) / (hi4 - lo4) END AS f4
       |      FROM src, mm),
       |samp AS (SELECT md5(k1 || ':' || k2 || ':9') AS h, f1, f2, f3, f4 FROM n
       |         WHERE f1 IS NOT NULL AND f2 IS NOT NULL AND f3 IS NOT NULL AND f4 IS NOT NULL
       |         ORDER BY $ord LIMIT 2000),
       |sp AS (SELECT list(f1 ORDER BY $ord) AS x1, list(f2 ORDER BY $ord) AS x2,
       |              list(f3 ORDER BY $ord) AS x3, list(f4 ORDER BY $ord) AS x4,
       |              COUNT(*) AS m FROM samp),
       |it(i, cs) AS (
       |  SELECT 0, [[x1[1], x2[1], x3[1], x4[1]],
       |             [x1[2], x2[2], x3[2], x4[2]],
       |             [x1[3], x2[3], x3[3], x4[3]]] FROM sp
       |  UNION ALL
       |  SELECT i + 1, [$newc]
       |  FROM (SELECT i, cs, x1, x2, x3, x4,
       |               [[j FOR j IN generate_series(1, m) IF asg[j] = 1],
       |                [j FOR j IN generate_series(1, m) IF asg[j] = 2],
       |                [j FOR j IN generate_series(1, m) IF asg[j] = 3]] AS ixs
       |        FROM (SELECT i, cs, x1, x2, x3, x4, m,
       |                     list_transform(generate_series(1, m), j ->
       |                       CASE WHEN ${sdist(1)} <= ${sdist(2)} AND ${sdist(1)} <= ${sdist(3)} THEN 1
       |                            WHEN ${sdist(2)} <= ${sdist(3)} THEN 2 ELSE 3 END) AS asg
       |              FROM it, sp WHERE i < 30))),
       |fin AS (SELECT cs FROM it WHERE i = 30)
       |SELECT k1 AS l_orderkey, k2 AS l_linenumber,
       |  CAST(CASE WHEN f1 IS NULL OR f2 IS NULL OR f3 IS NULL OR f4 IS NULL THEN 0
       |            WHEN ${dist(1)} <= ${dist(2)} AND ${dist(1)} <= ${dist(3)} THEN 0
       |            WHEN ${dist(2)} <= ${dist(3)} THEN 1 ELSE 2 END AS BIGINT) AS category_kmeans
       |FROM n, fin""".stripMargin
  }

  /** SQL-expressible core transforms: DBSCAN with canonical
    * min-core-key labels is pure ε-graph set logic — neighbor counts,
    * connected components (recursive CTE), min-label border assignment
    * — over the same minmax normalization and fixed-order squared
    * distances, so it value-matches bit-exactly; KMeans replays the
    * deterministic Lloyd fit ([[kmeansOracle]]). The remaining
    * iterative/eigen-based transforms (pca/tsne/mds/umap/lda) stay
    * rows-only by nature. */
  val oracles: Map[String, String] = Map(
    "q_coret_kmeans" -> kmeansOracle,
    "q_coret_dbscan" ->
      """WITH RECURSIVE
        |pts AS (SELECT p_partkey AS k, CAST(p_size AS DOUBLE) AS f1,
        |               CAST(p_retailprice AS DOUBLE) AS f2 FROM part
        |        WHERE p_partkey <= 2000),
        |mm AS (SELECT MIN(f1) AS lo1, MAX(f1) AS hi1, MIN(f2) AS lo2, MAX(f2) AS hi2 FROM pts),
        |n AS (SELECT k,
        |        CASE WHEN hi1 = lo1 THEN 0.0 ELSE (f1 - lo1) / (hi1 - lo1) END AS x,
        |        CASE WHEN hi2 = lo2 THEN 0.0 ELSE (f2 - lo2) / (hi2 - lo2) END AS y
        |      FROM pts, mm),
        |e AS (SELECT a.k AS ka, b.k AS kb FROM n a JOIN n b
        |      ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 0.0625),
        |core AS (SELECT ka AS k FROM e GROUP BY ka HAVING COUNT(*) >= 5),
        |ce AS (SELECT e.ka, e.kb FROM e
        |       JOIN core c1 ON c1.k = e.ka JOIN core c2 ON c2.k = e.kb),
        |reach(id, r) AS (
        |  SELECT ka, kb FROM ce
        |  UNION
        |  SELECT ce.ka, reach.r FROM ce JOIN reach ON ce.kb = reach.id),
        |comp AS (SELECT id, LEAST(id, MIN(r)) AS lbl FROM reach GROUP BY id),
        |border AS (SELECT e.ka AS k, MIN(comp.lbl) AS lbl
        |           FROM e JOIN core c ON c.k = e.kb JOIN comp ON comp.id = e.kb
        |           WHERE e.ka NOT IN (SELECT k FROM core)
        |           GROUP BY e.ka)
        |SELECT n.k AS p_partkey,
        |  COALESCE(comp.lbl, border.lbl, -1) AS category_dbscan
        |FROM n LEFT JOIN comp ON comp.id = n.k LEFT JOIN border ON border.k = n.k""".stripMargin
  )
}
