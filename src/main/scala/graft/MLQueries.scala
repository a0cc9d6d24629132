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
      CoreT.kmeans(Tables.lineitem(s, dir),
        features = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        carry = Seq("l_orderkey", "l_linenumber")).get
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

  /** The one SQL-expressible core transform: DBSCAN with canonical
    * min-core-key labels is pure ε-graph set logic — neighbor counts,
    * connected components (recursive CTE), min-label border assignment
    * — over the same minmax normalization and fixed-order squared
    * distances, so it value-matches bit-exactly. The iterative/
    * eigen-based transforms (pca/tsne/mds/umap/lda/kmeans) stay
    * rows-only by nature. */
  val oracles: Map[String, String] = Map(
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
