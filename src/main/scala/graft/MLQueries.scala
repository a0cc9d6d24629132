package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreT
import graft.sources.Tables

/** Declared queries for the core (ML) transforms — SURVEY §2.8.
  *
  * These are not SQL-expressible, so no oracle entries: the driver
  * records a rows-only check. Cross-ecosystem determinism (sklearn vs
  * MLlib initialization) makes value equality meaningless anyway;
  * invariants are asserted in CoreTSpec instead.
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
      CoreT.dbscan(Tables.part(s, dir),
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
}
