package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, first-class —
  * the graph-family sibling of [[PageRank]] (entity resolution after
  * [[FuzzyJoin]], dedup-cluster closure, host-graph partitioning).
  * Each node labels with the MINIMUM id reachable from it.
  *
  * This is [[Dedup.nearDupSurvivors]]'s transitive-closure machinery
  * exposed on edges instead of near-dup pairs — both its arms
  * (count-gated driver union-find below ~2M edges; pointer-jumping
  * label propagation above, halving chain depth per round so 20
  * rounds cover diameters to ~2^19) and its loud non-convergence
  * guard come along unchanged, so the scale posture is the one the
  * dedup family already proved.
  *
  * @return (node, component) — component = min reachable node id */
object GraphComponents {

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 20): DataFrame =
    Dedup.nearDupSurvivors(
      edges.select(col(srcCol).cast("long").as("id_a"),
          col(dstCol).cast("long").as("id_b"))
        .where(col("id_a").isNotNull && col("id_b").isNotNull)
        .distinct(),
      maxIters)
      .select(col("id").as("node"), col("keep_id").as("component"))
}
