package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TStep
import graft.plans.{Beautify, Lineage, Recommendation, Recommender}
import graft.profiler.Profiler

/** The user-facing API surface — the library analogue of the
  * reference's four HTTP endpoints (main.py):
  *
  *  - /vis/csv    → [[profile]]   (ingest + profile)
  *  - /vis/search → [[search]]    (the five-phase recommendation query)
  *  - /vis/addT   → [[addTransform]] (extend a lineage by one basic T)
  *  - /vis/addV   → [[addVisualization]] (terminal transform on a lineage)
  *
  * A user of the reference switches by calling these with a DataFrame
  * instead of POSTing a table; an HTTP shim over this object is
  * deployment plumbing, not engine semantics.
  */
final class Engine(spark: SparkSession, cfg: EngineConfig = EngineConfig.default) {

  /** Ingest + profile: returns the (possibly key-augmented) frame and
    * the profile that drives the search (§3.1). */
  def profile(df: DataFrame): (DataFrame, TableProfile) = Profiler.profile(df, cfg)

  /** The main search query (§3.2): profile → enumerate → execute →
    * score → top-k (+ optional beautify reorder, utils.py:215-222). */
  def search(df: DataFrame, charts: Seq[String] = Seq("scatter", "line", "bar"),
             beautify: Boolean = true): Recommendation = {
    val (pdf, prof) = Profiler.profile(df, cfg)
    val rec = Recommender.recommend(pdf, prof, spark, cfg, charts)
    if (beautify) rec.copy(visList = Beautify.reorder(rec.visList)) else rec
  }

  /** Interactive lineage extension (§3.3): replay `lineageJson` on the
    * source and apply one more basic step; returns the frame + new id. */
  def addTransform(source: DataFrame, lineageJson: String, step: TStep): (DataFrame, String) = {
    val (pdf, prof) = Profiler.profile(source, cfg)
    Lineage.addStep(pdf, lineageJson, step, prof.keyColumn.toSeq)
  }

  /** Interactive terminal transform on a replayed lineage (§3.3). */
  def addVisualization(source: DataFrame, lineageJson: String, coreT: String): Option[DataFrame] = {
    val (pdf, prof) = Profiler.profile(source, cfg)
    Lineage.addCoreT(pdf, lineageJson, coreT, prof.keyColumn.toSeq, cfg.notCalcuDmT)
  }
}
