package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The composed corpus-cleaning flow a training-data pipeline runs over
  * raw documents — exact dedup, near dedup, quality and language
  * filters — as one call built from the individual operators.
  *
  * Stage order is the cheap-first rule at corpus scale:
  *  1. exact dedup (fingerprint groupBy — shuffles 16-byte keys) first,
  *     so byte-identical copies never reach the quadratic-ish stages;
  *  2. quality + language filters (pure codegen expressions over one
  *     scan) next, shrinking the candidate-pair input;
  *  3. MinHash near-dedup (signatures → banded candidates → connected
  *     components → min-id survivor) last, over the survivors only.
  *
  * Every stage is the already-gated operator; this object only
  * composes and documents them.
  */
object CorpusPipeline {

  /** @param minQuality   drop docs scoring below this ([0,1] heuristic)
    * @param keepLangs    language allow-list (empty = keep all)
    * @param nearDedupOn  run the MinHash near-dedup stage
    */
  final case class Config(minQuality: Double = 0.3,
                          keepLangs: Set[String] = Set.empty,
                          nearDedupOn: Boolean = true,
                          minhashBands: Int = 8,
                          minhashHashes: Int = 32,
                          shingleSize: Int = 3,
                          tau: Double = 0.7)

  /** Clean a (keyCol, textCol) corpus; returns the surviving rows with
    * `quality` and `lang` columns appended. */
  def clean(docs: DataFrame, keyCol: String, textCol: String,
            cfg: Config = Config()): DataFrame = {
    // 1. exact dedup
    val exact = Dedup.exactDedup(docs, keyCol, textCol)

    // 2. quality + language gates, one expression scan
    val scored = exact
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__ltoks", TextFunctions.tokens(lower(col(textCol))))
      .withColumn("quality",
        TextFunctions.qualityScoreOf(col(textCol), col("__toks"), col("__ltoks")))
      .withColumn("lang", TextFunctions.langIdOf(col(textCol), col("__ltoks")))
      .drop("__toks", "__ltoks")
    val filtered = scored
      .where(col("quality") >= cfg.minQuality)
      .where(if (cfg.keepLangs.isEmpty) lit(true)
             else col("lang").isin(cfg.keepLangs.toSeq: _*))

    // 3. near dedup over the survivors
    if (!cfg.nearDedupOn) filtered
    else {
      val sigs = Dedup.minhashSignatures(filtered, keyCol, textCol,
        cfg.minhashHashes, cfg.shingleSize)
      val pairs = Dedup.minhashCandidatePairs(sigs, cfg.minhashHashes,
        cfg.minhashBands, cfg.tau)
      Dedup.nearDedup(filtered, pairs, keyCol)
    }
  }

  /** The streamable subset of [[clean]] for a document stream with an
    * event-time column: watermark-bounded EXACT dedup on the content
    * fingerprint (state bounded by the delay) plus the quality/language
    * expression gates. Near-dedup needs a corpus self-join and stays a
    * batch compaction — the standard lambda split: cheap gates on the
    * stream, quadratic-ish pruning in the periodic batch job. */
  def cleanStream(docs: DataFrame, textCol: String, tsCol: String,
                  delay: String = "10 minutes",
                  cfg: Config = Config()): DataFrame = {
    val deduped = docs
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
    deduped
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__ltoks", TextFunctions.tokens(lower(col(textCol))))
      .withColumn("quality",
        TextFunctions.qualityScoreOf(col(textCol), col("__toks"), col("__ltoks")))
      .withColumn("lang", TextFunctions.langIdOf(col(textCol), col("__ltoks")))
      .drop("__toks", "__ltoks")
      .where(col("quality") >= cfg.minQuality)
      .where(if (cfg.keepLangs.isEmpty) lit(true)
             else col("lang").isin(cfg.keepLangs.toSeq: _*))
  }
}
