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

  private val generatedCols = Seq("quality", "lang", "__toks", "__ltoks")

  /** Quality + language gates, one expression scan: appends `quality`
    * and `lang`, filters by the config thresholds. Shared verbatim by
    * the batch and streaming paths so they can't drift. */
  private def gates(df: DataFrame, textCol: String, cfg: Config): DataFrame = {
    val clash = df.columns.intersect(generatedCols)
    require(clash.isEmpty,
      s"input already has ${clash.mkString(", ")} — rename before cleaning " +
        "(the pipeline appends quality/lang and would clobber them)")
    df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__ltoks", TextFunctions.tokens(lower(col(textCol))))
      .withColumn("quality",
        TextFunctions.qualityScoreOf(col(textCol), col("__toks"), col("__ltoks")))
      .withColumn("lang", TextFunctions.langIdOf(col(textCol), col("__ltoks")))
      .drop("__toks", "__ltoks")
      .where(col("quality") >= cfg.minQuality)
      .where(if (cfg.keepLangs.isEmpty) lit(true)
             else col("lang").isin(cfg.keepLangs.toSeq: _*))
  }

  /** Clean a (keyCol, textCol) corpus; returns the surviving rows with
    * `quality` and `lang` columns appended. */
  def clean(docs: DataFrame, keyCol: String, textCol: String,
            cfg: Config = Config()): DataFrame = {
    // 1. exact dedup; 2. quality + language gates
    val filtered = gates(Dedup.exactDedup(docs, keyCol, textCol), textCol, cfg)

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
    gates(deduped, textCol, cfg)
  }
}
