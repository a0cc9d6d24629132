package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT graft_simhash64(...)")` works alongside the
  * Column API.
  *
  * Two entry points:
  *  - [[GraftFunctions.register]] on a live session (temp functions);
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.
  *    GraftExtensions` at session build time.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tokens",
      exprs => WhitespaceTokens(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpeish_tokens",
      exprs => BpeishTokens(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimExpr(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinhashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_repetition",
      exprs => RepetitionStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_gopher_stats",
      exprs => GopherStats(exprs.head, evalString(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_c4_stats",
      exprs => C4Stats(exprs.head, evalString(exprs(1)),
        exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nfc_normalize",
      exprs => NfcNormalize(exprs.head), "scala_udf")
  }

  private[functions] def evalString(
      e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
}

/** `SparkSessionExtensions` hook (spark.sql.extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[SimHash64].getName, null, name, usage,
        "", "", "", "", "", "", "scala_udf")
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit simhash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens", "single-pass whitespace tokenization"),
      (exprs: Seq[Expression]) => WhitespaceTokens(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_bpeish_tokens"),
      info("graft_bpeish_tokens", "letter/digit/punct pre-tokenization"),
      (exprs: Seq[Expression]) => BpeishTokens(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "n-token shingles of a token array"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "tight-loop cosine similarity of two float/double arrays"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "row-local k-hash MinHash signature of a shingle array"),
      (exprs: Seq[Expression]) => MinhashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("graft_repetition"),
      info("graft_repetition", "one-pass Gopher repetition stats of a token array"),
      (exprs: Seq[Expression]) => RepetitionStats(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("graft_gopher_stats"),
      info("graft_gopher_stats", "single-sweep Gopher rule counts of a document"),
      (exprs: Seq[Expression]) =>
        GopherStats(exprs.head, GraftFunctions.evalString(exprs(1)))))
    e.injectFunction((FunctionIdentifier("graft_c4_stats"),
      info("graft_c4_stats", "single-sweep C4 line cleaning of a document"),
      (exprs: Seq[Expression]) => C4Stats(exprs.head,
        GraftFunctions.evalString(exprs(1)),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("graft_nfc_normalize"),
      info("graft_nfc_normalize", "Unicode NFC composition (codegen'd scalar)"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}
