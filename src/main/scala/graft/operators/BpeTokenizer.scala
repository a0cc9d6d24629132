package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFunctions}

/** BPE tokenizer induction over a corpus — the vocabulary-learning
  * stage of a training-data pipeline (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016), done the
  * way every codebook in this engine is done: FIT on a bounded seeded
  * digest sample driver-side (deterministic, SQL-replayable), APPLY to
  * the full corpus as a literal-table expression scan.
  *
  * Train: words (RE2 `\S+` runs) split into code points; `numMerges`
  * rounds of: count adjacent token pairs within words across the
  * sample → take the most frequent pair (ties broken by
  * md5(a‖0x01‖b) — hex digests order identically in every engine,
  * where raw string collation might not) → rewrite the sample with
  * the merge. A round with no pairs left yields the unmatchable
  * sentinel pair (0x02, 0x02), keeping the merge table a fixed
  * `numMerges` long (the oracle's unrolled stages are total).
  *
  * Encode: [[graft.functions.BpeEncodeExpr]] applies the merge table
  * in learned order — one tight-loop pass per row, merge table as plan
  * literals, zero shuffle, nothing driver-side touches corpus-scale
  * data. At 100 TB the fit cost is constant (sample-capped) and encode
  * is a single expression scan.
  */
object BpeTokenizer {

  /** RE2-\s word split, byte-identical to
    * [[graft.functions.WhitespaceTokens]] (NOT Java `\s`: no \x0B). */
  private[graft] def splitWords(s: String): Array[String] =
    s.split("[ \t\n\f\r]+").filter(_.nonEmpty)

  private def tieKey(a: String, b: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest((a + "\u0001" + b).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** The sentinel merge emitted when a round finds no pairs — 0x02
    * can never appear as a token (tokens are non-space code points of
    * real words, and merged tokens concatenate them). */
  private[graft] val Sentinel = ("\u0002", "\u0002")

  /** Learn `numMerges` merges from a digest-capped sample.
    * Deterministic: sample membership and order, pair counting, and
    * tie-breaks are all engine-replayable. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, sampleCap: Int = 2000,
            seed: Long = 9L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val rows = docs
      .select(md5(concat_ws(":", col(idCol), lit(seed))).as("__h"),
        coalesce(col(textCol), lit("")).as("__t"))
      .orderBy(col("__h")).limit(sampleCap)
      .collect().sortBy(_.getString(0))
    // sample words as code-point token arrays, COLLAPSED to distinct
    // words with multiplicities (Sennrich's word-frequency dict): a
    // pair's count is Σ freq · (occurrences in word) — the identical
    // arithmetic the per-occurrence loop computed, over a vocabulary-
    // sized array instead of every word occurrence (round 15: the fit
    // was ~1 s of driver time per query, dominated by re-counting and
    // re-merging duplicate words each round)
    var words: Array[(Array[String], Long)] = rows.view
      .flatMap(r => splitWords(r.getString(1)))
      .groupBy(identity).view
      .map { case (w, occ) => (Bpe.codePointSplit(w), occ.size.toLong) }
      .toArray
    val merges = new scala.collection.mutable.ArrayBuffer[(String, String)](numMerges)
    var round = 0
    while (round < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val (w, freq) = words(wi)
        var i = 0
        while (i < w.length - 1) {
          counts.merge((w(i), w(i + 1)), freq, _ + _)
          i += 1
        }
        wi += 1
      }
      val best =
        if (counts.isEmpty) Sentinel
        else {
          // two passes: find the max count first, then hash only the
          // tied pairs — tieKey is an md5 digest, and hashing every
          // candidate pair every round made the digest the dominant
          // fit cost (O(pairs) digests → O(ties), same selection)
          var bestCount = -1L
          counts.forEach { (_, c) => if (c > bestCount) bestCount = c }
          var bestPair: (String, String) = null
          var bestKey: String = null
          counts.forEach { (p, c) =>
            if (c == bestCount) {
              val k = tieKey(p._1, p._2)
              if (bestKey == null || k < bestKey) { bestPair = p; bestKey = k }
            }
          }
          bestPair
        }
      merges += best
      if (best != Sentinel)
        words = words.map { case (w, freq) =>
          (Bpe.applyMerge(w, best._1, best._2), freq)
        }
      round += 1
    }
    merges.toSeq
  }

  /** Encode the full corpus with a learned merge table:
    * (idCol, n_words, n_bpe_tokens, bpe_fp) — the fingerprint hashes
    * the 0x01-joined token stream, so the oracle gates the exact
    * tokenization, not just its length. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    docs.select(col(idCol),
        words.as("__w"),
        Bpe.encode(words, merges).as("__bpe"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_words"),
        size(col("__bpe")).cast("long").as("n_bpe_tokens"),
        md5(concat_ws("\u0001", col("__bpe"))).as("bpe_fp"))
  }

  /** Train-and-encode in one call — the gate query surface. */
  def trainEncode(docs: DataFrame, idCol: String, textCol: String,
                  numMerges: Int, sampleCap: Int = 2000,
                  seed: Long = 9L): DataFrame =
    encode(docs, idCol, textCol,
      train(docs, idCol, textCol, numMerges, sampleCap, seed))
}
