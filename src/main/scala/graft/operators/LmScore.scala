package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-LM document scoring — the perplexity-filter stage of a
  * training-data pipeline (the CCNet/KenLM pattern), re-expressed so
  * the whole thing is bit-reproducible across engines.
  *
  * A bigram LM with add-one smoothing is fit on the corpus itself:
  * tokens lowercase, vocabulary = top `vocabSize` unigrams, everything
  * else collapsed to one UNK symbol; transition table = top
  * `bigramCap` mapped bigrams. Each document scores the mean
  * transition probability over its token positions —
  * p(t₁) = (c(t₁)+1)/(N+V), p(tᵢ|tᵢ₋₁) = (c(ab)+1)/(c(a)+V) with
  * V = vocabSize+1 — i.e. the arithmetic-mean counterpart of
  * perplexity's geometric mean. Deliberately NOT log-perplexity:
  * `log()` is not correctly rounded and differs by ulps across libm
  * implementations, which would poison a value-exact oracle; the
  * probabilities themselves are exact-integer ratios (one IEEE
  * division each), and the per-document mean uses the 2⁻⁴⁰ pinned
  * integer sum, so the score is bit-identical on any engine and any
  * partitioning. Low score = improbable text under the corpus LM —
  * the same filter signal, monotone in the same direction.
  *
  * Scale shape: one token explode carrying each position's
  * predecessor ROW-LOCALLY (element_at over the materialized token
  * array — no doc-keyed window/sort ever touches the corpus); the
  * WHOLE fit is one map-side-combinable (word, prev-word) adjacency
  * count — vocabulary, unigram and transition tables are exact sums
  * over that small frame (two-level aggregation, round 16), cut to
  * deterministic top-k (count desc, md5 tie-break) and BROADCAST —
  * the corpus-sized frames never shuffle on token keys for scoring,
  * and both bigram ends map through the same broadcast vocab; the
  * per-doc mean is one groupBy with exact long sums. Caps keep both
  * tables broadcast-small at any corpus size.
  *
  * The per-doc pinned totals reassemble in LONG arithmetic —
  * hi·2²⁰+lo is exact below 2⁶³, i.e. up to 2²³ ≈ 8M tokens per
  * document; longer single documents would round the reassembly
  * (split such documents upstream, [[PipelineOps.chunkDocuments]]).
  */
object LmScore {
  private val Unk = "\u0003"
  private val PinScale = CoreT.PinScale // 2^40, the shared pin

  /** @return (idCol, n_tokens, lm_score) for every input document;
    *         empty documents score 0.0 */
  def score(docs: DataFrame, idCol: String, textCol: String,
            vocabSize: Int = 2000, bigramCap: Int = 10000): DataFrame = {
    require(vocabSize >= 1 && bigramCap >= 1, "caps must be positive")
    require(!Set("pos", "word", "m", "a", "uc", "bc", "n_tokens", "lm_score",
      "__v", "__c", "__p", "__hi", "__lo", "__shi", "__slo", "__n",
      "__uc_first", "__uc_prev", "__t", "__pw", "__vw", "__fw", "__ntot")
      .contains(idCol),
      s"idCol '$idCol' collides with an internal column name")
    val v1 = vocabSize + 1 // vocab + UNK, the add-one denominator width

    val words = TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))
    // token adjacency is ROW-LOCAL: the previous word is read off the
    // materialized token array AFTER the explode (element_at, 1-based
    // = the 0-based predecessor), so NO doc-keyed window/sort ever
    // touches the corpus — a `lag` spelling would shuffle and sort
    // every token position by document. The token array rides through
    // the Generate as a retained child column: the Project computing
    // it sits BELOW the Generate, so the tokenizer runs exactly once
    // per row with no persist needed — the previous spelling kept the
    // element_at inside a transform() lambda, whose per-element
    // re-evaluation hazard forced a full corpus-token cache
    // (write + read of every token array) purely as a CSE barrier;
    // that extra corpus pass is gone (round 15, guide §1.2/§2.3).
    val pairs0 = graft.CacheScope.track(
      docs.select(col(idCol), words.as("__t"))
        .select(col(idCol), col("__t"),
          posexplode(col("__t")).as(Seq("pos", "word")))
        .select(col(idCol), col("pos"), col("word"),
          when(col("pos") > 0, element_at(col("__t"), col("pos")))
            .otherwise(lit(null)).as("__pw")))

    // FUSED FIT (round 16, guide §1.2/§2.3 two-level aggregation): ONE
    // corpus-scale aggregation — the (word, prev-word) adjacency
    // counts — feeds every fit table. The previous chain aggregated
    // the corpus THREE times (vocab unigrams over pairs0, unigram and
    // bigram counts over a second corpus-scale persisted `mapped`
    // frame); vocab, mapped-unigram and mapped-bigram counts are all
    // exact sums over these ≤|distinct bigram type| rows, so the
    // corpus-scale `mapped` cache (a full write + two reads of every
    // token position) is gone and the scoring pass maps through the
    // broadcast vocab inline as its only remaining consumer.
    val rawPairs = graft.CacheScope.track(
      pairs0.groupBy(col("word"), col("__pw")).agg(count(lit(1)).as("__ntot")))

    // vocabulary: deterministic top-k unigrams (md5 tie-break — hex
    // digests order identically in every engine); word totals are the
    // per-word sums of the adjacency counts (every position carries
    // exactly one word), NOT a second corpus pass
    val wordCounts = rawPairs.groupBy(col("word")).agg(sum(col("__ntot")).as("__c"))
    // persisted: the vocab is broadcast-consumed FIVE times (uni build,
    // both bigram-end maps, both scoring-side maps) and each broadcast
    // build evaluates its subtree — without the cache every build
    // re-runs the word-count agg + top-k sort over the adjacency frame
    // (measured +1.1 s on q_lm_score at sf0.1); with it the rebuilds
    // read ≤vocabSize rows
    val vocab = graft.CacheScope.track(wordCounts
      .orderBy(col("__c").desc, md5(col("word")).asc).limit(vocabSize)
      .select(col("word"), lit(1).as("__v")))
    // both ends of the bigram map through the SAME broadcast vocab —
    // the predecessor's mapped symbol depends only on its word, never
    // on cross-row state
    val vb = broadcast(vocab)

    // persisted: read three times below (nTotal + both score-side
    // broadcast joins) — and nTotal comes from the ≤(vocabSize+1)-row
    // unigram table's own counts, NOT a corpus-wide count() pass. It
    // stays a driver-read LITERAL deliberately: folding it in as a
    // broadcast 1-row cross join was measured SLOWER (round 15) — the
    // nested-loop join rides every scored position, a per-row cost at
    // any scale, while the head() is one tiny agg over the cached
    // unigram table.
    val uni = graft.CacheScope.track(
      wordCounts.join(vb, Seq("word"), "left")
        .select(when(col("__v").isNotNull, col("word")).otherwise(lit(Unk)).as("m"),
          col("__c"))
        .groupBy(col("m")).agg(sum(col("__c")).as("uc")))
    val nTotal = uni.agg(sum(col("uc"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

    // the scoring-side symbol mapping, inline (single consumer now —
    // no persist): one pass over the cached token positions through
    // the broadcast vocab
    val pairs = pairs0.join(vb, Seq("word"), "left")
      .withColumnRenamed("__v", "__vw").as("j1")
      .join(vb.as("v2"), col("__pw") === col("v2.word"), "left")
      .select(col(idCol), col("pos"),
        when(col("__vw").isNotNull, col("j1.word")).otherwise(lit(Unk)).as("m"),
        when(col("__pw").isNull, lit(null))
          .otherwise(when(col("v2.__v").isNotNull, col("__pw"))
            .otherwise(lit(Unk))).as("a"))
    // mapped bigram counts: map BOTH ends of the adjacency-count rows
    // through the vocab and re-aggregate — sum(__ntot) over the raw
    // groups collapsing to one (a, m) equals the per-position count
    // the corpus-pass spelling took, exactly
    val big = rawPairs.where(col("__pw").isNotNull)
      .join(vb, Seq("word"), "left")
      .withColumnRenamed("__v", "__fw").as("f1")
      .join(vb.as("fv2"), col("__pw") === col("fv2.word"), "left")
      .select(
        when(col("__fw").isNotNull, col("f1.word")).otherwise(lit(Unk)).as("m"),
        when(col("fv2.__v").isNotNull, col("__pw")).otherwise(lit(Unk)).as("a"),
        col("__ntot"))
      .groupBy(col("a"), col("m")).agg(sum(col("__ntot")).as("bc"))
      .orderBy(col("bc").desc,
        md5(concat(col("a"), lit("\u0001"), col("m"))).asc)
      .limit(bigramCap)

    // per-position probability: exact-integer ratio, one IEEE division.
    // The two unigram probes are two broadcast builds — Spark does NOT
    // reuse the exchange across them (round 16, plans/r16: 0
    // ReusedExchange nodes; the round-15 claim that a qualified alias
    // makes ReuseExchange fire was wrong and is struck) — but both
    // builds read the persisted ≤(vocabSize+1)-row `uni` cache, so the
    // duplicate build cost is bounded by the vocab cap, not the corpus.
    val p = when(col("a").isNull,
        (col("__uc_first") + 1).cast("double") / lit((nTotal + v1).toDouble))
      .otherwise(
        (coalesce(col("bc"), lit(0L)) + 1).cast("double") /
          (col("u2.uc") + lit(v1.toLong)).cast("double"))
    val ub = broadcast(uni)
    val scoredPos = pairs
      .join(broadcast(big), Seq("a", "m"), "left")
      .join(ub, Seq("m"), "left")
      .withColumnRenamed("uc", "__uc_first")
      .join(ub.as("u2"), col("a") === col("u2.m"), "left")
      .select(col(idCol), p.as("__p"))

    // exact pinned mean per document (long-reassembled, see scaladoc)
    val (hi, lo) = CoreT.pinnedSplit(col("__p"))
    val perDoc = scoredPos
      .select(col(idCol), hi.as("__hi"), lo.as("__lo"))
      .groupBy(col(idCol))
      .agg(sum(col("__hi")).as("__shi"), sum(col("__lo")).as("__slo"),
        count(lit(1)).as("__n"))
      .select(col(idCol), col("__n"),
        ((col("__shi") * lit(1048576L) + col("__slo")).cast("double") /
          lit(PinScale) / col("__n")).as("lm_score"))

    // n_tokens = the scored-position count (every token scores exactly
    // one position), so the corpus is NOT tokenized a second time for
    // the count — the base side of the join prunes to the id column
    // alone, and token-less documents fall out of the left join to a
    // (0, 0.0) row
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    * the corpus with [[score]], then split it into head / middle / tail
    * tertiles of the global score order — head = most in-distribution
    * text, the slice CCNet keeps for LM training.
    *
    * The tertile cut uses min-rank semantics — tied scores
    * (byte-identical documents score bit-identically here) share the
    * rank of their first sorted position, so the bucket label is
    * independent of partitioning and encounter order with no tie-break
    * column needed. The bucket index is pure integer arithmetic,
    * `(rank-1)*3 div n`; no double division whose rounding could flip
    * a boundary document.
    *
    * Scale shape (round 12): bucket(v) is MONOTONE in the score, so
    * the whole cut reduces to two boundary SCORES — the smallest
    * score whose min-rank reaches each tertile, read off the
    * distinct-value rank frame ([[Rank.distinctValueRanks]], the
    * [[Rank.exactPercentiles]] machinery: only DISTINCT scores sort,
    * range-partitioned). The corpus itself is then labeled by one
    * literal-comparison projection. The earlier spelling
    * ([[Rank.minRankByValue]]) joined the full corpus against the
    * rank table — with real-valued scores distinct ≈ rows, i.e. a
    * corpus-sized shuffle join — and paid a separate `count()` pass;
    * both are gone: after the score fit, the only corpus-wide work is
    * the distinct groupBy and the final scan.
    */
  def buckets(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int = 2000, bigramCap: Int = 10000): DataFrame = {
    require(idCol != "__rk" && idCol != "ppl_bucket",
      s"idCol '$idCol' collides with an internal column name")
    // persisted: consumed by the rank groupBy and the final labeling
    // scan, and its lineage is the whole LM fit
    val scored = graft.CacheScope.track(
      score(docs, idCol, textCol, vocabSize, bigramCap))
    // n rides along with the rank frame (summed from the prefix-sum
    // subtotals) — neither a corpus count() pass nor an extra agg job
    val (dv, n) = Rank.distinctValueRanksWithTotal(
      scored, "lm_score", "__v", "__rk", "__cnt")
    // smallest min-rank inside tertile k: 3·(r−1) ≥ k·n, all-long
    def tertileRank(k: Long): Long = (k * n + 2L) / 3L + 1L
    // boundary scores are exact doubles FROM the data, re-embedded as
    // literals — the >= cuts reproduce the rank cut bit-for-bit. They
    // stay driver-read LITERALS deliberately: a broadcast 1-row cross
    // join spelling was measured SLOWER (round 15) — the nested-loop
    // join rides every corpus row in the labeling scan, while the
    // head() is one tiny agg over the distinct-score rank frame.
    val (s1, s2) =
      if (n == 0L) (None, None)
      else {
        val r = dv.agg(
          min(when(col("__rk") >= tertileRank(1), col("__v"))).as("__s1"),
          min(when(col("__rk") >= tertileRank(2), col("__v"))).as("__s2")).head()
        (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
         if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      }
    val tail: Column = lit("tail")
    val withMid = s1.fold(tail)(v =>
      when(col("lm_score") >= v, lit("middle")).otherwise(tail))
    val label = s2.fold(withMid)(v =>
      when(col("lm_score") >= v, lit("head")).otherwise(withMid))
    scored.select(col(idCol), col("n_tokens"), col("lm_score"),
      label.as("ppl_bucket"))
  }
}
