package graft.profiler

import graft.functions.DBSCAN

/** Semantic column-name clustering — the w2v half of the reference's
  * col_names_simi clusters (spreadsheet.py:231-253, utils.py:165-213).
  *
  * The reference embeds each column name as the w2v vector of its FIRST
  * preprocessed token (gensim preprocess_string: lowercase, strip
  * non-alphanum/punctuation/numerics, split alphanum runs, drop
  * stopwords; OOV → the vector of the literal word 'TOKEN'), then runs
  * DBSCAN(eps=0.5, min_samples=5, euclidean) over the raw vectors. The
  * GoogleNews binary is a gitignored external asset there, so this is
  * feature-flagged the same way ([[graft.EngineConfig.semanticNameClusters]]):
  *
  *  - with an embedding file (word2vec TEXT format: `word v1 … vd` per
  *    line, optional `count dim` header), tokens resolve from it and
  *    OOV tokens fall back to the file's `TOKEN` row when present;
  *  - without one, every token gets a deterministic hashed unit vector
  *    (splitmix64 over the token bytes): identical first tokens are
  *    distance 0 and distinct tokens are near-orthogonal in 16-d, so
  *    the degraded mode clusters exactly "same leading token" — and
  *    needs no asset at any scale.
  *
  * Driver-side math over column NAMES (a handful of strings) — nothing
  * here touches the data plane.
  */
object SemClusters {

  /** gensim's STOPWORDS is large; the column-name-relevant core. */
  private val Stopwords = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "in", "is", "it", "its", "of", "on", "or", "per", "that", "the", "to",
    "was", "were", "will", "with")

  /** preprocess_string mirror (utils.py:165-174): lowercase → strip
    * non-alphanumeric → split alphanum runs → drop numeric tokens →
    * drop stopwords. */
  private[profiler] def tokens(name: String): Seq[String] =
    name.toLowerCase
      .replaceAll("[^a-z0-9]+", " ")
      .replaceAll("(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])", " ")
      .split(" ").toSeq
      .filter(t => t.nonEmpty && !t.forall(_.isDigit) && !Stopwords.contains(t))

  /** First-token key, 'TOKEN' when nothing survives (utils.py:183-184). */
  private[profiler] def firstToken(name: String): String =
    tokens(name).headOption.getOrElse("TOKEN")

  /** Deterministic 16-d unit vector for a token (splitmix64 stream
    * seeded by the token's FNV-1a hash). */
  private[profiler] def hashedVector(token: String, dim: Int = 16): Array[Double] = {
    var h = 0xcbf29ce484222325L
    token.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
    var state = h
    def next(): Double = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // uniform in [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val v = Array.fill(dim)(next())
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else { v(0) = 1.0; v }
  }

  /** Load a word2vec text-format file into a vocabulary map. */
  private[profiler] def loadEmbedding(path: String): Map[String, Array[Double]] = {
    val src = scala.io.Source.fromFile(path)
    try {
      src.getLines().flatMap { line =>
        val parts = line.trim.split("\\s+")
        // skip the optional "count dim" header line
        if (parts.length < 3) None
        else scala.util.Try(
          parts.head -> parts.tail.map(_.toDouble)).toOption
      }.toMap
    } finally src.close()
  }

  /** Cluster column names; returns clusters of size ≥ 2 in discovery
    * order (label order, like the reference's cid loop). */
  def cluster(names: Seq[String], embeddingPath: Option[String]): Seq[Seq[String]] = {
    if (names.isEmpty) return Nil
    val vocab = embeddingPath.map(loadEmbedding).getOrElse(Map.empty)
    // the hashed fallback must match the loaded vocabulary's dimension:
    // a well-formed embedding file merely lacking a literal 'TOKEN' row
    // would otherwise mix (say) 300-d in-vocab vectors with 16-d OOV
    // fallbacks and abort the whole profile call at the dim check below
    val fallbackDim = vocab.headOption.map(_._2.length).getOrElse(16)
    def vectorOf(name: String): Array[Double] = {
      val t = firstToken(name)
      vocab.get(t)
        .orElse(vocab.get("TOKEN"))
        .getOrElse(hashedVector(t, fallbackDim))
    }
    val vs = names.map(vectorOf).toArray
    // after the dim-matched fallback, mixed dims can only happen with a
    // malformed embedding file (rows of differing widths); the
    // euclidean metric needs one dim — fail loudly rather than guess
    require(vs.map(_.length).distinct.length == 1,
      "semantic embedding file has inconsistent vector dimensions")
    def dist(i: Int, j: Int): Double =
      math.sqrt(vs(i).zip(vs(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
    val labels = DBSCAN.fit(names.length, dist, eps = 0.5, minPts = 5)
    labels.zipWithIndex.filter(_._1 >= 0).groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(p => names(p._2)).toSeq)
      .filter(_.size >= 2)
  }
}
