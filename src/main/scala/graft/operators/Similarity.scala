package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set, score every corpus row, per-query window top-k. Exact, scales
  * linearly in corpus size, embarrassingly parallel: the right answer
  * up to surprisingly large corpora because it's one scan, no shuffle
  * of the corpus itself.
  *
  * Scale path: random-hyperplane LSH (Charikar) — b bands of r sign
  * bits; candidate = band-bucket equality; exact cosine re-rank of
  * candidates only. Planes are seeded-deterministic literals, so the
  * whole thing stays a Column expression tree (codegen, no UDF).
  */
object Similarity {

  /** Elementwise-double dot product of two array columns (left-fold in
    * array order — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass tight-loop kernel, value-identical to
    * `dot(a,b) / (l2Norm(a) * l2Norm(b))` except on zero-norm inputs,
    * which score 0.0 instead of NaN (NaN ordering is engine-specific
    * and Spark ranks it above every real neighbor) — see
    * [[graft.functions.CosineSim]] for why the HOF spelling is ~50×
    * slower on pairwise joins (interpreted lambda folds). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim.cosine(a, b)

  /** Exact brute-force cosine top-k.
    *
    * The per-query window is NOT an nq-reducer corpus funnel: the
    * row_number + `rank <= k` pattern triggers Spark's
    * WindowGroupLimit rewrite, which plans a Partial group-limit
    * upstream of the exchange — each map task emits at most k rows per
    * query, so the shuffle carries partitions×k rows per query, never
    * the corpus (PlanShapeSpec pins the Partial node for the PQ twin
    * of this shape).
    *
    * @param corpus  (idCol, vecCol) corpus rows
    * @param queries (idCol, vecCol) query rows — must be small (broadcast)
    * @return (query_id, neighbor_id, cosine, rank) with rank 1..k,
    *         ties broken by neighbor id for determinism
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Driver-side probe selection shared by [[ivfTopK]] and
    * [[ivfPqTopK]]: for each collected query row (columns `query_id`,
    * `__qv`), the `nprobe` nearest centroids by squared L2, ties
    * broken by `sortBy`'s stability (centroid declaration order) —
    * the ONE spelling of the selection both ANN paths and their
    * oracles must agree on. Returns (row, qv-as-doubles, list index)
    * triples; callers attach their own payload. Accepts float or
    * double embedding arrays. */
  private def probeTriples(qRows: Array[org.apache.spark.sql.Row],
                           centers: Array[Array[Double]],
                           dim: Int, nprobe: Int)
      : Seq[(org.apache.spark.sql.Row, Array[Double], Int)] =
    qRows.toIndexedSeq.flatMap { r =>
      val qv = r.getAs[scala.collection.Seq[Any]]("__qv")
        .map(_.asInstanceOf[Number].doubleValue()).toArray
      centers.zipWithIndex.map { case (ctr, i) =>
        var d = 0.0; var j = 0
        while (j < dim) { val diff = qv(j) - ctr(j); d += diff * diff; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nprobe).map { case (list, _) => (r, qv, list) }
    }

  /** Deterministic ±1 hyperplanes for `nbits` sign bits over `dim`
    * dimensions: sign(p,d) = parity of the first hex digit of
    * md5("plane:seed:p:d"). md5 (vs a JVM PRNG) makes the planes
    * recomputable in any SQL engine, so LSH bucketing is value-exact
    * against the oracle. Driver-side only — the planes become plan
    * literals, zero per-row cost. */
  private def planes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nbits) { p =>
      Array.tabulate(dim) { d =>
        md.reset()
        val h = md.digest(s"plane:$seed:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Append band-bucket sign signatures: `bands` columns named
    * band_0..band_{bands-1}, each an r-bit integer of hyperplane signs. */
  def withLshBands(df: DataFrame, vecCol: String, dim: Int,
                   bands: Int = 4, rowsPerBand: Int = 8,
                   seed: Long = 20220901L): DataFrame = {
    val ps = planes(dim, bands * rowsPerBand, seed)
    val bits = ps.map { p =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(col(vecCol), planeLit) >= 0, 1L).otherwise(0L)
    }
    (0 until bands).foldLeft(df) { (d, b) =>
      val bandVal = (0 until rowsPerBand).map { r =>
        bits(b * rowsPerBand + r) * lit(1L << r)
      }.reduce(_ + _)
      d.withColumn(s"band_$b", bandVal)
    }
  }

  /** Explode band columns to (…, band, bucket) rows — one equi-join on
    * (band, bucket) replaces a union of per-band joins, so the sign-bit
    * computation is evaluated once per side. */
  private[graft] def explodeBands(df: DataFrame, bands: Int): DataFrame = {
    val arr = array((0 until bands).map { b =>
      struct(lit(b).as("band"), col(s"band_$b").as("bucket"))
    }: _*)
    df.select(df.columns.filterNot(_.startsWith("band_")).map(col).toIndexedSeq
      :+ explode(arr).as("__bb"): _*)
      .withColumn("band", col("__bb.band"))
      .withColumn("bucket", col("__bb.bucket"))
      .drop("__bb")
  }

  /** Query-side band explosion with MULTIPROBE: per band, probe the
    * exact bucket plus every bucket at Hamming distance 1 (flip each
    * of the r sign bits). A near neighbor that lands one hyperplane
    * sign away in every band — the typical near-miss for vectors close
    * to a plane — is still reached, so recall rises without touching
    * the corpus side or adding bands. Probe rows per query:
    * bands × (1 + rowsPerBand); the query set is broadcast-small by
    * contract, so the extra rows cost nothing at corpus scale
    * (Lv et al., "Multi-Probe LSH", VLDB 2007 — the 1-step perturbation
    * set specialized to sign-bit buckets). */
  private[graft] def explodeBandsMultiprobe(df: DataFrame, bands: Int,
                                            rowsPerBand: Int): DataFrame = {
    val arr = array((for {
      b <- 0 until bands
      probe <- -1 until rowsPerBand
    } yield {
      val bucket = if (probe < 0) col(s"band_$b")
                   else col(s"band_$b").bitwiseXOR(lit(1L << probe))
      struct(lit(b).as("band"), bucket.as("bucket"))
    }): _*)
    df.select(df.columns.filterNot(_.startsWith("band_")).map(col).toIndexedSeq
      :+ explode(arr).as("__bb"): _*)
      .withColumn("band", col("__bb.band"))
      .withColumn("bucket", col("__bb.bucket"))
      .drop("__bb")
  }

  /** Candidate (query_id, neighbor_id) pairs sharing a band bucket —
    * the probe stage of [[lshTopK]], exposed for recall analysis.
    * Returned frame is persisted (CacheScope-tracked). */
  private[graft] def lshCandidates(corpus: DataFrame, queries: DataFrame,
                                       idCol: String, vecCol: String, dim: Int,
                                       bands: Int, rowsPerBand: Int,
                                       multiprobe: Boolean): DataFrame = {
    val cQ = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = explodeBands(withLshBands(cQ, "__cv", dim, bands, rowsPerBand), bands)
    val qB = withLshBands(qQ, "__qv", dim, bands, rowsPerBand)
    val q = if (multiprobe) explodeBandsMultiprobe(qB, bands, rowsPerBand)
            else explodeBands(qB, bands)
    graft.CacheScope.track(
      c.join(broadcast(q), Seq("band", "bucket"))
        .where(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id"))
  }

  /** LSH-bucketed approximate top-k: candidates share at least one
    * band bucket with the query; exact cosine re-rank of candidates.
    * Recall < 1 by construction; raise bands for higher recall.
    *
    * Recall floor: a query whose buckets yield fewer than k candidates
    * falls back to a brute-force scan for that query alone, so every
    * query always returns exactly k rows (corpus permitting). The
    * fallback costs one extra corpus pass ONLY when it fires, scoped
    * to the lacking queries — the common all-buckets-warm case pays
    * one broadcast count.
    *
    * @param multiprobe also probe every 1-bit-flipped bucket per band
    *        on the QUERY side ([[explodeBandsMultiprobe]]): candidate
    *        sets only grow, so recall never drops and the brute-force
    *        fallback fires less often — the right default for mid-size
    *        corpora where the fallback's extra scan is the cost center */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              bands: Int = 4, rowsPerBand: Int = 8,
              multiprobe: Boolean = false): DataFrame = {
    val cQ = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    // the candidate set feeds both the per-query count (recall floor)
    // and the final rank — persisted inside lshCandidates so the band
    // join runs once
    val candidates = lshCandidates(corpus, queries, idCol, vecCol, dim,
      bands, rowsPerBand, multiprobe)
    val lacking = qQ.join(
        candidates.groupBy("query_id").agg(count(lit(1)).as("__nc")),
        Seq("query_id"), "left")
      .where(coalesce(col("__nc"), lit(0L)) < k)
      .select("query_id", "__qv")
    val scored = candidates.select("query_id", "neighbor_id", "__qv", "__cv")
      .join(broadcast(lacking.select("query_id")), Seq("query_id"), "left_anti")
      .unionByName(cQ.crossJoin(broadcast(lacking))
        .where(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Auto-derived IVF list count for an m-vector fit sample: ≈ √m (the
    * classic IVF balance point — per-query probe work m/nlist matches
    * the nlist-term centroid scan at nlist = √m), floored at 2 and
    * capped at 1024 because the centroid assignment is a plan-literal
    * expression whose size grows linearly with nlist (at the 100k
    * fitCap, √m ≈ 316, well inside the cap). */
  private[graft] def autoNlist(m: Int): Int =
    math.min(math.max(2, math.round(math.sqrt(m.toDouble)).toInt), 1024)

  /** IVF (inverted-file) approximate top-k — the centroid-bucket scale
    * path: a KMeans codebook (fit on a bounded seeded sample) assigns
    * every corpus vector to its nearest-centroid list; a query scores
    * only the lists of its `nprobe` nearest centroids, then exact
    * cosine re-ranks. One shuffle to bucket the corpus (reusable
    * across queries), probe cost ∝ nprobe/nlist of the corpus.
    *
    * The query frame is collected driver-side BY CONTRACT (point
    * lookups); a corpus-scale query frame belongs on
    * [[ivfTopKDistributed]], which keeps both sides distributed and is
    * value-identical.
    *
    * @param nlist list count; 0 (the default) derives [[autoNlist]]
    *              (≈ √fit-sample-size) — pass an explicit value to pin
    *              results across corpus growth (the gate query pins 16
    *              so its DuckDB replay stays in lockstep) */
  /** Fit the deterministic codebook: driver Lloyd on a bounded seeded
    * sample (same fit strategy as CoreT.kmeans: top-fitCap by seeded
    * md5 digest, collected and initialized in digest order —
    * replayable by any SQL engine, so results are value-exact against
    * the oracle). 10 Lloyd rounds: a codebook doesn't need full
    * convergence. */
  /** The bounded seeded fit sample shared by every codebook fit here:
    * top-fitCap corpus vectors by md5(id:seed) digest, in digest order
    * — replayable by any SQL engine (`list(v ORDER BY md5(id||':'||seed))`),
    * so every fit stays value-exact against the oracle. */
  private def collectFitSample(c: DataFrame, seed: Long): Array[Array[Double]] = {
    val fitCap = 100000
    val fitRows = c
      .select(md5(concat_ws(":", col("neighbor_id"), lit(seed))).as("__h"), col("__cv"))
      .orderBy(col("__h")).limit(fitCap)
      .collect().sortBy(_.getString(0))
    fitRows.map(
      _.getAs[scala.collection.Seq[Float]]("__cv").map(_.toDouble).toArray)
  }

  private def fitFromSample(pts: Array[Array[Double]], nlist: Int): Array[Array[Double]] = {
    // nlist = 0 → derive from the fit sample actually collected (≈ √m,
    // see autoNlist) — the sample is what the codebook can resolve
    val effNlist = if (nlist > 0) nlist else autoNlist(pts.length)
    CoreT.lloyd(pts, math.min(effNlist, math.max(2, pts.length)), maxIter = 10)
  }

  private def fitCodebook(c: DataFrame, nlist: Int, seed: Long): Array[Array[Double]] =
    fitFromSample(collectFitSample(c, seed), nlist)

  /** A FITTED, reusable IVF codebook — the amortization handle for the
    * ANN family's one driver-side constant: the bounded-sample Lloyd
    * fit is corpus-size-independent but costs ~28 s at the 100k fit
    * cap (KnnGraphProbe, BASELINE.md round 13), and every operator
    * call used to pay it again. Fit ONCE per (corpus, nlist, seed)
    * via [[Similarity.fitIvfCodebook]] and pass the handle to the
    * `*With` variants ([[Similarity.ivfTopKWith]],
    * [[Similarity.ivfTopKDistributedWith]],
    * [[Similarity.knnGraphWith]], [[Similarity.bitextMineForwardWith]],
    * [[Similarity.ivfPqTopKWith]], [[Similarity.clusterEmbeddingsWith]],
    * [[Similarity.bitextMineMutualWith]],
    * [[Similarity.semanticDedupPairsWith]]) — an IVF-top-k + kNN-graph +
    * bitext session over one corpus then pays the fit once instead of
    * four times. Results are BIT-IDENTICAL to the fit-inside variants:
    * the handle stores exactly the centers (and the digest-ordered fit
    * sample, for PQ residual sub-fits) those variants derive
    * internally, so the gate oracles replay unchanged.
    *
    * Driver footprint: nlist·dim center doubles plus the ≤100k-row fit
    * sample (~50 MB at dim 64) — bounded by the fit cap, never by the
    * corpus. */
  final class Codebook private[operators] (
      val centers: Array[Array[Double]], val dim: Int,
      private[operators] val sample: Array[Array[Double]]) {
    def nlist: Int = centers.length
  }

  /** Fit the deterministic IVF codebook once and return the reusable
    * handle — the same bounded digest-sample Lloyd every fit-inside
    * operator runs ([[fitCodebook]]), so `xWith(fitIvfCodebook(c, …))`
    * ≡ `x(c, …)` value-exactly. */
  def fitIvfCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nlist: Int = 0, seed: Long = 9): Codebook = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sample = collectFitSample(c, seed)
    val centers = fitFromSample(sample, nlist)
    require(centers.forall(_.length == dim),
      s"fitted centroid dimension ${centers.headOption.map(_.length)} != declared dim $dim")
    new Codebook(centers, dim, sample)
  }

  /** THE row-local probe selection — top-`np` (dist, list idx) pairs
    * per row over a precomputed `__dists` array column, ties broken by
    * list idx (natural struct order = [[probeTriples]]' stable sortBy):
    * the ONE spelling every distributed probe side shares with the
    * driver path and the DuckDB oracles' `ORDER BY d, cidx`. Factored
    * (r15 self-review) because four verbatim copies of a value-identity
    * contract is how one of them silently drifts. */
  private def probeListsExpr(np: Int): Column =
    explode(expr(
      s"transform(slice(array_sort(transform(__dists, (d, i) -> struct(d, i))), 1, $np), x -> x.i)"))

  /** THE first-min argmin list assignment over `__dists` (INT list id,
    * 0 on a null distance array) — the corpus-bucketing spelling every
    * IVF consumer shares. */
  private def argminList: Column =
    coalesce((array_position(col("__dists"), array_min(col("__dists"))) - 1)
      .cast("int"), lit(0))

  /** Per-vector squared distance to every center, as one array column —
    * argmin via array_position(min). A single tight-loop expression
    * ([[graft.functions.CentroidDists]]): the k·d-term Column spelling
    * generated JIT-hostile thousand-node code that cost ~5 s of pure
    * interpretation on a 2000-row scan (EmbedClusterProbe). */
  private def centerDistArr(centers: Array[Array[Double]], dim: Int) = {
    require(centers.forall(_.length == dim),
      s"codebook dimension ${centers.head.length} != declared dim $dim")
    graft.functions.CentroidDists.dists(col("__cv"), centers)
  }

  /** Corpus semantic clustering — the SemDeDup/coreset-curation
    * primitive (Abbas et al. 2023): every embedding assigned to its
    * nearest codebook centroid. Returns
    * `(idCol, cluster_id, dist2)` — `dist2` the squared distance to
    * the winning centroid, for picking per-cluster representatives or
    * pruning outliers.
    *
    * Scale shape, identical to [[ivfTopK]]'s bucketing stage (this IS
    * that stage, first-class): the fit collects a bounded digest
    * sample; the assignment is a pure expression scan — zero shuffles,
    * whole-stage codegen, nothing driver-side grows with the corpus.
    */
  def clusterEmbeddings(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nlist: Int = 0, seed: Long = 9,
                        refineIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    // refineIters > 0 upgrades the sample-fit codebook with full-corpus
    // Lloyd passes ([[refineCodebook]]) before the assignment scan
    val centers = if (refineIters > 0) refinedCenters(c, dim, nlist, refineIters, seed)
                  else fitCodebook(c, nlist, seed)
    clusterEmbeddingsImpl(corpus, idCol, vecCol, dim, centers)
  }

  /** [[clusterEmbeddings]] against a pre-fitted [[Codebook]] — pure
    * expression scan, zero driver work beyond the plan literals. */
  def clusterEmbeddingsWith(corpus: DataFrame, idCol: String, vecCol: String,
                            codebook: Codebook): DataFrame =
    clusterEmbeddingsImpl(corpus, idCol, vecCol, codebook.dim, codebook.centers)

  private def clusterEmbeddingsImpl(corpus: DataFrame, idCol: String,
                                    vecCol: String, dim: Int,
                                    centers: Array[Array[Double]]): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    c.withColumn("__dists", centerDistArr(centers, dim))
      .select(col("neighbor_id").as(idCol),
        coalesce((array_position(col("__dists"), array_min(col("__dists"))) - 1),
          lit(0L)).cast("long").as("cluster_id"),
        array_min(col("__dists")).as("dist2"))
  }

  /** SemDeDup proper (Abbas et al. 2023 §3): near-duplicate candidate
    * pairs by cosine ≥ `tau` WITHIN each semantic cluster — the
    * codebook bucketing replaces LSH bands as the blocking key, so
    * paraphrases that share no hyperplane bucket but sit in the same
    * semantic region still pair up. Returns `(id_a, id_b, cosine)`;
    * feed into [[Dedup.nearDupSurvivors]] for the keep set.
    *
    * Scale shape: the cluster assignment is the [[clusterEmbeddings]]
    * expression scan (zero shuffle); the self-join is equi-keyed on
    * cluster id, and clusters are size-bounded by construction
    * (≈ m/nlist, with `maxClusterSize` as the loud skew guard — a
    * degenerate codebook concentrating the corpus into one cluster
    * would otherwise go quadratic, the same failure mode
    * [[Dedup.capBuckets]] guards in LSH). Each pair meets in exactly
    * one cluster, so no pair-dedup pass is needed. The assigned frame
    * persists once for both join sides.
    */
  def semanticDedupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, tau: Double, nlist: Int = 0, seed: Long = 9,
                         maxClusterSize: Long = 100000L): DataFrame = {
    // cheap argument reject BEFORE the driver fit
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine in [-1,1], got $tau")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    semanticDedupPairsImpl(corpus, idCol, vecCol, dim,
      fitCodebook(c, nlist, seed), tau, maxClusterSize)
  }

  /** [[semanticDedupPairs]] against a pre-fitted [[Codebook]] — a
    * session that already clustered or IVF-indexed the corpus dedups
    * it without re-paying the fit (same handle contract as the other
    * `*With` variants: bit-identical to fit-inside). */
  def semanticDedupPairsWith(corpus: DataFrame, idCol: String, vecCol: String,
                             tau: Double, codebook: Codebook,
                             maxClusterSize: Long = 100000L): DataFrame =
    semanticDedupPairsImpl(corpus, idCol, vecCol, codebook.dim,
      codebook.centers, tau, maxClusterSize)

  private def semanticDedupPairsImpl(corpus: DataFrame, idCol: String,
                                     vecCol: String, dim: Int,
                                     centers: Array[Array[Double]],
                                     tau: Double,
                                     maxClusterSize: Long): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine in [-1,1], got $tau")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val assigned = graft.CacheScope.track(Dedup.capBuckets(
      c.withColumn("__dists", centerDistArr(centers, dim))
        .select(col("neighbor_id").as("id"), col("__cv"),
          coalesce((array_position(col("__dists"), array_min(col("__dists"))) - 1),
            lit(0L)).cast("long").as("__cl")),
      Seq("__cl"), maxClusterSize))
    assigned.as("a").join(assigned.as("b"),
        col("a.__cl") === col("b.__cl") && col("a.id") < col("b.id"))
      .withColumn("cosine", cosine(col("a.__cv"), col("b.__cv")))
      .where(col("cosine") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              nlist: Int = 0, nprobe: Int = 4, seed: Long = 9,
              refineIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val centers = if (refineIters > 0) refinedCenters(c, dim, nlist, refineIters, seed)
                  else fitCodebook(c, nlist, seed)
    ivfTopKImpl(corpus, queries, idCol, vecCol, k, dim, centers, nprobe)
  }

  /** [[ivfTopK]] against a pre-fitted [[Codebook]] — skips the per-call
    * driver fit; value-identical when the handle was fit on the same
    * (corpus, nlist, seed). */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  codebook: Codebook, nprobe: Int = 4): DataFrame =
    ivfTopKImpl(corpus, queries, idCol, vecCol, k, codebook.dim,
      codebook.centers, nprobe)

  private def ivfTopKImpl(corpus: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, k: Int, dim: Int,
                          centers: Array[Array[Double]], nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val bucketed = c
      .withColumn("__dists", centerDistArr(centers, dim))
      .withColumn("__list",
        argminList)
      .drop("__dists")

    // queries (small, driver-side): nprobe nearest centroids each
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")).collect()
    val probes = probeTriples(qRows, centers, dim, nprobe).map {
      case (r, _, list) =>
        (r.getAs[Any]("query_id"), r.getAs[scala.collection.Seq[Any]]("__qv"), list)
    }
    import spark.implicits._
    val probeDF = spark.createDataFrame(
      spark.sparkContext.parallelize(probes.map(p =>
        org.apache.spark.sql.Row(p._1, p._2, p._3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          queries.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("__qv",
          queries.schema(vecCol).dataType),
        org.apache.spark.sql.types.StructField("__list",
          org.apache.spark.sql.types.IntegerType))))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    bucketed.join(broadcast(probeDF), Seq("__list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** [[ivfTopK]] with BOTH sides distributed — the corpus-scale query
    * path. [[ivfTopK]]'s contract collects the query frame to the
    * driver and broadcasts the probe rows, which is right for point
    * lookups but a funnel when the query side is itself a corpus
    * ("top-k corpus neighbors for 10 M queries"). Here probe selection
    * runs as a row-local expression ON the query frame — one
    * [[graft.functions.CentroidDists]] scan + array_sort slice, the
    * same (dist, list idx) order as the driver path's [[probeTriples]]
    * with the identical ascending-feature fold, so results are
    * VALUE-IDENTICAL to [[ivfTopK]] on the same (corpus, nlist, seed)
    * (spec-pinned) and the gate oracle is the same replay with the
    * query predicate widened. The two sides meet in a plain list-keyed
    * equi-join with the strategy left to AQE — at corpus scale a
    * co-partitioned shuffle join on ≈√m keys, never a collect or a
    * forced broadcast; per-query top-k stays map-side bounded
    * (row_number + `rank <= k` → WindowGroupLimit). Hot-list skew
    * guard as in [[knnGraph]]: lists over `maxListSize` are SILENTLY
    * dropped by [[Dedup.capBuckets]] (a degenerate codebook
    * concentrating the corpus in one list would otherwise make the
    * join quadratic in it) — the ONE documented deviation from the
    * uncapped driver path: value-identity holds whenever no list
    * exceeds the cap (always at gate scale; pass `Long.MaxValue` to
    * pin it unconditionally). Self-pairs are excluded, like
    * [[ivfTopK]] — queries drawn from the corpus don't report
    * themselves. */
  def ivfTopKDistributed(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int, dim: Int,
                         nlist: Int = 0, nprobe: Int = 4, seed: Long = 9,
                         maxListSize: Long = 100000L): DataFrame = {
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    ivfTopKDistributedImpl(corpus, queries, idCol, vecCol, k, dim,
      fitCodebook(c, nlist, seed), nprobe, maxListSize)
  }

  /** [[ivfTopKDistributed]] against a pre-fitted [[Codebook]] (fit on
    * the corpus side) — the amortized form an IVF session over one
    * corpus should use. */
  def ivfTopKDistributedWith(corpus: DataFrame, queries: DataFrame,
                             idCol: String, vecCol: String, k: Int,
                             codebook: Codebook, nprobe: Int = 4,
                             maxListSize: Long = 100000L): DataFrame =
    ivfTopKDistributedImpl(corpus, queries, idCol, vecCol, k, codebook.dim,
      codebook.centers, nprobe, maxListSize)

  private def ivfTopKDistributedImpl(corpus: DataFrame, queries: DataFrame,
                                     idCol: String, vecCol: String, k: Int,
                                     dim: Int, centers: Array[Array[Double]],
                                     nprobe: Int, maxListSize: Long): DataFrame = {
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val np = math.min(nprobe, centers.length)
    val bucketed = Dedup.capBuckets(
      c.withColumn("__dists", centerDistArr(centers, dim))
        .select(col("neighbor_id"), col("__cv"),
          argminList.as("__list")),
      Seq("__list"), maxListSize)
    // top-nprobe (dist, idx) per query, ROW-LOCAL — the knnGraph probe
    // spelling (natural struct order = dist asc, then list idx asc,
    // matching probeTriples' stable sortBy)
    val probes = q
      .withColumn("__dists",
        graft.functions.CentroidDists.dists(col("__qv"), centers))
      .select(col("query_id"), col("__qv"),
        probeListsExpr(np)
          .as("__list"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(bucketed, Seq("__list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Approximate kNN-GRAPH construction — every corpus vector's top-k
    * neighbors in one job (the all-pairs sibling of [[ivfTopK]]; the
    * primitive under kNN-graph dedup/clustering, SemDeDup's
    * "semantic graph", and embedding-space diversity sampling).
    *
    * [[ivfTopK]]'s shape deliberately does NOT fit here: its query
    * side is collected driver-side and broadcast (contract-small by
    * design), but a graph's query side IS the corpus — collecting or
    * broadcasting it is exactly the scale bug the r10 verdict hunted.
    * So this operator keeps both sides distributed: one
    * [[CentroidDists]] expression scan computes every vector's
    * centroid distances; the corpus side takes its argmin list (the
    * IVF assignment), the probe side takes its `nprobe` closest lists
    * (array_sort over the per-row (dist, idx) structs — row-local, no
    * shuffle), and the two meet in a plain equi-JOIN on the list id
    * with the strategy left to AQE — at corpus scale that is a
    * co-partitioned shuffle join on ≈√m keys, never a broadcast.
    *
    * Scale shape: candidate volume ≈ m·nprobe·(m/nlist) pairs, tuned
    * by nlist (autoNlist ≈ √m keeps per-list size ≈ √m). Measured
    * (KnnGraphProbe, BASELINE.md round 13): the driver Lloyd fit at
    * the 100k fit-sample cap is a ~28 s CONSTANT term independent of
    * m, while the distributed join term costs ~54M exact cosines/s on
    * 32 cores — the term that grows with the corpus is the
    * distributed one, as intended. The scan
    * frame persists once (MEMORY_AND_DISK — both join sides consume
    * it, and re-deriving it would re-run the centroid scan per side);
    * the per-query top-k windows are map-side bounded (row_number +
    * `rank <= k` triggers the WindowGroupLimit rewrite, so each map
    * task pre-trims to k rows per query). A degenerate codebook
    * concentrating the corpus into one list would go quadratic — the
    * same failure mode as LSH hot buckets — so over-cap lists are
    * SILENTLY dropped by [[Dedup.capBuckets]] (`maxListSize`, never
    * hit at gate scale and not modeled by the oracle; pass
    * `Long.MaxValue` to disable the guard).
    *
    * Every vector probes its own assignment list first (its argmin is
    * its closest centroid), so each vector always sees its own-cluster
    * candidates; a (query, neighbor) pair meets in at most ONE list
    * (the neighbor's single assignment), so no pair-dedup pass exists.
    * Exactness contract (gate): the fit is the shared deterministic
    * digest-sample Lloyd, probe selection orders (dist, list idx) —
    * both replayed term-for-term by the DuckDB oracle
    * (ExtQueries.knnGraphOracle). */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, dim: Int, nlist: Int = 0, nprobe: Int = 4,
               seed: Long = 9, maxListSize: Long = 100000L): DataFrame = {
    require(k > 0 && nprobe > 0, s"k and nprobe must be positive")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    knnGraphImpl(corpus, idCol, vecCol, k, dim, fitCodebook(c, nlist, seed),
      nprobe, maxListSize)
  }

  /** [[knnGraph]] against a pre-fitted [[Codebook]] — the graph over a
    * corpus whose IVF fit another operator already paid for. */
  def knnGraphWith(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, codebook: Codebook, nprobe: Int = 4,
                   maxListSize: Long = 100000L): DataFrame =
    knnGraphImpl(corpus, idCol, vecCol, k, codebook.dim, codebook.centers,
      nprobe, maxListSize)

  private def knnGraphImpl(corpus: DataFrame, idCol: String, vecCol: String,
                           k: Int, dim: Int, centers: Array[Array[Double]],
                           nprobe: Int, maxListSize: Long): DataFrame = {
    require(k > 0 && nprobe > 0, s"k and nprobe must be positive")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val effNlist = centers.length
    val np = math.min(nprobe, effNlist)
    val withD = graft.CacheScope.track(
      c.withColumn("__dists", centerDistArr(centers, dim)))
    val bucketed = Dedup.capBuckets(
      withD.select(col("neighbor_id"), col("__cv"),
        argminList.as("__list")),
      Seq("__list"), maxListSize)
    // top-nprobe (dist, idx) per row, ROW-LOCAL: sort the zipped
    // structs (natural struct order = dist asc, then list idx asc —
    // the oracle's ORDER BY d, cidx), slice, project the idx
    val probes = withD.select(col("neighbor_id").as("query_id"),
        col("__cv").as("__qv"),
        probeListsExpr(np)
          .as("__list"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(bucketed, Seq("__list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Margin-based bitext mining, FORWARD strategy (Artetxe & Schwenk
    * 2019; the LASER/CCMatrix parallel-corpus discovery primitive):
    * each query-side document's best corpus-side match, accepted iff
    * its cosine stands out from the query's k-NN neighborhood —
    * `margin = cos(x, y₁) / mean(cos(x, yᵢ), i ≤ k)`. Absolute-cosine
    * thresholds fail under hubness (dense regions make everything
    * "similar"); the ratio margin is the standard fix. Forward-only is
    * the pinned variant (the bidirectional max-margin needs the
    * reverse neighborhood too — compose two forward passes and join
    * when that's wanted).
    *
    * Scale shape = [[knnGraph]]'s cross-corpus sibling, BOTH sides
    * distributed: codebook fit on the corpus side's bounded digest
    * sample; corpus bucketed by argmin list ([[Dedup.capBuckets]] hot
    * guard); queries probe their `nprobe` closest lists row-locally;
    * one list-keyed equi-join; per-query top-k via the WindowGroupLimit
    * rewrite. The margin reduce folds each query's ≤k cosines in RANK
    * order (sort_array over (rank, …) structs + a left-fold aggregate)
    * — a deterministic summation order both engines replay exactly,
    * like the dot-product oracle's list_reduce. No self-exclusion: the
    * two sides are distinct corpora by contract.
    *
    * Two deliberate deviations from the paper, documented: (1) the
    * denominator is the QUERY-side k-NN neighborhood mean only —
    * Artetxe & Schwenk average both sides' neighborhoods; the one-sided
    * form needs no reverse-direction pass and preserves the margin ≥ 1
    * invariant the tau gate relies on ([[bitextMineTwoSided]] is the
    * paper-faithful two-sided form, and [[bitextMineMutual]] the
    * mutual-best acceptance). (2) That invariant assumes a
    * POSITIVE neighborhood mean cosine (true for real embedding hubs;
    * false for adversarially anti-correlated spaces) — a non-positive
    * mean raises loudly at execution rather than silently flipping the
    * ratio's sign. The guard is DELIBERATELY pre-τ (spec-pinned): it
    * fires even for queries the τ cut would have discarded, because a
    * non-positive neighborhood mean is corrupt-input evidence
    * regardless of whether that query's match would have been
    * accepted — a corpus that trips it should fail the run, not
    * silently shed queries.
    *
    * @return (query_id, match_id, cosine, margin) for queries whose
    *         best match clears `tau` (margin ≥ 1 by construction, so
    *         tau ≤ 1 accepts every query that has candidates) */
  def bitextMineForward(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int, dim: Int,
                        nlist: Int = 0, nprobe: Int = 4, tau: Double = 1.0,
                        seed: Long = 9, maxListSize: Long = 100000L): DataFrame = {
    // cheap argument rejects BEFORE the multi-second driver fit
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    require(tau >= 1.0, s"margin is >= 1 by construction; tau $tau would be vacuous")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    bitextMineForwardImpl(queries, corpus, idCol, vecCol, k, dim,
      fitCodebook(c, nlist, seed), nprobe, tau, maxListSize)
  }

  /** [[bitextMineForward]] against a pre-fitted [[Codebook]] — the
    * handle must have been fit on the CORPUS side (the side that gets
    * bucketed). */
  def bitextMineForwardWith(queries: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String, k: Int,
                            corpusCodebook: Codebook, nprobe: Int = 4,
                            tau: Double = 1.0,
                            maxListSize: Long = 100000L): DataFrame =
    bitextMineForwardImpl(queries, corpus, idCol, vecCol, k,
      corpusCodebook.dim, corpusCodebook.centers, nprobe, tau, maxListSize)

  private def bitextMineForwardImpl(queries: DataFrame, corpus: DataFrame,
                                    idCol: String, vecCol: String, k: Int,
                                    dim: Int, centers: Array[Array[Double]],
                                    nprobe: Int, tau: Double,
                                    maxListSize: Long): DataFrame = {
    require(tau >= 1.0, s"margin is >= 1 by construction; tau $tau would be vacuous")
    forwardNeighborhood(queries, corpus, idCol, vecCol, k, dim, centers,
        nprobe, maxListSize)
      .select(col("query_id"), col("match_id"), col("cosine"),
        when(col("mean_cos") <= 0.0, raise_error(concat(
            lit("bitextMineForward: non-positive neighborhood mean cosine for query "),
            col("query_id").cast("string"),
            lit(" — the ratio margin is undefined outside the positive-cosine regime")))
            .cast("double"))
          .otherwise(col("cosine") / col("mean_cos"))
          .as("margin"))
      .where(col("margin") >= lit(tau))
  }

  /** The shared probe → list-join → top-k → rank-ordered fold stage of
    * the bitext miners: per query, its best corpus match plus its k-NN
    * neighborhood mean cosine — `(query_id, match_id, cosine,
    * mean_cos)`. The one-sided margin divides by `mean_cos` directly
    * ([[bitextMineForward]]); the two-sided margin averages both
    * sides' means ([[bitextMineTwoSided]]). */
  private def forwardNeighborhood(queries: DataFrame, corpus: DataFrame,
                                  idCol: String, vecCol: String, k: Int,
                                  dim: Int, centers: Array[Array[Double]],
                                  nprobe: Int, maxListSize: Long): DataFrame = {
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val np = math.min(nprobe, centers.length)
    val bucketed = Dedup.capBuckets(
      c.withColumn("__dists", centerDistArr(centers, dim))
        .select(col("neighbor_id"), col("__cv"),
          argminList.as("__list")),
      Seq("__list"), maxListSize)
    val probes = q
      .withColumn("__dists",
        graft.functions.CentroidDists.dists(col("__qv"), centers))
      .select(col("query_id"), col("__qv"),
        probeListsExpr(np)
          .as("__list"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val topk = probes.join(bucketed, Seq("__list"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    val meanCos = aggregate(
      transform(col("__nn"), x => x.getField("cosine")),
      lit(0.0), (a, v) => a + v) / size(col("__nn")).cast("double")
    topk.groupBy(col("query_id"))
      .agg(sort_array(collect_list(
        struct(col("rank"), col("neighbor_id"), col("cosine")))).as("__nn"))
      .select(col("query_id"),
        col("__nn").getItem(0).getField("neighbor_id").as("match_id"),
        col("__nn").getItem(0).getField("cosine").as("cosine"),
        meanCos.as("mean_cos"))
  }

  /** MUTUAL bitext mining — the CCMatrix-grade acceptance on top of
    * [[bitextMineForward]]: a pair survives iff each side is the
    * OTHER's best match AND both forward margins clear `tau`
    * (mutual-best intersection kills the asymmetric false positives
    * the forward pass alone admits — a hub y can be many x's best
    * while y's own best is elsewhere). Pure composition of the
    * gate-proven forward operator run in both directions (each with
    * its own codebook fit on its corpus side) plus ONE id-pair
    * equi-join of two ≤min(|A|,|B|)-row frames — the join inputs are
    * already one row per query, so nothing here grows past the
    * forward passes themselves. `cosine` is direction-independent
    * bit-exactly (IEEE multiply commutes in both the dot fold and the
    * norm product), so the A→B value is reported.
    *
    * @return (a_id, b_id, cosine, margin_ab, margin_ba) */
  def bitextMineMutual(a: DataFrame, b: DataFrame,
                       idCol: String, vecCol: String, k: Int, dim: Int,
                       nlist: Int = 0, nprobe: Int = 4, tau: Double = 1.0,
                       seed: Long = 9, maxListSize: Long = 100000L): DataFrame = {
    // cheap argument rejects BEFORE the two driver fits
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    require(tau >= 1.0, s"margin is >= 1 by construction; tau $tau would be vacuous")
    bitextMineMutualWith(a, b, idCol, vecCol, k,
      fitIvfCodebook(b, idCol, vecCol, dim, nlist, seed),
      fitIvfCodebook(a, idCol, vecCol, dim, nlist, seed),
      nprobe, tau, maxListSize)
  }

  /** [[bitextMineMutual]] against pre-fitted handles: `codebookOnB`
    * routes the A→B pass (fit on corpus B), `codebookOnA` the B→A pass
    * — a session that already ran per-side IVF/kNN work reuses both
    * fits instead of paying the ~28 s driver constant twice more. */
  def bitextMineMutualWith(a: DataFrame, b: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           codebookOnB: Codebook, codebookOnA: Codebook,
                           nprobe: Int = 4, tau: Double = 1.0,
                           maxListSize: Long = 100000L): DataFrame = {
    val fwd = bitextMineForwardWith(a, b, idCol, vecCol, k, codebookOnB,
        nprobe, tau, maxListSize)
      .select(col("query_id").as("a_id"), col("match_id").as("b_id"),
        col("cosine"), col("margin").as("margin_ab"))
    val rev = bitextMineForwardWith(b, a, idCol, vecCol, k, codebookOnA,
        nprobe, tau, maxListSize)
      .select(col("match_id").as("a_id"), col("query_id").as("b_id"),
        col("margin").as("margin_ba"))
    fwd.join(rev, Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("cosine"),
        col("margin_ab"), col("margin_ba"))
  }

  /** TWO-SIDED margin bitext mining — the PAPER-FAITHFUL Artetxe &
    * Schwenk (2019) ratio, closing [[bitextMineForward]]'s documented
    * one-sided deviation: `margin(x, y) = cos(x, y) /
    * ((mean NN_k(x) + mean NN_k(y)) / 2)` — the denominator averages
    * BOTH sides' k-NN neighborhood means, so a hub y (dense
    * neighborhood in A, high mean) is penalized even when it stands
    * out from x's neighborhood. Unlike the one-sided form, the
    * two-sided margin is NOT ≥ 1 by construction (y's neighborhood can
    * be tighter than cos(x, y)), so `tau` is only required positive
    * and 1.0 is the natural "better than the average neighborhood"
    * cut.
    *
    * Composition: the shared [[forwardNeighborhood]] stage run in both
    * directions — A→B keeps (best match, cosine, mean_q); B→A is used
    * ONLY for its per-y neighborhood mean — joined on the match id.
    * Same both-sides-distributed scale shape as [[bitextMineMutual]]
    * (two list-keyed equi-joins + one id join of one-row-per-query
    * frames); with pre-fitted handles both driver fits amortize away.
    * A non-positive averaged denominator raises loudly, like the
    * one-sided guard.
    *
    * @return (query_id, match_id, cosine, margin) for A-side queries
    *         whose best B-side match clears `tau` */
  def bitextMineTwoSided(a: DataFrame, b: DataFrame,
                         idCol: String, vecCol: String, k: Int, dim: Int,
                         nlist: Int = 0, nprobe: Int = 4, tau: Double = 1.0,
                         seed: Long = 9, maxListSize: Long = 100000L): DataFrame = {
    // cheap argument rejects BEFORE the two driver fits
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    require(tau > 0.0, s"tau must be positive, got $tau")
    bitextMineTwoSidedWith(a, b, idCol, vecCol, k,
      fitIvfCodebook(b, idCol, vecCol, dim, nlist, seed),
      fitIvfCodebook(a, idCol, vecCol, dim, nlist, seed),
      nprobe, tau, maxListSize)
  }

  /** [[bitextMineTwoSided]] against pre-fitted handles (`codebookOnB`
    * routes A→B, `codebookOnA` the reverse neighborhoods). */
  def bitextMineTwoSidedWith(a: DataFrame, b: DataFrame,
                             idCol: String, vecCol: String, k: Int,
                             codebookOnB: Codebook, codebookOnA: Codebook,
                             nprobe: Int = 4, tau: Double = 1.0,
                             maxListSize: Long = 100000L): DataFrame = {
    require(tau > 0.0, s"tau must be positive, got $tau")
    val fwd = forwardNeighborhood(a, b, idCol, vecCol, k, codebookOnB.dim,
      codebookOnB.centers, nprobe, maxListSize)
    val rev = forwardNeighborhood(b, a, idCol, vecCol, k, codebookOnA.dim,
        codebookOnA.centers, nprobe, maxListSize)
      .select(col("query_id").as("__y"), col("mean_cos").as("__mean_c"))
    // inner join: a B-side doc with NO A-side candidates has no
    // neighborhood mean — the paper's margin is undefined there, and
    // such a y can't be anyone's well-attested match anyway
    fwd.join(rev, col("match_id") === col("__y"))
      .select(col("query_id"), col("match_id"), col("cosine"),
        when((col("mean_cos") + col("__mean_c")) / 2.0 <= 0.0,
          raise_error(concat(
            lit("bitextMineTwoSided: non-positive averaged neighborhood mean for query "),
            col("query_id").cast("string"),
            lit(" — the ratio margin is undefined outside the positive-cosine regime")))
            .cast("double"))
          .otherwise(col("cosine") / ((col("mean_cos") + col("__mean_c")) / 2.0))
          .as("margin"))
      .where(col("margin") >= lit(tau))
  }

  /** Product-quantization (PQ) approximate top-k — the
    * compressed-corpus scale path (Jégou, Douze, Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011).
    *
    * The vector space splits into `m` contiguous subspaces of dim/m
    * dimensions; each gets its own `ksub`-centroid KMeans codebook
    * (fit on the same bounded seeded digest sample as [[ivfTopK]] —
    * one driver collect shared by all m fits). Every corpus vector is
    * encoded as m small codes (one nearest-centroid argmin per
    * subspace — a pure expression scan, zero shuffle, and the only
    * thing the scoring scan ever touches again: at dim=64/m=4 the
    * 256-byte float vector becomes 4 ints, a ~16× scan-bandwidth cut;
    * real deployments store the codes as bytes for 64×).
    *
    * Query time is asymmetric distance computation (ADC): each query
    * precomputes a ksub-entry lookup table per subspace (distance from
    * its subvector to every centroid — m·ksub·(dim/m) = dim·ksub work
    * ONCE per query), then every (query, corpus) pair costs just m
    * table lookups + m−1 adds instead of dim multiply-adds. The
    * `candidates` best pairs per query by ADC (ties → neighbor id) are
    * exact-cosine re-ranked to the final top-k — the re-rank joins the
    * tiny candidate set BACK to the corpus for its vectors, so the
    * full-precision vectors never ride through the scoring scan.
    *
    * Scale shape: codebooks and query LUTs are plan literals
    * (broadcast-small by contract); the ADC scan is one pass over the
    * m-int codes; the re-rank is a broadcast join of nq·candidates
    * rows against the corpus. The per-query candidate windows are
    * map-side bounded: row_number + `rn <= candidates` triggers
    * Spark's WindowGroupLimit rewrite, so each map task pre-trims to
    * `candidates` rows per query and the exchange carries
    * partitions×candidates rows per query — never nq·corpus
    * (PlanShapeSpec pins the Partial group-limit node; answers
    * VERDICT r7's few-queries × huge-corpus watch item).
    *
    * Exactness contract (gate): every float op — per-subspace Lloyd,
    * argmin encode, LUT distances, the m-term ADC sum, the cosine
    * re-rank — is an ordered fold replayed term-for-term by the DuckDB
    * oracle (ExtQueries.pqOracle).
    *
    * @param m          number of subspaces; must divide `dim`
    * @param ksub       centroids per subspace codebook
    * @param candidates ADC short-list size per query (re-ranked exactly)
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, dim: Int,
             m: Int = 4, ksub: Int = 16, candidates: Int = 50,
             seed: Long = 9): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && candidates > 0, "k and candidates must be positive")
    val sub = dim / m
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))

    val sample = collectFitSample(c, seed)
    val books: IndexedSeq[Array[Array[Double]]] = (0 until m).map { j =>
      CoreT.lloyd(sample.map(_.slice(j * sub, (j + 1) * sub)),
        math.min(ksub, math.max(2, sample.length)), maxIter = 10)
    }

    // corpus → m nearest-centroid codes (argmin = first index of the
    // min, the same array_position(array_min) spelling as
    // clusterEmbeddings; offset-addressed kernel, no slice() copies)
    val coded = (0 until m).foldLeft(c) { (df, j) =>
      df.withColumn(s"__d$j",
          graft.functions.CentroidDists.dists(col("__cv"), books(j), offset = j * sub))
        .withColumn(s"__c$j",
          coalesce((array_position(col(s"__d$j"), array_min(col(s"__d$j"))) - 1)
            .cast("int"), lit(0)))
        .drop(s"__d$j")
    }.drop("__cv")

    // query → per-subspace LUTs (ksub distances each), computed once
    // per query row on the broadcast-small side
    val qluts = (0 until m).foldLeft(q) { (df, j) =>
      df.withColumn(s"__l$j",
        graft.functions.CentroidDists.dists(col("__qv"), books(j), offset = j * sub))
    }.drop("__qv")

    // ADC score: left-to-right m-term sum of LUT lookups (the oracle
    // replays the same association order)
    val adc = (0 until m).map(j =>
      element_at(col(s"__l$j"), col(s"__c$j") + 1)).reduce(_ + _)
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("neighbor_id").asc)
    val cand = coded.crossJoin(broadcast(qluts))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adc)
      .withColumn("__rn", row_number().over(wCand))
      .where(col("__rn") <= candidates)
      .select("query_id", "neighbor_id")

    // exact re-rank: candidate ids (tiny) broadcast back against the
    // corpus for full-precision vectors, then the usual cosine window
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Distributed Lloyd refinement — closes the codebook fit's scale
    * seam: [[fitCodebook]] is driver-Lloyd on a bounded 100k digest
    * sample, which is the right COST shape at any corpus size but
    * means centroids only ever see the sample. This operator runs
    * `iters` full Lloyd iterations over the ENTIRE corpus: each
    * iteration is one shuffle-free assignment scan
    * ([[graft.functions.CentroidDists]] argmin, the [[ivfTopK]]
    * bucketing stage) plus ONE map-side-combinable aggregation of
    * per-(cluster, dimension) component sums; the k·d aggregate rows
    * collect to the driver (bounded by the codebook size, never the
    * corpus) and become the next iteration's plan-literal centers.
    *
    * Exactness: the component sums use [[CoreT.pinnedParts]] — the
    * 2⁻⁴⁰ fixed-point split-long machinery of PCA's moment sums — so
    * each centroid mean is an ORDER-FREE exact integer total with
    * exactly two double roundings (BigInt→double, then ÷count after
    * the exact ÷2⁴⁰), bit-identical under any partitioning and
    * replayed by the oracle's BIGINT sums. Clusters that lose every
    * member keep their previous centroid, like the sample fit's
    * empty-cluster branch. Returns `(cluster_id, dim, center)` —
    * k·d rows, the refined codebook.
    *
    * 100 TB story: per iteration, one expression scan + one agg whose
    * reducer keys are (cluster, dim) — k·d keys with map-side combine,
    * no hot key possible; driver traffic is k·d rows per iteration.
    * The sample fit stays the INIT (deterministic, oracle-replayed);
    * refinement upgrades it to full-corpus optima at a fixed number of
    * linear passes. RefineProbe: 1M×64-dim vectors, 2 iterations,
    * 37 s on local[32] — the per-iteration cost is the component
    * explode (64M rows), all map-side combined into 1024 reducer keys.
    */
  def refineCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nlist: Int = 16, iters: Int = 2,
                     seed: Long = 9): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val centers = refinedCenters(c, dim, nlist, iters, seed)
    import spark.implicits._
    centers.zipWithIndex.flatMap { case (ctr, cl) =>
      ctr.zipWithIndex.map { case (x, j) => (cl, j, x) }
    }.toSeq.toDF("cluster_id", "dim", "center")
  }

  /** [[refineCodebook]]'s center matrix, for callers that consume the
    * codebook directly ([[clusterEmbeddings]]/[[ivfTopK]] with
    * `refineIters > 0`). `c` must already be `(neighbor_id, __cv)`. */
  private def refinedCenters(c: DataFrame, dim: Int, nlist: Int,
                             iters: Int, seed: Long): Array[Array[Double]] = {
    var centers = fitCodebook(c, nlist, seed)
    for (_ <- 0 until iters) {
      val assigned = c
        .withColumn("__dists", centerDistArr(centers, dim))
        .withColumn("__cl",
          argminList)
        .drop("__dists")
      val comps = assigned.select(col("__cl"),
        posexplode(col("__cv").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))).as(Seq("__j", "__x")))
      val aggCols = CoreT.pinnedParts(col("__x"), "s") :+ count(lit(1)).as("__n")
      val rows = comps.groupBy(col("__cl"), col("__j"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val next = centers.map(_.clone())
      rows.foreach { r =>
        val cl = r.getInt(0); val j = r.getInt(1)
        val n = r.getLong(r.fieldIndex("__n"))
        next(cl)(j) = CoreT.pinnedTotal(r, "s") / n.toDouble
      }
      // clusters with no members never appear in `rows` → keep old
      centers = next
    }
    centers
  }

  /** IVF-PQ approximate top-k — the coarse-quantizer + residual-PQ
    * composition (Jégou et al. 2011 §V; the FAISS `IVFPQ` index, and
    * the architecture every billion-vector deployment actually runs):
    * an IVF codebook routes each corpus vector to its nearest-centroid
    * list, the RESIDUAL (vector − coarse centroid) is product-quantized
    * into m codes, and a query scans only its `nprobe` nearest lists,
    * scoring candidates by ADC over per-(query, list) residual lookup
    * tables. Residual encoding is what separates this from
    * [[pqTopK]]: residuals concentrate near the origin, so the same
    * ksub centroids quantize them with far less error than raw vectors.
    *
    * Scale shape — this is the 100 TB ANN path: the corpus scan after
    * encode touches `m` ints + one list id per vector (the float
    * vectors never ride through scoring); probe pruning cuts the
    * scanned fraction to ≈ nprobe/nlist; both codebooks and the
    * per-probe LUT frame (nq·nprobe rows, small by the same contract
    * as [[ivfTopK]]'s probe frame) are broadcast; the candidate cut
    * joins corpus codes to probes on the list id — an equi-join, no
    * crossJoin of the corpus. The exact re-rank touches only
    * nq·candidates full vectors, fetched by broadcast join.
    *
    * Exactness contract (gate): coarse Lloyd, sample residual
    * assignment, the m residual sub-fits, the residual argmin encode
    * (double subtraction first, then the same ascending-feature fold as
    * [[graft.functions.CentroidDists]]), the m-term left-associated ADC
    * sum, and the cosine re-rank are all replayed term-for-term by
    * DuckDB (ExtQueries.ivfpqOracle). The corpus residual is
    * materialized as `zip_with(cast(v as double), centroid, _-_)` so
    * the subtraction widens exactly like the oracle's
    * `list_zip(v, cs[lst+1])` on already-double `v`.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int, dim: Int,
                nlist: Int = 0, nprobe: Int = 4,
                m: Int = 4, ksub: Int = 16, candidates: Int = 50,
                seed: Long = 9): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && candidates > 0, "k and candidates must be positive")
    require(nprobe > 0, "nprobe must be positive")
    val cFit = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sample = collectFitSample(cFit, seed)
    ivfPqTopKImpl(corpus, queries, idCol, vecCol, k, dim,
      sample, fitFromSample(sample, nlist), nprobe, m, ksub, candidates)
  }

  /** [[ivfPqTopK]] against a pre-fitted [[Codebook]]: the handle's
    * centers become the coarse quantizer and its retained digest-order
    * fit sample seeds the m residual sub-fits — both exactly what the
    * fit-inside variant derives, so results are value-identical. The
    * residual sub-fits still run (they depend on m/ksub), but the
    * corpus sample collect and the coarse Lloyd are amortized. */
  def ivfPqTopKWith(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    codebook: Codebook, nprobe: Int = 4,
                    m: Int = 4, ksub: Int = 16,
                    candidates: Int = 50): DataFrame =
    ivfPqTopKImpl(corpus, queries, idCol, vecCol, k, codebook.dim,
      codebook.sample, codebook.centers, nprobe, m, ksub, candidates)

  /** The m residual sub-codebooks shared by both IVF-PQ query paths:
    * fit-sample residuals against the coarse argmin (driver-side, the
    * same first-min rule and ascending-feature fold as the expression
    * kernel), one bounded Lloyd per subspace. */
  private def pqResidualBooks(sample: Array[Array[Double]],
                              coarse: Array[Array[Double]], dim: Int,
                              m: Int, ksub: Int): IndexedSeq[Array[Array[Double]]] = {
    val sub = dim / m
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var i = 0
      while (i < coarse.length) {
        val ctr = coarse(i); var s = 0.0; var f = 0
        while (f < dim) { val diff = v(f) - ctr(f); s += diff * diff; f += 1 }
        if (s < bestD) { bestD = s; best = i }
        i += 1
      }
      best
    }
    val residSample = sample.map { v =>
      val ctr = coarse(nearest(v))
      Array.tabulate(dim)(f => v(f) - ctr(f))
    }
    (0 until m).map { j =>
      CoreT.lloyd(residSample.map(_.slice(j * sub, (j + 1) * sub)),
        math.min(ksub, math.max(2, residSample.length)), maxIter = 10)
    }
  }

  private def ivfPqTopKImpl(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, k: Int, dim: Int,
                            sample: Array[Array[Double]],
                            coarse: Array[Array[Double]], nprobe: Int,
                            m: Int, ksub: Int, candidates: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && candidates > 0, "k and candidates must be positive")
    require(nprobe > 0, "nprobe must be positive")
    val spark = corpus.sparkSession
    val sub = dim / m
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))

    val books = pqResidualBooks(sample, coarse, dim, m, ksub)

    // corpus: coarse list assignment (expression scan), residual
    // materialization, m residual argmin codes — zero shuffles
    val centersLit = array(coarse.toIndexedSeq.map(ctr =>
      array(ctr.toIndexedSeq.map(lit): _*)): _*)
    val listed = c
      .withColumn("__dists", centerDistArr(coarse, dim))
      .withColumn("__list",
        argminList)
      .drop("__dists")
      .withColumn("__rv", zip_with(
        col("__cv").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        element_at(centersLit, col("__list") + 1), (a, b) => a - b))
    val coded = (0 until m).foldLeft(listed) { (df, j) =>
      df.withColumn(s"__d$j",
          graft.functions.CentroidDists.dists(col("__rv"), books(j), offset = j * sub))
        .withColumn(s"__c$j",
          coalesce((array_position(col(s"__d$j"), array_min(col(s"__d$j"))) - 1)
            .cast("int"), lit(0)))
        .drop(s"__d$j")
    }.drop("__cv", "__rv")

    // probes (driver-side, small by contract): nprobe nearest coarse
    // centroids per query, with the per-(query, list) residual carried
    // for the LUT build
    val qRows = q.collect()
    val probes = probeTriples(qRows, coarse, dim, nprobe).map {
      case (r, qv, list) =>
        val ctr = coarse(list)
        (r.getAs[Any]("query_id"),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(
            Array.tabulate(dim)(f => qv(f) - ctr(f))), list)
    }
    val probeDF = spark.createDataFrame(
      spark.sparkContext.parallelize(probes.map(p =>
        org.apache.spark.sql.Row(p._1, p._2, p._3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          queries.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("__qrv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("__list",
          org.apache.spark.sql.types.IntegerType))))
    val qluts = (0 until m).foldLeft(probeDF) { (df, j) =>
      df.withColumn(s"__l$j",
        graft.functions.CentroidDists.dists(col("__qrv"), books(j), offset = j * sub))
    }.drop("__qrv")

    // ADC over the probed lists only: equi-join on the list id, m LUT
    // lookups + m−1 adds per surviving pair
    val adc = (0 until m).map(j =>
      element_at(col(s"__l$j"), col(s"__c$j") + 1)).reduce(_ + _)
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("neighbor_id").asc)
    val cand = coded.join(broadcast(qluts), Seq("__list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adc)
      .withColumn("__rn", row_number().over(wCand))
      .where(col("__rn") <= candidates)
      .select("query_id", "neighbor_id")

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** [[ivfPqTopK]] with BOTH sides distributed — the IVF-PQ sibling of
    * [[ivfTopKDistributed]], closing the SAME corpus-scale funnel in
    * the compressed-corpus path: the driver variant collects the query
    * frame to build per-(query, list) residual LUTs, which is right
    * for point lookups and a funnel for a query corpus. Every
    * driver-side query step moves into row-local expressions here:
    * probe selection is the [[ivfTopKDistributed]] array_sort slice
    * (probeTriples' exact (dist, list idx) order), the per-probe
    * residual is `zip_with(qv, element_at(centersLit, lst+1), −)`
    * (the corpus encode's own spelling, so the subtraction widens
    * identically), and the m LUTs are [[graft.functions.CentroidDists]]
    * scans over that residual — all plan-literal codebooks, zero
    * query-side collects. The ADC join on the list id and the re-rank
    * joins on (neighbor_id, query_id) carry NO forced broadcast —
    * AQE broadcasts when a side is actually small and shuffles when
    * not. Candidate and top-k windows stay map-side bounded
    * (WindowGroupLimit). Hot-list skew guard as in
    * [[ivfTopKDistributed]]: lists over `maxListSize` are SILENTLY
    * dropped by [[Dedup.capBuckets]] before the encode (a degenerate
    * coarse codebook would otherwise make the nq-side ADC join
    * quadratic in the hot list) — the one documented deviation from
    * the uncapped driver path; value-identity holds whenever no list
    * exceeds the cap (always at gate scale; `Long.MaxValue` disables).
    * Otherwise VALUE-IDENTICAL to [[ivfPqTopK]] on the same
    * (corpus, params) — spec-pinned on a half-corpus query frame; the
    * gate oracle is the q_sim_ivfpq_topk replay with the query
    * predicate widened. */
  def ivfPqTopKDistributed(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int, dim: Int,
                           nlist: Int = 0, nprobe: Int = 4,
                           m: Int = 4, ksub: Int = 16, candidates: Int = 50,
                           seed: Long = 9,
                           maxListSize: Long = 100000L): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && candidates > 0, "k and candidates must be positive")
    require(nprobe > 0, "nprobe must be positive")
    val cFit = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sample = collectFitSample(cFit, seed)
    ivfPqTopKDistributedImpl(corpus, queries, idCol, vecCol, k, dim,
      sample, fitFromSample(sample, nlist), nprobe, m, ksub, candidates,
      maxListSize)
  }

  /** [[ivfPqTopKDistributed]] against a pre-fitted [[Codebook]] (its
    * centers = the coarse quantizer, its retained sample seeds the m
    * residual sub-fits — exactly the fit-inside derivation). */
  def ivfPqTopKDistributedWith(corpus: DataFrame, queries: DataFrame,
                               idCol: String, vecCol: String, k: Int,
                               codebook: Codebook, nprobe: Int = 4,
                               m: Int = 4, ksub: Int = 16,
                               candidates: Int = 50,
                               maxListSize: Long = 100000L): DataFrame =
    ivfPqTopKDistributedImpl(corpus, queries, idCol, vecCol, k, codebook.dim,
      codebook.sample, codebook.centers, nprobe, m, ksub, candidates,
      maxListSize)

  private def ivfPqTopKDistributedImpl(corpus: DataFrame, queries: DataFrame,
                                       idCol: String, vecCol: String, k: Int,
                                       dim: Int, sample: Array[Array[Double]],
                                       coarse: Array[Array[Double]],
                                       nprobe: Int, m: Int, ksub: Int,
                                       candidates: Int,
                                       maxListSize: Long): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && candidates > 0, "k and candidates must be positive")
    require(nprobe > 0, "nprobe must be positive")
    val sub = dim / m
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val np = math.min(nprobe, coarse.length)
    val books = pqResidualBooks(sample, coarse, dim, m, ksub)
    val centersLit = array(coarse.toIndexedSeq.map(ctr =>
      array(ctr.toIndexedSeq.map(lit): _*)): _*)
    val dblArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)

    // corpus side: identical to the driver variant — coarse argmin,
    // residual materialization, m residual argmin codes, zero shuffles
    // — plus the hot-list cap the corpus-scale query contract needs
    val listed = Dedup.capBuckets(c
        .withColumn("__dists", centerDistArr(coarse, dim))
        .withColumn("__list",
          argminList)
        .drop("__dists"),
        Seq("__list"), maxListSize)
      .withColumn("__rv", zip_with(col("__cv").cast(dblArr),
        element_at(centersLit, col("__list") + 1), (a, b) => a - b))
    val coded = (0 until m).foldLeft(listed) { (df, j) =>
      df.withColumn(s"__d$j",
          graft.functions.CentroidDists.dists(col("__rv"), books(j), offset = j * sub))
        .withColumn(s"__c$j",
          coalesce((array_position(col(s"__d$j"), array_min(col(s"__d$j"))) - 1)
            .cast("int"), lit(0)))
        .drop(s"__d$j")
    }.drop("__cv", "__rv")

    // query side, all row-local: top-nprobe coarse lists, per-probe
    // residual, per-subspace LUTs — no collect, no broadcast hint
    val probes = q
      .withColumn("__dists",
        graft.functions.CentroidDists.dists(col("__qv"), coarse))
      .select(col("query_id"),
        probeListsExpr(np)
          .as("__list"),
        col("__qv"))
      .withColumn("__qrv", zip_with(col("__qv").cast(dblArr),
        element_at(centersLit, col("__list") + 1), (a, b) => a - b))
    val qluts = (0 until m).foldLeft(probes) { (df, j) =>
      df.withColumn(s"__l$j",
        graft.functions.CentroidDists.dists(col("__qrv"), books(j), offset = j * sub))
    }.drop("__qrv", "__qv")

    val adc = (0 until m).map(j =>
      element_at(col(s"__l$j"), col(s"__c$j") + 1)).reduce(_ + _)
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("neighbor_id").asc)
    val cand = coded.join(qluts, Seq("__list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adc)
      .withColumn("__rn", row_number().over(wCand))
      .where(col("__rn") <= candidates)
      .select("query_id", "neighbor_id")

    // exact re-rank: plain equi-joins back to both full-precision
    // sides — nq·candidates rows against the corpus, AQE's strategy
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(cand, Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ tau among LSH-band
    * candidates (the embedding flavor of [[Dedup]]). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, tau: Double,
                            bands: Int = 4, rowsPerBand: Int = 8,
                            maxBucketSize: Long = 100000L): DataFrame = {
    // persist the CAPPED exploded frame: the self-join evaluates its
    // subtree once per side, and that subtree carries the
    // bands×rowsPerBand hyperplane dot products per row AND the
    // hot-bucket groupBy shuffle inside capBuckets (the skew guard,
    // see Dedup — and see minhashCandidatePairs for the r3 bench
    // lesson on persisting before vs after the cap). Cosine + τ
    // filter run before the pair dedup so sub-threshold collisions
    // never shuffle the vectors.
    // ... and persist the compact banded frame itself: populating the
    // capped cache evaluates it twice (capBuckets' hot groupBy + the
    // anti-join probe side), and it carries all bands×rowsPerBand
    // hyperplane dot products per row. Cached, the second evaluation
    // re-reads n rows and re-runs only the band explode.
    val compact = graft.CacheScope.track(withLshBands(
      df.select(col(idCol).as("id"), col(vecCol).as("__v")),
      "__v", dim, bands, rowsPerBand))
    val d = graft.CacheScope.track(Dedup.capBuckets(explodeBands(compact, bands),
      Seq("band", "bucket"), maxBucketSize))
    d.as("a").join(d.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.__v"), col("b.__v")).as("cosine"))
      .where(col("cosine") >= tau)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "cosine")
  }
}
