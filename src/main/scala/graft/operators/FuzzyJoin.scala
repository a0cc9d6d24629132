package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (record linkage) within edit
  * distance 1, via deletion-neighborhood blocking — the FastSS /
  * SymSpell move (Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries"): two strings are within Levenshtein distance 1 iff
  * they share a key in {s} ∪ {s with one character deleted}, so an
  * equi-join on deletion keys is a COMPLETE candidate generator —
  * substitutions share the deletion at the differing position,
  * insert/delete pairs share the shorter string's identity key, and
  * equal strings share their identity keys. No pairwise scan, no
  * length-band heuristics that silently drop matches.
  * (Extension family — the reference has no fuzzy matching; this is
  * the entity-resolution complement of the n-gram/MinHash dedups for
  * SHORT strings — names, titles, ids — where shingles are degenerate.)
  *
  * Scale shape: each string emits length+1 keys, shipped as md5 hashes
  * with the id only — raw strings never shuffle into the blocking
  * join. The key frame is hot-bucket-capped (a degenerate key shared
  * by m strings would otherwise join O(m²) — same guard as the LSH
  * band buckets) and persisted before the self-join (a self-join
  * evaluates its subtree once per side, and this subtree carries the
  * cap's aggregation shuffle). Candidate pairs are distinct-ed as bare
  * (id, id) rows, and only then do names join back for the exact
  * Levenshtein confirm — the confirm is a dimension-style id join, not
  * part of the quadratic candidate path.
  */
object FuzzyJoin {

  /** Keys = identity ∪ single-deletions, exploded to (id, md5(key)).
    * Spelled with SQL `substring`/`sequence` (character semantics,
    * 1-based, length-clamped — identical in DuckDB's `substr`).
    * `sequence(1, 0)` would DESCEND in Spark, so the empty string
    * guards to an empty deletion array (DuckDB's generate_series(1,0)
    * is empty — the guard keeps both engines on the same key set). */
  private def deletionKeys(base: DataFrame): DataFrame = {
    val dels = when(length(col("name")) > 0,
      expr("transform(sequence(1, length(name)), i -> " +
        "concat(substring(name, 1, i-1), substring(name, i+1, length(name)-i)))"))
      .otherwise(array().cast("array<string>"))
    base.select(col("id"),
        explode(concat(array(col("name")), dels)).as("__k"))
      .select(col("id"), md5(col("__k")).as("__kh"))
      .dropDuplicates("id", "__kh") // "aa" deletes to "a" twice — don't inflate the join
  }

  /** All pairs (id_a < id_b) within Levenshtein distance ≤ 1 of each
    * other's `nameCol`, with the exact distance. Null names are
    * excluded (no edit distance to NULL).
    *
    * @param maxBucket hot-key skew guard: blocking keys claimed by
    *        more than this many strings are dropped from the candidate
    *        join (their members still pair through their other keys);
    *        the gate fixture's buckets are ≤ ~10, so the default never
    *        cuts there
    * @return (id_a, id_b, name_a, name_b, dist)
    */
  def editDist1SelfJoin(df: DataFrame, idCol: String, nameCol: String,
                        maxBucket: Long = 100000L): DataFrame = {
    val base = df.where(col(nameCol).isNotNull)
      .select(col(idCol).as("id"), col(nameCol).as("name"))
    // persist BOTH sides of the cap (the minhashCandidatePairs lesson):
    // populating the capped cache evaluates its input twice — once for
    // the hot-key groupBy, once as the anti-join probe — and that
    // input carries the explode + key-dedup shuffle; and the capped
    // frame itself feeds a self-join (one evaluation per side)
    val raw = graft.CacheScope.track(deletionKeys(base))
    val keys = graft.CacheScope.track(
      Dedup.capBuckets(raw, Seq("__kh"), maxBucket))
    val pairs = keys.as("a").join(keys.as("b"),
        col("a.__kh") === col("b.__kh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    confirm(pairs, base, "id_a", "id_b")
  }

  /** Cross-catalog variant: which `left` strings match a `right`
    * string within distance 1 — record linkage between two tables
    * with NO self-pairing (each side explodes once; the only join is
    * the cross-side key equi-join, the [[Dedup.minhashIncrementalPairs]]
    * shape). Both sides share the hot-key cap.
    *
    * @return (id_a, id_b, name_a, name_b, dist) — id_a from `left`,
    *         id_b from `right`
    */
  def editDist1Join(left: DataFrame, leftId: String, leftName: String,
                    right: DataFrame, rightId: String, rightName: String,
                    maxBucket: Long = 100000L): DataFrame = {
    val lb = left.where(col(leftName).isNotNull)
      .select(col(leftId).as("id"), col(leftName).as("name"))
    val rb = right.where(col(rightName).isNotNull)
      .select(col(rightId).as("id"), col(rightName).as("name"))
    val lk = graft.CacheScope.track(
      Dedup.capBuckets(deletionKeys(lb), Seq("__kh"), maxBucket))
    val rk = graft.CacheScope.track(
      Dedup.capBuckets(deletionKeys(rb), Seq("__kh"), maxBucket))
    val pairs = lk.as("a").join(rk.as("b"), col("a.__kh") === col("b.__kh"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    confirm(pairs, lb, "id_a", "id_b", rightBase = Some(rb))
  }

  /** Exact-distance confirm: join names back by id (dimension-style,
    * off the quadratic path) and keep dist ≤ 1. */
  private def confirm(pairs: DataFrame, base: DataFrame,
                      aCol: String, bCol: String,
                      rightBase: Option[DataFrame] = None): DataFrame = {
    val x = base.select(col("id").as(aCol), col("name").as("name_a"))
    val y = rightBase.getOrElse(base)
      .select(col("id").as(bCol), col("name").as("name_b"))
    pairs.join(x, aCol).join(y, bCol)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= 1)
      .select(col(aCol), col(bCol), col("name_a"), col("name_b"), col("dist"))
  }
}
