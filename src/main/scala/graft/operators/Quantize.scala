package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of an embedding column — the cheap 4×
  * shrink (float32 → int8) applied before embeddings are stored or
  * ANN-indexed at corpus scale, with per-vector reconstruction error
  * so a pipeline can budget the precision loss.
  *
  * Fit: per-dimension corpus min/max — ONE aggregation pass with 2·dim
  * map-side-combinable agg columns (min/max are insensitive to
  * combine order, so the fit is exact and partitioning-invariant, no
  * digest sample needed — unlike the KMeans-family fits). The 2·dim
  * doubles come back to the driver and re-enter the encode scan as
  * plan literals — the codebook pattern, at its cheapest.
  *
  * Encode: `code_j = floor((v_j − mn_j) / rng_j · 255 + 0.5) − 128`
  * (∈ [−128, 127] by construction since mn/mx bound the corpus;
  * degenerate dimensions with rng = 0 encode as 0). One pure
  * expression scan, zero shuffle.
  *
  * Exactness: float→double casts are exact, min/max over exact values
  * are exact, and the encode/reconstruction arithmetic is a fixed
  * association order of double ops — so a SQL engine replaying the
  * same shapes on the same parquet reproduces codes and errors
  * bit-for-bit (the oracle recomputes the min/max fit itself rather
  * than receiving literals; both sides agree because the fit is
  * order-insensitive).
  *
  * @param dim embedding dimensionality (all vectors must have ≥ dim
  *            elements; extra elements are ignored)
  * @return (idCol, codes array<int>, recon_err double) where
  *         recon_err = Σ_j (v_j − dequant_j)² as a left-to-right fold
  */
object Quantize {

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(!Set("codes", "recon_err", "__v").contains(idCol),
      s"idCol '$idCol' collides with an output column name")

    val aggs = (0 until dim).flatMap { j =>
      Seq(min(element_at(col(vecCol), j + 1).cast("double")).as(s"__mn$j"),
        max(element_at(col(vecCol), j + 1).cast("double")).as(s"__mx$j"))
    }
    val fit = df.agg(aggs.head, aggs.tail: _*).head()
    val nullDims = (0 until dim).filter(j => fit.isNullAt(2 * j))
    require(nullDims.isEmpty,
      s"quantizeInt8 fit found no values for dimension(s) ${nullDims.mkString(", ")} " +
        s"of '$vecCol' — the corpus is empty, vectors are shorter than dim=$dim, " +
        "or those dimensions are null everywhere")
    val mins = (0 until dim).map(j => fit.getAs[Double](s"__mn$j"))
    val rngs = (0 until dim).map(j =>
      fit.getAs[Double](s"__mx$j") - fit.getAs[Double](s"__mn$j"))

    val mnLit = array(mins.map(lit(_)): _*)
    val rngLit = array(rngs.map(lit(_)): _*)

    def vAt(j: Column): Column = element_at(col(vecCol), j).cast("double")
    def mnAt(j: Column): Column = element_at(mnLit, j)
    def rngAt(j: Column): Column = element_at(rngLit, j)

    val codes = transform(sequence(lit(1), lit(dim)), j =>
      when(rngAt(j) === 0.0, lit(0))
        .otherwise(floor((vAt(j) - mnAt(j)) / rngAt(j) * 255.0 + 0.5)
          .cast("int") - 128))

    // reconstruction: dequant_j = (code_j + 128) / 255 · rng_j + mn_j;
    // the error is an ordered fold of the per-dim squared diffs (the
    // same list_prepend-style sum the cosine oracles replay)
    val out = df.select(col(idCol), codes.as("codes"), col(vecCol).as("__v"))
    val err = aggregate(
      transform(sequence(lit(1), lit(dim)), j => {
        val dq = (element_at(col("codes"), j) + 128).cast("double") / 255.0 *
          rngAt(j) + mnAt(j)
        val d = element_at(col("__v"), j).cast("double") - dq
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)
    out.select(col(idCol), col("codes"), err.as("recon_err"))
  }
}
