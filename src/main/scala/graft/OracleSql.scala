package graft

/** DuckDB SQL generators for the statistical oracles (AssemblyQueries).
  *
  * The reference scores charts with F/t-distribution CDFs
  * (score.py:394-452 — `f.cdf`, `t.cdf` via scipy). Spark-side we use
  * commons-math; the oracle mirrors the math in pure DuckDB SQL:
  *
  *  - the F(1, d2) CDF is the regularized incomplete beta
  *    I_x(1/2, d2/2) with x = f/(f+d2), evaluated with the standard
  *    Lentz continued fraction (Numerical Recipes §6.4 `betacf`,
  *    public-domain algorithm), written as a `list_reduce` fold over
  *    200 iterations carrying `[c, d, h]`;
  *  - the f statistic itself (the reference's quirky
  *    `ssr / (sse/n - 2)` form) is rebuilt with ordered
  *    `list_reduce(list_prepend(0.0, …))` folds so the arithmetic
  *    matches the Scala fold order term for term.
  *
  * Both sides round final scores through DECIMAL(18,2), so the only
  * tolerance consumed is libm-level (pow/lgamma) ulp noise — far below
  * the rounding grid.
  */
object OracleSql {

  /** Ordered left fold `0.0 + x1 + x2 + …` (matches Array[Double].sum). */
  private def osum(list: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $list), (p, q) -> p + q)"

  /** CTE chain computing the reference f statistic over a sorted list
    * column `d` (DOUBLE[]) in CTE `src`, carrying `keys` through.
    * `idxExpr(i)` is the regression index as a function of the SQL
    * 1-based position variable — `pow(i, 0.7)` for outstanding1,
    * `i::DOUBLE` for linearness (score.py:398,440).
    *
    * Produces CTE `<src>_x` with columns: keys, n, degenerate, f, d2.
    */
  def fstatChain(src: String, keys: String, idx: String => String): String = {
    val k = if (keys.isEmpty) "" else s"$keys, "
    s"""${src}_s0 AS (
       |  SELECT ${k}d, len(d) AS n,
       |         list_transform(range(1, len(d) + 1), i -> ${idx("i::DOUBLE")}) AS idx
       |  FROM $src
       |),
       |${src}_s1 AS (
       |  SELECT *, ${osum("d")} / n AS md, ${osum("idx")} / n AS mi FROM ${src}_s0
       |),
       |${src}_s2 AS (
       |  SELECT *,
       |    ${osum("list_transform(range(1, n + 1), i -> (d[i] - md) * (idx[i] - mi))")} AS num,
       |    ${osum("list_transform(range(1, n + 1), i -> (d[i] - md) * (d[i] - md))")} AS den
       |  FROM ${src}_s1
       |),
       |${src}_s3 AS (
       |  SELECT *, CASE WHEN den = 0 THEN 0.0 ELSE num / den END AS kk FROM ${src}_s2
       |),
       |${src}_s4 AS (
       |  SELECT *, md - kk * mi AS bb FROM ${src}_s3
       |),
       |${src}_s5 AS (
       |  SELECT *,
       |    ${osum("list_transform(range(1, n + 1), i -> (kk * idx[i] + bb - md) * (kk * idx[i] + bb - md))")} AS ssr,
       |    ${osum("list_transform(range(1, n + 1), i -> (kk * idx[i] + bb - d[i]) * (kk * idx[i] + bb - d[i]))")} AS sse
       |  FROM ${src}_s4
       |),
       |${src}_x AS (
       |  SELECT ${k}n, (n <= 2 OR den = 0) AS degenerate,
       |         CASE WHEN n <= 2 OR den = 0 THEN 0.0 ELSE ssr / (sse / n - 2) END AS f,
       |         (n - 2)::DOUBLE AS d2
       |  FROM ${src}_s5
       |)""".stripMargin
  }

  // Lentz continued fraction for I_x(ca, cb) at cx (post-swap params):
  // one fold step runs the even (aa1) and odd (aa2) NR sub-steps.
  // acc = [c, d, h]; elements [m, 0, 0].
  private val betacfFold: String = {
    val aa1 = "(e[1] * (cb - e[1]) * cx / ((ca - 1.0 + 2 * e[1]) * (ca + 2 * e[1])))"
    val aa2 = "(-(ca + e[1]) * (ca + cb + e[1]) * cx / ((ca + 2 * e[1]) * (ca + 1.0 + 2 * e[1])))"
    def guard(v: String) = s"(CASE WHEN abs($v) < 1e-300 THEN 1e-300 ELSE $v END)"
    val d1 = s"(1.0 / ${guard(s"1.0 + $aa1 * acc[2]")})"
    val c1 = guard(s"1.0 + $aa1 / acc[1]")
    val d2 = s"(1.0 / ${guard(s"1.0 + $aa2 * $d1")})"
    val c2 = s"(1.0 + $aa2 / $c1)"
    s"""list_reduce(
       |      list_prepend(
       |        [1.0::DOUBLE,
       |         1.0 / (CASE WHEN abs(1.0 - (ca + cb) * cx / (ca + 1.0)) < 1e-300 THEN 1e-300 ELSE 1.0 - (ca + cb) * cx / (ca + 1.0) END),
       |         1.0 / (CASE WHEN abs(1.0 - (ca + cb) * cx / (ca + 1.0)) < 1e-300 THEN 1e-300 ELSE 1.0 - (ca + cb) * cx / (ca + 1.0) END)],
       |        list_transform(range(1, 201), m -> [m::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE])),
       |      (acc, e) -> [$c2, $d2, acc[3] * $d1 * $c1 * $d2 * $c2])""".stripMargin
  }

  /** CTE chain computing the F(1, d2) CDF for CTE `src` with columns
    * (keys, degenerate, f, d2, …). Produces `<src>_cdf` with columns:
    * keys, n, degenerate, f, fcdf. */
  def fcdfChain(src: String, keys: String): String = {
    val k = if (keys.isEmpty) "" else s"$keys, "
    s"""${src}_p AS (
       |  SELECT ${k}n, degenerate, f, 0.5 AS a, d2 / 2 AS b,
       |         CASE WHEN f <= 0 THEN 0.0 ELSE f / (f + d2) END AS x
       |  FROM $src
       |),
       |${src}_q AS (
       |  SELECT *,
       |    CASE WHEN x >= (a + 1) / (a + b + 2) THEN b ELSE a END AS ca,
       |    CASE WHEN x >= (a + 1) / (a + b + 2) THEN a ELSE b END AS cb,
       |    CASE WHEN x >= (a + 1) / (a + b + 2) THEN 1 - x ELSE x END AS cx,
       |    (x >= (a + 1) / (a + b + 2)) AS swapped
       |  FROM ${src}_p
       |),
       |${src}_r AS (
       |  SELECT *, $betacfFold AS st FROM ${src}_q
       |),
       |${src}_cdf AS (
       |  SELECT ${k}n, degenerate, f,
       |    CASE WHEN x <= 0 THEN 0.0 WHEN x >= 1 THEN 1.0
       |         WHEN swapped THEN 1.0 - exp(lgamma(a + b) - lgamma(a) - lgamma(b) + ca * ln(cx) + cb * ln(1.0 - cx)) * st[3] / ca
       |         ELSE exp(lgamma(a + b) - lgamma(a) - lgamma(b) + ca * ln(cx) + cb * ln(1.0 - cx)) * st[3] / ca END AS fcdf
       |  FROM ${src}_r
       |)""".stripMargin
  }

  /** `100 * (1 - cdf)` score with the reference's degenerate rules. */
  def scoreExpr: String =
    "CASE WHEN degenerate THEN 0.0 ELSE 100.0 * (1.0 - fcdf) END"

  /** Round-trip through DECIMAL(p,2) → DOUBLE (the gate's parity pin). */
  def dec2(expr: String, p: Int = 18): String =
    s"CAST(CAST(($expr) AS DECIMAL($p,2)) AS DOUBLE)"
}
