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

  /** Ordered left fold `0.0 + x1 + x2 + …` (matches Array[Double].sum).
    * The ONE canonical spelling of the fold — oracles must reuse it so
    * the bit-exactness argument never depends on keeping textual
    * copies in sync. */
  def osum(list: String): String =
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
    val c2 = guard(s"1.0 + $aa2 / $c1")
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

  /** Round-trip through DECIMAL(p,2) → DOUBLE (the gate's parity pin).
    *
    * The decimal conversion goes through VARCHAR deliberately: DuckDB's
    * direct double→DECIMAL cast computes `d · 10^scale` in DOUBLE and
    * rounds THAT, so a large-magnitude value whose scaled product lands
    * exactly on an ulp .5 tie rounds to even and disagrees with Spark
    * (seen at sf0.001: dispersion 38851901883905.2265625 → .22 direct
    * vs Spark's .23). Spark's Cast(double→decimal) parses the shortest
    * round-trip string (`BigDecimal.valueOf`), then HALF_UP; DuckDB's
    * VARCHAR→DECIMAL parse of the same shortest repr also rounds half
    * away from zero, so the string route is value-identical on both
    * engines for every magnitude.
    */
  def dec2(expr: String, p: Int = 18): String =
    s"CAST(CAST(CAST(CAST(($expr) AS DOUBLE) AS VARCHAR) AS DECIMAL($p,2)) AS DOUBLE)"

  /** q_scagnostics oracle: bit-exact DuckDB replay of the MST scatter
    * metrics ([[graft.score.Scagnostics.Graph]]) over the deduped,
    * lexicographically sorted part scatter.
    *
    *  - Prim's MST as a recursive CTE carrying `[inTree, minDist,
    *    minFrom, edges]` — same strict-< first-index tie-break, so the
    *    tree (and every fold over its insertion-ordered edge list) is
    *    identical;
    *  - Prim's minFrom is a parent-pointer rooting at node 1, so
    *    root distances are one insertion-order fold and clumpy's
    *    per-edge component sizes are reverse-insertion-order subtree
    *    accumulation — no union-find needed;
    *  - BFS distances from the diameter endpoint replay as layered
    *    relaxation sweeps (each sweep labels one BFS layer; the path
    *    predecessor is the unique labeled neighbor, so the d(u) =
    *    d(parent) + w accumulation is the same IEEE sequence);
    *  - percentiles, Spearman average ranks, striated cosines and the
    *    clumpy cut loop mirror the Scala folds term for term.
    *
    * Only +,-,*,/,sqrt,abs → bit-exact; outputs still round-trip
    * DECIMAL(18,2) as insurance (matching the Spark query).
    */
  def scagnosticsOracle: String = {
    def osumL(list: String) = osum(list)
    def pct(q: String): String = {
      val pos = s"((len(sl) - 1) * $q / 100.0)"
      s"(CASE WHEN floor($pos) = ceil($pos) THEN sl[CAST(floor($pos) AS BIGINT) + 1] " +
        s"ELSE sl[CAST(floor($pos) AS BIGINT) + 1] + ($pos - floor($pos)) * " +
        s"(sl[CAST(ceil($pos) AS BIGINT) + 1] - sl[CAST(floor($pos) AS BIGINT) + 1]) END)"
    }
    def argmaxF(v: String) =
      s"list_reduce(list_prepend([-1.0::DOUBLE, 0.0::DOUBLE], list_transform(range(1, cnt + 1), " +
        s"j -> [CAST(j AS DOUBLE), $v[j]])), (a2, e2) -> " +
        s"CASE WHEN a2[1] < 0 OR e2[2] > a2[2] THEN e2 ELSE a2 END)"
    // Euclidean distance between points i/j of the sorted dot lists
    // (sqrt included — mirrors Scagnostics.Graph.dist exactly)
    def dist(i: String, j: String) =
      s"sqrt((x[$i] - x[$j]) * (x[$i] - x[$j]) + (y[$i] - y[$j]) * (y[$i] - y[$j]))"
    // Prim argmin: first index with strictly smaller minDist among out-of-tree
    val bestF =
      "list_reduce(list_prepend([-1.0::DOUBLE, 0.0::DOUBLE], list_transform(range(1, cnt + 1), " +
        "j -> [CAST(j AS DOUBLE), md[j]])), (a2, e2) -> " +
        "CASE WHEN NOT intree[CAST(e2[1] AS BIGINT)] AND (a2[1] < 0 OR e2[2] < a2[2]) THEN e2 ELSE a2 END)"
    // first labeled incident neighbor of u during a relaxation sweep
    // (unique by BFS layering)
    val relax =
      "list_reduce(list_prepend(-1.0::DOUBLE, list_transform(range(1, len(inco[u]) + 1), t -> CAST(t AS DOUBLE))), " +
        "(a2, e2) -> CASE WHEN a2 >= 0 THEN a2 " +
        "WHEN dv[CAST(inco[u][CAST(e2 AS BIGINT)] AS BIGINT)] >= 0 " +
        "THEN dv[CAST(inco[u][CAST(e2 AS BIGINT)] AS BIGINT)] + incl[u][CAST(e2 AS BIGINT)] ELSE a2 END)"
    s"""WITH RECURSIVE
       |pts0 AS (SELECT DISTINCT CAST(p_size AS DOUBLE) AS px, CAST(p_retailprice AS DOUBLE) AS py
       |         FROM part WHERE p_partkey <= 500 AND p_size IS NOT NULL AND p_retailprice IS NOT NULL LIMIT 4000),
       |pts AS MATERIALIZED (SELECT list(px ORDER BY px, py) AS x, list(py ORDER BY px, py) AS y,
       |               COUNT(*) AS cnt FROM pts0),
       |prim(i, intree, md, mf, ea, eb, el) AS (
       |  SELECT 0, list_transform(range(1, cnt + 1), j -> j = 1),
       |         list_transform(range(1, cnt + 1), j ->
       |           CASE WHEN j = 1 THEN 1.7976931348623157e308 ELSE ${dist("1", "j")} END),
       |         list_transform(range(1, cnt + 1), j -> CAST(1 AS BIGINT)),
       |         CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), CAST([] AS DOUBLE[])
       |  FROM pts
       |  UNION ALL
       |  SELECT i + 1,
       |    list_transform(range(1, cnt + 1), j -> j = best OR intree[j]),
       |    list_transform(range(1, cnt + 1), j ->
       |      CASE WHEN j = best OR intree[j] THEN md[j]
       |           WHEN dl[j] < md[j] THEN dl[j] ELSE md[j] END),
       |    list_transform(range(1, cnt + 1), j ->
       |      CASE WHEN j = best OR intree[j] THEN mf[j]
       |           WHEN dl[j] < md[j] THEN best ELSE mf[j] END),
       |    list_append(ea, mf[best]), list_append(eb, best), list_append(el, md[best])
       |  FROM (SELECT *, list_transform(range(1, cnt + 1), j -> ${dist("best", "j")}) AS dl
       |        FROM (SELECT *, CAST($bestF[1] AS BIGINT) AS best
       |              FROM prim, pts WHERE i < cnt - 1))),
       |mst AS (SELECT x, y, cnt, ea, eb, el FROM prim, pts WHERE i = cnt - 1),
       |base AS (SELECT *, list_sort(el) AS sl, ${osumL("el")} AS total FROM mst),
       |pctc AS (SELECT *, ${pct("75")} AS q75, ${pct("25")} AS q25, ${pct("90")} AS q90,
       |                ${pct("50")} AS q50, ${pct("10")} AS q10, sl[len(sl)] AS maxe FROM base),
       |degc AS (SELECT *, list_transform(range(1, cnt + 1), v ->
       |           len(list_filter(ea, t -> t = v)) + len(list_filter(eb, t -> t = v))) AS dg FROM pctc),
       |incc AS (SELECT *,
       |  list_transform(range(1, cnt + 1), v ->
       |    [CAST(eb[k] AS DOUBLE) FOR k IN range(1, cnt) IF ea[k] = v] ||
       |    [CAST(ea[k] AS DOUBLE) FOR k IN range(1, cnt) IF eb[k] = v]) AS inco,
       |  list_transform(range(1, cnt + 1), v ->
       |    [el[k] FOR k IN range(1, cnt) IF ea[k] = v] ||
       |    [el[k] FOR k IN range(1, cnt) IF eb[k] = v]) AS incl FROM degc),
       |d0c AS (SELECT *, list_reduce(list_prepend(
       |          list_transform(range(1, cnt + 1), u -> CASE WHEN u = 1 THEN 0.0::DOUBLE ELSE -1.0::DOUBLE END),
       |          list_transform(range(1, cnt), k -> [CAST(k AS DOUBLE)])),
       |          (acc, e) -> list_transform(range(1, cnt + 1), u ->
       |            CASE WHEN u = eb[CAST(e[1] AS BIGINT)]
       |                 THEN acc[ea[CAST(e[1] AS BIGINT)]] + el[CAST(e[1] AS BIGINT)]
       |                 ELSE acc[u] END)) AS d0 FROM incc),
       |anc AS MATERIALIZED (SELECT *, CAST(${argmaxF("d0")}[1] AS BIGINT) AS na FROM d0c),
       |rel(j, dv) AS (
       |  SELECT 0, list_transform(range(1, cnt + 1), u -> CASE WHEN u = na THEN 0.0::DOUBLE ELSE -1.0::DOUBLE END)
       |  FROM anc
       |  UNION ALL
       |  SELECT j + 1, list_transform(range(1, cnt + 1), u ->
       |    CASE WHEN dv[u] >= 0 THEN dv[u] ELSE $relax END)
       |  FROM rel, anc WHERE j < cnt AND len(list_filter(dv, t -> t < 0)) > 0),
       |dac AS (SELECT dv AS da FROM rel ORDER BY j DESC LIMIT 1),
       |bnc AS (SELECT anc.*, da, ${argmaxF("da")} AS bb FROM anc, dac),
       |szc AS (SELECT *, list_reduce(list_prepend(
       |          list_transform(range(1, cnt + 1), u -> 1.0::DOUBLE),
       |          list_transform(range(1, cnt), k -> [CAST(cnt - k AS DOUBLE)])),
       |          (acc, e) -> list_transform(range(1, cnt + 1), u ->
       |            CASE WHEN u = ea[CAST(e[1] AS BIGINT)]
       |                 THEN acc[u] + acc[eb[CAST(e[1] AS BIGINT)]]
       |                 ELSE acc[u] END)) AS sz FROM bnc),
       |sec AS (SELECT *, list_transform(
       |          list_sort(list_transform(range(1, cnt), k -> [-el[k], CAST(k AS DOUBLE)])),
       |          pr -> CAST(pr[2] AS BIGINT)) AS se FROM szc),
       |cutc AS (SELECT *, list_reduce(list_prepend([1.0::DOUBLE, -1.0::DOUBLE],
       |          list_transform(range(1, cnt), r -> [CAST(r AS DOUBLE)])),
       |          (acc, e) -> CASE WHEN acc[1] = 0 THEN acc
       |            WHEN el[se[CAST(e[1] AS BIGINT)]] <= 0 THEN [0.0, acc[2]]
       |            WHEN sz[eb[se[CAST(e[1] AS BIGINT)]]] > greatest(0.05::DOUBLE * cnt, 1.0::DOUBLE)
       |             AND sz[eb[se[CAST(e[1] AS BIGINT)]]] < least(cnt - 1.0::DOUBLE, 0.95::DOUBLE * cnt)
       |             AND (cnt - sz[eb[se[CAST(e[1] AS BIGINT)]]]) > greatest(0.05::DOUBLE * cnt, 1.0::DOUBLE)
       |             AND (cnt - sz[eb[se[CAST(e[1] AS BIGINT)]]]) < least(cnt - 1.0::DOUBLE, 0.95::DOUBLE * cnt)
       |            THEN [1.0, el[se[CAST(e[1] AS BIGINT)]]]
       |            ELSE [0.0, el[se[CAST(e[1] AS BIGINT)]]] END) AS cut FROM sec),
       |olc AS (SELECT *, ${osumL(
             "list_transform(range(1, cnt), k -> CASE WHEN el[k] > (q75 + 1.5 * (q75 - q25)) " +
               "AND (dg[ea[k]] = 1 OR dg[eb[k]] = 1) THEN el[k] ELSE 0.0 END)")} AS olcut,
       |          len(list_filter(dg, t -> t = 2)) AS deg2n,
       |          ${osumL(
             "list_transform(range(1, cnt + 1), v -> CASE WHEN dg[v] = 2 THEN " +
               "abs(((x[CAST(inco[v][1] AS BIGINT)] - x[v]) * (x[CAST(inco[v][2] AS BIGINT)] - x[v]) + " +
               "(y[CAST(inco[v][1] AS BIGINT)] - y[v]) * (y[CAST(inco[v][2] AS BIGINT)] - y[v])) / " +
               "(incl[v][1] * incl[v][2])) ELSE 0.0 END)")} AS stsum FROM cutc),
       |rkc AS (SELECT *,
       |  list_transform(range(1, cnt + 1), i2 -> CAST(2 * len(list_filter(x, t -> t < x[i2])) +
       |    len(list_filter(x, t -> t = x[i2])) + 1 AS DOUBLE) / 2.0) AS xr,
       |  list_transform(range(1, cnt + 1), i2 -> CAST(2 * len(list_filter(y, t -> t < y[i2])) +
       |    len(list_filter(y, t -> t = y[i2])) + 1 AS DOUBLE) / 2.0) AS yr FROM olc),
       |prc AS (SELECT *, ${osumL("xr")} / cnt AS mxr, ${osumL("yr")} / cnt AS myr FROM rkc),
       |pr2 AS (SELECT *,
       |  ${osumL("list_transform(range(1, cnt + 1), i2 -> (xr[i2] - mxr) * (yr[i2] - myr))")} AS pnum,
       |  ${osumL("list_transform(range(1, cnt + 1), i2 -> (xr[i2] - mxr) * (xr[i2] - mxr))")} AS pda,
       |  ${osumL("list_transform(range(1, cnt + 1), i2 -> (yr[i2] - myr) * (yr[i2] - myr))")} AS pdb
       |  FROM prc)
       |SELECT
       |  ${dec2("CASE WHEN cnt < 10 THEN 0.0 ELSE 100 * (total - olcut) / total END")} AS outlying,
       |  ${dec2("CASE WHEN cnt < 10 THEN 0.0 ELSE 100 * (q90 - q50 + 1e-6) / (q90 - q10 + 1e-6) END")} AS skewed,
       |  ${dec2("CASE WHEN cnt < 10 THEN 0.0 ELSE 100 * bb[2] / total END")} AS stringy,
       |  ${dec2(s"CASE WHEN cnt < 10 THEN 0.0 ELSE 100 * ${dist("na", "CAST(bb[1] AS BIGINT)")} / bb[2] END")} AS straight,
       |  ${dec2("CASE WHEN cnt < 10 OR deg2n = 0 THEN 0.0 ELSE 100 * stsum / deg2n END")} AS striated,
       |  ${dec2("CASE WHEN cnt < 10 OR pda = 0 OR pdb = 0 THEN 0.0 ELSE 100 * abs(pnum / sqrt(pda * pdb)) END")} AS monotonic,
       |  ${dec2("CASE WHEN cnt < 10 OR cut[2] < 0 THEN 0.0 ELSE 100 * (1 - (1e-6 + cut[2]) / (1e-6 + maxe)) END")} AS clumpy
       |FROM pr2""".stripMargin
  }
}
