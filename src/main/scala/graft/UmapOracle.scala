package graft

/** q_coret_umap oracle: a bit-exact DuckDB replay of the ENTIRE UMAP
  * fit ([[graft.functions.UMAP]]) — exact kNN graph, rho/sigma
  * calibration (64-iteration bisection), fuzzy-set symmetrization,
  * PCA init, the closed-form per-edge firing schedule, counter-based
  * negative draws, and every SGD update.
  *
  * Feasible because round 4 made the fit engine-replayable (see the
  * UMAP scaladoc): exp/ln/pow go through [[graft.functions.MirrorMath]]
  * (mirrored here term for term), negative sampling is a counter-based
  * quadratic-congruential hash (BIGINT-exact on both engines), and the
  * schedule is a closed form of (eps, epoch). Structure:
  *
  *  - kNN/rho as plain windowed rows (no folds — DuckDB 1.0 segfaults
  *    when many ROWS carry folds; single-row folds only, like
  *    [[TsneOracle]]);
  *  - sigma: ONE fold over cnt×65 elements (64 bisection iterations +
  *    finalize per point) carrying [done, lo, hi, sigma] + a growing
  *    tail of finished sigmas — the t-SNE bisection shape;
  *  - SGD: one fold over 2× the firing events (two phases per event).
  *    Phase 1 appends the event's 4 updated coordinates (an INNER
  *    61-stage fold: ln-exponent descent → Horner ln → kernel g →
  *    apply, for the attraction pair then each of 5 negatives) as
  *    scratch; phase 2 writes scratch into the y slots. Two phases so
  *    the inner fold is evaluated ONCE (no lets / no CSE assumption
  *    in DuckDB lambdas);
  *  - ln's exponent extraction is a 7-step binary descent over powers
  *    64..1 (covers the 1e-30-clamped kernel domain [2^-100, 2^128]);
  *    every step is an exact power-of-2 scaling, so it lands on the
  *    same (m, e) pair as MirrorMath.logm's unit-step loop.
  *
  * DuckDB 1.0 quirks honored (see TsneOracle): fixed-slot phases with
  * direct `acc`/`ia` references; no `list_transform([acc[k]], …)`
  * singleton bindings inside fold lambdas. Nested list_reduce inside a
  * fold lambda is verified correct (tools/umap_oracle_dev.py probes).
  *
  * tools/umap_oracle_dev.py is the dev twin of this builder: it emits
  * the same SQL stage by stage and exact-compares each stage against
  * a Scala-side trace (graft.tools.DumpUmap). Runtime at the gate's
  * 100-point chart: ~88k firing events; minutes-scale in DuckDB,
  * comparable to the accepted t-SNE oracle.
  */
object UmapOracle {

  private val L = "0.6931471805599453"
  private val LHI = "6.93147180369123816490e-01"
  private val LLO = "1.90821492927058770002e-10"
  private val EPOCHS = 300
  private val UA = "1.5769434603113077"
  private val UB = "0.8950608779109733"

  /** MirrorMath.expm mirrored: Cody–Waite reduction + 13-term Horner. */
  private def expSql(x: String): String = {
    val k = s"floor(($x) / $L + 0.5)"
    val r = s"((($x) - $k * $LHI) - $k * $LLO)"
    var acc = "1.0"
    for (i <- 13 to 1 by -1) acc = s"(1.0 + $r * $acc / $i.0)"
    s"(CASE WHEN ($x) < -745.0 THEN 0.0 WHEN ($x) > 709.0 THEN CAST('Infinity' AS DOUBLE) ELSE (pow(2.0, $k) * $acc) END)"
  }

  /** MirrorMath.logm's tail: e·ln2 + 2t·Q(t²), t = (m−1)/(m+1);
    * m and e must be short slot refs. */
  private def hornerLn(m: String, e: String): String = {
    val t = s"((($m) - 1.0) / (($m) + 1.0))"
    var acc = "0.0"
    for (i <- 16 to 0 by -1) acc = s"((1.0 / ${2 * i + 1}.0) + $t * $t * $acc)"
    s"(($e) * $L + 2.0 * $t * $acc)"
  }

  // binary-descent exponent extraction: one pass of powers 64..1
  // descends m ≥ 1 into [1,2) and ascends m < 1 into [1,2); every
  // multiply is an exact power-of-2 scaling. Literals are the shortest
  // decimal reprs (round-trip exactly to the binary powers).
  private val DescPowers = Seq(64, 32, 16, 8, 4, 2, 1)
  private def pow2(p: Int): String = java.lang.Double.toString(math.pow(2.0, p))
  private def pow2neg(p: Int): String = java.lang.Double.toString(math.pow(2.0, -p))
  private def pow2up1(p: Int): String = java.lang.Double.toString(math.pow(2.0, 1 - p))

  /** Full [m, e] normalize fold for one-off scalars (the log2(k) target). */
  private def normFold(x: String): String = {
    val steps = DescPowers.map(p => s"[$p.0, 0.0]").mkString(", ")
    val arms = DescPowers.map { p =>
      s"WHEN le[1] = $p.0 AND la[1] >= ${pow2(p)} THEN [la[1] * ${pow2neg(p)}, la[2] + $p.0] " +
        s"WHEN le[1] = $p.0 AND la[1] < ${pow2up1(p)} THEN [la[1] * ${pow2(p)}, la[2] - $p.0]"
    }.mkString(" ")
    s"list_reduce(list_prepend([CAST(($x) AS DOUBLE), 0.0], [$steps]), " +
      s"(la, le) -> CASE $arms ELSE la END)"
  }

  // ---- sigma bisection fold (state [done, lo, hi, sigma] + tail) ----
  private val IP = "((CAST(e[1] AS BIGINT) - 1) // 65 + 1)"
  private val PZ = "(((CAST(e[1] AS BIGINT) - 1) % 65) + 1)"
  private def ssum: String =
    "list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(dss[$IP], dv -> " +
      expSql(s"(-greatest(0.0, dv - rhs[$IP])) / acc[4]") +
      ")), (p, q) -> p + q)"
  private val init4 = "[0.0::DOUBLE, 0.0::DOUBLE, CAST('Infinity' AS DOUBLE), 1.0::DOUBLE]"
  private def sigStep: String = {
    val fin = s"list_concat(list_concat($init4, acc[5:len(acc)]), [acc[4]])"
    s"""CASE
       | WHEN $PZ = 65 THEN $fin
       | WHEN acc[1] = 1.0 THEN acc
       | WHEN abs($ssum - tgt) < 1e-5 THEN list_concat([1.0, acc[2], acc[3], acc[4]], acc[5:len(acc)])
       | WHEN $ssum > tgt THEN list_concat([0.0, acc[2], acc[4], (acc[2] + acc[4]) / 2.0], acc[5:len(acc)])
       | ELSE list_concat([0.0, acc[4], acc[3],
       |   CASE WHEN isinf(acc[3]) THEN acc[4] * 2.0 ELSE (acc[4] + acc[3]) / 2.0 END], acc[5:len(acc)])
       |END""".stripMargin
  }

  // ---- PCA init (power iteration, d = 2, start [1, 1/2]) ----
  private def powerFold(d1: String, d2: String): String = {
    val xv = s"((0.0 + cx[r] * $d1) + cy[r] * $d2)"
    val n1 = s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, cnt + 1), r -> cx[r] * $xv)), (p, q) -> p + q)"
    val n2 = s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, cnt + 1), r -> cy[r] * $xv)), (p, q) -> p + q)"
    val nrm = s"sqrt((0.0 + $n1 * $n1) + $n2 * $n2)"
    s"list_reduce(list_prepend([1.0::DOUBLE, 0.5::DOUBLE], list_transform(range(1, 101), zz -> [CAST(zz AS DOUBLE)])), " +
      s"(acc, e) -> CASE WHEN $nrm > 0.0 THEN [$n1 / $nrm, $n2 / $nrm] ELSE [$d1, $d2] END)"
  }
  private val cdef = "((0.0 + acc[1] * u1) + acc[2] * u2)"
  private def proj(v1: String, v2: String): String =
    s"list_transform(range(1, cnt + 1), r -> (0.0 + cx[r] * $v1) + cy[r] * $v2)"
  private def meanOf(c: String): String =
    s"(list_reduce(list_prepend(0.0::DOUBLE, $c), (p, q) -> p + q) / cnt)"

  // ---- firing schedule + counter-based negative draws ----
  private val ft = "least(CAST(t AS DOUBLE), floor(CAST(t AS DOUBLE) / eps))"
  private val ftm1 = "least(CAST(t AS DOUBLE) - 1.0, floor((CAST(t AS DOUBLE) - 1.0) / eps))"
  /** UMAP.draw mirrored in BIGINT (seed = 9 → +10 offset). */
  private def drw(tt: String): String = {
    val x0 = s"(($tt) + 10) % 2147483647"
    val x1 = s"(48271 * ($x0)) % 2147483647"
    val x2 = s"((($x1) * ($x1)) + 12345) % 2147483647"
    val x3 = s"(48271 * ($x2)) % 2147483647"
    s"(($x3) % cnt)"
  }
  private def negsSelect: String =
    (0 until 5).map(s => s"CAST(${drw(s"5 * (rn - 1) + $s")} + 1 AS DOUBLE)").mkString(", ")

  // ---- SGD: outer two-phase fold, inner 61-stage per-event fold ----
  private val I = "CAST(e[2] AS BIGINT)"
  private val J = "CAST(e[3] AS BIGINT)"
  private val AL = "e[4]"
  private val SC = "CAST(ie[1] AS BIGINT)"
  private val AUX = "CAST(ie[2] AS BIGINT)"
  private def clip(v: String): String = s"greatest(-4.0, least(4.0, $v))"
  private def innerStep: String = {
    val d2Att = "((ia[1] - ia[3]) * (ia[1] - ia[3]) + (ia[2] - ia[4]) * (ia[2] - ia[4]))"
    val mn = s"CAST(e[4 + $AUX] AS BIGINT)"
    val rx = s"(ia[1] - acc[$mn])"
    val ry = s"(ia[2] - acc[cnt + $mn])"
    val rd2 = s"greatest($rx * $rx + $ry * $ry, 1e-30)"
    val lnm = hornerLn("ia[5]", "ia[6]")
    val gAtt = s"((-2.0 * $UA * $UB * ${expSql(s"($UB - 1.0) * ia[5]")}) / " +
      s"(1.0 + $UA * ${expSql(s"$UB * ia[5]")}))"
    val gNeg = s"((2.0 * $UB) / ((0.001 + $rd2) * (1.0 + $UA * ${expSql(s"$UB * ia[5]")})))"
    val descent = DescPowers.map { p =>
      s"WHEN $AUX = $p AND ia[5] >= ${pow2(p)} THEN [ia[1], ia[2], ia[3], ia[4], ia[5] * ${pow2neg(p)}, ia[6] + $p.0] " +
        s"WHEN $AUX = $p AND ia[5] < ${pow2up1(p)} THEN [ia[1], ia[2], ia[3], ia[4], ia[5] * ${pow2(p)}, ia[6] - $p.0]"
    }.mkString(" ")
    val attApply =
      s"CASE WHEN $d2Att > 0.0 THEN [" +
        s"ia[1] + ${clip("ia[5] * (ia[1] - ia[3])")} * $AL, " +
        s"ia[2] + ${clip("ia[5] * (ia[2] - ia[4])")} * $AL, " +
        s"ia[3] - ${clip("ia[5] * (ia[1] - ia[3])")} * $AL, " +
        s"ia[4] - ${clip("ia[5] * (ia[2] - ia[4])")} * $AL, ia[5], ia[6]] ELSE ia END"
    val negApply =
      s"CASE WHEN $mn = $I OR $mn = $J THEN ia ELSE [" +
        s"ia[1] + ${clip(s"$gNeg * $rx")} * $AL, " +
        s"ia[2] + ${clip(s"$gNeg * $ry")} * $AL, " +
        s"ia[3], ia[4], ia[5], ia[6]] END"
    s"""CASE
       | WHEN $SC = 1 THEN [ia[1], ia[2], ia[3], ia[4], greatest($d2Att, 1e-30), 0.0]
       | WHEN $SC = 2 THEN CASE $descent ELSE ia END
       | WHEN $SC = 3 OR $SC = 7 THEN [ia[1], ia[2], ia[3], ia[4], $lnm, ia[6]]
       | WHEN $SC = 4 THEN [ia[1], ia[2], ia[3], ia[4], $gAtt, ia[6]]
       | WHEN $SC = 5 THEN $attApply
       | WHEN $SC = 6 THEN [ia[1], ia[2], ia[3], ia[4], greatest($rx * $rx + $ry * $ry, 1e-30), 0.0]
       | ELSE $negApply
       |END""".stripMargin
  }
  private def stageList: String = {
    val att = Seq("[1.0, 0.0]") ++ DescPowers.map(p => s"[2.0, $p.0]") ++
      Seq("[3.0, 0.0]", "[4.0, 0.0]", "[5.0, 0.0]")
    val negs = (1 to 5).flatMap(s =>
      Seq(s"[6.0, $s.0]") ++ DescPowers.map(p => s"[2.0, $p.0]") ++
        Seq("[7.0, 0.0]", s"[8.0, $s.0]"))
    (att ++ negs).mkString("[", ", ", "]")
  }
  private def outerStep: String = {
    val inner = s"list_reduce(list_prepend([acc[$I], acc[cnt + $I], acc[$J], acc[cnt + $J], 0.0, 0.0], " +
      s"$stageList), (ia, ie) -> $innerStep)"
    val ph1 = s"list_concat(acc[1:2 * cnt], $inner[1:4])"
    val ph2 = s"list_transform(range(1, 2 * cnt + 1), idx -> " +
      s"CASE WHEN idx = $I THEN acc[2 * cnt + 1] " +
      s"WHEN idx = cnt + $I THEN acc[2 * cnt + 2] " +
      s"WHEN idx = $J THEN acc[2 * cnt + 3] " +
      s"WHEN idx = cnt + $J THEN acc[2 * cnt + 4] " +
      s"ELSE acc[idx] END)"
    s"CASE WHEN e[1] = 1.0 THEN $ph1 ELSE $ph2 END"
  }

  /** The complete oracle SQL for q_coret_umap (supplier, 2 features). */
  def sql: String = {
    val m0 = "(list_reduce(list_prepend(0.0::DOUBLE, fy[1:cnt]), (p, q) -> p + q) / cnt)"
    val m1 = "(list_reduce(list_prepend(0.0::DOUBLE, fy[cnt + 1:2 * cnt]), (p, q) -> p + q) / cnt)"
    val w = expSql("(-greatest(0.0, d - rho)) / sg")
    s"""WITH src AS (SELECT s_suppkey AS k, CAST(s_nationkey AS DOUBLE) AS f1, CAST(s_acctbal AS DOUBLE) AS f2 FROM supplier),
       |mm AS (SELECT MIN(f1) lo1, MAX(f1) hi1, MIN(f2) lo2, MAX(f2) hi2 FROM src),
       |nn AS (SELECT k,
       |        coalesce(CASE WHEN hi1 = lo1 THEN 0.0 ELSE (f1 - lo1) / (hi1 - lo1) END, 0.0) AS f1,
       |        coalesce(CASE WHEN hi2 = lo2 THEN 0.0 ELSE (f2 - lo2) / (hi2 - lo2) END, 0.0) AS f2
       |      FROM src, mm ORDER BY k LIMIT 2001),
       |pts AS MATERIALIZED (SELECT list(f1 ORDER BY k) AS x, list(f2 ORDER BY k) AS y, list(k ORDER BY k) AS ks, COUNT(*) AS cnt,
       |        least(15, COUNT(*) - 1) AS kk FROM nn),
       |ii AS (SELECT unnest(range(1, cnt + 1)) AS i FROM pts),
       |pr AS (SELECT a.i AS i, b.i AS j,
       |        sqrt((x[a.i] - x[b.i]) * (x[a.i] - x[b.i]) + (y[a.i] - y[b.i]) * (y[a.i] - y[b.i])) AS d
       |      FROM ii a, ii b, pts WHERE a.i != b.i),
       |knnr AS (SELECT i, j, d, row_number() OVER (PARTITION BY i ORDER BY d, j) AS rn FROM pr),
       |kn AS (SELECT i, j, d, rn FROM knnr, pts WHERE rn <= kk),
       |rhor AS (SELECT i, COALESCE(MIN(d) FILTER (WHERE d > 0.0), 0.0) AS rho FROM kn GROUP BY i),
       |klm AS MATERIALIZED (SELECT
       |        list(nb ORDER BY i) AS nbs, list(ds ORDER BY i) AS dss, list(rho ORDER BY i) AS rhs
       |      FROM (SELECT kn.i, list(j ORDER BY rn) AS nb, list(d ORDER BY rn) AS ds, any_value(rho) AS rho
       |            FROM kn JOIN rhor ON kn.i = rhor.i GROUP BY kn.i)),
       |tg0 AS (SELECT pts.*, klm.*, ${normFold("CAST(kk AS DOUBLE)")} AS tl FROM pts, klm),
       |tg AS MATERIALIZED (SELECT *, ${hornerLn("tl[1]", "tl[2]")} / $L AS tgt FROM tg0),
       |sig AS MATERIALIZED (SELECT tg.*, list_reduce(list_prepend(
       |        $init4,
       |        list_transform(range(1, cnt * 65 + 1), zt -> [CAST(zt AS DOUBLE)])),
       |        (acc, e) -> $sigStep)[5:] AS sgs
       |      FROM tg),
       |dirw AS (SELECT kn.i AS i, kn.j AS j, $w AS w
       |      FROM kn JOIN rhor ON kn.i = rhor.i, (SELECT sgs FROM sig) s0, LATERAL (SELECT s0.sgs[kn.i] AS sg)),
       |pw AS (SELECT least(i, j) AS a, greatest(i, j) AS b,
       |        COALESCE(MAX(CASE WHEN i < j THEN w END), 0.0) AS wf,
       |        COALESCE(MAX(CASE WHEN i > j THEN w END), 0.0) AS wb
       |      FROM dirw GROUP BY 1, 2),
       |edges AS MATERIALIZED (SELECT a, b, (wf + wb) - wf * wb AS s,
       |        row_number() OVER (ORDER BY a, b) AS en FROM pw),
       |mx AS (SELECT MAX(s) AS maxw FROM edges),
       |ctr AS (SELECT sig.*, list_transform(x, v -> v - ${meanOf("x")}) AS cx,
       |               list_transform(y, v -> v - ${meanOf("y")}) AS cy FROM sig),
       |pw1 AS MATERIALIZED (SELECT *, ${powerFold("acc[1]", "acc[2]")} AS vv1 FROM ctr),
       |pw1b AS (SELECT *, vv1[1] AS u1, vv1[2] AS u2 FROM pw1),
       |pw2 AS MATERIALIZED (SELECT *, ${powerFold(s"(acc[1] - $cdef * u1)", s"(acc[2] - $cdef * u2)")} AS vv2 FROM pw1b),
       |pj AS (SELECT *, ${proj("u1", "u2")} AS c1, ${proj("vv2[1]", "vv2[2]")} AS c2 FROM pw2),
       |sc AS (SELECT *, greatest(list_aggregate(list_transform(c1, v -> abs(v)), 'max'),
       |                 greatest(list_aggregate(list_transform(c2, v -> abs(v)), 'max'), 1e-12)) AS spn FROM pj),
       |ini AS MATERIALIZED (SELECT *, list_concat(
       |        list_transform(c1, v -> v / spn * 10.0),
       |        list_transform(c2, v -> v / spn * 10.0)) AS st0 FROM sc),
       |ev0 AS (SELECT a, b, eps, unnest(range(1, $EPOCHS + 1)) AS t
       |      FROM (SELECT a, b, maxw / s AS eps FROM edges, mx)),
       |ev1 AS (SELECT a, b, t FROM ev0 WHERE $ft > $ftm1),
       |ev2 AS (SELECT a, b, t, row_number() OVER (ORDER BY t, a, b) AS rn,
       |        1.0 - (CAST(t AS DOUBLE) - 1.0) / $EPOCHS.0 AS alpha FROM ev1),
       |evl AS MATERIALIZED (SELECT list([CAST(a AS DOUBLE), CAST(b AS DOUBLE), alpha, $negsSelect] ORDER BY rn) AS evs,
       |        COUNT(*) AS nev FROM ev2, pts),
       |evp AS MATERIALIZED (SELECT flatten(list_transform(evs, ee ->
       |        [list_concat([1.0], ee), [2.0, ee[1], ee[2]]])) AS evp2 FROM evl),
       |gd AS MATERIALIZED (SELECT ini.cnt AS cnt, ini.ks AS ks,
       |        list_reduce(list_prepend(st0, evp2), (acc, e) -> $outerStep) AS fy
       |      FROM ini, evp),
       |fin AS (SELECT ks, cnt, fy, $m0 AS m0, $m1 AS m1 FROM gd)
       |SELECT unnest(ks) AS s_suppkey,
       |       unnest(list_transform(fy[1:cnt], v -> v - m0)) AS umap_1,
       |       unnest(list_transform(fy[cnt + 1:2 * cnt], v -> v - m1)) AS umap_2
       |FROM fin""".stripMargin
  }
}
