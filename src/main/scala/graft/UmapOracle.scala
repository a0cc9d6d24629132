package graft

/** q_coret_umap oracle: a bit-exact DuckDB replay of the ENTIRE UMAP
  * fit ([[graft.functions.UMAP]]) — exact kNN graph, rho/sigma
  * calibration (64-iteration bisection), fuzzy-set symmetrization,
  * PCA init, the closed-form per-edge firing schedule, counter-based
  * negative draws, and every SGD update, with NO output rounding.
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
  *    Phase 1 appends the event's 4 updated coordinates — an INNER
  *    43-stage fold on a 10-slot state [xi, yi, xj, yj, scratch×6] —
  *    after the state; phase 2 writes them into the y slots. Two
  *    phases so the inner fold is evaluated ONCE (DuckDB lambdas have
  *    no lets and no CSE).
  *
  * Cost model (measured, DuckDB 1.0): ~8.4 µs fixed per fold step,
  * ~1.3 µs per EVALUATED expression node, untaken CASE branches free.
  * Hence the slot discipline: every Horner chain reads its base from a
  * state slot, ln's exponent extraction is floor(log2(x)) + a one-step
  * adjust (faithful libm log2 is off by at most one at integer
  * boundaries; every rescale is an exact power-of-2 multiply, so it
  * lands on the same unique (m ∈ [1,2), e) pair as MirrorMath.logm's
  * unit-step loop), and kernel args are clamped to ≥ 1e-30 so every
  * exp argument stays inside (-75, 636) and expm's ±745/709 guards can
  * never fire — the SQL omits them.
  *
  * DuckDB 1.0 traps honored: fixed-slot phases, no singleton-binding
  * `list_transform([acc[k]], …)` inside fold lambdas (miscompiles),
  * and — found the hard way — REAL LITERALS MUST BE E-NOTATION:
  * DuckDB parses plain decimals as DECIMAL, so literal-only
  * subexpressions like `(0.895… - 1.0)` constant-fold in exact decimal
  * arithmetic and round differently (up to 4 ulp) than Scala's double
  * subtraction. `8.950608779109733e-1` parses as DOUBLE.
  *
  * tools/umap_oracle_dev.py is the dev twin of this builder: it emits
  * the same SQL and exact-compares every stage (kNN, rho, sigma,
  * edges, maxW, init, the 14,331-event schedule, and the full SGD +
  * recenter) against a Scala-side trace (graft.tools.DumpUmap) —
  * all OK at the gate's 100-point chart, ~116 s wall in DuckDB
  * (the accepted t-SNE oracle runs ~49 s).
  */
object UmapOracle {

  private val L = "6.931471805599453e-1"
  private val LHI = "6.93147180369123816490e-01"
  private val LLO = "1.90821492927058770002e-10"
  /** Gate-query epoch count (CoreT.umap's `epochs`): pinned like
    * kmeans pins fitCap=2000, so the oracle's event fold stays within
    * the driver's DuckDB budget; the operator default stays 300
    * (spec-tested at full strength, UmapQualitySpec). History: 50 →
    * 150 in round 6 (104s → 289s replay), then 150 → 30 in round 8:
    * at 150 the replay alone ate 321s of the driver's correctness
    * window, which expired into an empty CORRECTNESS_r07.json twice
    * running; the whole gate's DuckDB side must stay under ~3 min
    * (tools/check.py prints total_oracle_sec and warns past 180s).
    * The fold is ~linear in epochs, so 30 ≈ 60-70s. Discrimination is
    * unchanged in kind: every stage (kNN, rho/sigma bisection, fuzzy
    * union, PCA init, schedule, counter draws, SGD kernel) still
    * replays bit-exactly, just over a shorter event stream. */
  val GateEpochs = 30

  /** Gate-query input bound (s_suppkey ≤ this), shared with
    * MLQueries.q_coret_umap like [[TsneOracle.GateKeyBound]]: the
    * sigma bisection (cnt×65 fold steps, k exp's each) and PCA init
    * are epoch-INDEPENDENT — ~39 s of the replay at sf0.01's 100
    * suppliers survived the epoch re-pin — and the event stream
    * scales with the kNN edge count (~cnt·k). The bound cuts both,
    * and makes the gate's replay cost independent of the scale factor
    * (unbounded supplier at sf0.1 is 1000 points — that replay would
    * run for hours if the gate ever ran at a larger sf), like the
    * dbscan (≤2000), lda (≤32) and tsne (≤48) bounds. 64 → 48 later
    * in round 8: the 64-point replay still measured ~45 s idle and
    * the three manifold replays together held ~140 s of the ~180 s
    * budget; at 48 points every stage still replays bit-exactly. */
  val GateKeyBound = 48
  private val UA = "1.5769434603113077e0"
  private val UB = "8.950608779109733e-1"

  /** MirrorMath.expm mirrored: Cody–Waite reduction + 13-term Horner.
    * Used where the argument is a plain column (weights/sigma stages) —
    * keeps the range guards since those args aren't pre-bounded. */
  private def expSql(x: String): String = {
    val k = s"floor(($x) / $L + 0.5)"
    val r = s"((($x) - $k * $LHI) - $k * $LLO)"
    s"(CASE WHEN ($x) < -745.0 THEN 0.0 WHEN ($x) > 709.0 THEN CAST('Infinity' AS DOUBLE) ELSE (pow(2.0, $k) * ${horner13(r)}) END)"
  }

  /** expm's 13-term Taylor Horner; `r` should be a slot ref or short. */
  private def horner13(r: String): String = {
    var acc = "1.0"
    for (i <- 13 to 1 by -1) acc = s"(1.0 + $r * $acc / $i.0)"
    acc
  }

  /** logm's 17-term atanh-series Horner on a slotted t². */
  private def horner17(t2: String): String = {
    var acc = "0.0"
    for (i <- 16 to 0 by -1) acc = s"((1.0 / ${2 * i + 1}.0) + $t2 * $acc)"
    acc
  }

  /** MirrorMath.logm's tail for short m/e refs (target stage). */
  private def hornerLn(m: String, e: String): String = {
    val t = s"((($m) - 1.0) / (($m) + 1.0))"
    var acc = "0.0"
    for (i <- 16 to 0 by -1) acc = s"((1.0 / ${2 * i + 1}.0) + $t * $t * $acc)"
    s"(($e) * $L + 2.0 * $t * $acc)"
  }

  // binary-descent [m, e] normalize fold for the one-off log2(k) target
  private val DescPowers = Seq(64, 32, 16, 8, 4, 2, 1)
  private def dbl(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.contains("E") || s.contains("e")) s.toLowerCase else s + "e0"
  }
  private def normFold(x: String): String = {
    val steps = DescPowers.map(p => s"[$p.0, 0.0]").mkString(", ")
    val arms = DescPowers.map { p =>
      s"WHEN le[1] = $p.0 AND la[1] >= ${dbl(math.pow(2, p))} THEN [la[1] * ${dbl(math.pow(2, -p))}, la[2] + $p.0] " +
        s"WHEN le[1] = $p.0 AND la[1] < ${dbl(math.pow(2, 1 - p))} THEN [la[1] * ${dbl(math.pow(2, p))}, la[2] - $p.0]"
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
  /** UMAP.draw mirrored in BIGINT; the counter offset is derived from
    * the shared seed constant (UMAP.DefaultSeed = 9 → +10), so a seed
    * change on the Scala side desynchronizes the SQL loudly at build
    * time instead of silently at gate time. */
  private val DrawOffset = graft.functions.UMAP.drawOffset(graft.functions.UMAP.DefaultSeed)
  private def drw(tt: String): String = {
    val x0 = s"(($tt) + $DrawOffset) % 2147483647"
    val x1 = s"(48271 * ($x0)) % 2147483647"
    val x2 = s"((($x1) * ($x1)) + 12345) % 2147483647"
    val x3 = s"(48271 * ($x2)) % 2147483647"
    s"(($x3) % cnt)"
  }
  private def negsSelect: String =
    (0 until 5).map(s => s"CAST(${drw(s"5 * (rn - 1) + $s")} + 1 AS DOUBLE)").mkString(", ")

  // ---- SGD: outer two-phase fold, inner 43-stage per-event fold ----
  private val I = "CAST(e[2] AS BIGINT)"
  private val J = "CAST(e[3] AS BIGINT)"
  private val AL = "e[4]"
  private val SC = "CAST(ie[1] AS BIGINT)"
  private val AUX = "CAST(ie[2] AS BIGINT)"
  private def clip(v: String): String = s"greatest(-4.0, least(4.0, $v))"

  /** 10-slot rebuild with only the given slots changed. */
  private def keep(upd: (Int, String)*): String = {
    val m = upd.toMap
    (1 to 10).map(k => m.getOrElse(k, s"ia[$k]")).mkString("[", ", ", "]")
  }

  private def innerStep: String = {
    val d2Att = "((ia[1] - ia[3]) * (ia[1] - ia[3]) + (ia[2] - ia[4]) * (ia[2] - ia[4]))"
    val mn = s"CAST(e[4 + $AUX] AS BIGINT)"
    val rx = s"(ia[1] - acc[$mn])"
    val ry = s"(ia[2] - acc[cnt + $mn])"
    val e0 = "floor(log2(ia[5]))"
    val m0 = s"(ia[5] * pow(2.0, -$e0))"
    val st = Map(
      // attraction: d2 seed → (m,e) → (t,t²) → lnval → k's → r's → g → apply
      1 -> keep(5 -> s"greatest($d2Att, 1e-30)"),
      2 -> keep(
        5 -> s"(CASE WHEN $m0 >= 2.0 THEN $m0 * 0.5 WHEN $m0 < 1.0 THEN $m0 * 2.0 ELSE $m0 END)",
        6 -> s"(CASE WHEN $m0 >= 2.0 THEN $e0 + 1.0 WHEN $m0 < 1.0 THEN $e0 - 1.0 ELSE $e0 END)"),
      3 -> keep(7 -> "((ia[5] - 1.0) / (ia[5] + 1.0))",
        8 -> "(((ia[5] - 1.0) / (ia[5] + 1.0)) * ((ia[5] - 1.0) / (ia[5] + 1.0)))"),
      4 -> keep(5 -> s"(ia[6] * $L + 2.0 * ia[7] * ${horner17("ia[8]")})"),
      5 -> keep(6 -> s"floor((($UB - 1.0) * ia[5]) / $L + 0.5)",
        7 -> s"floor(($UB * ia[5]) / $L + 0.5)"),
      6 -> keep(8 -> s"(((($UB - 1.0) * ia[5]) - ia[6] * $LHI) - ia[6] * $LLO)",
        9 -> s"((($UB * ia[5]) - ia[7] * $LHI) - ia[7] * $LLO)"),
      7 -> keep(5 -> (s"((-2.0 * $UA * $UB * (pow(2.0, ia[6]) * ${horner13("ia[8]")})) / " +
        s"(1.0 + $UA * (pow(2.0, ia[7]) * ${horner13("ia[9]")})))")),
      8 -> (s"CASE WHEN $d2Att > 0.0 THEN " + keep(
        1 -> s"(ia[1] + ${clip("ia[5] * (ia[1] - ia[3])")} * $AL)",
        2 -> s"(ia[2] + ${clip("ia[5] * (ia[2] - ia[4])")} * $AL)",
        3 -> s"(ia[3] - ${clip("ia[5] * (ia[1] - ia[3])")} * $AL)",
        4 -> s"(ia[4] - ${clip("ia[5] * (ia[2] - ia[4])")} * $AL)") + " ELSE ia END"),
      // negatives: rd2 seed (rd2 also kept in s10) → shared 2/3/4 → k,r → g → apply
      9 -> keep(5 -> s"greatest($rx * $rx + $ry * $ry, 1e-30)",
        10 -> s"greatest($rx * $rx + $ry * $ry, 1e-30)"),
      10 -> keep(6 -> s"floor(($UB * ia[5]) / $L + 0.5)",
        7 -> (s"((($UB * ia[5]) - floor(($UB * ia[5]) / $L + 0.5) * $LHI) - " +
          s"floor(($UB * ia[5]) / $L + 0.5) * $LLO)")),
      11 -> keep(5 -> (s"((2.0 * $UB) / ((0.001 + ia[10]) * " +
        s"(1.0 + $UA * (pow(2.0, ia[6]) * ${horner13("ia[7]")}))))")),
      12 -> (s"CASE WHEN $mn = $I OR $mn = $J THEN ia ELSE " + keep(
        1 -> s"(ia[1] + ${clip(s"ia[5] * $rx")} * $AL)",
        2 -> s"(ia[2] + ${clip(s"ia[5] * $ry")} * $AL)") + " END"))
    "CASE " + (1 to 11).map(c => s"WHEN $SC = $c THEN ${st(c)}").mkString(" ") +
      s" ELSE ${st(12)} END"
  }

  private def stageList: String = {
    val att = (1 to 8).map(c => s"[$c.0, 0.0]")
    val negs = (1 to 5).flatMap(s => Seq(s"[9.0, $s.0]", "[2.0, 0.0]", "[3.0, 0.0]",
      "[4.0, 0.0]", "[10.0, 0.0]", "[11.0, 0.0]", s"[12.0, $s.0]"))
    (att ++ negs).mkString("[", ", ", "]")
  }

  private def outerStep: String = {
    val inner = s"list_reduce(list_prepend([acc[$I], acc[cnt + $I], acc[$J], acc[cnt + $J], " +
      s"0.0, 0.0, 0.0, 0.0, 0.0, 0.0], $stageList), (ia, ie) -> $innerStep)"
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
    s"""WITH src AS (SELECT s_suppkey AS k, CAST(s_nationkey AS DOUBLE) AS f1, CAST(s_acctbal AS DOUBLE) AS f2 FROM supplier WHERE s_suppkey <= $GateKeyBound),
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
       |ev0 AS (SELECT a, b, eps, unnest(range(1, $GateEpochs + 1)) AS t
       |      FROM (SELECT a, b, maxw / s AS eps FROM edges, mx)),
       |ev1 AS (SELECT a, b, t FROM ev0 WHERE $ft > $ftm1),
       |ev2 AS (SELECT a, b, t, row_number() OVER (ORDER BY t, a, b) AS rn,
       |        1.0 - (CAST(t AS DOUBLE) - 1.0) / $GateEpochs.0 AS alpha FROM ev1),
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
