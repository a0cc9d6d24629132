package graft

/** q_coret_lda oracle: a bit-exact DuckDB replay of the ENTIRE
  * deterministic VB-LDA fit ([[graft.functions.VBLda]]) — percentile
  * ranks, the counter-hash topic init, all 10 batch EM iterations
  * (per-doc mean-field E-steps with their 1e-3 convergence tests,
  * sufficient-statistics accumulation, M-steps), the final posterior
  * pass, argmax labels, and the reference-format label strings.
  *
  * Feasible because round 4 replaced MLlib's partitioning-dependent
  * online EM with a fit that is a pure function of the canonically
  * ordered count matrix (MirrorMath digammam/expm/logm). Structure,
  * following [[UmapOracle]]'s measured cost model:
  *
  *  - ONE fold over ~170k phase elements on a 72-slot state
  *    (λ 1-8 | expElogbeta 9-16 | sstats 17-24 | γ 25-28 | eet 29-32 |
  *    done 33 | ψ scratch 34-38 | x-star / v / t² digamma scratch 39-53 |
  *    packed argmax tail 56-72);
  *  - each digamma decomposes into slot-staged phases (x* and the
  *    recurrence sum v, then t², then ψ) so no Horner chain ever
  *    textually embeds another transcendental — the per-step lambda
  *    tree stays small and unexecuted CASE branches stay free;
  *  - per-doc argmaxes pack 24 two-bit values per double into a fixed
  *    17-slot tail (exact integer arithmetic < 2^48) — the state never
  *    grows, so fold steps stay O(state);
  *  - the shifted digamma arguments are single adds from the original
  *    x (x + t), never an accumulated x += 1 — accumulation rounds
  *    differently and desynchronizes low bits (found the hard way);
  *  - real literals in e-notation (the DuckDB DECIMAL-literal trap,
  *    see UmapOracle); exp range guards omitted — ψ differences are
  *    bounded in (−12, 0] for λ, γ ≥ 1/K;
  *  - label strings: substr(CAST(w AS VARCHAR), 1, 6), legal because
  *    DuckDB's VARCHAR cast and Java's Double.toString are both
  *    shortest-roundtrip — verified equal on the gate fit's weights.
  *
  * The gate bounds its input to p_partkey ≤ [[GateKeyBound]] (like
  * dbscan's gate; the reference caps sources at 400 rows) — the replay
  * runs all 10×30 sweeps per doc, so its cost is linear in docs.
  * Round 8 cut the bound 100 → 50 → 32 (81 s → ~40 s → ~25 s): the
  * whole oracle gate must stay under ~3 min of DuckDB time or the
  * driver's correctness window expires (it did, twice — r6/r7), and
  * the LDA replay was still the single largest line item at 50; every
  * VB stage still replays bit-exactly, over fewer docs.
  * tools/lda_oracle_dev.py is the dev twin (python bit-exact replayer
  * + stage checks, all OK against graft.tools.DumpLda's trace).
  */
object LdaOracle {

  /** Gate-query shape, shared with MLQueries.q_coret_lda so the Spark
    * query and this SQL cannot drift independently. */
  val GateFeatures: Seq[String] = Seq("p_size", "p_retailprice")
  val GateKeyBound = 32

  /** Topic count / seed / priors come from the operator's own
    * constants ([[graft.operators.CoreT.LdaK]]/LdaSeed,
    * [[graft.functions.VBLda.InitDrawBound]]); the fold layout below
    * (slot map, packed argmax width) is SPECIALIZED to k=4 × 2
    * features, so a constant change fails these requires at SQL-build
    * time instead of surfacing as a silent gate value mismatch. */
  private val K = graft.operators.CoreT.LdaK
  require(K == 4, s"LdaOracle fold layout is specialized to k=4 (got $K)")
  require(GateFeatures.length == 2,
    s"LdaOracle fold layout is specialized to 2 features (got ${GateFeatures.length})")
  /** α = η = 1/K (sklearn defaults); renders "0.25" — exact in DOUBLE. */
  private val Alpha = s"${1.0 / K}"
  private val DrawOffset =
    graft.functions.UMAP.drawOffset(graft.operators.CoreT.LdaSeed)
  private val DrawBound = graft.functions.VBLda.InitDrawBound

  /** sstats fixed-point pin (2^36) — derived from the operator's
    * constant so the SQL cannot drift from the Scala fit. Slots hold
    * the pinned INTEGER totals (exact in a double while < 2^53; gate
    * bound: 101 docs × counts ≤ 100 × 2^36 ≈ 6.9e14). */
  private val Pin = {
    val p = graft.functions.VBLda.SStatsPinScale
    require(p == 68719476736.0, s"LdaOracle literal assumes the 2^36 pin (got $p)")
    "6.8719476736e10"
  }

  private val L = "6.931471805599453e-1"
  private val LHI = "6.93147180369123816490e-01"
  private val LLO = "1.90821492927058770002e-10"
  private val NSlot = 72
  private val Pack0 = 56
  private val MaxIter = 10

  private def keep(upd: Map[Int, String]): String =
    (1 to NSlot).map(k => upd.getOrElse(k, s"ia[$k]")).mkString("[", ", ", "]")

  private def horner13(r: String): String = {
    var acc = "1.0"
    for (i <- 13 to 1 by -1) acc = s"(1.0 + $r * $acc / $i.0)"
    acc
  }

  private def horner17(t2: String): String = {
    var acc = "0.0"
    for (i <- 16 to 0 by -1) acc = s"((1.0 / ${2 * i + 1}.0) + $t2 * $acc)"
    acc
  }

  /** x + #applied-recurrence-steps as ONE add (digammam's x + t). */
  private def xstar(a: String): String = {
    val cnt = (0 until 6).map(t =>
      s"(CASE WHEN ($a) + $t.0 < 6.0 THEN 1.0 ELSE 0.0 END)").mkString(" + ")
    s"(($a) + ($cnt))"
  }

  /** −Σ 1/(a+t) over applied steps, left-associated like the loop. */
  private def vrec(a: String): String = {
    var acc = "0.0"
    for (t <- 0 until 6)
      acc = s"($acc - (CASE WHEN ($a) + $t.0 < 6.0 THEN 1.0 / (($a) + $t.0) ELSE 0.0 END))"
    acc
  }

  private def mOf(xs: String): String = {
    val e0 = s"floor(log2($xs))"
    val m0 = s"(($xs) * pow(2.0, -$e0))"
    s"(CASE WHEN $m0 >= 2.0 THEN $m0 * 0.5 WHEN $m0 < 1.0 THEN $m0 * 2.0 ELSE $m0 END)"
  }

  private def eOf(xs: String): String = {
    val e0 = s"floor(log2($xs))"
    val m0 = s"(($xs) * pow(2.0, -$e0))"
    s"(CASE WHEN $m0 >= 2.0 THEN $e0 + 1.0 WHEN $m0 < 1.0 THEN $e0 - 1.0 ELSE $e0 END)"
  }

  private def t2Of(xs: String): String = {
    val m = mOf(xs)
    val t = s"((($m) - 1.0) / (($m) + 1.0))"
    s"($t * $t)"
  }

  /** ψ from slotted x*, v, t²: v + e·L + 2t·Q(t²) − 1/(2x*) − series. */
  private def psi(xslot: Int, vslot: Int, t2slot: Int): String = {
    val xs = s"ia[$xslot]"
    val m = mOf(xs)
    val t = s"((($m) - 1.0) / (($m) + 1.0))"
    val ln = s"(${eOf(xs)} * $L + 2.0 * $t * ${horner17(s"ia[$t2slot]")})"
    val inv = s"(1.0 / $xs)"
    val inv2 = s"($inv * $inv)"
    val ser = s"($inv2 * (1.0 / 12.0 - $inv2 * (1.0 / 120.0 - $inv2 * " +
      s"(1.0 / 252.0 - $inv2 * (1.0 / 240.0 - $inv2 * (1.0 / 132.0))))))"
    s"(ia[$vslot] + $ln - 0.5 * $inv - $ser)"
  }

  /** expm without range guards (ψ-difference args are bounded). */
  private def expmSql(a: String): String = {
    val k = s"floor(($a) / $L + 0.5)"
    val r = s"((($a) - $k * $LHI) - $k * $LLO)"
    s"(pow(2.0, $k) * ${horner13(r)})"
  }

  private def stages: Map[Int, String] = {
    val C1 = "e[2]"; val C2 = "e[3]"; val DP = "CAST(e[4] AS BIGINT)"
    def g(i: Int) = s"ia[${24 + i}]"
    def eet(i: Int) = s"ia[${28 + i}]"
    def eeb(i: Int, j: Int) = s"ia[${8 + (i - 1) * 2 + j}]"
    val gsum = "(((ia[25] + ia[26]) + ia[27]) + ia[28])"
    def norm(j: Int) = {
      val terms = (1 to 4).map(k => s"${eet(k)} * ${eeb(k, j)}").mkString(" + ")
      s"(1e-100 + $terms)"
    }
    def gnew(i: Int) =
      s"($Alpha + ${eet(i)} * ($C1 * ${eeb(i, 1)} / ${norm(1)} + $C2 * ${eeb(i, 2)} / ${norm(2)}))"
    val change = (1 to 4).map(i => s"abs(${gnew(i)} - ${g(i)})").mkString(" + ")
    val am =
      "(CASE WHEN ia[25] >= ia[26] AND ia[25] >= ia[27] AND ia[25] >= ia[28] THEN 0.0 " +
        "WHEN ia[26] >= ia[27] AND ia[26] >= ia[28] THEN 1.0 " +
        "WHEN ia[27] >= ia[28] THEN 2.0 ELSE 3.0 END)"
    val slotOf = s"($Pack0 + ($DP - 1) // 24)"
    Map(
      0 -> keep((25 to 28).map(s => s -> s"($Alpha + ($C1 + $C2) / $K.0)").toMap + (33 -> "0.0")),
      1 -> keep(((1 to 4).flatMap(i => Seq(
        38 + i -> xstar(g(i)), 43 + i -> vrec(g(i)))) ++
        Seq(43 -> xstar(gsum), 48 -> vrec(gsum))).toMap),
      2 -> keep((1 to 5).map(i => (48 + i) -> t2Of(s"ia[${38 + i}]")).toMap),
      3 -> keep(Map(34 -> psi(43, 48, 53), 35 -> psi(39, 44, 49), 36 -> psi(40, 45, 50),
        37 -> psi(41, 46, 51), 38 -> psi(42, 47, 52))),
      4 -> keep((1 to 4).map(i => (28 + i) -> expmSql(s"(ia[${34 + i}] - ia[34])")).toMap),
      5 -> keep((1 to 4).map(i => (24 + i) -> gnew(i)).toMap +
        (33 -> s"(CASE WHEN ($change) / $K.0 < 1e-3 THEN 1.0 ELSE 0.0 END)")),
      10 -> keep(Map(33 -> "0.0")),
      // sstats accumulate PINNED (floor(contribution·2^36), exact
      // integer adds — mirrors VBLda.docPinnedStats/addPinned, which
      // makes the Scala fit order-free and distributable; the replay
      // keeps its sequential doc order and sums the same integers)
      11 -> keep((for (i <- 1 to 4; j <- 1 to 2) yield {
        val c = if (j == 1) C1 else C2
        (16 + (i - 1) * 2 + j) ->
          s"(ia[${16 + (i - 1) * 2 + j}] + floor($c * ${eet(i)} * ${eeb(i, j)} / ${norm(j)} * $Pin))"
      }).toMap),
      // M-step: λ = η + sstats/2^36 (power-of-2 divide — rounds once,
      // exactly like VBLda.unpin's single conversion), η = 1/K like α
      12 -> keep((1 to 8).map(i => i -> s"($Alpha + ia[${16 + i}] / $Pin)").toMap ++
        (1 to 8).map(i => (16 + i) -> "0.0").toMap)
    ) ++ (1 to 4).map { i =>
      val l1 = s"ia[${(i - 1) * 2 + 1}]"; val l2 = s"ia[${(i - 1) * 2 + 2}]"
      val rs = s"($l1 + $l2)"
      (12 + i) -> keep(Map(
        39 -> xstar(l1), 40 -> xstar(l2), 41 -> xstar(rs),
        44 -> vrec(l1), 45 -> vrec(l2), 46 -> vrec(rs),
        49 -> t2Of(xstar(l1)), 50 -> t2Of(xstar(l2)), 51 -> t2Of(xstar(rs))))
    }.toMap ++ (1 to 4).map { i =>
      (16 + i) -> keep(Map(
        (8 + (i - 1) * 2 + 1) -> s"(${psi(39, 44, 49)} - ${psi(41, 46, 51)})",
        (8 + (i - 1) * 2 + 2) -> s"(${psi(40, 45, 50)} - ${psi(41, 46, 51)})"))
    }.toMap ++ Map(
      21 -> keep((1 to 4).map(i => (8 + i) -> expmSql(s"ia[${8 + i}]")).toMap),
      22 -> keep((5 to 8).map(i => (8 + i) -> expmSql(s"ia[${8 + i}]")).toMap),
      23 -> keep((0 until 17).map(s => (Pack0 + s) ->
        (s"(CASE WHEN $slotOf = ${Pack0 + s} THEN ia[${Pack0 + s}] + $am * " +
          s"pow(4.0, CAST(($DP - 1) % 24 AS DOUBLE)) ELSE ia[${Pack0 + s}] END)")).toMap)
    )
  }

  private val Guarded = Set(1, 2, 3, 4, 5)

  private def step: String = {
    val st = stages
    val sc = "CAST(e[1] AS BIGINT)"
    val codes = st.keys.toSeq.sorted
    val arms = codes.init.map { c =>
      val body = if (Guarded(c)) s"(CASE WHEN ia[33] = 1.0 THEN ia ELSE ${st(c)} END)" else st(c)
      s"WHEN $sc = $c THEN $body"
    }
    s"CASE ${arms.mkString(" ")} ELSE ${st(codes.last)} END"
  }

  private def elements: String = {
    def el(code: Int, c1: String = "dd[d][1]", c2: String = "dd[d][2]", dp: String = "0.0") =
      s"[$code.0, $c1, $c2, $dp]"
    val inner5 = (1 to 5).map(el(_)).mkString(", ")
    val fitDoc = s"list_concat(list_concat([${el(0)}], " +
      s"flatten(list_transform(range(1, 31), zz -> [$inner5]))), " +
      s"[${el(10)}, ${el(1)}, ${el(2)}, ${el(3)}, ${el(4)}, ${el(11)}])"
    val rowPairs = (0 until 4).flatMap(i => Seq(13 + i, 17 + i))
    val mBlock = (Seq(el(12, "0.0", "0.0")) ++
      rowPairs.map(c => el(c, "0.0", "0.0")) ++
      Seq(el(21, "0.0", "0.0"), el(22, "0.0", "0.0"))).mkString("[", ", ", "]")
    val eebInit = (rowPairs.map(c => el(c, "0.0", "0.0")) ++
      Seq(el(21, "0.0", "0.0"), el(22, "0.0", "0.0"))).mkString("[", ", ", "]")
    val trDoc = s"list_concat(list_concat([${el(0)}], " +
      s"flatten(list_transform(range(1, 31), zz -> [$inner5]))), " +
      s"[${el(23, dp = "CAST(d AS DOUBLE)")}])"
    val fitIter = s"list_concat(flatten(list_transform(range(1, nd + 1), d -> $fitDoc)), $mBlock)"
    s"list_concat(list_concat($eebInit, " +
      s"flatten(list_transform(range(1, $MaxIter + 1), it -> $fitIter))), " +
      s"flatten(list_transform(range(1, nd + 1), d -> $trDoc)))"
  }

  private def lam0: String = {
    // UMAP.draw mirrored in BIGINT; offset/bound derived from the
    // shared constants (LdaSeed → +10, VBLda.InitDrawBound → 1000)
    def drw(t: Int): String = {
      val x0 = s"((CAST($t AS BIGINT)) + $DrawOffset) % 2147483647"
      val x1 = s"(48271 * ($x0)) % 2147483647"
      val x2 = s"((($x1) * ($x1)) + 12345) % 2147483647"
      val x3 = s"(48271 * ($x2)) % 2147483647"
      s"(CAST(($x3) % $DrawBound AS DOUBLE) / $DrawBound.0 - 0.5)"
    }
    (0 until K * GateFeatures.length).map(t => s"(1.0 + ${drw(t)} / 10.0) AS l$t").mkString(", ")
  }

  private def initState: String = {
    val lam = (0 until 8).map(t => s"l$t").mkString(", ")
    val zeros = Seq.fill(NSlot - 8)("0.0").mkString(", ")
    s"[$lam, $zeros]"
  }

  /** The complete oracle SQL for q_coret_lda
    * (part ≤ [[GateKeyBound]], [[GateFeatures]]). */
  def sql: String = {
    val feats = GateFeatures
    def lab(i: Int): String = {
      val l1 = s"fs[${(i - 1) * 2 + 1}]"; val l2 = s"fs[${(i - 1) * 2 + 2}]"
      val w1 = s"($l1 / ($l1 + $l2))"; val w2 = s"($l2 / ($l1 + $l2))"
      val t1 = s"substr(CAST($w1 AS VARCHAR), 1, 6) || '*${feats.head}'"
      val t2 = s"substr(CAST($w2 AS VARCHAR), 1, 6) || '*${feats(1)}'"
      s"(CASE WHEN $w1 >= $w2 THEN $t1 || ' + ' || $t2 ELSE $t2 || ' + ' || $t1 END)"
    }
    val labels = (1 to K).map(i => s"${lab(i)} AS lb$i").mkString(", ")
    val am = s"CAST(floor(fs[$Pack0 + (d - 1) // 24] / " +
      s"pow(4.0, CAST((d - 1) % 24 AS DOUBLE))) AS BIGINT) % $K"
    s"""WITH src AS (SELECT p_partkey AS k,
       |        CAST(ceil((percent_rank() OVER (ORDER BY ${feats.head}, p_partkey)) * 99) + 1 AS DOUBLE) AS c1,
       |        CAST(ceil((percent_rank() OVER (ORDER BY ${feats(1)}, p_partkey)) * 99) + 1 AS DOUBLE) AS c2
       |      FROM part WHERE p_partkey <= $GateKeyBound),
       |dl AS MATERIALIZED (SELECT list([c1, c2] ORDER BY k) AS dd, list(k ORDER BY k) AS ks,
       |        COUNT(*) AS nd FROM src),
       |lam0 AS (SELECT $lam0),
       |elz AS MATERIALIZED (SELECT dd, ks, nd, $elements AS els FROM dl),
       |fold AS MATERIALIZED (SELECT dd, ks, nd,
       |        list_reduce(list_prepend($initState, els), (ia, e) -> $step) AS fs
       |      FROM elz, lam0),
       |fin AS (SELECT ks, nd, fs, $labels FROM fold)
       |SELECT unnest(ks) AS p_partkey,
       |       unnest(list_transform(range(1, nd + 1), d ->
       |         CASE $am WHEN 0 THEN lb1 WHEN 1 THEN lb2 WHEN 2 THEN lb3 ELSE lb4 END)) AS category_lda
       |FROM fin""".stripMargin
  }
}
