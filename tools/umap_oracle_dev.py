#!/usr/bin/env python3
"""Dev harness for the q_coret_umap DuckDB oracle.

Builds the oracle SQL stage by stage (same builders that UmapOracle.scala
emits) and checks each stage's values against /tmp/umap_trace.json written
by `sbt "runMain graft.tools.DumpUmap"`. Exact float compare throughout —
the oracle must be bit-exact, not close.

Usage: python3 tools/umap_oracle_dev.py <sfDir> [stage]
"""
import sys, json
import duckdb

L = "6.931471805599453e-1"
LHI = "6.93147180369123816490e-01"
LLO = "1.90821492927058770002e-10"
EPOCHS = int(__import__("os").environ.get("UMAP_EPOCHS", "300"))
UA = "1.5769434603113077e0"
UB = "8.950608779109733e-1"


def exp_sql(x):
    """MirrorMath.expm mirrored (same as TsneOracle.expSql)."""
    k = f"floor(({x}) / {L} + 0.5)"
    r = f"((({x}) - {k} * {LHI}) - {k} * {LLO})"
    acc = "1.0"
    for i in range(13, 0, -1):
        acc = f"(1.0 + {r} * {acc} / {i}.0)"
    return (f"(CASE WHEN ({x}) < -745.0 THEN 0.0 WHEN ({x}) > 709.0 "
            f"THEN CAST('Infinity' AS DOUBLE) ELSE (pow(2.0, {k}) * {acc}) END)")


def horner_ln(m, e):
    """MirrorMath.logm's tail: e*ln2 + 2t*Q(t^2), t=(m-1)/(m+1). m, e are
    short slot refs, so the 17-level Horner stays compact."""
    t = f"((({m}) - 1.0) / (({m}) + 1.0))"
    acc = "0.0"
    for i in range(16, -1, -1):
        acc = f"((1.0 / {2 * i + 1}.0) + {t} * {t} * {acc})"
    return f"(({e}) * {L} + 2.0 * {t} * {acc})"


# binary-descent exponent extraction: 7 powers cover m in [2^-100, 2^128]
# (kernel inputs are clamped >= 1e-30 and bounded above by coordinate
# drift). One pass: descend-only for m>=1, ascend-only for m<1.
DESC_POWERS = [64, 32, 16, 8, 4, 2, 1]
POW2 = {p: repr(2.0 ** p) for p in DESC_POWERS}
POW2NEG = {p: repr(2.0 ** -p) for p in DESC_POWERS}
POW2UP1 = {p: repr(2.0 ** (1 - p)) for p in DESC_POWERS}


def norm_fold_sql(x):
    """Full normalize fold for single-use ln (target etc.): state [m,e]."""
    steps = ", ".join(f"[{p}.0, 0.0]" for p in DESC_POWERS)
    return (f"list_reduce(list_prepend([CAST(({x}) AS DOUBLE), 0.0], [{steps}]), "
            "(la, le) -> CASE "
            + " ".join(
                f"WHEN le[1] = {p}.0 AND la[1] >= {POW2[p]} THEN [la[1] * {POW2NEG[p]}, la[2] + {p}.0] "
                f"WHEN le[1] = {p}.0 AND la[1] < {POW2UP1[p]} THEN [la[1] * {POW2[p]}, la[2] - {p}.0]"
                for p in DESC_POWERS)
            + " ELSE la END)")


def ln_single(x):
    """ln for a one-off scalar (not in a hot loop)."""
    nf = norm_fold_sql(x)
    # materialize through a list so nf is written once; callers wrap in CTE
    return nf  # caller does: e·L + horner via slots


def tables(con, sf):
    for t in ["supplier"]:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


# ---------------- CTE builders ----------------

def cte_pts():
    return f"""src AS (SELECT s_suppkey AS k, CAST(s_nationkey AS DOUBLE) AS f1, CAST(s_acctbal AS DOUBLE) AS f2 FROM supplier),
mm AS (SELECT MIN(f1) lo1, MAX(f1) hi1, MIN(f2) lo2, MAX(f2) hi2 FROM src),
nn AS (SELECT k,
        coalesce(CASE WHEN hi1 = lo1 THEN 0.0 ELSE (f1 - lo1) / (hi1 - lo1) END, 0.0) AS f1,
        coalesce(CASE WHEN hi2 = lo2 THEN 0.0 ELSE (f2 - lo2) / (hi2 - lo2) END, 0.0) AS f2
      FROM src, mm ORDER BY k LIMIT 2001),
pts AS MATERIALIZED (SELECT list(f1 ORDER BY k) AS x, list(f2 ORDER BY k) AS y, list(k ORDER BY k) AS ks, COUNT(*) AS cnt,
        least(15, COUNT(*) - 1) AS kk FROM nn)"""


def cte_knn():
    # pairwise rows -> windowed kNN -> per-point lists; rho via FILTER agg
    return f"""ii AS (SELECT unnest(range(1, cnt + 1)) AS i FROM pts),
pr AS (SELECT a.i AS i, b.i AS j,
        sqrt((x[a.i] - x[b.i]) * (x[a.i] - x[b.i]) + (y[a.i] - y[b.i]) * (y[a.i] - y[b.i])) AS d
      FROM ii a, ii b, pts WHERE a.i != b.i),
knnr AS (SELECT i, j, d, row_number() OVER (PARTITION BY i ORDER BY d, j) AS rn FROM pr),
kn AS (SELECT i, j, d, rn FROM knnr, pts WHERE rn <= kk),
rhor AS (SELECT i, COALESCE(MIN(d) FILTER (WHERE d > 0.0), 0.0) AS rho FROM kn GROUP BY i),
klm AS MATERIALIZED (SELECT
        list(nb ORDER BY i) AS nbs, list(ds ORDER BY i) AS dss, list(rho ORDER BY i) AS rhs
      FROM (SELECT kn.i, list(j ORDER BY rn) AS nb, list(d ORDER BY rn) AS ds, any_value(rho) AS rho
            FROM kn JOIN rhor ON kn.i = rhor.i GROUP BY kn.i))"""


def cte_target():
    # target = logm(kk)/logm(2) ; logm(2) = Ln2 exactly
    return f"""tg0 AS (SELECT pts.*, klm.*, {norm_fold_sql("CAST(kk AS DOUBLE)")} AS tl FROM pts, klm),
tg AS MATERIALIZED (SELECT *, {horner_ln("tl[1]", "tl[2]")} / {L} AS tgt FROM tg0)"""


def cte_sigma():
    # one global fold: per point 64 iteration elements + 1 finalize.
    # state [done, lo, hi, sigma] + tail of finished sigmas.
    IP = "((CAST(e[1] AS BIGINT) - 1) // 65 + 1)"
    PZ = "(((CAST(e[1] AS BIGINT) - 1) % 65) + 1)"
    ssum = ("list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(dss[{IP}], dv -> "
            + exp_sql(f"(-greatest(0.0, dv - rhs[{IP}])) / acc[4]")
            + ")), (p, q) -> p + q)")
    init4 = "[0.0::DOUBLE, 0.0::DOUBLE, CAST('Infinity' AS DOUBLE), 1.0::DOUBLE]"
    fin = f"list_concat(list_concat({init4}, acc[5:len(acc)]), [acc[4]])"
    step = f"""CASE
 WHEN {PZ} = 65 THEN {fin}
 WHEN acc[1] = 1.0 THEN acc
 WHEN abs({ssum} - tgt) < 1e-5 THEN list_concat([1.0, acc[2], acc[3], acc[4]], acc[5:len(acc)])
 WHEN {ssum} > tgt THEN list_concat([0.0, acc[2], acc[4], (acc[2] + acc[4]) / 2.0], acc[5:len(acc)])
 ELSE list_concat([0.0, acc[4], acc[3],
   CASE WHEN isinf(acc[3]) THEN acc[4] * 2.0 ELSE (acc[4] + acc[3]) / 2.0 END], acc[5:len(acc)])
END"""
    return f"""sig AS MATERIALIZED (SELECT tg.*, list_reduce(list_prepend(
        {init4},
        list_transform(range(1, cnt * 65 + 1), zt -> [CAST(zt AS DOUBLE)])),
        (acc, e) -> {step})[5:] AS sgs
      FROM tg)"""


def cte_edges():
    # directed weights as rows, then unordered-pair t-conorm, ordered edges
    w = exp_sql("(-greatest(0.0, d - rho)) / sg")
    return f"""dirw AS (SELECT kn.i AS i, kn.j AS j, {w} AS w
      FROM kn JOIN rhor ON kn.i = rhor.i, (SELECT sgs FROM sig) s0, LATERAL (SELECT s0.sgs[kn.i] AS sg)),
pw AS (SELECT least(i, j) AS a, greatest(i, j) AS b,
        COALESCE(MAX(CASE WHEN i < j THEN w END), 0.0) AS wf,
        COALESCE(MAX(CASE WHEN i > j THEN w END), 0.0) AS wb
      FROM dirw GROUP BY 1, 2),
edges AS MATERIALIZED (SELECT a, b, (wf + wb) - wf * wb AS s,
        row_number() OVER (ORDER BY a, b) AS en FROM pw),
mx AS (SELECT MAX(s) AS maxw FROM edges)"""


def cte_init():
    # pcaInit replay: power iteration d=2, deflation inline, span scaling
    def power_fold(d1, d2):
        xv = f"((0.0 + cx[r] * {d1}) + cy[r] * {d2})"
        n1 = f"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, cnt + 1), r -> cx[r] * {xv})), (p, q) -> p + q)"
        n2 = f"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, cnt + 1), r -> cy[r] * {xv})), (p, q) -> p + q)"
        nrm = f"sqrt((0.0 + {n1} * {n1}) + {n2} * {n2})"
        return (f"list_reduce(list_prepend([1.0::DOUBLE, 0.5::DOUBLE], list_transform(range(1, 101), zz -> [CAST(zz AS DOUBLE)])), "
                f"(acc, e) -> CASE WHEN {nrm} > 0.0 THEN [{n1} / {nrm}, {n2} / {nrm}] ELSE [{d1}, {d2}] END)")
    cdef = "((0.0 + acc[1] * u1) + acc[2] * u2)"
    def proj(v1, v2):
        return f"list_transform(range(1, cnt + 1), r -> (0.0 + cx[r] * {v1}) + cy[r] * {v2})"
    def mean_of(c):
        return f"(list_reduce(list_prepend(0.0::DOUBLE, {c}), (p, q) -> p + q) / cnt)"
    return f"""ctr AS (SELECT sig.*, list_transform(x, v -> v - {mean_of("x")}) AS cx,
               list_transform(y, v -> v - {mean_of("y")}) AS cy FROM sig),
pw1 AS MATERIALIZED (SELECT *, {power_fold("acc[1]", "acc[2]")} AS vv1 FROM ctr),
pw1b AS (SELECT *, vv1[1] AS u1, vv1[2] AS u2 FROM pw1),
pw2 AS MATERIALIZED (SELECT *, {power_fold(f"(acc[1] - {cdef} * u1)", f"(acc[2] - {cdef} * u2)")} AS vv2 FROM pw1b),
pj AS (SELECT *, {proj("u1", "u2")} AS c1, {proj("vv2[1]", "vv2[2]")} AS c2 FROM pw2),
sc AS (SELECT *, greatest(list_aggregate(list_transform(c1, v -> abs(v)), 'max'),
                 greatest(list_aggregate(list_transform(c2, v -> abs(v)), 'max'), 1e-12)) AS spn FROM pj),
ini AS MATERIALIZED (SELECT *, list_concat(
        list_transform(c1, v -> v / spn * 10.0),
        list_transform(c2, v -> v / spn * 10.0)) AS st0 FROM sc)"""


def cte_events():
    # closed-form schedule: fires-through(t) = least(t, floor(t/eps));
    # fire at t iff it increments. eps = maxw/s >= 1.
    ft = "least(CAST(t AS DOUBLE), floor(CAST(t AS DOUBLE) / eps))"
    ftm1 = "least(CAST(t AS DOUBLE) - 1.0, floor((CAST(t AS DOUBLE) - 1.0) / eps))"
    # counter-based negative draws, BIGINT-exact (UMAP.draw, seed=9)
    def drw(tt):
        x0 = f"(({tt}) + 10) % 2147483647"
        x1 = f"(48271 * ({x0})) % 2147483647"
        x2 = f"((({x1}) * ({x1})) + 12345) % 2147483647"
        x3 = f"(48271 * ({x2})) % 2147483647"
        return f"CAST(({x3}) % cnt AS DOUBLE)"
    negs = ", ".join(drw(f"5 * (rn - 1) + {s}") for s in range(5))
    return f"""evr AS (SELECT a, b, t, rn, 1.0 - (CAST(t AS DOUBLE) - 1.0) / {EPOCHS}.0 AS alpha FROM (
        SELECT a, b, eps, unnest(range(1, {EPOCHS} + 1)) AS t,
               row_number() OVER (ORDER BY 1) AS dummy
        FROM (SELECT a, b, maxw / s AS eps FROM edges, mx)
      ) z, LATERAL (SELECT row_number() OVER () AS _r) _l(_r)
      WHERE {ft} > {ftm1}
      """


# events need rn = row_number over (t, a, b) AFTER the filter; rewrite simpler below
def cte_events2():
    ft = "least(CAST(t AS DOUBLE), floor(CAST(t AS DOUBLE) / eps))"
    ftm1 = "least(CAST(t AS DOUBLE) - 1.0, floor((CAST(t AS DOUBLE) - 1.0) / eps))"
    def drw(tt):
        x0 = f"(({tt}) + 10) % 2147483647"
        x1 = f"(48271 * ({x0})) % 2147483647"
        x2 = f"((({x1}) * ({x1})) + 12345) % 2147483647"
        x3 = f"(48271 * ({x2})) % 2147483647"
        return f"(({x3}) % cnt)"
    negs = ", ".join(f"CAST({drw(f'5 * (rn - 1) + {s}')} + 1 AS DOUBLE)" for s in range(5))
    return f"""ev0 AS (SELECT a, b, eps, unnest(range(1, {EPOCHS} + 1)) AS t
      FROM (SELECT a, b, maxw / s AS eps FROM edges, mx)),
ev1 AS (SELECT a, b, t FROM ev0 WHERE {ft} > {ftm1}),
ev2 AS (SELECT a, b, t, row_number() OVER (ORDER BY t, a, b) AS rn,
        1.0 - (CAST(t AS DOUBLE) - 1.0) / {EPOCHS}.0 AS alpha FROM ev1),
evl AS MATERIALIZED (SELECT list([CAST(a AS DOUBLE), CAST(b AS DOUBLE), alpha, {negs}] ORDER BY rn) AS evs,
        COUNT(*) AS nev FROM ev2, pts)"""


def cte_sgd():
    """Two-phase outer fold over events; the inner 43-stage fold does
    one event's sequential updates on a 10-slot state
    [xi, yi, xj, yj, s5..s10]. Slot-staged ln/exp (Horner bases always
    read from slots) keeps evaluated-node counts small — DuckDB's
    lambda interpreter costs ~1.3us per EVALUATED node, ~8.4us fixed
    per fold step, and unexecuted CASE branches are free (measured).

    ln's exponent extraction is floor(log2(x)) + a one-step adjust:
    faithful libm log2 is off by at most 1 at integer boundaries, the
    adjust lands on the unique (m in [1,2), e) pair, and every rescale
    is an exact power-of-2 multiply — so it equals MirrorMath.logm's
    unit-step loop bit for bit. Kernel args are clamped to
    [1e-30, ~1e9], so ln in [-69.1, +20.8] and every exp arg is inside
    (-62, 19): the +-745/709 guards of MirrorMath.expm can never fire
    and the SQL omits them."""
    I = "CAST(e[2] AS BIGINT)"
    J = "CAST(e[3] AS BIGINT)"
    AL = "e[4]"
    SC = "CAST(ie[1] AS BIGINT)"
    AUX = "CAST(ie[2] AS BIGINT)"
    d2_att = "((ia[1] - ia[3]) * (ia[1] - ia[3]) + (ia[2] - ia[4]) * (ia[2] - ia[4]))"
    MN = f"CAST(e[4 + {AUX}] AS BIGINT)"
    rx = f"(ia[1] - acc[{MN}])"
    ry = f"(ia[2] - acc[cnt + {MN}])"
    def clip(v):
        return f"greatest(-4.0, least(4.0, {v}))"
    def keep(**upd):
        # 10-slot rebuild with only the named slots changed
        return "[" + ", ".join(upd.get(f"s{k}", f"ia[{k}]") for k in range(1, 11)) + "]"
    def horner17(t2):
        acc = "0.0"
        for i in range(16, -1, -1):
            acc = f"((1.0 / {2 * i + 1}.0) + {t2} * {acc})"
        return acc
    def horner13(r):
        acc = "1.0"
        for i in range(13, 0, -1):
            acc = f"(1.0 + {r} * {acc} / {i}.0)"
        return acc
    e0 = "floor(log2(ia[5]))"
    m0 = f"(ia[5] * pow(2.0, -{e0}))"
    # stage bodies (code -> 10-slot result)
    st = {}
    st[1] = keep(s5=f"greatest({d2_att}, 1e-30)")
    st[2] = keep(
        s5=f"(CASE WHEN {m0} >= 2.0 THEN {m0} * 0.5 WHEN {m0} < 1.0 THEN {m0} * 2.0 ELSE {m0} END)",
        s6=f"(CASE WHEN {m0} >= 2.0 THEN {e0} + 1.0 WHEN {m0} < 1.0 THEN {e0} - 1.0 ELSE {e0} END)")
    st[3] = keep(s7="((ia[5] - 1.0) / (ia[5] + 1.0))",
                 s8="(((ia[5] - 1.0) / (ia[5] + 1.0)) * ((ia[5] - 1.0) / (ia[5] + 1.0)))")
    st[4] = keep(s5=f"(ia[6] * {L} + 2.0 * ia[7] * {horner17('ia[8]')})")
    st[5] = keep(s6=f"floor((({UB} - 1.0) * ia[5]) / {L} + 0.5)",
                 s7=f"floor(({UB} * ia[5]) / {L} + 0.5)")
    st[6] = keep(s8=f"(((({UB} - 1.0) * ia[5]) - ia[6] * {LHI}) - ia[6] * {LLO})",
                 s9=f"((({UB} * ia[5]) - ia[7] * {LHI}) - ia[7] * {LLO})")
    st[7] = keep(s5=f"((-2.0 * {UA} * {UB} * (pow(2.0, ia[6]) * {horner13('ia[8]')})) / "
                    f"(1.0 + {UA} * (pow(2.0, ia[7]) * {horner13('ia[9]')})))")
    st[8] = (f"CASE WHEN {d2_att} > 0.0 THEN " + keep(
        s1=f"(ia[1] + {clip('ia[5] * (ia[1] - ia[3])')} * {AL})",
        s2=f"(ia[2] + {clip('ia[5] * (ia[2] - ia[4])')} * {AL})",
        s3=f"(ia[3] - {clip('ia[5] * (ia[1] - ia[3])')} * {AL})",
        s4=f"(ia[4] - {clip('ia[5] * (ia[2] - ia[4])')} * {AL})") + " ELSE ia END")
    st[9] = keep(s5=f"greatest({rx} * {rx} + {ry} * {ry}, 1e-30)",
                 s10=f"greatest({rx} * {rx} + {ry} * {ry}, 1e-30)")
    st[10] = keep(s6=f"floor(({UB} * ia[5]) / {L} + 0.5)",
                  s7=f"((({UB} * ia[5]) - floor(({UB} * ia[5]) / {L} + 0.5) * {LHI}) - "
                     f"floor(({UB} * ia[5]) / {L} + 0.5) * {LLO})")
    st[11] = keep(s5=f"((2.0 * {UB}) / ((0.001 + ia[10]) * "
                     f"(1.0 + {UA} * (pow(2.0, ia[6]) * {horner13('ia[7]')}))))")
    st[12] = (f"CASE WHEN {MN} = {I} OR {MN} = {J} THEN ia ELSE " + keep(
        s1=f"(ia[1] + {clip(f'ia[5] * {rx}')} * {AL})",
        s2=f"(ia[2] + {clip(f'ia[5] * {ry}')} * {AL})") + " END")
    inner_step = ("CASE " + " ".join(
        f"WHEN {SC} = {c} THEN {st[c]}" for c in range(1, 12)) +
        f" ELSE {st[12]} END")
    att = [f"[{c}.0, 0.0]" for c in range(1, 9)]
    negs = []
    for s in range(1, 6):
        negs += [f"[9.0, {s}.0]", "[2.0, 0.0]", "[3.0, 0.0]", "[4.0, 0.0]",
                 "[10.0, 0.0]", "[11.0, 0.0]", f"[12.0, {s}.0]"]
    stage_list = "[" + ", ".join(att + negs) + "]"
    inner = (f"list_reduce(list_prepend([acc[{I}], acc[cnt + {I}], acc[{J}], acc[cnt + {J}], "
             f"0.0, 0.0, 0.0, 0.0, 0.0, 0.0], {stage_list}), (ia, ie) -> {inner_step})")
    ph1 = f"list_concat(acc[1:2 * cnt], {inner}[1:4])"
    ph2 = (f"list_transform(range(1, 2 * cnt + 1), idx -> "
           f"CASE WHEN idx = {I} THEN acc[2 * cnt + 1] "
           f"WHEN idx = cnt + {I} THEN acc[2 * cnt + 2] "
           f"WHEN idx = {J} THEN acc[2 * cnt + 3] "
           f"WHEN idx = cnt + {J} THEN acc[2 * cnt + 4] "
           f"ELSE acc[idx] END)")
    outer_step = f"CASE WHEN e[1] = 1.0 THEN {ph1} ELSE {ph2} END"
    return f"""evp AS MATERIALIZED (SELECT flatten(list_transform(evs, ee ->
        [list_concat([1.0], ee), [2.0, ee[1], ee[2]]])) AS evp2 FROM evl),
gd AS MATERIALIZED (SELECT ini.cnt AS cnt, ini.ks AS ks,
        list_reduce(list_prepend(st0, evp2), (acc, e) -> {outer_step}) AS fy
      FROM ini, evp)"""


def cte_final():
    m0 = "(list_reduce(list_prepend(0.0::DOUBLE, fy[1:cnt]), (p, q) -> p + q) / cnt)"
    m1 = "(list_reduce(list_prepend(0.0::DOUBLE, fy[cnt + 1:2 * cnt]), (p, q) -> p + q) / cnt)"
    return f"""fin AS (SELECT ks, cnt, fy, {m0} AS m0, {m1} AS m1 FROM gd)
SELECT unnest(ks) AS s_suppkey,
       unnest(list_transform(fy[1:cnt], v -> v - m0)) AS umap_1,
       unnest(list_transform(fy[cnt + 1:2 * cnt], v -> v - m1)) AS umap_2
FROM fin"""


def full_sql():
    return ("WITH " + ",\n".join([cte_pts(), cte_knn(), cte_target(), cte_sigma(),
                                   cte_edges(), cte_init(), cte_events2(), cte_sgd()])
            + ",\n" + cte_final())


# ---------------- stage checks ----------------

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    stage = sys.argv[2] if len(sys.argv) > 2 else "all"
    tr = json.load(open("/tmp/umap_trace.json"))
    con = duckdb.connect()
    tables(con, sf)
    n = len(tr["pts"])

    def run(ctes, select):
        q = "WITH " + ",\n".join(ctes) + "\n" + select
        return con.execute(q).fetchone()

    if stage in ("all", "knn"):
        r = run([cte_pts(), cte_knn()], "SELECT nbs, dss, rhs FROM klm")
        nbs, dss, rhs = r
        ok = all([nbs[i] == [j + 1 for j in tr["knn"][i]] for i in range(n)])
        okr = all(rhs[i] == tr["rho"][i] for i in range(n))
        print("knn:", "OK" if ok else "MISMATCH", "| rho:", "OK" if okr else "MISMATCH")
        if not ok:
            for i in range(n):
                if nbs[i] != [j + 1 for j in tr["knn"][i]]:
                    print(" first bad i=", i, nbs[i][:5], [j + 1 for j in tr["knn"][i]][:5]); break

    if stage in ("all", "sigma"):
        r = run([cte_pts(), cte_knn(), cte_target(), cte_sigma()], "SELECT tgt, sgs FROM sig")
        tgt, sgs = r
        bad = [i for i in range(n) if sgs[i] != tr["sigma"][i]]
        print(f"target={tgt!r} sigma:", "OK" if not bad else f"MISMATCH {len(bad)} pts, first {bad[:3]}")
        if bad:
            i = bad[0]
            print("  sql:", repr(sgs[i]), " scala:", repr(tr["sigma"][i]))

    if stage in ("all", "edges"):
        r = run([cte_pts(), cte_knn(), cte_target(), cte_sigma(), cte_edges()],
                "SELECT list(a ORDER BY en), list(b ORDER BY en), list(s ORDER BY en), (SELECT maxw FROM mx) FROM edges")
        aa, bb, ss, mxw = r
        te = tr["edges"]
        ok = (len(aa) == len(te)
              and all(aa[e] == te[e][0] + 1 and bb[e] == te[e][1] + 1 and ss[e] == te[e][2]
                      for e in range(len(te))))
        print("edges:", "OK" if ok else "MISMATCH", f"({len(aa)} vs {len(te)})",
              "| maxW:", "OK" if mxw == tr["maxW"] else f"MISMATCH {mxw!r} vs {tr['maxW']!r}")

    if stage in ("all", "init"):
        r = run([cte_pts(), cte_knn(), cte_target(), cte_sigma(), cte_edges(), cte_init()],
                "SELECT st0 FROM ini")
        st0 = r[0]
        bad = [i for i in range(n)
               if st0[i] != tr["init"][i][0] or st0[n + i] != tr["init"][i][1]]
        print("init:", "OK" if not bad else f"MISMATCH {len(bad)} pts, first {bad[:3]}")
        if bad:
            i = bad[0]
            print("  sql:", repr(st0[i]), repr(st0[n + i]), " scala:", repr(tr["init"][i]))

    if stage in ("all", "events"):
        r = run([cte_pts(), cte_knn(), cte_target(), cte_sigma(), cte_edges(), cte_events2()],
                "SELECT nev, evs[1], evs[2], evs[len(evs)] FROM evl")
        print("events:", r[0], "(scala:", tr["firings"], ")", "OK" if r[0] == tr["firings"] else "MISMATCH")
        print("  first:", r[1], "\n  second:", r[2])

    if stage == "debug":
        import math
        # python bit-exact replay of the SGD (IEEE doubles), event by event
        A = 1.5769434603113077; B = 0.8950608779109733
        Lc = 0.6931471805599453
        LHIc = float("6.93147180369123816490e-01"); LLOc = 1.90821492927058770002e-10
        def expm(x):
            k = math.floor(x / Lc + 0.5)
            r = (x - k * LHIc) - k * LLOc
            acc = 1.0
            for i in range(13, 0, -1): acc = 1.0 + r * acc / i
            return (2.0 ** k) * acc
        def lnm(x):
            m, ex = math.frexp(x)   # m in [0.5,1) exact
            m *= 2.0; ex -= 1       # m in [1,2) exact
            t = (m - 1.0) / (m + 1.0); t2 = t * t
            acc = 0.0
            for i in range(16, -1, -1): acc = 1.0 / (2 * i + 1) + t2 * acc
            return ex * Lc + 2.0 * t * acc
        def powm(x, y): return expm(y * lnm(x))
        def clip(v): return max(-4.0, min(4.0, v))
        tr_init = tr["init"]
        n = len(tr_init)
        r = run([cte_pts(), cte_knn(), cte_target(), cte_sigma(), cte_edges(),
                 cte_init(), cte_events2()], "SELECT evs FROM evl")
        evs = r[0]
        xs = [p[0] for p in tr_init]; ys = [p[1] for p in tr_init]
        def apply_event(ee):
            i = int(ee[0]) - 1; j = int(ee[1]) - 1; al = ee[2]
            ms = [int(v) - 1 for v in ee[3:8]]
            dx = xs[i] - xs[j]; dy = ys[i] - ys[j]
            d2 = dx * dx + dy * dy
            if d2 > 0.0:
                d2c = max(d2, 1e-30)
                g = (-2.0 * A * B * powm(d2c, B - 1.0)) / (1.0 + A * powm(d2c, B))
                g0 = clip(g * dx) * al; g1 = clip(g * dy) * al
                xs[i] += g0; ys[i] += g1; xs[j] -= g0; ys[j] -= g1
            for m in ms:
                if m != i and m != j:
                    rx = xs[i] - xs[m]; ry = ys[i] - ys[m]
                    rd2 = max(rx * rx + ry * ry, 1e-30)
                    g = (2.0 * B) / ((0.001 + rd2) * (1.0 + A * powm(rd2, B)))
                    xs[i] += clip(g * rx) * al
                    ys[i] += clip(g * ry) * al
        K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        for ee in evs[:K]:
            apply_event(ee)
        sgd = cte_sgd().replace("list_prepend(st0, evp2)",
                                f"list_prepend(st0, evp2[1:{2*K}])")
        fy = run([cte_pts(), cte_knn(), cte_target(), cte_sigma(), cte_edges(),
                  cte_init(), cte_events2(), sgd], "SELECT fy FROM gd")[0]
        bad = [i for i in range(n) if fy[i] != xs[i] or fy[n + i] != ys[i]]
        print(f"debug K={K}:", "OK" if not bad else f"MISMATCH {len(bad)} pts, first {bad[:5]}")
        if bad:
            i = bad[0]
            print("  sql:", repr(fy[i]), repr(fy[n + i]))
            print("  py :", repr(xs[i]), repr(ys[i]))

    if stage in ("all", "sgd"):
        import time
        t0 = time.time()
        res = con.execute(full_sql()).fetchall()
        dt = time.time() - t0
        res.sort(key=lambda r: r[0])
        bad = [i for i in range(n)
               if res[i][1] != tr["y"][i][0] or res[i][2] != tr["y"][i][1]]
        print(f"sgd+final ({dt:.1f}s):", "OK" if not bad else f"MISMATCH {len(bad)} pts, first {bad[:3]}")
        if bad:
            i = bad[0]
            print("  sql:", repr(res[i][1]), repr(res[i][2]), " scala:", tr["y"][i])

if __name__ == "__main__":
    main()
