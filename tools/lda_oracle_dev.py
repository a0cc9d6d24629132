#!/usr/bin/env python3
"""Dev harness for the q_coret_lda DuckDB oracle.

Stage 1: a python bit-exact replayer of graft.functions.VBLda (IEEE
doubles throughout — python floats ARE doubles, MirrorMath mirrored via
frexp) validated against /tmp/lda_trace.json from `sbt "runMain
graft.tools.DumpLda"`. Stage 2: the SQL builder (ported to LdaOracle
.scala once green), bisectable against the python replay.

Usage: python3 tools/lda_oracle_dev.py <sfDir> [stage]
"""
import sys, json, math
import duckdb

K = 4
ALPHA = 0.25
ETA = 0.25
MAX_ITER = 10
PIN = 68719476736.0  # 2^36 sstats pin (VBLda.SStatsPinScale)
PIN_SQL = '6.8719476736e10'
DOC_ITER = 30
TOL = 1e-3

Lc = 0.6931471805599453
LHIc = float("6.93147180369123816490e-01")
LLOc = 1.90821492927058770002e-10


# ---------------- python mirror of MirrorMath ----------------

def expm(x):
    if x < -745.0: return 0.0
    if x > 709.0: return math.inf
    k = math.floor(x / Lc + 0.5)
    r = (x - k * LHIc) - k * LLOc
    acc = 1.0
    for i in range(13, 0, -1): acc = 1.0 + r * acc / i
    return (2.0 ** k) * acc

def lnm(x):
    m, ex = math.frexp(x)
    m *= 2.0; ex -= 1
    t = (m - 1.0) / (m + 1.0); t2 = t * t
    acc = 0.0
    for i in range(16, -1, -1): acc = 1.0 / (2 * i + 1) + t2 * acc
    return ex * Lc + 2.0 * t * acc

def digammam(x):
    v = 0.0
    t = 0.0
    while x + t < 6.0:
        v -= 1.0 / (x + t); t += 1.0
    xx = x + t
    inv = 1.0 / xx
    inv2 = inv * inv
    series = inv2 * (1.0/12.0 - inv2 * (1.0/120.0 - inv2 *
        (1.0/252.0 - inv2 * (1.0/240.0 - inv2 * (1.0/132.0)))))
    return v + lnm(xx) - 0.5 * inv - series


def draw(t, seed, bound):
    p = 2147483647
    x0 = (t + 1 + (seed % 65536)) % p
    x1 = 48271 * x0 % p
    x2 = (x1 * x1 + 12345) % p
    x3 = 48271 * x2 % p
    return x3 % bound


# ---------------- python replay of VBLda ----------------

def doc_estep(counts, eeb, w):
    nd = 0.0
    for c in counts: nd += c
    gamma = [ALPHA + nd / K] * K
    it = 0
    done = False
    while it < DOC_ITER and not done:
        sum_g = 0.0
        for g in gamma: sum_g += g
        psi_sum = digammam(sum_g)
        eet = [expm(digammam(gamma[i]) - psi_sum) for i in range(K)]
        change = 0.0
        for i in range(K):
            acc = 0.0
            for j in range(w):
                norm = 1e-100
                for kk in range(K):
                    norm += eet[kk] * eeb[kk][j]
                acc += counts[j] * eeb[i][j] / norm
            nxt = ALPHA + eet[i] * acc
            change += abs(nxt - gamma[i])
            gamma[i] = nxt
        if change / K < TOL: done = True
        it += 1
    return gamma

def exp_elog_beta(lam, w):
    eeb = []
    for i in range(K):
        s = 0.0
        for j in range(w): s += lam[i][j]
        psi_sum = digammam(s)
        eeb.append([expm(digammam(lam[i][j]) - psi_sum) for j in range(w)])
    return eeb

def fit(docs):
    w = len(docs[0])
    lam = [[1.0 + (draw(i * w + j, 9, 1000) / 1000.0 - 0.5) / 10.0
            for j in range(w)] for i in range(K)]
    for _ in range(MAX_ITER):
        eeb = exp_elog_beta(lam, w)
        # round 6: sstats accumulate as pinned integers (floor of
        # contribution * 2^36) — exact, order-free, mirrors
        # VBLda.docPinnedStats/addPinned and the SQL stage 11
        sstats = [[0] * w for _ in range(K)]
        for counts in docs:
            gamma = doc_estep(counts, eeb, w)
            sum_g = 0.0
            for g in gamma: sum_g += g
            psi_sum = digammam(sum_g)
            eet = [expm(digammam(gamma[i]) - psi_sum) for i in range(K)]
            for j in range(w):
                norm = 1e-100
                for kk in range(K):
                    norm += eet[kk] * eeb[kk][j]
                for i in range(K):
                    sstats[i][j] += math.floor(counts[j] * eet[i] * eeb[i][j] / norm * PIN)
        for i in range(K):
            for j in range(w):
                lam[i][j] = ETA + sstats[i][j] / PIN
    eeb = exp_elog_beta(lam, w)
    gammas = [doc_estep(c, eeb, w) for c in docs]
    return lam, gammas


# ---------------- SQL builders ----------------
# State (72 slots): 1-8 lambda | 9-16 eeb | 17-24 sstats | 25-28 gamma |
# 29-32 eet | 33 done | 34 psiSum | 35-38 psi(gamma_i) | 39-43 xstar
# (4 gammas + sum) | 44-48 v (recurrence part) | 49-53 t2 | 54-55 spare |
# 56-72 packed argmax (24 two-bit values per slot).
# Elements [code, c1, c2, dpos].

L = "6.931471805599453e-1"
LHI = "6.93147180369123816490e-01"
LLO = "1.90821492927058770002e-10"
NSLOT = 72
PACK0 = 56


def keep(upd):
    return "[" + ", ".join(upd.get(k, f"ia[{k}]") for k in range(1, NSLOT + 1)) + "]"


def horner13(r):
    acc = "1.0"
    for i in range(13, 0, -1): acc = f"(1.0 + {r} * {acc} / {i}.0)"
    return acc


def horner17(t2):
    acc = "0.0"
    for i in range(16, -1, -1): acc = f"((1.0 / {2*i+1}.0) + {t2} * {acc})"
    return acc


def xstar(a):
    # x + #applied-steps as ONE add, mirroring digammam's x + t
    cnt = " + ".join(
        f"(CASE WHEN ({a}) + {t}.0 < 6.0 THEN 1.0 ELSE 0.0 END)" for t in range(6))
    return f"(({a}) + ({cnt}))"


def vrec(a):
    # -(sum of 1/(a+t) for applied steps t), left-associated like the loop
    acc = "0.0"
    for t in range(6):
        acc = f"({acc} - (CASE WHEN ({a}) + {t}.0 < 6.0 THEN 1.0 / (({a}) + {t}.0) ELSE 0.0 END))"
    return acc


def m_of(xs):
    # log2-extract + one-step adjust: m in [1,2) (xs >= 6 so only >=2 side)
    e0 = f"floor(log2({xs}))"
    m0 = f"(({xs}) * pow(2.0, -{e0}))"
    return f"(CASE WHEN {m0} >= 2.0 THEN {m0} * 0.5 WHEN {m0} < 1.0 THEN {m0} * 2.0 ELSE {m0} END)"


def e_of(xs):
    e0 = f"floor(log2({xs}))"
    m0 = f"(({xs}) * pow(2.0, -{e0}))"
    return f"(CASE WHEN {m0} >= 2.0 THEN {e0} + 1.0 WHEN {m0} < 1.0 THEN {e0} - 1.0 ELSE {e0} END)"


def t2_of(xs):
    m = m_of(xs)
    t = f"((({m}) - 1.0) / (({m}) + 1.0))"
    return f"({t} * {t})"


def psi(xslot, vslot, t2slot):
    # v + e*L + 2t*Q(t2) - 0.5/x* - series(1/x*^2); x*/v/t2 slotted
    xs = f"ia[{xslot}]"
    m = m_of(xs)
    t = f"((({m}) - 1.0) / (({m}) + 1.0))"
    ln = f"({e_of(xs)} * {L} + 2.0 * {t} * {horner17(f'ia[{t2slot}]')})"
    inv = f"(1.0 / {xs})"
    inv2 = f"({inv} * {inv})"
    ser = (f"({inv2} * (1.0 / 12.0 - {inv2} * (1.0 / 120.0 - {inv2} * "
           f"(1.0 / 252.0 - {inv2} * (1.0 / 240.0 - {inv2} * (1.0 / 132.0))))))")
    return f"(ia[{vslot}] + {ln} - 0.5 * {inv} - {ser})"


def expm_sql(a):
    # range-safe for psi diffs (|arg| small): guards omitted like UmapOracle
    k = f"floor(({a}) / {L} + 0.5)"
    r = f"((({a}) - {k} * {LHI}) - {k} * {LLO})"
    return f"(pow(2.0, {k}) * {horner13(r)})"


def lda_stages():
    """code -> full 72-slot rebuild expr (ia = state, e = element)."""
    C1, C2, DP = "e[2]", "e[3]", "CAST(e[4] AS BIGINT)"
    st = {}
    g = lambda i: f"ia[{24 + i}]"        # gamma_i, i=1..4
    eet = lambda i: f"ia[{28 + i}]"
    eeb = lambda i, j: f"ia[{8 + (i - 1) * 2 + j}]"
    # P0: doc init
    st[0] = keep({25: f"(0.25 + ({C1} + {C2}) / 4.0)",
                  26: f"(0.25 + ({C1} + {C2}) / 4.0)",
                  27: f"(0.25 + ({C1} + {C2}) / 4.0)",
                  28: f"(0.25 + ({C1} + {C2}) / 4.0)",
                  33: "0.0"})
    gsum = "(((ia[25] + ia[26]) + ia[27]) + ia[28])"
    # q12: xstar + v for the 4 gammas and their sum
    upd = {}
    for i in range(1, 5):
        upd[38 + i] = xstar(g(i))
        upd[43 + i] = vrec(g(i))
    upd[43] = xstar(gsum)
    upd[48] = vrec(gsum)
    st[1] = keep(upd)
    # q3: t2 x5 (from xstar slots 39..43 -> 49..53)
    st[2] = keep({48 + i: t2_of(f"ia[{38 + i}]") for i in range(1, 6)})
    # q4: psi x5
    st[3] = keep({34: psi(43, 48, 53),
                  35: psi(39, 44, 49), 36: psi(40, 45, 50),
                  37: psi(41, 46, 51), 38: psi(42, 47, 52)})
    # q5: eet
    st[4] = keep({28 + i: expm_sql(f"(ia[{34 + i}] - ia[34])") for i in range(1, 5)})
    # q6: gamma update + done (mean |change| < 1e-3)
    def norm(j):
        terms = " + ".join(f"{eet(k)} * {eeb(k, j)}" for k in range(1, 5))
        return f"(1e-100 + {terms})"
    def gnew(i):
        acc = f"({C1} * {eeb(i, 1)} / {norm(1)} + {C2} * {eeb(i, 2)} / {norm(2)})"
        return f"(0.25 + {eet(i)} * {acc})"
    change = " + ".join(f"abs({gnew(i)} - {g(i)})" for i in range(1, 5))
    st[5] = keep({24 + i: gnew(i) for i in range(1, 5)} |
                 {33: f"(CASE WHEN ({change}) / 4.0 < 1e-3 THEN 1.0 ELSE 0.0 END)"})
    # 11: sstats accumulate (uses converged eet recomputed via 6..9)
    supd = {}
    for i in range(1, 5):
        for j in range(1, 3):
            c = C1 if j == 1 else C2
            supd[16 + (i - 1) * 2 + j] = (f"(ia[{16 + (i - 1) * 2 + j}] + "
                f"floor({c} * {eet(i)} * {eeb(i, j)} / {norm(j)} * {PIN_SQL}))")
    st[11] = keep(supd)
    # 10: clear done before the unguarded post-loop recompute (codes
    # 1..4 then rerun on the FINAL gamma regardless of convergence)
    st[10] = keep({33: "0.0"})
    # 12: M-step lambda update + sstats reset
    st[12] = keep({i: f"(0.25 + ia[{16 + i}] / {PIN_SQL})" for i in range(1, 9)} |
                  {16 + i: "0.0" for i in range(1, 9)})
    # 13+i (i=1..4): per-topic-row digamma prep: xstar/v/t2 for
    # lambda_i1, lambda_i2, rowsum_i -> slots 39-41 / 44-46 / 49-51
    for i in range(1, 5):
        l1, l2 = f"ia[{(i - 1) * 2 + 1}]", f"ia[{(i - 1) * 2 + 2}]"
        rs = f"({l1} + {l2})"
        st[12 + i] = keep({39: xstar(l1), 40: xstar(l2), 41: xstar(rs),
                           44: vrec(l1), 45: vrec(l2), 46: vrec(rs),
                           49: t2_of(xstar(l1)), 50: t2_of(xstar(l2)),
                           51: t2_of(xstar(rs))})
    # 17+i: eeb raw diffs for row i (psi(l_ij) - psi(rowsum_i))
    for i in range(1, 5):
        st[16 + i] = keep({8 + (i - 1) * 2 + 1: f"({psi(39, 44, 49)} - {psi(41, 46, 51)})",
                           8 + (i - 1) * 2 + 2: f"({psi(40, 45, 50)} - {psi(41, 46, 51)})"})
    # 21/22: exponentiate eeb (4 + 4)
    st[21] = keep({8 + i: expm_sql(f"ia[{8 + i}]") for i in range(1, 5)})
    st[22] = keep({12 + i: expm_sql(f"ia[{12 + i}]") for i in range(1, 5)})
    # 23: pack argmax(gamma) into the tail (first max wins)
    am = ("(CASE WHEN ia[26] > ia[25] AND ia[26] >= ia[27] AND ia[26] >= ia[28] THEN "
          " CASE WHEN ia[27] > ia[26] THEN (CASE WHEN ia[28] > ia[27] THEN 3.0 ELSE 2.0 END) ELSE (CASE WHEN ia[28] > ia[26] THEN 3.0 ELSE 1.0 END) END "
          "ELSE 0.0 END)")
    # simpler correct first-max-wins argmax:
    am = ("(CASE WHEN ia[25] >= ia[26] AND ia[25] >= ia[27] AND ia[25] >= ia[28] THEN 0.0 "
          "WHEN ia[26] >= ia[27] AND ia[26] >= ia[28] THEN 1.0 "
          "WHEN ia[27] >= ia[28] THEN 2.0 ELSE 3.0 END)")
    slotexpr = f"({PACK0} + ({DP} - 1) // 24)"
    st[23] = keep({PACK0 + s: (
        f"(CASE WHEN {slotexpr} = {PACK0 + s} THEN ia[{PACK0 + s}] + {am} * pow(4.0, CAST(({DP} - 1) % 24 AS DOUBLE)) "
        f"ELSE ia[{PACK0 + s}] END)") for s in range(0, 17)})
    return st


GUARDED = {1, 2, 3, 4, 5}
MAX_ITER_SQL = 10


def lda_step():
    st = lda_stages()
    SC = "CAST(e[1] AS BIGINT)"
    arms = []
    codes = sorted(st)
    for c in codes[:-1]:
        guard = f"(CASE WHEN ia[33] = 1.0 THEN ia ELSE {st[c]} END)" if c in GUARDED else st[c]
        arms.append(f"WHEN {SC} = {c} THEN {guard}")
    return "CASE " + " ".join(arms) + f" ELSE {st[codes[-1]]} END"


def lda_elements():
    """Element-list SQL over the docs list dd (list of [c1, c2])."""
    def el(code, c1="dd[d][1]", c2="dd[d][2]", dp="0.0"):
        return f"[{code}.0, {c1}, {c2}, {dp}]"
    inner5 = ", ".join(el(c) for c in (1, 2, 3, 4, 5))
    fit_doc = (f"list_concat(list_concat([{el(0)}], "
               f"flatten(list_transform(range(1, 31), zz -> [{inner5}]))), "
               f"[{el(10)}, {el(1)}, {el(2)}, {el(3)}, {el(4)}, {el(11)}])")
    # per topic row: prep (13+i) must be immediately followed by its
    # consumer (17+i) — the prep scratch slots are shared across rows
    row_pairs = [c for i in range(4) for c in (13 + i, 17 + i)]
    m_block = ("[" + ", ".join([el(12, "0.0", "0.0")] +
               [el(c, "0.0", "0.0") for c in row_pairs] +
               [el(21, "0.0", "0.0"), el(22, "0.0", "0.0")]) + "]")
    eeb_init = ("[" + ", ".join([el(c, "0.0", "0.0") for c in row_pairs] +
                [el(21, "0.0", "0.0"), el(22, "0.0", "0.0")]) + "]")
    tr_doc = (f"list_concat(list_concat([{el(0)}], "
              f"flatten(list_transform(range(1, 31), zz -> [{inner5}]))), "
              f"[{el(23, dp='CAST(d AS DOUBLE)')}])")
    fit_iter = f"list_concat(flatten(list_transform(range(1, nd + 1), d -> {fit_doc})), {m_block})"
    return (f"list_concat(list_concat({eeb_init}, "
            f"flatten(list_transform(range(1, {MAX_ITER_SQL} + 1), it -> {fit_iter}))), "
            f"flatten(list_transform(range(1, nd + 1), d -> {tr_doc})))")


def lam0_init():
    # lambda_kw = 1 + (draw(k*W+w)/1000 - 0.5)/10, t = (i-1)*2 + (j-1)
    def drw(t):
        x0 = f"((CAST({t} AS BIGINT)) + 10) % 2147483647"
        x1 = f"(48271 * ({x0})) % 2147483647"
        x2 = f"((({x1}) * ({x1})) + 12345) % 2147483647"
        x3 = f"(48271 * ({x2})) % 2147483647"
        return f"(CAST(({x3}) % 1000 AS DOUBLE) / 1000.0 - 0.5)"
    return ", ".join(f"(1.0 + {drw(t)} / 10.0) AS l{t}" for t in range(8))


def init_state():
    lam = ", ".join(f"l{t}" for t in range(8))
    zeros = ", ".join("0.0" for _ in range(NSLOT - 8))
    return f"[{lam}, {zeros}]"


def cte_lda(sf_filter="p_partkey <= 400"):
    return f"""src AS (SELECT p_partkey AS k,
        CAST(ceil((percent_rank() OVER (ORDER BY p_size, p_partkey)) * 99) + 1 AS DOUBLE) AS c1,
        CAST(ceil((percent_rank() OVER (ORDER BY p_retailprice, p_partkey)) * 99) + 1 AS DOUBLE) AS c2
      FROM part WHERE {sf_filter}),
dl AS MATERIALIZED (SELECT list([c1, c2] ORDER BY k) AS dd, list(k ORDER BY k) AS ks,
        COUNT(*) AS nd FROM src),
lam0 AS (SELECT {lam0_init()}),
elz AS MATERIALIZED (SELECT dd, ks, nd, {lda_elements()} AS els FROM dl),
fold AS MATERIALIZED (SELECT dd, ks, nd,
        list_reduce(list_prepend({init_state()}, els), (ia, e) -> {lda_step()}) AS fs
      FROM elz, lam0)"""


def unpack_argmax(d):
    # d is 1-based doc ordinal
    return (f"CAST(floor(fs[{PACK0} + ({d} - 1) // 24] / pow(4.0, CAST(({d} - 1) % 24 AS DOUBLE))) AS BIGINT) % 4")


def full_lda_sql(flt="p_partkey <= 100", feats=("p_size", "p_retailprice")):
    # per-topic label strings: normalized lambda row, terms ordered by
    # (weight desc, index asc), each "str(w)[:6]*feat" (+ ' + ' join) —
    # DuckDB's VARCHAR cast and Java's Double.toString agree on the
    # 6-char prefix (both shortest-roundtrip; verified on the gate fit)
    def lab(i):
        l1, l2 = f"fs[{(i - 1) * 2 + 1}]", f"fs[{(i - 1) * 2 + 2}]"
        w1 = f"({l1} / ({l1} + {l2}))"
        w2 = f"({l2} / ({l1} + {l2}))"
        t1 = f"substr(CAST({w1} AS VARCHAR), 1, 6) || '*{feats[0]}'"
        t2 = f"substr(CAST({w2} AS VARCHAR), 1, 6) || '*{feats[1]}'"
        return f"(CASE WHEN {w1} >= {w2} THEN {t1} || ' + ' || {t2} ELSE {t2} || ' + ' || {t1} END)"
    labels = ", ".join(f"{lab(i)} AS lb{i}" for i in range(1, 5))
    am = unpack_argmax("d")
    return ("WITH " + cte_lda(flt) + f""",
fin AS (SELECT ks, nd, fs, {labels} FROM fold)
SELECT unnest(ks) AS p_partkey,
       unnest(list_transform(range(1, nd + 1), d ->
         CASE {am} WHEN 0 THEN lb1 WHEN 1 THEN lb2 WHEN 2 THEN lb3 ELSE lb4 END)) AS category_lda
FROM fin""")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    stage = sys.argv[2] if len(sys.argv) > 2 else "py"
    tr = json.load(open("/tmp/lda_trace.json"))

    if stage == "py":
        docs = tr["docs"]
        lam, gammas = fit(docs)
        okl = all(lam[i][j] == tr["lambda"][i][j]
                  for i in range(K) for j in range(len(docs[0])))
        okg = all(gammas[d][i] == tr["gamma"][d][i]
                  for d in range(len(docs)) for i in range(K))
        print("lambda:", "OK" if okl else "MISMATCH",
              "| gamma:", "OK" if okg else "MISMATCH")
        if not okl:
            print(" py :", lam)
            print(" sc :", tr["lambda"])
        if not okg and okl:
            for d in range(len(docs)):
                if gammas[d] != [float(v) for v in tr["gamma"][d]]:
                    print(" first bad doc", d, gammas[d], tr["gamma"][d]); break

    if stage == "lam0":
        con = duckdb.connect()
        r = con.execute("SELECT " + lam0_init()).fetchone()
        w = len(tr["docs"][0])
        exp = [1.0 + (draw(i * w + j, 9, 1000) / 1000.0 - 0.5) / 10.0
               for i in range(K) for j in range(w)]
        print("lam0:", "OK" if list(r) == exp else f"MISMATCH {r} vs {exp}")

    if stage == "sqlfit":
        import time
        con = duckdb.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
        flt = sys.argv[3] if len(sys.argv) > 3 else "p_partkey <= 400"
        t0 = time.time()
        q = ("WITH " + cte_lda(flt) +
             " SELECT fs[1:8], nd, ks FROM fold")
        lam_sql, nd, ks = con.execute(q).fetchone()
        dt = time.time() - t0
        # python reference on the same filtered docs
        con2 = duckdb.connect()
        con2.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
        docs = [list(r) for r in con2.execute(
            f"""SELECT CAST(ceil((percent_rank() OVER (ORDER BY p_size, p_partkey)) * 99) + 1 AS DOUBLE),
                       CAST(ceil((percent_rank() OVER (ORDER BY p_retailprice, p_partkey)) * 99) + 1 AS DOUBLE)
                FROM part WHERE {flt} ORDER BY p_partkey""").fetchall()]
        lam_py, gammas_py = fit(docs)
        flat_py = [lam_py[i][j] for i in range(K) for j in range(2)]
        ok = list(lam_sql) == flat_py
        print(f"sqlfit ({dt:.1f}s, nd={nd}): lambda", "OK" if ok else "MISMATCH")
        if not ok:
            for t in range(8):
                if lam_sql[t] != flat_py[t]:
                    print(f"  slot {t}: sql={lam_sql[t]!r} py={flat_py[t]!r}"); break
        # argmax check
        q2 = ("WITH " + cte_lda(flt) +
              f" SELECT list_transform(range(1, nd + 1), d -> "
              f"CAST(floor(fs[{PACK0} + (d - 1) // 24] / pow(4.0, CAST((d - 1) % 24 AS DOUBLE))) AS BIGINT) % 4) FROM fold")
        am_sql = con.execute(q2).fetchone()[0]
        am_py = []
        for g in gammas_py:
            best = 0
            for i in range(1, K):
                if g[i] > g[best]: best = i
            am_py.append(best)
        oka = list(am_sql) == am_py
        print("argmax:", "OK" if oka else
              f"MISMATCH ({sum(1 for a, b in zip(am_sql, am_py) if a != b)} of {len(am_py)})")

    if stage == "final":
        import time
        con = duckdb.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
        t0 = time.time()
        rows = con.execute(full_lda_sql()).fetchall()
        dt = time.time() - t0
        rows.sort(key=lambda r: int(r[0]))
        keys = tr["keys"]
        exp = [tr["labels"][int(a)] for a in tr["argmax"]]
        bad = [i for i in range(len(keys))
               if int(rows[i][0]) != int(keys[i]) or rows[i][1] != exp[i]]
        print(f"final ({dt:.1f}s, {len(rows)} rows):",
              "OK" if not bad else f"MISMATCH {len(bad)}, first {bad[:3]}")
        if bad:
            i = bad[0]
            print("  sql:", rows[i], " exp:", (keys[i], exp[i]))

    if stage == "ranks":
        con = duckdb.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
        q = """SELECT p_partkey,
            CAST(ceil((percent_rank() OVER (ORDER BY p_size, p_partkey)) * 99) + 1 AS DOUBLE) AS c1,
            CAST(ceil((percent_rank() OVER (ORDER BY p_retailprice, p_partkey)) * 99) + 1 AS DOUBLE) AS c2
            FROM part ORDER BY p_partkey"""
        rows = con.execute(q).fetchall()
        docs = tr["docs"]
        bad = [i for i in range(len(docs))
               if rows[i][1] != docs[i][0] or rows[i][2] != docs[i][1]]
        print("ranks:", "OK" if not bad else f"MISMATCH {len(bad)}, first {bad[:3]}")

if __name__ == "__main__":
    main()
