#!/usr/bin/env python3
"""Prototype the DuckDB Lloyd-replay oracle for q_sim_ivf_topk."""
import duckdb, time

DIR = "/root/testdata/sf0.01"
NLIST, NPROBE, K, ITERS = 16, 4, 5, 10

DOT = ("list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
       "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), (x, y) -> x + y)")
DIST = ("list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))), (x, y) -> x + y)")
NORM = "sqrt(" + DOT.format(a="{a}", b="{a}") + ")"

d_vj_c = DIST.format(a="vs[j]", b="c")
d_v_c = DIST.format(a="v", b="c")

SQL = f"""
WITH RECURSIVE
emb AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
sp AS (SELECT list(v ORDER BY md5(id || ':9')) AS vs, COUNT(*) AS m FROM emb),
it(i, cs) AS (
  SELECT 0, vs[1:{NLIST}] FROM sp
  UNION ALL
  SELECT i + 1,
    [CASE WHEN len(ixs[c]) = 0 THEN cs[c]
          ELSE list_transform(
                 list_reduce(list_prepend(list_transform(generate_series(1, 64), z -> 0.0),
                                          [vs[j] FOR j IN ixs[c]]),
                             (a, v) -> list_transform(list_zip(a, v), z -> z[1] + z[2])),
                 s -> s / len(ixs[c])) END
     FOR c IN generate_series(1, {NLIST})]
  FROM (SELECT i, cs, vs,
               [[j FOR j IN generate_series(1, m) IF asg[j] = c]
                FOR c IN generate_series(1, {NLIST})] AS ixs
        FROM (SELECT i, cs, vs, m,
                     list_transform(generate_series(1, m), j ->
                       list_position(list_transform(cs, c -> {d_vj_c}),
                                     list_min(list_transform(cs, c -> {d_vj_c})))) AS asg
              FROM it, sp WHERE i < {ITERS}))),
fin AS (SELECT cs FROM it WHERE i = {ITERS}),
bucketed AS (
  SELECT id, v,
    CAST(list_position(list_transform(cs, c -> {d_v_c}),
                       list_min(list_transform(cs, c -> {d_v_c}))) - 1 AS INT) AS lst
  FROM emb, fin),
probes AS (
  SELECT id AS query_id, v AS qv, cidx - 1 AS lst
  FROM (SELECT e.id, e.v, u.cidx, {DIST.format(a="e.v", b="cs[u.cidx]")} AS d
        FROM emb e, fin, (SELECT unnest(generate_series(1, {NLIST})) AS cidx) u
        WHERE e.id < 5)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cidx) <= {NPROBE}),
scored AS (
  SELECT p.query_id, b.id AS neighbor_id,
    {DOT.format(a="p.qv", b="b.v")} /
      ({NORM.format(a="p.qv")} * {NORM.format(a="b.v")}) AS cosine
  FROM bucketed b JOIN probes p ON b.lst = p.lst AND b.id <> p.query_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {K}
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{DIR}/embeddings.parquet'")
t0 = time.time()
oracle = con.execute(SQL).df()
print(f"oracle: {len(oracle)} rows in {time.time()-t0:.1f}s")
cols = ["query_id", "neighbor_id", "cosine", "rank"]
spark = con.execute("SELECT * FROM '/tmp/vq/q_sim_ivf_topk/*.parquet'").df()
o = oracle[cols].sort_values(cols).reset_index(drop=True)
s = spark[cols].sort_values(cols).reset_index(drop=True)
eq = o.equals(s)
print("EXACT MATCH" if eq else "MISMATCH")
if not eq:
    print(o.head(8)); print(s.head(8))
