#!/usr/bin/env python3
"""Prototype the DuckDB Lloyd-replay oracle for q_coret_kmeans and
compare value-exactly with the Spark dump at /tmp/vq/q_coret_kmeans."""
import duckdb, sys

DIR = "/root/testdata/sf0.01"

def dist(pfx, c):
    # left-assoc (f1-cs[c][1])^2 + ... matching Spark's reduce(_+_)
    terms = [f"({pfx}{f} - cs[{c}][{f}])*({pfx}{f} - cs[{c}][{f}])" for f in (1, 2, 3, 4)]
    return "(" + " + ".join(terms) + ")"

def sdist(c):
    # sample-space dist for point j using the ordered lists x1..x4
    terms = [f"(x{f}[j] - cs[{c}][{f}])*(x{f}[j] - cs[{c}][{f}])" for f in (1, 2, 3, 4)]
    return "(" + " + ".join(terms) + ")"

newc = ", ".join(
    "[" + ", ".join(
        f"CASE WHEN len(ixs[{c}]) = 0 THEN cs[{c}][{f}] "
        f"ELSE list_reduce(list_prepend(0.0, [x{f}[j] FOR j IN ixs[{c}]]), (a,v) -> a + v) / len(ixs[{c}]) END"
        for f in (1, 2, 3, 4)) + "]"
    for c in (1, 2, 3))

SQL = f"""
WITH RECURSIVE
src AS (SELECT l_orderkey AS k1, l_linenumber AS k2,
               CAST(l_quantity AS DOUBLE) AS f1, CAST(l_extendedprice AS DOUBLE) AS f2,
               CAST(l_discount AS DOUBLE) AS f3, CAST(l_tax AS DOUBLE) AS f4 FROM lineitem),
mm AS (SELECT MIN(f1) lo1, MAX(f1) hi1, MIN(f2) lo2, MAX(f2) hi2,
              MIN(f3) lo3, MAX(f3) hi3, MIN(f4) lo4, MAX(f4) hi4 FROM src),
n AS (SELECT k1, k2,
        CASE WHEN hi1 = lo1 THEN 0.0 ELSE (f1 - lo1) / (hi1 - lo1) END AS f1,
        CASE WHEN hi2 = lo2 THEN 0.0 ELSE (f2 - lo2) / (hi2 - lo2) END AS f2,
        CASE WHEN hi3 = lo3 THEN 0.0 ELSE (f3 - lo3) / (hi3 - lo3) END AS f3,
        CASE WHEN hi4 = lo4 THEN 0.0 ELSE (f4 - lo4) / (hi4 - lo4) END AS f4
      FROM src, mm),
samp AS (SELECT md5(k1 || ':' || k2 || ':9') AS h, f1, f2, f3, f4 FROM n
         WHERE f1 IS NOT NULL AND f2 IS NOT NULL AND f3 IS NOT NULL AND f4 IS NOT NULL
         ORDER BY h, f1, f2, f3, f4 LIMIT 2000),
sp AS (SELECT list(f1 ORDER BY h, f1, f2, f3, f4) AS x1, list(f2 ORDER BY h, f1, f2, f3, f4) AS x2,
              list(f3 ORDER BY h, f1, f2, f3, f4) AS x3, list(f4 ORDER BY h, f1, f2, f3, f4) AS x4,
              COUNT(*) AS m FROM samp),
it(i, cs) AS (
  SELECT 0, [[x1[1], x2[1], x3[1], x4[1]],
             [x1[2], x2[2], x3[2], x4[2]],
             [x1[3], x2[3], x3[3], x4[3]]] FROM sp
  UNION ALL
  SELECT i + 1, [{newc}]
  FROM (SELECT i, cs, x1, x2, x3, x4,
               [[j FOR j IN generate_series(1, m) IF asg[j] = 1],
                [j FOR j IN generate_series(1, m) IF asg[j] = 2],
                [j FOR j IN generate_series(1, m) IF asg[j] = 3]] AS ixs
        FROM (SELECT i, cs, x1, x2, x3, x4, m,
                     list_transform(generate_series(1, m), j ->
                       CASE WHEN {sdist(1)} <= {sdist(2)} AND {sdist(1)} <= {sdist(3)} THEN 1
                            WHEN {sdist(2)} <= {sdist(3)} THEN 2 ELSE 3 END) AS asg
              FROM it, sp WHERE i < 30))),
fin AS (SELECT cs FROM it WHERE i = 30)
SELECT k1 AS l_orderkey, k2 AS l_linenumber,
  CAST(CASE WHEN f1 IS NULL OR f2 IS NULL OR f3 IS NULL OR f4 IS NULL THEN 0
            WHEN {dist('f', 1)} <= {dist('f', 2)} AND {dist('f', 1)} <= {dist('f', 3)} THEN 0
            WHEN {dist('f', 2)} <= {dist('f', 3)} THEN 1 ELSE 2 END AS BIGINT) AS category_kmeans
FROM n, fin
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{DIR}/lineitem.parquet'")
import time
t0 = time.time()
oracle = con.execute(SQL).df().sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
print(f"oracle: {len(oracle)} rows in {time.time()-t0:.1f}s; label counts:")
print(oracle.category_kmeans.value_counts().to_dict())

cols = ["l_orderkey", "l_linenumber", "category_kmeans"]
spark = con.execute("SELECT * FROM '/tmp/vq/q_coret_kmeans/*.parquet'").df()
# the driver's compare: sort columns by name, sort rows, hash values
o = oracle[cols].sort_values(cols).reset_index(drop=True)
s = spark[cols].sort_values(cols).reset_index(drop=True)
print("spark label counts:", spark.category_kmeans.value_counts().to_dict())
eq = o.equals(s)
print("EXACT MATCH" if eq else "MISMATCH")
if not eq:
    diff = (o != s).any(axis=1)
    print(o[diff].head(5)); print(s[diff].head(5))
