#!/usr/bin/env python3
"""Dev-only pre-validation of SparkEntry oracles, mimicking the driver's gate:
run graft.Verify at a given SF, then replay each oracle SQL in DuckDB over the
same parquet tables and compare (rows, schema-ish, sorted value hash).

Usage: python3 scripts/check_correctness.py [sfDir] [outDir]
"""
import sys, os, json, hashlib
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

ok = fail = 0
for name in sorted(oracles):
    pq = os.path.join(out, name)
    if not os.path.isdir(pq):
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        scols, srows = (lambda r: ([d[0] for d in r.description], r.fetchall()))(
            con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')"))
        ocols, orows = (lambda r: ([d[0] for d in r.description], r.fetchall()))(
            con.execute(oracles[name]))
    except Exception as e:
        print(f"[ERR ] {name}: {str(e).splitlines()[0]}"); fail += 1; continue
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
    if not problems and table_hash(scols, srows) != table_hash(ocols, orows):
        sh = {"\x01".join(norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
        oh = {"\x01".join(norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
        diff_s = list(sh - oh)[:3]; diff_o = list(oh - sh)[:3]
        problems.append(f"hash mismatch; spark-only={diff_s} oracle-only={diff_o}")
    if problems:
        print(f"[FAIL] {name} ({len(srows)} rows): " + " | ".join(problems)); fail += 1
    else:
        print(f"[ OK ] {name}: {len(srows)} rows"); ok += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
