#!/usr/bin/env python3
"""Dev-only harness: per-key DuckDB compare with a wall-clock timeout
and spill cleanup per key — for big on-disk factors (GATE_sf1) where a
single oracle can exhaust the disk (the LPA CTE chain needs >79 GB at
x10). Each key runs in its own subprocess; TIMEOUT/CRASH affects only
that key and its temp spill is removed before the next one.

Usage: python3 tools/check_each.py <sfDir> <verifyOutDir> [timeoutSec]
       [skip,keys,csv]
"""
import sys, json, glob, os, shutil, subprocess, time

ONE = r'''
import sys, json
import duckdb
sf_dir, out_dir, key = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.sql("SET memory_limit='48GB'")
con.sql("SET threads=16")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[key]
o = con.sql(sql)
ocols, orows = [c.lower() for c in o.columns], o.fetchall()
otypes = [str(t).upper() for t in o.types]
s = con.sql(f"SELECT * FROM '{out_dir}/{key}/*.parquet'")
scols, srows = [c.lower() for c in s.columns], s.fetchall()
stypes = [str(t).upper() for t in s.types]
def tc(t):
    return "TIMESTAMP" if t in ("TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ") else t
assert sorted(ocols) == sorted(scols), f"cols {sorted(ocols)} vs {sorted(scols)}"
omap = dict(zip(ocols, map(tc, otypes))); smap = dict(zip(scols, map(tc, stypes)))
tbad = [(c, omap[c], smap[c]) for c in sorted(omap) if omap[c] != smap[c]]
assert not tbad, f"types {tbad}"
assert len(orows) == len(srows), f"rows {len(orows)} vs {len(srows)}"
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if v is None: rr.append(None)
            elif isinstance(v, float): rr.append(("f", repr(v)))
            elif hasattr(v, "isoformat"): rr.append(("t", v.isoformat()))
            elif str(type(v).__name__) == "Decimal": rr.append(("f", repr(float(v))))
            else: rr.append((type(v).__name__[0], str(v)))
        out.append(tuple(rr))
    out.sort(key=repr)
    return out
co, cs = canon(orows, ocols), canon(srows, scols)
assert co == cs, "value mismatch: " + repr([(a, b) for a, b in zip(co, cs) if a != b][:2])
print(f"rows={len(orows)}")
'''

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for key in sorted(oracles):
        if key in skip:
            print(f"SKIP {key} (listed)", flush=True); n_skip += 1; continue
        if not glob.glob(f"{out_dir}/{key}/*.parquet"):
            print(f"FAIL {key}: no spark output", flush=True); n_fail += 1; continue
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", ONE, sf_dir, out_dir, key],
                               capture_output=True, text=True, timeout=timeout)
            dt = time.time() - t0
            if r.returncode == 0:
                print(f"PASS {key} ({r.stdout.strip()}, {dt:.1f}s)", flush=True)
                n_pass += 1
            else:
                tail = (r.stderr.strip().splitlines() or ["?"])[-1][:300]
                print(f"FAIL {key}: {tail} ({dt:.1f}s)", flush=True)
                n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP {key} (oracle timeout {timeout}s)", flush=True)
            n_skip += 1
        shutil.rmtree(".tmp", ignore_errors=True)
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip", flush=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
