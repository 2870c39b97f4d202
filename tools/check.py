#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate — NOT part of
the library). Runs DuckDB on each oracle_sql.json entry against the
testdata tables and compares with the Spark parquet dumped by
graft.Verify: row count, column names, and per-value hash with columns
sorted by name and rows sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; normalize floats/decimals/datetimes
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if v is None:
                rr.append(None)
            elif isinstance(v, float):
                rr.append(('f', repr(v)))
            elif hasattr(v, 'isoformat'):
                rr.append(('t', v.isoformat()))
            elif str(type(v).__name__) == 'Decimal':
                rr.append(('f', repr(float(v))))
            else:
                rr.append((type(v).__name__[0], str(v)))
        out.append(tuple(rr))
    out.sort(key=repr)
    return out

def type_canon(t):
    # Canonical DuckDB type family for strictness: the driver's hasher
    # materializes values per-type (HUGEINT -> float64!), so the oracle
    # must produce the SAME duckdb type family as the Spark parquet.
    # Exact-int family members are NOT merged (HUGEINT is the bug this
    # guard exists for); only representation-identical aliases collapse.
    t = str(t).upper()
    if t in ("TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ"):
        return "TIMESTAMP"  # same instant payload; hasher emits isoformat
    return t

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # dev-only: comma-separated key substring filter
        pats = sys.argv[3].split(",")
        oracles = {k: v for k, v in oracles.items() if any(p in k for p in pats)}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.sql(sql)
            ocols, orows = [c.lower() for c in o.columns], o.fetchall()
            otypes = [type_canon(t) for t in o.types]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = [c.lower() for c in s.columns], s.fetchall()
        stypes = [type_canon(t) for t in s.types]
        # List/struct-typed output columns are rejected outright: the
        # driver's pandas-based hasher sorts rows and dies on unhashable
        # numpy arrays (proven by vocab_tokenize_ids in r7). Serialize
        # nested values to scalars (concat_ws / array_to_string) instead.
        nested = [(c, t) for c, t in list(zip(scols, stypes)) + list(zip(ocols, otypes))
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY"))]
        if nested:
            print(f"FAIL {name}: nested-typed output cols (unhashable downstream): {sorted(set(nested))}")
            n_fail += 1; continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1; continue
        # Type-strict gate: per column (matched by name), the DuckDB
        # oracle type must equal the Spark parquet type — names+values
        # alone pass while the driver's hasher diverges (HUGEINT vs
        # BIGINT hashed float64 vs int). Proven by sequence_pack in r5.
        omap = dict(zip(ocols, otypes)); smap = dict(zip(scols, stypes))
        tbad = [(c, omap[c], smap[c]) for c in sorted(omap) if omap[c] != smap[c]]
        if tbad:
            print(f"FAIL {name}: type mismatch (col, oracle, spark): {tbad}")
            n_fail += 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            n_fail += 1; continue
        co, cs = canon(orows, ocols), canon(srows, scols)
        if co != cs:
            bad = [(a, b) for a, b in zip(co, cs) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(orows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
