#!/usr/bin/env python3
"""Dev-only big-output referee: compare one oracle key ENTIRELY inside
DuckDB — row count, sorted column names, and an order-independent
multiset fingerprint SUM(hash(ROW(cols sorted by name))) over both the
oracle result and the Spark parquet. For keys whose x10 output is tens
of millions of rows, tools/check_each.py's python-side canon (fetchall
+ sort of both sides) dominates the referee budget; this keeps the
whole compare columnar. Hash collisions: DuckDB's 64-bit hash summed
mod 2^64 — a value mismatch escaping detection needs an adversarial
collision, not a plausible engine bug.

Usage: python3 tools/check_hash.py <sfDir> <verifyOutDir> <key>
       [--overrides]  (read tools/oracle_overrides/<key>.sql)
"""
import sys, os, json
import duckdb

def main():
    sf_dir, out_dir, key = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.sql("SET memory_limit='48GB'")
    con.sql("SET threads=16")
    con.sql(f"SET temp_directory='{out_dir}/.duck_tmp_hash_{key}'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ov = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "oracle_overrides", f"{key}.sql")
    if "--overrides" in sys.argv and os.path.exists(ov):
        # multi-statement script: run everything up to the final
        # top-level SELECT, then materialize that SELECT as __o
        script = open(ov).read()
        body, _, final = script.rpartition("\nSELECT ")
        assert final, f"override {ov} has no final SELECT"
        if body.strip():
            con.sql(body)
        sql = "SELECT " + final.rstrip().rstrip(";")
        print(f"[override] {ov}")
    else:
        sql = json.load(open(f"{out_dir}/oracle_sql.json"))[key]
    con.sql(f"CREATE TEMP TABLE __o AS ({sql.rstrip().rstrip(';')})")
    s = con.sql(f"CREATE TEMP TABLE __s AS SELECT * FROM "
                f"'{out_dir}/{key}/*.parquet'")
    def schema(tbl):
        return sorted((r[0].lower(), str(r[1]).upper())
                      for r in con.sql(f"DESCRIBE {tbl}").fetchall())
    osch, ssch = schema("__o"), schema("__s")
    # same contract as check_each: names AND types must match, so the
    # per-row hash below is computed over identically-typed values
    assert osch == ssch, f"schema {osch} vs {ssch}"
    ocols = [c for c, _ in osch]
    cols = ", ".join(f'"{c}"' for c in ocols)
    def fp(tbl):
        return con.sql(
            f"SELECT COUNT(*), "
            f"CAST(SUM(CAST(hash(ROW({cols})) AS HUGEINT)) % "
            f"CAST(18446744073709551616 AS HUGEINT) AS VARCHAR) "
            f"FROM {tbl}").fetchone()
    on, oh = fp("__o")
    sn, sh = fp("__s")
    assert on == sn, f"rows {on} vs {sn}"
    assert oh == sh, f"multiset hash {oh} vs {sh}"
    print(f"PASS {key} (rows={on}, multiset_hash={oh})")

if __name__ == "__main__":
    main()
