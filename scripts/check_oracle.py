#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for every query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same parquet tables and
compare (sorted rows, exact for non-floats, tiny tolerance report for
floats so hash-match risk is visible).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
            want_rel = con.sql(sql)
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # sort columns by name (driver semantics), then rows
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1; continue
        # type-kind check: the driver hashes through Arrow, where e.g. a
        # DuckDB HUGEINT (sum() OVER on BIGINT) converts to float64 and
        # hash-mismatches an integer Spark column even when values are
        # equal. Catch int-vs-float/decimal drift locally.
        def kind(t):
            t = str(t).upper()
            if "HUGEINT" in t: return "hugeint"
            if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")): return "int"
            if any(k in t for k in ("FLOAT", "DOUBLE", "REAL")): return "float"
            if "DECIMAL" in t: return "decimal"
            return "other"
        got_types = con.sql(
            f"SELECT * FROM read_parquet({files!r}) LIMIT 0").types
        want_types = want_rel.types
        type_drift = [
            (got_cols[i], str(got_types[i]), want_cols[j], str(want_types[j]))
            for i, j in zip(gi, wi)
            if kind(got_types[i]) != kind(want_types[j])]
        if type_drift:
            print(f"FAIL {name}: type drift (hash-gate risk): {type_drift}")
            n_fail += 1; continue
        g = sorted([tuple(r[i] for i in gi) for r in got], key=lambda r: tuple(map(str, r)))
        w = sorted([tuple(r[i] for i in wi) for r in want], key=lambda r: tuple(map(str, r)))
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        max_float_diff = 0.0
        mismatch = None
        for rg, rw in zip(g, w):
            for a, b in zip(rg, rw):
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    d = abs(a - b)
                    max_float_diff = max(max_float_diff, d)
                    if d > 1e-9 * max(1.0, abs(a), abs(b)):
                        mismatch = (rg, rw); break
                elif a != b:
                    mismatch = (rg, rw); break
            if mismatch: break
        if mismatch:
            print(f"FAIL {name}: first mismatch\n  got  {mismatch[0]}\n  want {mismatch[1]}")
            n_fail += 1
        else:
            exact = "bit-exact" if max_float_diff == 0.0 else f"max_float_diff={max_float_diff:.3g}"
            print(f"PASS {name}: {len(g)} rows, {exact}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
