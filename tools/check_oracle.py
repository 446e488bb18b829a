#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB running SparkEntry.oracleSql on the same
tables. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # canonicalize values for comparison (dates/times -> ISO strings)
    import datetime, decimal, math
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v

def type_token(t):
    """Canonical token per DuckDB type so only representation-changing skews
    flag (HUGEINT vs BIGINT, DECIMAL vs DOUBLE), not alias spellings."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t  # precision/scale matter to the hash
    return {"VARCHAR": "STRING", "TEXT": "STRING", "CHAR": "STRING"}.get(t, t)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            want = con.sql(sql)
        except Exception as e:
            print(f"FAIL {name}: query error {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
            print(f"FAIL {name}: columns {gcols} vs {wcols}")
            n_fail += 1
            continue
        # Type parity: the driver's hash is representation-sensitive, so a
        # HUGEINT-vs-BIGINT or DECIMAL-vs-DOUBLE skew fails there even when
        # every value is equal. Catch it here.
        gtypes = {c.lower(): t for c, t in zip(got.columns, map(str, got.types))}
        wtypes = {c.lower(): t for c, t in zip(want.columns, map(str, want.types))}
        skew = [(c, gtypes[c], wtypes[c]) for c in gtypes
                if type_token(gtypes[c]) != type_token(wtypes[c])]
        if skew:
            print(f"FAIL {name}: TYPE-SKEW {skew}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.select(', '.join(f'"{c}"' for c in gcols)).fetchall()]
        wrows = [tuple(norm(v) for v in r) for r in want.select(', '.join(f'"{c}"' for c in wcols)).fetchall()]
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}")
            n_fail += 1
            continue
        if sorted(map(repr, grows)) != sorted(map(repr, wrows)):
            bad = [(g, w) for g, w in zip(sorted(map(repr, grows)), sorted(map(repr, wrows))) if g != w][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        # also verify the declared ORDER BY agrees (order-sensitive check)
        ordered_ok = grows == wrows
        print(f"PASS {name} ({len(grows)} rows{'', ' ORDER-MISMATCH'}[not ordered_ok])" if False else
              f"PASS {name} ({len(grows)} rows{'' if ordered_ok else ', ORDER-MISMATCH'})")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
