#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate:
reads each Verify parquet dump + oracle_sql.json, runs the oracle SQL
in DuckDB over the same testdata parquet, and compares values
(columns sorted by name, rows SORTED BY ALL COLUMNS with pandas
sort_values, exactly like the driver — so array-typed cells raise the
same TypeError here that they raise in the driver's gate). Dev tool
only — the shipped library is pure Scala.
Usage: local_verify.py <sfDir> <verifyOutDir>
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 12)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm(v.item())
    except ImportError:
        pass
    return v

def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # The driver sorts EVERY dumped result (oracled or not) by all
    # columns; unsortable cells (arrays/maps) error its gate even for
    # rows-only checks. Sort-probe every dump so that failure mode
    # can never pass locally again.
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}") or name in oracles:
            continue
        try:
            d = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            d.sort_values(by=sorted(d.columns))
            print(f"PASS {name} (no oracle; {len(d)} rows sortable)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: unsortable no-oracle output: {type(e).__name__}: {e}")
            n_fail += 1
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            # Driver parity: pandas sort_values over every column —
            # errors on unsortable cells (e.g. numpy.ndarray) exactly
            # like the driver's comparator does.
            got_s = got[gcols].sort_values(by=gcols).reset_index(drop=True)
            want_s = want[wcols].sort_values(by=wcols).reset_index(drop=True)
            g = [tuple(norm(v) for v in r) for r in got_s.itertuples(index=False)]
            w = [tuple(norm(v) for v in r) for r in want_s.itertuples(index=False)]
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
