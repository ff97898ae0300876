#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, runs the matching oracle SQL in DuckDB
over the same sf tables and compares (schema-ish, row count, exact values
after sorting rows). Exits nonzero on any mismatch.

Usage: tools/verify_local.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    results = {}
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{qdir}/*.parquet' ORDER BY ALL"
        ).fetchall()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got_rows)}"
            print(f"  ~ {name}: no oracle, rows={len(got_rows)}")
            continue
        try:
            want = con.sql(oracles[name])
            want_cols = sorted(want.columns)
            want_rows = con.sql(
                f"SELECT {', '.join(want_cols)} FROM ({oracles[name]}) ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            n_fail += 1
            print(f"  ✗ {name}: oracle error: {str(e)[:200]}")
            continue
        if got_cols != want_cols:
            results[name] = f"COLS got={got_cols} want={want_cols}"
            n_fail += 1
            print(f"  ✗ {name}: columns differ: {got_cols} vs {want_cols}")
            continue
        if len(got_rows) != len(want_rows):
            results[name] = f"ROWS got={len(got_rows)} want={len(want_rows)}"
            n_fail += 1
            print(f"  ✗ {name}: rowcount {len(got_rows)} vs {len(want_rows)}")
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            gn, wn = tuple(map(norm, g)), tuple(map(norm, w))
            if gn != wn:
                bad = (i, gn, wn)
                break
        if bad:
            results[name] = f"VALUES row {bad[0]}"
            n_fail += 1
            print(f"  ✗ {name}: row {bad[0]} differs:\n      got  {bad[1]}\n      want {bad[2]}")
        else:
            results[name] = "OK"
            n_pass += 1
            print(f"  ✓ {name}: {len(got_rows)} rows match exactly")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for v in results.values() if v.startswith('NO-ORACLE'))} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
