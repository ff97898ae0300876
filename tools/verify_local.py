#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, runs the matching oracle SQL in DuckDB
over the same sf tables and compares (schema-ish, row count, exact values
after sorting rows). Exits nonzero on any mismatch.

Every oracle runs under a TIME BUDGET (default 30 s): an oracle that
exceeds the budget is reported as a failure even if its rows match, and a
watchdog interrupts DuckDB at 2x the budget so one pathological oracle can
never hang the whole gate (the q112b_r8 incident: one exponentially
inlined CTE chain zeroed CORRECTNESS_r08.json to `{}`).

Usage: tools/verify_local.py <sfDir> <outDir> [budget_sec]
"""
import json
import math
import sys
import threading
import time
from pathlib import Path

import duckdb

BUDGET_SEC = 30.0


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


class OracleTimeout(Exception):
    pass


def run_oracle(sf_dir, tables, sql, hard_timeout):
    """Run one oracle on a FRESH connection with a hard-timeout watchdog.

    A fresh connection per oracle is deliberate: con.interrupt() from the
    watchdog can race query completion, and a pending interrupt on a
    SHARED connection would abort the NEXT query (a spurious red row for
    an innocent query). Here the interrupted/poisoned connection is
    simply discarded. A watchdog-interrupted run raises OracleTimeout so
    it lands in the ORACLE-OVER-BUDGET category, not generic error."""
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    done = threading.Event()
    fired = threading.Event()

    def watchdog():
        if not done.wait(hard_timeout):
            fired.set()
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        cols = con.sql(sql).columns
        rows = con.sql(
            f"SELECT {', '.join(sorted(cols))} FROM ({sql}) ORDER BY ALL"
        ).fetchall()
        return sorted(cols), rows
    except Exception:
        if fired.is_set():
            raise OracleTimeout(f"interrupted by watchdog after {hard_timeout:.0f}s")
        raise
    finally:
        done.set()
        con.close()


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, budget: float = BUDGET_SEC) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()  # got-side reads only; oracles get fresh cons

    n_pass = n_fail = 0
    results = {}
    slowest = []
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
        t0 = time.time()
        try:
            want_cols, want_rows = run_oracle(
                sf_dir, TABLES, oracles[name], hard_timeout=2 * budget)
        except OracleTimeout as e:
            results[name] = f"ORACLE-OVER-BUDGET {e}"
            n_fail += 1
            print(f"  ✗ {name}: {e} — fix the oracle SQL "
                  f"(MATERIALIZE reused CTEs?)")
            continue
        except Exception as e:
            elapsed = time.time() - t0
            results[name] = f"ORACLE-ERROR {e}"
            n_fail += 1
            print(f"  ✗ {name}: oracle error after {elapsed:.1f}s: {str(e)[:200]}")
            continue
        elapsed = time.time() - t0
        slowest.append((elapsed, name))
        if elapsed > budget:
            results[name] = f"ORACLE-OVER-BUDGET {elapsed:.1f}s > {budget:.0f}s"
            n_fail += 1
            print(f"  ✗ {name}: oracle took {elapsed:.1f}s (budget {budget:.0f}s)"
                  f" — fix the oracle SQL (MATERIALIZE reused CTEs?)")
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
            print(f"  ✓ {name}: {len(got_rows)} rows match exactly ({elapsed:.2f}s oracle)")
    slowest.sort(reverse=True)
    if slowest:
        top = ", ".join(f"{n}={t:.1f}s" for t, n in slowest[:5])
        print(f"\nslowest oracles: {top}")
    print(f"{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for v in results.values() if v.startswith('NO-ORACLE'))} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    b = float(sys.argv[3]) if len(sys.argv) > 3 else BUDGET_SEC
    sys.exit(main(sys.argv[1], sys.argv[2], b))
