#!/usr/bin/env python3
"""Self-test for tools/check.py — the gate is load-bearing diagnostics
(round 12 made it the artifact a non-reproducing driver fail is argued
from), so its detector classes get planted-divergence tests of their own.

Fabricates a tiny verify_out with oracle SQL over literal VALUES and
asserts each detector fires (or stays silent) as designed:
  1. bit-only divergence (+0.0 vs -0.0): [warn] + bits-only diff record,
     still a PASS (values equal) — the driver-hash-candidate class
  2. decimal result column: hard FAIL even with identical values
  3. genuine value divergence: FAIL with row-level record
  4. identical frames: clean pass, empty diffs
Run: python3 tools/test_check.py   (exit 0 = all good)
"""
import json
import os
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "/root/testdata/sf0.001"  # tables unused by the literal oracles


def run_case(name, spark_tbl, oracle_sql):
    import shutil
    out = tempfile.mkdtemp(prefix=f"check_self_{name}_")
    try:
        os.makedirs(f"{out}/{name}")
        pq.write_table(spark_tbl, f"{out}/{name}/part-0.parquet")
        with open(f"{out}/oracle_sql.json", "w") as f:
            # oracle_sql=None plants a no-oracle query (the sketch-bound path)
            json.dump({name: oracle_sql} if oracle_sql else {}, f)
        p = subprocess.run(
            [sys.executable, f"{HERE}/check.py", SF, out],
            capture_output=True, text=True)
        if not os.path.exists(f"{out}/_gate_diffs.json"):
            # the gate died before writing its artifact — surface ITS
            # stderr, not a FileNotFoundError from here (a diagnosability
            # tool must not fail opaquely)
            sys.exit(f"check.py produced no artifact for {name} "
                     f"(rc={p.returncode}):\n{p.stderr[-2000:]}")
        diffs = json.load(open(f"{out}/_gate_diffs.json"))["diffs"]
        return p.returncode, p.stdout, diffs
    finally:
        shutil.rmtree(out, ignore_errors=True)


fails = []


def expect(cond, what):
    if not cond:
        fails.append(what)
        print(f"  SELF-TEST FAIL: {what}")
    else:
        print(f"  ok: {what}")


# 1. signed zero: equal values, divergent bits -> warn + record, rc 0
rc, outp, diffs = run_case(
    "t_signed_zero",
    pa.table({"k": pa.array([1], pa.int64()),
              "v": pa.array([-0.0], pa.float64())}),
    "SELECT CAST(1 AS BIGINT) AS k, CAST(0.0 AS DOUBLE) AS v")
expect(rc == 0, "signed zero: still a pass (values equal)")
expect("not bit-identical" in outp, "signed zero: bits-only warn printed")
expect(any(d.get("kind") == "bits-only" for d in diffs.get("t_signed_zero", [])),
       "signed zero: bits-only diff recorded")

# 2. decimal result column on both sides: hard FAIL
rc, outp, diffs = run_case(
    "t_decimal",
    pa.table({"k": pa.array([1], pa.int64()),
              "d": pa.array([10], pa.decimal128(38, 0))}),
    "SELECT CAST(1 AS BIGINT) AS k, CAST(10 AS DECIMAL(38,0)) AS d")
expect(rc == 1, "decimal column: hard fail")
expect(any(d.get("kind") == "decimal-result-column"
           for d in diffs.get("t_decimal", [])),
       "decimal column: guard recorded")

# 3. genuine value divergence: FAIL with row-level record incl. bits
rc, outp, diffs = run_case(
    "t_value",
    pa.table({"k": pa.array([1], pa.int64()),
              "v": pa.array([1.5], pa.float64())}),
    "SELECT CAST(1 AS BIGINT) AS k, CAST(2.5 AS DOUBLE) AS v")
expect(rc == 1, "value divergence: fail")
recs = diffs.get("t_value", [])
expect(any(d.get("kind") == "value" and "spark_bits" in d for d in recs),
       "value divergence: row-level record with bit patterns")

# 4. identical: clean pass, no diffs
rc, outp, diffs = run_case(
    "t_clean",
    pa.table({"k": pa.array([1, 2], pa.int64()),
              "s": pa.array(["a", "b"], pa.string())}),
    "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'), (2, 'b')) t(k, s)")
expect(rc == 0 and not diffs, "identical frames: clean pass, empty diffs")

# 5/6. sketch bound checks (no oracle SQL — the bound checker IS the
# gate): fabricate q_dau_sketch_rollup outputs (the one remaining
# oracle-less query since round 15) from the REAL exact answers over
# SF's events, once within the HLL bound (exact itself) and once far
# outside — both grains, so the day AND month-union checks are proven.
import duckdb as _dd
_days = _dd.connect().execute(
    f"SELECT strftime(ts, '%Y-%m-%d') AS dt, count(DISTINCT user_id) AS d "
    f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1").fetchall()
_months = _dd.connect().execute(
    f"SELECT substr(strftime(ts, '%Y-%m-%d'), 1, 7) AS m, "
    f"count(DISTINCT user_id) AS d "
    f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1").fetchall()
_grain = ["day"] * len(_days) + ["month"] * len(_months)
_keys = [r[0] for r in _days] + [r[0] for r in _months]
_ex = [float(r[1]) for r in _days] + [float(r[1]) for r in _months]

rc, outp, diffs = run_case(
    "q_dau_sketch_rollup",
    pa.table({"grain": pa.array(_grain, pa.string()),
              "key": pa.array(_keys, pa.string()),
              "uniques": pa.array(_ex, pa.float64())}),
    None)  # no oracle entry → routed to the bound checker
expect(rc == 0 and "bounded-ok" in outp,
       "sketch in-bound: exact-valued estimates pass the bound check")

rc, outp, diffs = run_case(
    "q_dau_sketch_rollup",
    pa.table({"grain": pa.array(_grain, pa.string()),
              "key": pa.array(_keys, pa.string()),
              # double every estimate: far outside the 4σ (6.5%) HLL bound
              "uniques": pa.array([v * 2 for v in _ex], pa.float64())}),
    None)
expect(rc == 1, "sketch out-of-bound: hard fail")
expect(any(d.get("kind") == "sketch-bound"
           for d in diffs.get("q_dau_sketch_rollup", [])),
       "sketch out-of-bound: bound-violation record in the artifact")

print(f"\n{'ALL GOOD' if not fails else str(len(fails)) + ' SELF-TEST FAILURES'}")
sys.exit(1 if fails else 0)
