#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [verify_out]

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL in DuckDB over the same testdata tables, sorts columns by name
and rows by value, and diffs. Exact for ints/strings; doubles compared to
1e-9 relative (the driver hashes — we flag anything not bit-identical too).
"""
import sys, json, glob, os, struct
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Engine-version stamp: a non-reproducing driver-side fail is diagnosable
# only if we know which DuckDB produced each side (round-11 lesson:
# q_label_centroids hash-failed driver-side, passed locally — the artifact
# alone couldn't say whether the oracle engine differed).
print(f"gate engines: duckdb={duckdb.__version__} pyarrow={pa.__version__} "
      f"pandas={pd.__version__}")


def bits(v):
    """Raw IEEE-754 bit pattern of a float as hex, else repr — makes a
    'doubles close but not bit-identical' diff actionable from the artifact
    alone."""
    try:
        f = float(v)
        return hex(struct.unpack("<Q", struct.pack("<d", f))[0])
    except (TypeError, ValueError):
        return repr(v)


diffs = {}  # name -> list of row-level divergence records
_counts = {"pass": 0, "fail": 0, "rows_only": 0}


def flush_diffs():
    """Rewrite the diff artifact NOW — the sandbox kills long gates under
    load (CLAUDE.md; Verify writes incrementally for the same reason), and
    an artifact that only appears after the full loop would vanish in
    exactly the degraded runs it exists to diagnose."""
    meta = {"duckdb": duckdb.__version__, "pyarrow": pa.__version__,
            "pandas": pd.__version__, "sf_dir": sf,
            "pass": _counts["pass"], "fail": _counts["fail"],
            "rows_only": _counts["rows_only"], "diffs": diffs}
    tmp = f"{out}/._gate_diffs.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, default=str)
    os.replace(tmp, f"{out}/_gate_diffs.json")


def record_diff(name, **kw):
    diffs.setdefault(name, []).append(kw)
    flush_diffs()

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


# ------------------------------------------------------------- sketches
# The 4 registered sketch queries have no exact cross-engine twin by
# definition (HLL/CMS/KLL internals differ per engine) — but each sketch
# PUBLISHES an error bound, and the exact answer is computable in DuckDB.
# So instead of rows-only, assert estimate ∈ bound(exact): a broken sketch
# pipeline (wrong key, wrong grouping, dropped filter) lands far outside
# the bound, while a healthy one never leaves it.

def _rel_viol(rows, exact, rel, abs_slack, what):
    """|est - exact| must be ≤ max(abs_slack, rel·exact) per key; a key
    present on one side only is its own violation."""
    v = []
    seen = set()
    for key, est in rows:
        seen.add(key)
        if key not in exact:
            v.append({"kind": "sketch-bound", "what": what, "key": str(key),
                      "err": "key missing from exact answer"})
            continue
        ex = float(exact[key])
        if abs(float(est) - ex) > max(abs_slack, rel * ex):
            v.append({"kind": "sketch-bound", "what": what, "key": str(key),
                      "estimate": float(est), "exact": ex,
                      "bound": max(abs_slack, rel * ex)})
    for key in set(exact) - seen:
        v.append({"kind": "sketch-bound", "what": what, "key": str(key),
                  "err": "exact key missing from sketch output"})
    return v


def _bound_dau_sketch_rollup(con, df):
    # DataSketches HLL, default lgK=12 → σ ≈ 1.04/√4096 ≈ 1.6%; 4σ ≈ 6.5%.
    # Day rows check the per-day sketches; month rows check that the
    # UNION path still estimates the true month-level distinct.
    days = dict(con.execute(
        "SELECT strftime(ts, '%Y-%m-%d'), count(DISTINCT user_id) "
        "FROM events GROUP BY 1").fetchall())
    months = dict(con.execute(
        "SELECT substr(strftime(ts, '%Y-%m-%d'), 1, 7), "
        "count(DISTINCT user_id) FROM events GROUP BY 1").fetchall())
    d = df[df["grain"] == "day"]
    m = df[df["grain"] == "month"]
    return (_rel_viol(zip(d["key"], d["uniques"]), days,
                      rel=4 * 0.0163, abs_slack=5, what="hll day") +
            _rel_viol(zip(m["key"], m["uniques"]), months,
                      rel=4 * 0.0163, abs_slack=5, what="hll month-union"))


# Since round 15 the only oracle-less query is the mergeable-sketch
# rollup (q_dau_approx / q_heavy_hitters_cms / q_len_quantiles_approx now
# register self-checking exact+boolean projections and go through the
# normal hash gate); its estimates are still HARD-checked here against
# DuckDB exact answers.
SKETCH_BOUNDS = {
    "q_dau_sketch_rollup": _bound_dau_sketch_rollup,
}

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(f"{out}/{d}") and not d.startswith("."))

def canon(tbl):
    """Arrow table -> (sorted DataFrame with per-column null-mask companions,
    original column list). Masks come from the ARROW layer: pandas float
    columns turn NULL into NaN, which equal_nan comparison would then
    silently conflate with a genuine NaN — the masks keep NULL distinct."""
    df = tbl.to_pandas()
    orig = sorted(df.columns)
    masks = []
    for c in orig:
        m = "\x00null_" + c
        df[m] = pc.is_null(tbl[c]).to_pandas().values
        masks.append(m)
    df = df[orig + masks]
    # masks participate as sort tie-breakers so a NULL and a NaN that sort
    # equal by value land in a deterministic order on both sides
    return df.sort_values(by=orig + masks, na_position="first",
                          kind="mergesort").reset_index(drop=True), orig

n_pass = n_fail = n_noor = n_bounded = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    got = pq.ParquetDataset(files).read()
    if name not in oracle:
        if name in SKETCH_BOUNDS:
            try:
                viol = SKETCH_BOUNDS[name](con, got.to_pandas())
            except Exception as e:
                print(f"  [FAIL] {name}: sketch-bound checker errored: {e}")
                record_diff(name, kind="sketch-bound-error", error=str(e))
                n_fail += 1
                continue
            if viol:
                print(f"  [FAIL] {name}: {len(viol)} estimate(s) outside the "
                      f"sketch's published error bound, e.g. {viol[0]}")
                for rec in viol[:10]:
                    record_diff(name, **rec)
                n_fail += 1
            else:
                print(f"  [bounded-ok] {name}: {got.num_rows} rows, every "
                      f"estimate within the sketch's published bound of exact")
                n_bounded += 1
        else:
            print(f"  [rows-only] {name}: {got.num_rows} rows")
            n_noor += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"  [ORACLE-ERR] {name}: {e}")
        record_diff(name, kind="oracle-error", error=str(e))
        n_fail += 1
        continue
    # Arrow-dtype parity: the driver HASHES result values after a pandas
    # round-trip, where dtype drives representation — a DuckDB HUGEINT
    # (arrow decimal128) column hashes differently from Spark's int64 even
    # when every value prints identically, so the string-compare below
    # would pass while the driver fails (exactly how q_bpe_train slipped
    # through round 5's local gate: an uncast sum(BIGINT)). 128-bit vs
    # 64-bit integer mismatches are therefore a hard FAIL here; any other
    # type difference is surfaced as a warning for eyeballing.
    ok = True
    g_types = {f.name: f.type for f in got.schema}
    e_types = {f.name: f.type for f in exp.schema}
    # A decimal RESULT column is a hard FAIL even when both sides agree:
    # decimal→pandas representation is engine-version-dependent (DuckDB
    # returned float64 for decimals in older releases, object Decimal in
    # newer), so the driver's dtype-included hash can mismatch between its
    # DuckDB and ours with every value identical. Round-11's one hash-fail
    # (q_label_centroids) was the registry's only decimal128 result column.
    # Decimals are fine INSIDE a query — just CAST the emitted column to
    # VARCHAR (exact) or BIGINT/DOUBLE before the final SELECT, both sides.
    import pyarrow.types as pt
    for side, types in (("spark", g_types), ("duck", e_types)):
        for c, t in sorted(types.items()):
            if pt.is_decimal(t):
                print(f"  [FAIL] {name}.{c}: {side} result column is {t} — "
                      f"decimal pandas representation is engine-version-"
                      f"dependent driver-side; CAST to VARCHAR/BIGINT")
                record_diff(name, column=c, kind="decimal-result-column",
                            side=side, dtype=str(t))
                ok = False
    for c in sorted(set(g_types) & set(e_types)):
        gt, et = g_types[c], e_types[c]
        if gt == et:
            continue
        intish = lambda t: pt.is_decimal(t) or pt.is_integer(t)
        width = lambda t: t.bit_width if pt.is_integer(t) else 128
        # ANY integer bit-width mismatch (32 vs 64 just like 64 vs 128)
        # hashes differently after the driver's dtype-included pandas
        # round-trip — all of them are hard FAILs, not warnings. So does
        # same-width signedness (DuckDB UBIGINT vs Spark int64: uint64 vs
        # int64 are distinct pandas dtypes even when every value is
        # representable in both).
        signed_mismatch = (pt.is_integer(gt) and pt.is_integer(et) and
                           pt.is_unsigned_integer(gt) != pt.is_unsigned_integer(et))
        if intish(gt) and intish(et) and (width(gt) != width(et) or signed_mismatch):
            why = ("int-width" if width(gt) != width(et) else "signedness")
            print(f"  [FAIL] {name}.{c}: dtype spark={gt} duck={et} "
                  f"({why} mismatch hashes differently driver-side — CAST the oracle)")
            record_diff(name, column=c, kind="dtype", spark=str(gt), duck=str(et))
            ok = False
        elif pt.is_large_string(gt) != pt.is_large_string(et) and \
                (pt.is_string(gt) or pt.is_large_string(gt)) and \
                (pt.is_string(et) or pt.is_large_string(et)):
            pass  # string vs large_string: same pandas object representation
        else:
            print(f"  [warn] {name}.{c}: dtype spark={gt} duck={et}")
    (g, g_cols), (e, e_cols) = canon(got), canon(exp)
    if g_cols != e_cols:
        print(f"  [FAIL] {name}: columns spark={g_cols} duck={e_cols}")
        record_diff(name, kind="columns", spark=g_cols, duck=e_cols)
        ok = False
    elif len(g) != len(e):
        print(f"  [FAIL] {name}: rows spark={len(g)} duck={len(e)}")
        record_diff(name, kind="rowcount", spark=len(g), duck=len(e))
        ok = False
    else:
        for c in g_cols:
            gm, em = g["\x00null_" + c].values, e["\x00null_" + c].values
            if not np.array_equal(gm, em):
                i = int(np.argmax(gm != em))
                print(f"  [FAIL] {name}.{c}: row {i} null-mask spark={bool(gm[i])} duck={bool(em[i])}")
                record_diff(name, column=c, kind="null-mask", row=i,
                            spark=bool(gm[i]), duck=bool(em[i]))
                ok = False
                continue
            gv, ev = g[c].values, e[c].values
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                bad = ~((pd.isna(gv) & pd.isna(ev)) |
                        np.isclose(gv.astype(float), ev.astype(float),
                                   rtol=1e-9, atol=1e-12, equal_nan=True))
                # BITWISE divergence is the ground truth (the driver hashes
                # bit-level representations): value equality would hide
                # +0.0 vs -0.0 and differing NaN payloads — exactly the
                # non-reproducing-fail class this artifact exists to catch
                nb = (np.frombuffer(gv.astype(np.float64).tobytes(), dtype=np.uint64)
                      != np.frombuffer(ev.astype(np.float64).tobytes(), dtype=np.uint64))
                if bad.any():
                    i = int(np.argmax(bad))
                    print(f"  [FAIL] {name}.{c}: row {i} spark={gv[i]!r} duck={ev[i]!r}")
                    record_diff(name, column=c, kind="value", row=i,
                                spark=repr(gv[i]), duck=repr(ev[i]),
                                spark_bits=bits(gv[i]), duck_bits=bits(ev[i]))
                    ok = False
                elif nb.any():
                    # surface the FIRST bit-divergent row with both bit
                    # patterns (NaN-payload diffs between two NaNs are
                    # unreachable through parquet/duckdb, but signed zeros
                    # are real: both hash differently driver-side)
                    i = int(np.argmax(nb))
                    print(f"  [warn] {name}.{c}: doubles close but not bit-identical "
                          f"(row {i}: spark={bits(gv[i])} duck={bits(ev[i])})")
                    record_diff(name, column=c, kind="bits-only", row=i,
                                spark=repr(gv[i]), duck=repr(ev[i]),
                                spark_bits=bits(gv[i]), duck_bits=bits(ev[i]))
            else:
                gs = pd.Series(gv, dtype=object).where(pd.notna(pd.Series(gv)), "\x00NULL")
                es = pd.Series(ev, dtype=object).where(pd.notna(pd.Series(ev)), "\x00NULL")
                if not (gs.astype(str) == es.astype(str)).all():
                    bad = (gs.astype(str) != es.astype(str))
                    i = int(np.argmax(bad.values))
                    print(f"  [FAIL] {name}.{c}: row {i} spark={gv[i]!r} duck={ev[i]!r}")
                    record_diff(name, column=c, kind="value", row=i,
                                spark=repr(gv[i]), duck=repr(ev[i]))
                    ok = False
    if ok:
        print(f"  [ok] {name}: {len(g)} rows")
        n_pass += 1
    else:
        n_fail += 1

# Final artifact write (diffs were also flushed incrementally on every
# record so a killed gate keeps its partial diagnostics — VERDICT r11 #1).
_counts.update({"pass": n_pass, "fail": n_fail, "rows_only": n_noor})
flush_diffs()

print(f"\n{n_pass} pass, {n_fail} fail, {n_noor} rows-only, "
      f"{n_bounded} bounded-ok (diff artifact: {out}/_gate_diffs.json)")
sys.exit(1 if n_fail else 0)
