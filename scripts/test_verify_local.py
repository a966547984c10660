#!/usr/bin/env python3
"""Self-test for verify_local's compare internals — run `python3
scripts/test_verify_local.py` after touching row_key / cells_equal /
tolerant_multiset_match. The fallback only fires on rare float-boundary
mismatches, so without this it would never be exercised until the day it
matters."""
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "vl", os.path.join(os.path.dirname(__file__), "verify_local.py")
)
vl = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vl)

cols = ["id", "score"]
floaty = frozenset(["score"])

# two scores equal under the 1e-9 compare tolerance but straddling a
# 7-significant-digit formatting boundary: the sorted-pairwise walk can
# cross-pair such rows (the ADVICE r8 false-FAIL scenario) — the
# tolerant fallback must accept the multiset
a1, a2 = 0.12345644999999, 0.12345645000001
assert vl.cells_equal(a1, a2), "tolerance premise broken"

# --- sign-of-zero strictness (r18 qml60 escape) -----------------------
# the driver's hash is bit-exact: -0.0 vs +0.0 are ==-equal but
# hash-different, so the local compare must reject the pairing
assert not vl.cells_equal(-0.0, 0.0)
assert not vl.cells_equal(0.0, -0.0)
assert vl.cells_equal(-0.0, -0.0)
assert vl.cells_equal(0.0, 0.0)
# a slack-dependent pass is recorded (surfaced as WARN/strict-FAIL)
vl.SLACK_HITS.clear()
assert vl.cells_equal(a1, a2) and vl.SLACK_HITS == [(a1, a2)]
vl.SLACK_HITS.clear()
assert vl.cells_equal(1.0, 1.0) and vl.SLACK_HITS == []
s_rows = [{"id": "x", "score": a1}, {"id": "x", "score": 0.9}]
o_rows = [{"id": "x", "score": a2}, {"id": "x", "score": 0.9}]
assert vl.row_key(s_rows[0], cols) != vl.row_key(o_rows[0], cols), (
    "boundary premise broken: keys agree, scenario not exercised"
)
assert vl.tolerant_multiset_match(s_rows, o_rows, cols, floaty) is None

# a genuine value difference must survive the fallback (never false PASS)
o_bad = [{"id": "x", "score": 0.5}, {"id": "x", "score": 0.9}]
assert vl.tolerant_multiset_match(s_rows, o_bad, cols, floaty) is not None

# a row present on one side only (non-float key miss) must fail
o_miss = [{"id": "y", "score": a2}, {"id": "x", "score": 0.9}]
assert vl.tolerant_multiset_match(s_rows, o_miss, cols, floaty) is not None

# multiset semantics: duplicates consume candidates one-for-one
s_dup = [{"id": "x", "score": 1.0}, {"id": "x", "score": 1.0}]
o_dup = [{"id": "x", "score": 1.0}, {"id": "x", "score": 2.0}]
assert vl.tolerant_multiset_match(s_dup, o_dup, cols, floaty) is not None

# int-vs-float cross-typing in a masked column still matches by value
s_i = [{"id": "x", "score": 5}]
o_f = [{"id": "x", "score": 5.0}]
assert vl.tolerant_multiset_match(s_i, o_f, cols, floaty) is None

# --- column-TYPE parity (r16 q91/q93 class) ---------------------------
# DuckDB promotes sum(BIGINT) to HUGEINT → decimal128(38,0); the
# string-compare sees Decimal('3') == '3' and stays green while the
# driver's type-aware hash fails. decimal_type_mismatches must flag the
# pairing structurally.
import pyarrow as pa

t_int = pa.table({"a": pa.array([1], pa.int64())})
t_dec = pa.table({"a": pa.array([1], pa.int64()).cast(pa.decimal128(38, 0))})
t_flt = pa.table({"a": pa.array([1.0], pa.float64())})
t_dec21 = pa.table({"a": pa.array([__import__("decimal").Decimal("1.0")],
                                  pa.decimal128(2, 1))})
assert vl.decimal_type_mismatches(t_int, t_dec) == [("a", "int", "decimal")]
assert vl.decimal_type_mismatches(t_flt, t_dec21) == [("a", "float", "decimal")]
assert vl.decimal_type_mismatches(t_int, t_int) == []
assert vl.decimal_type_mismatches(t_flt, t_flt) == []
# benign int-vs-float pairings (count() vs avg-family) stay allowed
assert vl.decimal_type_mismatches(t_int, t_flt) == []

# --- registry-wide oracle type sweep ----------------------------------
# must fail on a planted uncast sum() (HUGEINT) and an uncast numeric
# literal (decimal(2,1)), and pass their CAST-boundary forms
spec_s = importlib.util.spec_from_file_location(
    "ots", os.path.join(os.path.dirname(__file__), "oracle_type_sweep.py")
)
ots = importlib.util.module_from_spec(spec_s)
spec_s.loader.exec_module(ots)
import duckdb

con = duckdb.connect()
planted = {
    "p_sum": "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x) t",
    "p_lit": "SELECT 0.0 AS b",
}
bad = ots.sweep(con, planted)
assert {(n, c) for n, c, _ in bad} == {("p_sum", "s"), ("p_lit", "b")}, bad
clean = {
    "c_sum": "SELECT CAST(sum(x) AS BIGINT) AS s "
             "FROM (SELECT CAST(1 AS BIGINT) AS x) t ORDER BY s",
    "c_lit": "SELECT CAST(0.0 AS DOUBLE) AS b",
}
assert ots.sweep(con, clean) == []

# --- end-to-end: sweep empty-map guard + attempted.json scope ---------
# (subprocess level: both behaviors live in the scripts' main())
import json
import subprocess
import sys
import tempfile

import pyarrow.parquet as pq_w

scripts = os.path.dirname(os.path.abspath(__file__))


def run(script, *args):
    return subprocess.run([sys.executable, os.path.join(scripts, script),
                           *args], capture_output=True, text=True)


with tempfile.TemporaryDirectory() as tmp:
    sf = os.path.join(tmp, "sf")
    os.makedirs(sf)
    # empty oracle map must FAIL the type sweep, not certify as OK
    empty = os.path.join(tmp, "empty.json")
    json.dump({}, open(empty, "w"))
    r = run("oracle_type_sweep.py", sf, empty)
    assert r.returncode == 1 and "empty" in r.stdout, (r.returncode, r.stdout)

    # a filtered Verify dump dir is self-describing via attempted.json:
    # unfiltered verify_local must compare exactly the attempted scope
    out = os.path.join(tmp, "out")
    os.makedirs(os.path.join(out, "qa"))
    json.dump({"qa": "SELECT CAST(1 AS BIGINT) AS x",
               "qb": "SELECT CAST(2 AS BIGINT) AS y"},
              open(os.path.join(out, "oracle_sql.json"), "w"))
    pq_w.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                     os.path.join(out, "qa", "part-0.parquet"))
    # qmlz: rows-only entries appear in attempted but not in the oracle.
    # errors.json={} marks the run as having COMPLETED (Verify writes it
    # last; its absence next to a manifest now reads as interrupted).
    json.dump({}, open(os.path.join(out, "errors.json"), "w"))
    json.dump(["qa", "qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 0 and "scope from attempted.json: 1/2" in r.stdout \
        and "PASS qa" in r.stdout, (r.returncode, r.stdout)
    # a query inside the attempted scope but missing its dump still FAILs
    json.dump(["qa", "qb"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 1 and "qb: no parquet dump found" in r.stdout, (
        r.returncode, r.stdout)

    # ADVICE r17: an attempted scope holding ONLY rows-only queries must
    # read as an explicit "nothing comparable" success, not FAILED
    json.dump(["qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 0 and "nothing comparable in scope" in r.stdout, (
        r.returncode, r.stdout)
    # same via explicit CLI filter: a rows-only name (in attempted) is
    # dropped with a note, a genuinely unknown name still fails
    json.dump(["qa", "qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out, "qmlz")
    assert r.returncode == 0 and "nothing comparable in scope" in r.stdout, (
        r.returncode, r.stdout)
    r = run("verify_local.py", sf, out, "qa,qmlz")
    assert r.returncode == 0 and "dropping 1 rows-only" in r.stdout \
        and "PASS qa" in r.stdout, (r.returncode, r.stdout)
    r = run("verify_local.py", sf, out, "q_typo")
    assert r.returncode == 1 and "unknown query names" in r.stdout, (
        r.returncode, r.stdout)

    # a rows-only query that ERRORED spark-side must FAIL, never read as
    # the "nothing comparable" success (r18 review finding)
    json.dump(["qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    json.dump({"qmlz": "RuntimeException: boom"},
              open(os.path.join(out, "errors.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 1 and "spark-side error (rows-only" in r.stdout, (
        r.returncode, r.stdout)
    # same in a MIXED scope: the oracle query passes but the errored
    # rows-only query still fails the run
    json.dump(["qa", "qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 1 and "PASS qa" in r.stdout \
        and "spark-side error (rows-only" in r.stdout, (r.returncode, r.stdout)
    # error cleared: both shortcut paths go back to green
    json.dump({}, open(os.path.join(out, "errors.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 0 and "PASS qa" in r.stdout, (r.returncode, r.stdout)
    json.dump(["qmlz"], open(os.path.join(out, "attempted.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 0 and "nothing comparable in scope" in r.stdout, (
        r.returncode, r.stdout)

    # an INTERRUPTED run (manifest written, errors.json never reached —
    # Verify writes it last) must FAIL, never shortcut to "nothing
    # comparable" (second r18 review pass)
    os.remove(os.path.join(out, "errors.json"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 1 and "interrupted Verify run" in r.stdout, (
        r.returncode, r.stdout)
    # without a manifest, a recorded spark-side error on a NON-oracle
    # (rows-only) query must still fail — there is no scope to excuse it
    os.remove(os.path.join(out, "attempted.json"))
    json.dump({"qml_other": "OOM"},
              open(os.path.join(out, "errors.json"), "w"))
    r = run("verify_local.py", sf, out)
    assert r.returncode == 1 and "spark-side error (rows-only" in r.stdout, (
        r.returncode, r.stdout)
    # ...but an explicit CLI filter IS a declared scope: the same stray
    # error outside it is skipped, like out-of-filter oracle errors
    r = run("verify_local.py", sf, out, "qa")
    assert r.returncode == 0 and "PASS qa" in r.stdout, (
        r.returncode, r.stdout)

    # --- end-to-end sign-of-zero + slack surfacing (r18 qml60 class) --
    # a doctored -0.0 dump against a +0.0 oracle must FAIL (the driver's
    # bit-exact hash fails it; the pre-r19 compare certified it green)
    json.dump({}, open(os.path.join(out, "errors.json"), "w"))
    os.makedirs(os.path.join(out, "qz"))
    json.dump({"qz": "SELECT CAST(0.0 AS DOUBLE) AS z"},
              open(os.path.join(out, "oracle_sql.json"), "w"))
    pq_w.write_table(pa.table({"z": pa.array([-0.0], pa.float64())}),
                     os.path.join(out, "qz", "part-0.parquet"))
    r = run("verify_local.py", sf, out, "qz")
    assert r.returncode == 1 and "value mismatch" in r.stdout, (
        r.returncode, r.stdout)
    # matching signs pass without any slack warning
    pq_w.write_table(pa.table({"z": pa.array([0.0], pa.float64())}),
                     os.path.join(out, "qz", "part-0.parquet"))
    r = run("verify_local.py", sf, out, "qz")
    assert r.returncode == 0 and "PASS qz" in r.stdout \
        and "slack" not in r.stdout, (r.returncode, r.stdout)
    # a pass that NEEDS the 1e-9 slack is loud (WARN) and, under
    # GRAFT_VERIFY_STRICT=1, a FAIL — the driver's hash would fail it
    pq_w.write_table(pa.table({"z": pa.array([1e-12], pa.float64())}),
                     os.path.join(out, "qz", "part-0.parquet"))
    r = run("verify_local.py", sf, out, "qz")
    assert r.returncode == 0 and "WARN qz: 1 float pair(s)" in r.stdout, (
        r.returncode, r.stdout)
    env = dict(os.environ, GRAFT_VERIFY_STRICT="1")
    r2 = subprocess.run([sys.executable,
                         os.path.join(scripts, "verify_local.py"),
                         sf, out, "qz"],
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 1 and "ONLY via the 1e-9 slack" in r2.stdout, (
        r2.returncode, r2.stdout)

    # --- slack-hit mispairing adjudication (r19 review finding #2) ----
    # bit-identical MULTISETS whose sub-tolerance-different rows share a
    # 7-sig-digit sort key land in opposite orders: the pairwise walk
    # passes only via slack, but the driver's order-insensitive
    # bit-exact hash passes — so no WARN and no strict-mode FAIL
    a, b = 0.1, 0.100000000001
    assert vl.bitexact_multiset_equal(
        [{"z": a}, {"z": b}], [{"z": b}, {"z": a}], ["z"])
    assert not vl.bitexact_multiset_equal(
        [{"z": a}, {"z": a}], [{"z": b}, {"z": a}], ["z"])
    assert not vl.bitexact_multiset_equal([{"z": -0.0}], [{"z": 0.0}], ["z"])
    # kind-tagged keys (ADVICE r19): a bytes cell equal to a float's
    # IEEE bytes (or to b"nan") must never key like the float cell
    import struct as _struct
    assert not vl.bitexact_multiset_equal(
        [{"z": 0.1}], [{"z": _struct.pack("<d", 0.1)}], ["z"])
    assert not vl.bitexact_multiset_equal(
        [{"z": float("nan")}], [{"z": b"nan"}], ["z"])
    json.dump({"qz": f"SELECT CAST({b!r} AS DOUBLE) AS z "
                     f"UNION ALL SELECT CAST({a!r} AS DOUBLE)"},
              open(os.path.join(out, "oracle_sql.json"), "w"))
    pq_w.write_table(pa.table({"z": pa.array([a, b], pa.float64())}),
                     os.path.join(out, "qz", "part-0.parquet"))
    r = subprocess.run([sys.executable,
                        os.path.join(scripts, "verify_local.py"),
                        sf, out, "qz"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0 and "PASS qz" in r.stdout \
        and "slack" not in r.stdout, (r.returncode, r.stdout)

print("verify_local self-test: 44 cases OK")
