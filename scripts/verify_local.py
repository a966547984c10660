#!/usr/bin/env python3
"""Builder-side replica of the driver's DuckDB correctness compare.

Usage:
    python3 scripts/verify_local.py <sfDir> <verifyOutDir> [qname,...]

Reads the parquet dumps `graft.Verify` wrote to <verifyOutDir>, runs each
query's oracle SQL (from <verifyOutDir>/oracle_sql.json) in DuckDB over
the parquet tables in <sfDir>, and value-compares: row count, column set,
and cell-by-cell equality after sorting columns by name (the driver's
hash-compare normalization). Exits non-zero on any mismatch.

This is a LOCAL validation tool (python/duckdb are driver-side deps, not
library deps) — the shipped Scala library never imports any of this.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def fail(msg):
    print(f"FAIL {msg}")
    return False


# Float pairs that passed cells_equal ONLY via the 1e-9 slack, per query
# (cleared by the main loop before each compare). The driver's hash is
# bit-exact, so a slack-dependent local pass is a likely driver-red —
# oracle-parity rules round in-plan, meaning matched values should be
# bit-identical. Surfaced as a loud WARN per query (a FAIL under
# GRAFT_VERIFY_STRICT=1).
SLACK_HITS = []


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            # the driver's hash is bit-exact: +0.0 vs -0.0 are ==-equal
            # but hash-different (the r18 qml60 escape — this compare
            # certified green while the driver failed). Distinguish zero
            # signs so the local gate is at least as strict there.
            if fa == 0.0 and math.copysign(1.0, fa) != math.copysign(1.0, fb):
                return False
            return True
        # oracle-parity rules round floats before compare; allow only
        # representation-level slack, not value-level tolerance — and
        # RECORD every pair that needs it (see SLACK_HITS)
        if abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb)):
            SLACK_HITS.append((fa, fb))
            return True
        return False
    if isinstance(a, bytes) and isinstance(b, bytes):
        return a == b
    return str(a) == str(b)


def bitexact_key(row, cols):
    """Bit-exact full-row key: floats by their IEEE bytes (so -0.0 != 0.0
    and sub-tolerance differences count), NaN canonicalized, everything
    else by type+string. Used only to ADJUDICATE a slack-dependent pass:
    if the two sides are bit-exact-equal as MULTISETS, the pairwise
    walk's slack hits were mispairings of bit-identical rows (equal
    7-sig-digit sort keys preserve differing insertion orders) and the
    driver's order-insensitive bit-exact hash passes — no warning due.
    Conservative direction only: a cross-typed (int vs float) column
    keeps the warning alive, never silences a genuine slack pass."""
    import struct

    key = []
    for c in cols:
        v = row[c]
        # kind-tagged (ADVICE r19): a bytes cell that happens to equal
        # b"nan" or a float's IEEE bytes must never key like a float
        # cell in a mixed/cross-typed column
        if isinstance(v, float):
            key.append(("f", "nan") if math.isnan(v)
                       else ("f", struct.pack("<d", v)))
        elif isinstance(v, bytes):
            key.append(("b", v))
        else:
            key.append((type(v).__name__, str(v)))
    return tuple(key)


def bitexact_multiset_equal(s_rows, o_rows, cols):
    from collections import Counter

    return Counter(bitexact_key(r, cols) for r in s_rows) == Counter(
        bitexact_key(r, cols) for r in o_rows
    )


def row_key(row, cols, masked=frozenset()):
    # Deterministic full-row sort key, identical for equal values on both
    # sides. Floats are formatted at 7 significant digits so values equal
    # under the compare tolerance almost always share a key; order only
    # needs to be CONSISTENT across the two lists, not numeric. Columns in
    # `masked` contribute no value (used by the tolerant fallback, where
    # float cells are compared with cells_equal instead of by key).
    key = []
    for c in cols:
        v = row[c]
        if c in masked:
            key.append((2, "*"))
        elif v is None:
            key.append((0, ""))
        elif isinstance(v, bool):
            key.append((1, str(v)))
        elif isinstance(v, float):
            key.append((2, "nan" if math.isnan(v) else "%.6e" % v))
        elif isinstance(v, int):
            key.append((2, "%.6e" % float(v)))
        elif isinstance(v, bytes):
            key.append((3, v.hex()))
        else:
            key.append((4, str(v)))
    return tuple(key)


def float_col_names(*tables):
    import pyarrow as pa

    out = set()
    for t in tables:
        for name, typ in zip(t.schema.names, t.schema.types):
            if pa.types.is_floating(typ):
                out.add(name)
    return out


def type_family(typ):
    import pyarrow as pa

    if pa.types.is_decimal(typ):
        return "decimal"
    if pa.types.is_integer(typ):
        return "int"
    if pa.types.is_floating(typ):
        return "float"
    return "other"


def decimal_type_mismatches(spark_tbl, ora):
    """Columns where one side is arrow decimal and the other is not.

    The r16 driver failure class: DuckDB promotes windowed/aggregate
    sum(BIGINT) to HUGEINT, surfacing as decimal128(38,0) against
    Spark's int64. This replica's string-compare sees Decimal('3') ==
    '3' and stays green while the driver's type-aware hash compare
    fails — so type parity must be checked structurally, not by value.
    Returns [(col, spark_family, oracle_family), ...]."""
    s_types = dict(zip(spark_tbl.schema.names, spark_tbl.schema.types))
    o_types = dict(zip(ora.schema.names, ora.schema.types))
    bad = []
    for c in sorted(set(s_types) & set(o_types)):
        sf, of = type_family(s_types[c]), type_family(o_types[c])
        if "decimal" in (sf, of) and sf != of:
            bad.append((c, sf, of))
    return bad


def tolerant_multiset_match(s_rows, o_rows, cols, floaty):
    """Fallback for a sorted-pairwise mismatch: float sort keys bucket at 7
    significant digits, so two values equal under the 1e-9 tolerance can
    straddle a formatting boundary and land at different sorted positions
    — a spurious row-pairing, never a real value difference. Re-match as a
    multiset: bucket both sides on the float-masked key, then greedily pair
    rows inside each bucket with the full cells_equal tolerance. Greedy
    matching can in principle miss a perfect pairing when one row matches
    several near-identical candidates, but that failure mode is a false
    FAIL (same as today), never a false PASS. Returns None when every row
    matched, else (spark_row, oracle_candidate_or_None)."""
    buckets = {}
    for r in o_rows:
        buckets.setdefault(row_key(r, cols, floaty), []).append(r)
    if buckets and max(len(b) for b in buckets.values()) > 20000:
        # all-float schema at huge row counts: the O(bucket²) pairing is
        # not worth it; let the original pairwise verdict stand
        return (s_rows[0], None)
    for sr in s_rows:
        cand = buckets.get(row_key(sr, cols, floaty))
        if not cand:
            return (sr, None)
        hit = next(
            (
                i
                for i, orow in enumerate(cand)
                if all(cells_equal(sr[c], orow[c]) for c in cols)
            ),
            None,
        )
        if hit is None:
            return (sr, cand[0])
        cand.pop(hit)
    return None


def register_views(con, sf_dir):
    """CREATE OR REPLACE VIEW per parquet table under sf_dir. Shared with
    oracle_type_sweep.py — fixture-layout handling lives here only."""
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        t = os.path.splitext(os.path.basename(p))[0]
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            if os.path.isdir(p)
            else f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    attempted = None
    attempted_path = os.path.join(out_dir, "attempted.json")
    if os.path.exists(attempted_path):
        attempted = set(json.load(open(attempted_path)))
    # errors.json loads BEFORE any scope shortcut: a rows-only query that
    # crashed spark-side must FAIL the run even though it has no oracle to
    # compare — the "attempted but errored still FAILs" invariant applies
    # to the whole attempted scope, not only its oracle-backed part.
    errors = {}
    errs_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(errs_path):
        errors = json.load(open(errs_path))
    elif attempted is not None:
        # Verify deletes errors.json up front and writes it LAST
        # (Verify.scala): a manifest without it is an interrupted run.
        # Oracle queries would surface as missing-dump FAILs anyway;
        # rows-only queries leave no dump, so without this check a
        # mid-flight crash on an all-rows-only scope would certify green
        # via the "nothing comparable" shortcut below.
        print("FAIL interrupted Verify run: attempted.json present but "
              "errors.json missing (Verify writes errors.json last) — "
              "re-run Verify")
        sys.exit(1)
    # rows-only queries (registered, attempted, but oracle-less — the ML
    # contract) are a legitimate part of a scope with nothing to compare;
    # track them so an all-rows-only scope reads as "nothing comparable"
    # (explicit exit 0 below), never as the zero-checked FAILURE path.
    rows_only_in_scope = set()
    if only is None:
        # A filtered Verify run (SPARK_GRAFT_ONLY) declares its scope in
        # attempted.json while still dumping the FULL oracle map (for the
        # type sweep). Pick the scope up from the manifest so an
        # unfiltered re-check of a filtered dump dir compares exactly
        # what the run attempted — a query attempted but not dumped
        # (spark-side error) is still inside the scope and still FAILs.
        if attempted is not None:
            scope = attempted & set(oracle)
            rows_only_in_scope = attempted - set(oracle)
            if scope != set(oracle):
                only = scope
                print(f"NOTE scope from attempted.json: "
                      f"{len(only)}/{len(oracle)} oracle queries")
    else:
        unknown = set(only) - set(oracle)
        if attempted is not None:
            # a filter name outside the oracle map but inside the run's
            # attempted manifest is a rows-only query, not a typo — drop
            # it from the compare with a note instead of failing
            rows_only_in_scope = unknown & attempted
            unknown -= attempted
        if unknown:
            print(f"FAIL unknown query names in filter (not in oracle_sql.json): {sorted(unknown)}")
            sys.exit(1)
        if rows_only_in_scope:
            print(f"NOTE dropping {len(rows_only_in_scope)} rows-only "
                  f"(no-oracle) queries from the compare: "
                  f"{sorted(rows_only_in_scope)}")
            only = only - rows_only_in_scope
    # Spark-side errors on queries the compare loop will never see (they
    # are not in the oracle map). With a manifest: the rows-only part of
    # the scope. Without one, an explicit CLI filter IS the declared scope
    # (non-oracle names in it already failed as unknown above), so errors
    # outside it are skipped exactly like out-of-filter oracle errors;
    # only a scope-less no-manifest dir fails on every non-oracle error
    # key — there, ignoring a recorded crash is the unsafe direction.
    if attempted is not None:
        extra_err_scope = rows_only_in_scope
    elif only is not None:
        extra_err_scope = set()
    else:
        extra_err_scope = set(errors) - set(oracle)
    rows_only_errors = sorted(extra_err_scope & set(errors))

    def fail_rows_only_errors():
        for n in rows_only_errors:
            fail(f"{n}: spark-side error (rows-only query): {errors[n]}")
        return bool(rows_only_errors)

    if only is not None and not only and rows_only_in_scope:
        # the scope held ONLY rows-only queries: nothing is comparable by
        # construction — an explicit (warned) success, distinct from the
        # genuine "asked for oracle queries, checked none" failure below.
        # Unless one of them ERRORED spark-side: that is a failed run, not
        # a no-compare success.
        if fail_rows_only_errors():
            print("FAILED: 0 queries value-matched")
            sys.exit(1)
        print(f"WARN nothing comparable in scope: "
              f"{len(rows_only_in_scope)} rows-only queries, 0 oracle-backed "
              f"— no DuckDB compare ran")
        sys.exit(0)
    con = duckdb.connect()
    register_views(con, sf_dir)

    ok = True
    n_checked = 0
    # rows-only queries never enter the compare loop below (they are not
    # in the oracle map), so their spark-side errors surface here
    if fail_rows_only_errors():
        ok = False
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if name in errors:
            ok = fail(f"{name}: spark-side error: {errors[name]}")
            continue
        dump = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not dump:
            ok = fail(f"{name}: no parquet dump found")
            continue
        spark_tbl = pq.read_table(dump)
        ora = con.execute(oracle[name]).fetch_arrow_table()
        s_cols, o_cols = sorted(spark_tbl.column_names), sorted(ora.column_names)
        if s_cols != o_cols:
            ok = fail(f"{name}: schema mismatch spark={s_cols} oracle={o_cols}")
            continue
        type_bad = decimal_type_mismatches(spark_tbl, ora)
        if type_bad:
            ok = fail(
                f"{name}: column TYPE mismatch (decimal vs non-decimal; "
                f"cast the oracle at the boundary): {type_bad}"
            )
            continue
        if spark_tbl.num_rows != ora.num_rows:
            ok = fail(
                f"{name}: row mismatch spark={spark_tbl.num_rows} oracle={ora.num_rows}"
            )
            continue
        # Full-row sort on both sides: queries end with an ORDER BY, but
        # ties on the ORDER BY keys may legitimately order differently in
        # DuckDB vs Spark; the driver's hash compare is order-insensitive.
        SLACK_HITS.clear()
        s_rows = sorted(spark_tbl.select(s_cols).to_pylist(), key=lambda r: row_key(r, s_cols))
        o_rows = sorted(ora.select(o_cols).to_pylist(), key=lambda r: row_key(r, o_cols))
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for c in s_cols:
                if not cells_equal(sr[c], orow[c]):
                    bad = (i, c, sr[c], orow[c])
                    break
            if bad:
                break
        if bad:
            # the pairwise walk depends on both sides sorting equal-valued
            # rows to the same positions; float keys can break that (see
            # tolerant_multiset_match) — re-check order-free before failing
            floaty = frozenset(float_col_names(spark_tbl, ora))
            unmatched = (
                tolerant_multiset_match(s_rows, o_rows, s_cols, floaty)
                if floaty
                else bad
            )
            if unmatched is not None:
                i, c, sv, ov = bad
                ok = fail(
                    f"{name}: value mismatch row {i} col {c}: spark={sv!r} oracle={ov!r}"
                )
                continue
            print(f"NOTE {name}: pairwise order differed on float keys; tolerant multiset match passed")
        if SLACK_HITS and not bitexact_multiset_equal(s_rows, o_rows, s_cols):
            # a value-equal-but-bit-different pair (the class the driver's
            # bit-exact hash fails): passing here is an instrument gap,
            # not a certification — oracle-parity rounding should make
            # matched floats bit-identical. The multiset recheck first
            # clears slack hits that were mere MISPAIRINGS of
            # bit-identical rows (equal float sort keys preserving
            # differing insertion orders — the driver passes those), so
            # the warning means the bit-exact pairing genuinely fails.
            fa, fb = SLACK_HITS[0]
            msg = (f"{name}: {len(SLACK_HITS)} float pair(s) passed ONLY "
                   f"via the 1e-9 slack and the rows are NOT bit-exact as "
                   f"multisets (e.g. spark={fa!r} oracle={fb!r}) — likely "
                   f"driver hash FAIL; round in-plan on both sides")
            if os.environ.get("GRAFT_VERIFY_STRICT") == "1":
                ok = fail(msg)
                continue
            print(f"WARN {msg}")
        n_checked += 1
        print(f"PASS {name}: rows={spark_tbl.num_rows} hash_match=True")

    if only is not None and n_checked != len(only):
        ok = fail(f"filter asked for {len(only)} queries but only {n_checked} were checked")
    if n_checked == 0:
        ok = fail("no queries were checked")
    print(f"{'OK' if ok else 'FAILED'}: {n_checked} queries value-matched")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
