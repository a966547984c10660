#!/usr/bin/env python3
"""Registry-wide oracle output-TYPE sweep (r16 VERDICT item 2).

Usage:
    python3 scripts/oracle_type_sweep.py <sfDir> <oracleSqlJson>

Runs every oracle SQL through DuckDB schema-only (wrapped LIMIT 0 —
no data scanned) and fails if any output column is an arrow decimal
type. The registry convention is that every oracle casts integer
aggregates to BIGINT and numeric literals/ratios to DOUBLE at the
output boundary; DuckDB otherwise promotes sum(BIGINT) to HUGEINT
(→ decimal128(38,0)) and bare numeric literals to decimal(p,s), both
of which hash-mismatch Spark's int64/double under the driver's
type-aware compare even when every value is identical (the r16
q91/q93 failure class).

Local validation tool only — python/duckdb are driver-side deps; the
shipped Scala library never imports any of this.
"""
import importlib.util
import json
import os
import sys

import duckdb
import pyarrow as pa

# View registration is shared with verify_local.py (single home for
# fixture-layout handling — dir-vs-file parquet, table naming).
_spec = importlib.util.spec_from_file_location(
    "vl", os.path.join(os.path.dirname(__file__), "verify_local.py")
)
_vl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_vl)
register_views = _vl.register_views


def sweep(con, oracle):
    """Returns [(query, column, arrow_type), ...] for every decimal-typed
    oracle output column. Schema-only: each oracle runs under LIMIT 0."""
    bad = []
    for name in sorted(oracle):
        sql = oracle[name].rstrip().rstrip(";")
        schema = con.execute(
            f"SELECT * FROM (\n{sql}\n) _type_sweep LIMIT 0"
        ).fetch_arrow_table().schema
        for field in schema:
            if pa.types.is_decimal(field.type):
                bad.append((name, field.name, str(field.type)))
    return bad


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    # Coverage guard: this sweep is the registry-wide backstop in
    # scale_check.sh — an empty map (wrong path, stale file, a Verify
    # regression re-introducing filtering) must not certify as OK.
    if not oracle:
        print(f"FAILED: oracle map at {oracle_path} is empty — "
              f"nothing was type-checked")
        sys.exit(1)
    con = duckdb.connect()
    register_views(con, sf_dir)
    bad = sweep(con, oracle)
    if bad:
        for name, col, typ in bad:
            print(f"FAIL {name}: oracle column '{col}' is {typ} — "
                  f"CAST it to BIGINT/DOUBLE at the output boundary")
        print(f"FAILED: {len(bad)} decimal oracle column(s) in "
              f"{len(oracle)} queries")
        sys.exit(1)
    print(f"OK: {len(oracle)} oracle queries, zero decimal output columns")


if __name__ == "__main__":
    main()
