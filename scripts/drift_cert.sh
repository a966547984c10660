#!/usr/bin/env bash
# Cross-generation oracle certification: stage synthetic fixture
# regenerations (the round-14 breakage class) from a real sf dir and
# value-check the affected query families end-to-end against DuckDB.
#   usage: scripts/drift_cert.sh [sfDir]   (default /root/testdata/sf0.001)
# Two stagings:
#   - NANOS: events.ts rewritten to parquet TIMESTAMP(NANOS, UTC)
#     (the pre-r14 driver shape) -> the 13 events-family oracle queries
#     (incl. q106, whose readStream source shares the footer-adaptive
#     normalizeEventsTs path — r20)
#   - DATE:  o_orderdate / l_shipdate rewritten to date32 -> the 4
#     date-consuming oracle queries
# Requires driver-side python (pyarrow + duckdb), like verify_local.py.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
# same hard gate as scale_check.sh: a slack-dependent float pass (values
# equal only via the 1e-9 tolerance, not bit-exact as multisets) FAILS —
# the driver's hash is bit-exact, so a WARN-and-exit-0 here would certify
# a driver-red (review pass 5: the strict lock-in must cover BOTH oracle
# gate scripts, or the registry-wide zero-slack property is only half a
# gate)
export GRAFT_VERIFY_STRICT=1

EVQ="q23_dropna,q27_window_tumbling,q28_window_sliding,q29_user_hourly,q53_session_window,q54_rolling_avg,q60_json_extract,q61_json_roundtrip,q63_partition_pruning,q65_asof_join,q67_band_join,q74_window_analytics,q106_stream_batch_parity"
DTQ="q05_round_cast,q70_range_cluster,q75_scalar_functions,q89_zorder_cluster"

NDIR=$(mktemp -d /tmp/sf_nanos.XXXX); DDIR=$(mktemp -d /tmp/sf_date.XXXX)
trap 'rm -rf "$NDIR" "$DDIR" /tmp/verify_drift_nanos /tmp/verify_drift_date' EXIT

python3 - "$SF" "$NDIR" "$DDIR" <<'EOF'
import pyarrow as pa, pyarrow.parquet as pq, os, sys
src, ndir, ddir = sys.argv[1:4]
def stage(dst, rewrite):
    for f in os.listdir(src):
        if f.endswith('.parquet') and f not in rewrite:
            os.symlink(os.path.join(src, f), os.path.join(dst, f))
stage(ndir, {'events.parquet'})
t = pq.read_table(f'{src}/events.parquet')
i = t.schema.get_field_index('ts')
ns = t.column('ts').cast(pa.timestamp('us', tz='UTC')).cast(pa.timestamp('ns', tz='UTC'))
pq.write_table(t.set_column(i, pa.field('ts', pa.timestamp('ns', tz='UTC')), ns),
               f'{ndir}/events.parquet', version='2.6')
stage(ddir, {'orders.parquet', 'lineitem.parquet'})
for tbl, c in (('orders', 'o_orderdate'), ('lineitem', 'l_shipdate')):
    t = pq.read_table(f'{src}/{tbl}.parquet')
    i = t.schema.get_field_index(c)
    pq.write_table(t.set_column(i, pa.field(c, pa.date32()),
                                t.column(c).cast(pa.date32())),
                   f'{ddir}/{tbl}.parquet')
print('staged', ndir, ddir)
EOF

SPARK_GRAFT_ONLY="$EVQ" sbt -batch "runMain graft.Verify $NDIR /tmp/verify_drift_nanos"
python3 scripts/verify_local.py "$NDIR" /tmp/verify_drift_nanos "$EVQ"
SPARK_GRAFT_ONLY="$DTQ" sbt -batch "runMain graft.Verify $DDIR /tmp/verify_drift_date"
python3 scripts/verify_local.py "$DDIR" /tmp/verify_drift_date "$DTQ"
echo "drift_cert: NANOS and DATE generations oracle-green"
