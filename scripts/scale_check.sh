#!/usr/bin/env bash
# Per-round sf0.1 correctness promotion (BASELINE.md "sf0.1 correctness
# promotion"): value-checks the scale-sensitive dedup/window family at
# 10x the driver's oracle scale, catching cap/threshold artifacts the
# sf0.01 gate cannot see (this run caught the rank-1 minhash family in
# round 7). Run from the repo root; exits non-zero on any mismatch.
set -euo pipefail

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT_DIR="${2:-target/verify_sf01_promotion}"
# Third arg "all" = the full-suite certification (every oracle query
# value-checked at SF_DIR — the round-8 one-shot, repeatable on demand);
# default = the per-round scale-sensitive promotion family.
QUERIES="${3:-q31_dedup_jaccard,q32_dedup_minhash,q33_dedup_simhash,q65_asof_join,q71_dedup_clusters,q72_dedup_compact,q87_minhash_production,q99_para_dedup,q100_epoch_shuffle,q101_para_dup_ratio,q103_incremental_dedup}"

# GRAFT_VERIFY_STRICT=1: a float pair that matches only via the 1e-9
# slack (and is not a mispairing of bit-identical rows) FAILS the gate
# — the driver's hash is bit-exact, so a slack-dependent local pass is
# a driver-red in waiting (the r18 qml60 class). The registry measures
# ZERO slack-dependent passes, so this locks that property in.
export GRAFT_VERIFY_STRICT=1

if [ "$QUERIES" = "all" ]; then
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
  python3 scripts/verify_local.py "$SF_DIR" "$OUT_DIR"
else
  SPARK_GRAFT_CPUS=16 SPARK_GRAFT_ONLY="$QUERIES" \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
  python3 scripts/verify_local.py "$SF_DIR" "$OUT_DIR" "$QUERIES"
fi

# Registry-wide oracle output-type sweep (r16 VERDICT item 2): Verify
# dumps the FULL oracle_sql.json regardless of the query filter, so
# even the promotion-family run type-checks every registered oracle.
python3 scripts/oracle_type_sweep.py "$SF_DIR" "$OUT_DIR/oracle_sql.json"
