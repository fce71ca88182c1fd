#!/usr/bin/env bash
# Standing sf1 stress gate (VERDICT r11 item 8): regenerate
# CORRECTNESS_sf1.json each round with the round's catalog.
#
# sf1 is the only gate that exercises the OverflowAuditSpec
# PAIRCNT/GRAIN margins and tie-break totality at 10x the bench SF —
# it caught agg_penny_allocation's non-total tie-break and two
# capacity guards in round 11. Run it near the end of each round,
# after the catalog settles:
#
#   bash tools/sf1_gate.sh
#
# The amplified fixture is cached under /tmp (rebuilt only if absent);
# Verify runs the full catalog at sf1, then check.py writes the
# committed artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR=${SF1_DIR:-/tmp/graft_sf1}
OUT_DIR=${OUT_DIR:-/tmp/verify_sf1}
ARTIFACT=${ARTIFACT:-CORRECTNESS_sf1.json}

if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "[sf1_gate] building amplified fixture at $SF1_DIR (10x sf0.1)"
  python3 tools/amplify.py /root/testdata/sf0.1 "$SF1_DIR" 10
fi

echo "[sf1_gate] running full-catalog Verify at sf1"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $SF1_DIR $OUT_DIR"

echo "[sf1_gate] oracle compare -> $ARTIFACT"
# --no-time-gate: the 10x bit-identical amplification densifies every
# LSH band / block / grid cell 10x, so pair enumerators legitimately
# run ~density-squared here — sf1 gates correctness, sf0.1 gates time.
python3 tools/check.py "$SF1_DIR" "$OUT_DIR" --json "$ARTIFACT" \
  --no-time-gate

# Commit the sf1 per-query wall series next to the sf0.1 one: the
# sf1/sf0.1 timing ratio is the density-stress triage input (see
# PLANS.md round 13 — compare OUTPUT growth before calling a high
# ratio a regression), and keeping it as an artifact saves the
# next round a /tmp archaeology pass.
cp "$OUT_DIR/timings.json" TIMINGS_sf1.json
echo "[sf1_gate] timings -> TIMINGS_sf1.json"

# Replication-path e2e at the same SF (VERDICT r12 item 7): drives
# CdcPipeline ingest -> log-mirror folds -> ChangefeedReplicator polls
# (incremental, re-snapshot, resume) and verifies target == source
# distributedly. Non-zero exit fails the gate; the JSON line is the
# committed artifact.
REPL_ARTIFACT=${REPL_ARTIFACT:-REPLICATION_sf1.json}
echo "[sf1_gate] replication e2e -> $REPL_ARTIFACT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.ReplicationE2E $SF1_DIR" 2>/dev/null \
  | grep '^{"metric":"replication_e2e"' | tail -1 > "$REPL_ARTIFACT"
cat "$REPL_ARTIFACT"
python3 -c "import json,sys; d=json.load(open('$REPL_ARTIFACT')); sys.exit(0 if d.get('ok') else 1)"
