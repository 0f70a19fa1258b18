#!/usr/bin/env bash
# Round-4 evidence orchestrator (resumable, safe to re-run):
#   stage 1: two-extractor checkpoint trend (TPU, quality-only — OK to
#            overlap with the CPU-side two-framework FVD run)
#   stage 2: wait for the two-framework FVD artifact (launched separately;
#            bounded wait in case that run died)
#   stage 3: timing-sensitive TPU stages on an idle host — serving matrix,
#            sparse e2e timing window, composite e2e timing window,
#            ledger ingest + README/ROADMAP regen
set -u
cd "$(dirname "$0")/.."

echo "[orch] stage 1: trend"
bash scripts/collect_round4_trend.sh

echo "[orch] stage 2: wait for two-framework FVD"
FVD_PID=$(cat /tmp/two_fw.pid 2>/dev/null || echo "")
for i in $(seq 1 120); do
  [ -f artifacts/round4/two_framework_fvd.json ] && break
  [ -n "$FVD_PID" ] && ! kill -0 "$FVD_PID" 2>/dev/null && break
  sleep 60
done

echo "[orch] stage 3: timing-sensitive runs"
bash scripts/collect_round4b.sh
bash scripts/collect_round4c.sh
echo "[orch] done"
