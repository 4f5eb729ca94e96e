#!/bin/bash
# Round-4/5: DGCNN 40k retrain WITH the fused training edge stage
# (VERDICT r3 item 3 / round-5 queue item 2). Gated on the fused probe
# having measured an epoch premium <= 2.5x vs the PointNet probe pair
# (/root/data/probe_SynthCars40kPN512Probe.log, 23-26 s/epoch) — the
# economics bar under which an 80k DGCNN flagship becomes viable.
# Deadline-aware + time-boxed like r4_flagship.sh; the trainer's own
# per-epoch eval provides the accuracy row, plus one refined row at the
# latest checkpoint.
set -u
cd "$(dirname "$0")/.."
PROBE=/root/data/probe_SynthCars40kDGCNNFusedProbe.log

SEC=$(python - <<'EOF'
import re, sys
try:
    txt = open("/root/data/probe_SynthCars40kDGCNNFusedProbe.log").read()
except FileNotFoundError:
    print(-1); sys.exit()
# steady-state epochs only (epoch 0 includes compile)
ts = re.findall(r"Finished epoch (\d+)\. Time elapsed: (\d+):(\d+):([\d.]+)", txt)
tot = {int(e): int(h) * 3600 + int(m) * 60 + float(s) for e, h, m, s in ts}
durs = [tot[e] - tot[e - 1] for e in sorted(tot) if e - 1 in tot]
print(int(min(durs)) if durs else -1)
EOF
)
# fail CLOSED: any gate-evaluation error (empty/non-numeric SEC) skips
# the expensive retrain instead of enabling it (round-4 advisor finding)
case "$SEC" in
    ''|*[!0-9-]*) echo "[r4_dgcnn_retrain] gate evaluation failed (SEC='$SEC') — skipping"; exit 1 ;;
esac
if [ "$SEC" -lt 0 ]; then
    echo "[r4_dgcnn_retrain] no fused-probe epoch timing — skipping"
    exit 1
fi
echo "[r4_dgcnn_retrain] fused DGCNN probe epoch: ${SEC}s (PN baseline 23-26s)"
if [ "$SEC" -gt 65 ]; then
    echo "[r4_dgcnn_retrain] premium still > 2.5x — retrain uneconomical, skipping"
    # a real decision, not a transient failure: mark done via rc=0
    exit 0
fi

DEADLINE=$(cat /root/data/r4_deadline.txt 2>/dev/null || echo 0)
NOW=$(date +%s)
RESERVE=1500   # refined eval + round-end margin
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 900 ]; then
    echo "[r4_dgcnn_retrain] no time budget ($BUDGET s) — skipping"
    exit 1
fi
echo "[r4_dgcnn_retrain] training for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh \
    configs/SynthCars40kDGCNNFusedR4.json 1800 || rc=$?

RUN=/root/data/runs/SynthCars40kDGCNNFusedR4
E=$(ls "$RUN" 2>/dev/null | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r4_dgcnn_retrain] no checkpoint produced"
    exit 1
fi
echo "== refined eval at epoch $E =="
timeout 3600 python scripts/eval_with_config.py \
    configs/SynthCars40kDGCNNFusedR4.json "$E" "$RUN" \
    --refineICP --method p2plane || true
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r4_dgcnn_retrain] time-boxed out at epoch $E — replay resumes"
    exit 1
fi
exit $rc
