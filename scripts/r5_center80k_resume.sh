#!/bin/bash
# Round-5 post-flagship slot 1: on-chip correctness records.
# (Repurposed: this step originally resumed the 80k center-sup run, but
# the records below gate later queue decisions — smoke6 gates the DGCNN
# probe, the stable_max measurement gates the round-end default flip —
# so they claim the first post-flagship TPU window. The 80k resume moved
# to the tail of r5_dgcnn_probe.sh as the buffer-consuming last item;
# the 40k A/B already answered same-scale center-sup (+11.05 <20cm) and
# the 160k flagship IS the center-sup arm, so the resume is the lowest-
# value TPU spend of the evening.)
set -u
cd "$(dirname "$0")/.."

DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
LEFT=$((DEADLINE - $(date +%s)))
if [ "$DEADLINE" -gt 0 ] && [ "$LEFT" -lt 900 ]; then
    echo "[r5_records] only ${LEFT}s left — skipping"
    exit 1
fi

# 1. Revalidate smoke check 6 (fused edge-train backward) after BOTH
#    round-5 fixes: the integer slot-select (kernel side) and the
#    stable_max reference (the old check compared against XLA's own
#    broken jit max-VJP gradient). The dgcnn_probe gate reads this.
if [ ! -f /root/data/markers/smoke6_r5.done ]; then
    timeout 1800 python scripts/smoke6_recheck.py \
        || echo "[r5_records] smoke6 recheck FAILED (see docs/onchip_smoke.json)"
    git add docs/onchip_smoke.json
    git commit -q -m "Re-record on-chip smoke check 6: integer slot-select + stable_max reference" \
        || true
    touch /root/data/markers/smoke6_r5.done
fi

# 2. Measure the XLA reduce_max VJP cotangent drop on the REAL training
#    gradients, on silicon (CPU evidence: dgcnn jit gradient 58% wrong
#    in L2 vs eager/FD ground truth; pointnet bit-identical). This is
#    the datum for the round-end stable_max_grad default decision.
if [ ! -f /root/data/markers/stable_max_r5.done ]; then
    timeout 1800 python scripts/measure_stable_max_onchip.py \
        || echo "[r5_records] stable_max measurement FAILED"
    git add docs/stable_max_onchip.json 2>/dev/null || true
    git commit -q -m "Record on-chip magnitude of the XLA max-VJP gradient drop" \
        || true
    touch /root/data/markers/stable_max_r5.done
fi
exit 0
