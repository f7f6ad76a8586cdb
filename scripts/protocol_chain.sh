#!/bin/bash
# Chained protocol runs (VERDICT round-2 items #2 and #3), tunnel-outage-safe.
#
#   scripts/protocol_chain.sh <sweep_deadline_epoch> <schedule_deadline_epoch>
#
# 1. 384^2 x 25-frame quality-at-capacity sweep: fused flagship vs the
#    reference-capacity gather control, 5k steps, multi-segment.
# 2. 748^2 x 50-frame reference-schedule run (50k steps, validate/2500).
#
# Both go through run_supervisor.supervise: they wait for the tunnel, restart
# wedged children (checkpoint resume), and stop at their deadline with a
# partial-but-resumable result. Scenes are cached by (size, frames) stamps.
# Leave enough time after the schedule deadline for end-of-round bench.
set -u
cd "$(dirname "$0")/.."
SWEEP_DEADLINE=${1:?usage: protocol_chain.sh <sweep_deadline_epoch> <schedule_deadline_epoch>}
SCHED_DEADLINE=${2:?}
echo "# chain start $(date)"
python scripts/quality_at_capacity.py \
  --size 384 --frames 25 --steps 5000 --chunk 10 \
  --root /tmp/quality_sweep_384 \
  --out /tmp/quality_sweep_384/results.json \
  --only fused-flagship gather-ref-capacity \
  --deadline-epoch "$SWEEP_DEADLINE"
echo "# sweep done $(date); launching full-schedule run"
python scripts/full_schedule_run.py --deadline-epoch "$SCHED_DEADLINE"
echo "# chain done $(date)"
