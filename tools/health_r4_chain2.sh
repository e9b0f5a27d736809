#!/bin/bash
# Waits for the r4 health run-2 training (PID in /tmp/train_r4b.pid) to
# exit, then evaluates its final checkpoint on the held-out val split.
set -u
cd /root/repo
PID=$(cat /tmp/train_r4b.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "run2 training (pid $PID) exited at $(date)" >> /tmp/health_chain2.log
CKPT=$(ls -d runs/health_r4/run2/*/checkpoints 2>/dev/null | head -1)
python tools/health_run_r4.py evaluate runs/health_r4/data \
    --ckpt "$CKPT" --batches 16 --batch-size 2 \
    --out runs/health_r4/eval_trained_run2.json >> /tmp/health_chain2.log 2>&1
echo "run2 eval rc=$? at $(date)" >> /tmp/health_chain2.log
