#!/bin/bash
# Waits for the r4 health training (PID in /tmp/train_r4.pid) to exit, then
# runs the trained-checkpoint eval on the held-out val split. Survives the
# driving session dying: launch with nohup.
set -u
cd /root/repo
PID=$(cat /tmp/train_r4.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training (pid $PID) exited at $(date)" >> /tmp/health_chain.log
CKPT=runs/health_r4/19August2026at14_22_50_vm_muvo-tpu_resnet18_range_view_transformer_with_vo/checkpoints
python tools/health_run_r4.py evaluate runs/health_r4/data \
    --ckpt "$CKPT" --batches 16 --batch-size 2 \
    --out runs/health_r4/eval_trained.json >> /tmp/health_chain.log 2>&1
echo "eval rc=$? at $(date)" >> /tmp/health_chain.log
