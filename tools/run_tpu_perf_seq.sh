#!/bin/bash
# Round-3 TPU measurement sequence (run when the chip is free):
#   1. intersect/tree-op profilers (validate the day's kernel+gather work)
#   2. BVH leaf-size sweep (PPG_BVH_LEAF = 4/8/16)
#   3. bench.py snapshot
# Logs to /tmp/tpu_seq_*.log; sequential — the chip is exclusive.
set -u
cd "$(dirname "$0")/.."

echo "=== profile_intersect ($(date +%H:%M:%S))"
timeout 1500 python -u tools/profile_intersect.py 8 2>&1 | grep -v WARNING \
  | tee /tmp/tpu_seq_intersect.log | tail -8

echo "=== profile_tree_ops"
timeout 1500 python -u tools/profile_tree_ops.py 6 2>&1 | grep -v WARNING \
  | tee /tmp/tpu_seq_treeops.log | tail -12

echo "=== profile_pair_phases"
timeout 1500 python -u tools/profile_pair_phases.py 8 2>&1 | grep -v WARNING \
  | tee /tmp/tpu_seq_phases.log | tail -6

for lk in 8 16; do
  echo "=== leaf sweep PPG_BVH_LEAF=$lk"
  PPG_BVH_LEAF=$lk timeout 1500 python -u tools/profile_intersect.py 6 2>&1 \
    | grep -v WARNING | tee /tmp/tpu_seq_leaf$lk.log | tail -8
done

echo "=== bench.py"
timeout 2400 python bench.py 2>&1 | grep -v WARNING | tee /tmp/tpu_seq_bench.log | tail -2
echo "=== done ($(date +%H:%M:%S))"

echo "=== profile_splat"
timeout 1500 python -u tools/profile_splat.py 4 2>&1 | grep -v WARNING \
  | tee /tmp/tpu_seq_splat.log | tail -10
