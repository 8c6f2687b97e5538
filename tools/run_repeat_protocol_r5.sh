#!/bin/bash
# BASELINE config #5 at its SPECIFIED scale (round-4 verdict item 7):
# veach-ajar, iter_spp=1024, iterations through the training schedule
# (the 252-spp budget trains iterations 0..5 — reference main.py:99; the
# reference's 0..9 presumes a larger budget), >=2 sims, BOTH configs.
# 320x180 as in round 4 (resolution justification: the protocol compares
# per-sample variance between configs at equal budget; full-res costs
# ~16x the TPU-hours for the same comparison — RESULTS.md round-4).
set -e
cd "$(dirname "$0")/.."
RES="--resx 320 --resy 180"
ITERS=6
OUT=${1:-debug_r5}

echo "=== training (reference-exact defaults) ==="
PPG_ADAPTIVE_FRACTION=0 timeout 3000 python -m practical_path_guiding_lab_tpu.drivers.train \
  --scene veach-ajar --budget 252 $RES --out $OUT/repeat-default
echo "=== repeat x2 sims @1024 spp (defaults) ==="
PPG_ADAPTIVE_FRACTION=0 timeout 10800 python -m practical_path_guiding_lab_tpu.drivers.repeat \
  --scene veach-ajar --iterations $ITERS --spp 1024 --sims 2 $RES \
  --record-every 64 --dispatch 8 --out $OUT/repeat-default

echo "=== training (tuned: kd C=2500 + adaptive fraction) ==="
PPG_KD_SPLIT_C=2500 timeout 3000 python -m practical_path_guiding_lab_tpu.drivers.train \
  --scene veach-ajar --budget 252 $RES --out $OUT/repeat-tuned
echo "=== repeat x2 sims @1024 spp (tuned) ==="
PPG_KD_SPLIT_C=2500 timeout 10800 python -m practical_path_guiding_lab_tpu.drivers.repeat \
  --scene veach-ajar --iterations $ITERS --spp 1024 --sims 2 $RES \
  --record-every 64 --dispatch 8 --out $OUT/repeat-tuned
echo "=== repeat protocol done ($(date +%H:%M:%S)) ==="
