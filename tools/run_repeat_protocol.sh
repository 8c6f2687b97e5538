#!/bin/bash
# BASELINE config #5: veach-ajar repeated high-spp measurement over saved
# SD-trees (reference repeat_high_spp_renderer.py:267-283), 2 simulations
# averaged, for BOTH the reference-exact defaults (constant 0.5 fraction,
# c=12000) and the tuned config (PPG_KD_SPLIT_C=2500 + adaptive fraction).
# Run at 320x180 (the protocol is resolution-configurable; full-res costs
# ~16x the TPU-hours for the same comparison). Produces:
#   debug_r4/repeat-default/veach-ajar/performance/repeat_*_avg-2-sim.csv
#   debug_r4/repeat-tuned/veach-ajar/performance/repeat_*_avg-2-sim.csv
#   debug_r4/pt-base/veach-ajar/performance/pt_nee_*.csv  (unguided curve)
set -e
cd "$(dirname "$0")/.."
RES="--resx 320 --resy 180"
ITERS=6   # the 252-spp budget trains iterations 0..5 (reference main.py:99)

echo "=== training (reference-exact defaults) ==="
PPG_ADAPTIVE_FRACTION=0 timeout 3000 python -m practical_path_guiding_lab_tpu.drivers.train \
  --scene veach-ajar --budget 252 $RES --out debug_r4/repeat-default
echo "=== repeat x2 sims (defaults) ==="
PPG_ADAPTIVE_FRACTION=0 timeout 5400 python -m practical_path_guiding_lab_tpu.drivers.repeat \
  --scene veach-ajar --iterations $ITERS --spp 512 --sims 2 $RES \
  --record-every 32 --out debug_r4/repeat-default

echo "=== training (tuned: kd C=2500 + adaptive fraction) ==="
PPG_KD_SPLIT_C=2500 timeout 3000 python -m practical_path_guiding_lab_tpu.drivers.train \
  --scene veach-ajar --budget 252 $RES --out debug_r4/repeat-tuned
echo "=== repeat x2 sims (tuned) ==="
PPG_KD_SPLIT_C=2500 timeout 5400 python -m practical_path_guiding_lab_tpu.drivers.repeat \
  --scene veach-ajar --iterations $ITERS --spp 512 --sims 2 $RES \
  --record-every 32 --out debug_r4/repeat-tuned

echo "=== unguided PT baseline curve ==="
timeout 3000 python -m practical_path_guiding_lab_tpu.drivers.baseline \
  --scene veach-ajar --spp 512 $RES --out debug_r4/pt-base
echo "ALL DONE"
