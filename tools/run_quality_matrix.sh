#!/bin/bash
# Round-3 quality matrix: full-res veach-ajar, 252-spp budget, one run per
# config (verdict r2 item 4). Sequential — the single TPU chip is
# exclusive. ~15-20 min per guided run at round-3 throughput.
#
# Usage: bash tools/run_quality_matrix.sh [outroot]
set -u
OUT=${1:-debug_r3}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

run () {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout 3600 python -m practical_path_guiding_lab_tpu.drivers.train \
    --scene veach-ajar --budget 252 --resx 1280 --resy 720 \
    --out "$OUT/$name" 2>&1 | tail -4
}

echo "=== PT baseline 252 spp ($(date +%H:%M:%S)) ==="
timeout 3600 python -m practical_path_guiding_lab_tpu.drivers.baseline \
  --scene veach-ajar --spp 252 --resx 1280 --resy 720 \
  --out "$OUT/pt-252" 2>&1 | tail -3

run default
run adaptive0 PPG_ADAPTIVE_FRACTION=0
run dirfilter PPG_SPLAT_FILTER=dir
run kdc4000 PPG_KD_SPLIT_C=4000
run dirfilter-kdc4000 PPG_SPLAT_FILTER=dir PPG_KD_SPLIT_C=4000
echo "=== matrix done ($(date +%H:%M:%S)) ==="
