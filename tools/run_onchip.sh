#!/usr/bin/env bash
# Run every pending on-chip measurement in priority order, one process at a
# time (the axon tunnel admits ONE user; a second blocks forever).  Each tool
# is bounded so a tunnel stall can't eat the whole window.  Results land in
# results/onchip_$(date +%Y%m%d_%H%M%S)/.
#
# PRE-REQ: no other python process may be using the TPU (pgrep python).
set -u
cd "$(dirname "$0")/.."
out="results/onchip_$(date +%Y%m%d_%H%M%S)"
mkdir -p "$out"
echo "writing to $out"

run() {  # run <budget_s> <name> <cmd...>
  local budget=$1 name=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S), budget ${budget}s) ==="
  timeout "$budget" "$@" 2>&1 | tee "$out/$name.log"
  rc=${PIPESTATUS[0]}      # the tool's status, not tee's (124 = timeout)
  echo "--- $name exit=$rc ---"
}

# 1. headline: sweeps chunk 4 / 8:4 / 8:2 candidates itself (first on-chip
# run cold-compiles the 3 candidate programs; allow a bigger window here so
# the driver's later bench run hits a warm cache)
run 4500 bench env FUSIONOCC_BENCH_BUDGET_S=3000 python bench.py
# 2. int8 image-backbone serving A/B (batched-frames two-pass)
run 1800 ab_int8 python tools/ab_int8.py --iters 4
# 3. lidar-branch bisection incl. block-vs-row gather A/B
run 1200 profile_lidar python tools/profile_lidar.py
# 4. camera-branch per-stage/per-op bisection (locate the low-MFU ops)
run 2400 profile_camera python tools/profile_camera.py
# 5. streaming chunk sweep (finer grid than bench's 3 candidates)
run 2400 profile_streaming python tools/profile_streaming.py 8 1,2,4,8
# 6. two-pass eval fps vs batch size (reference eval semantics)
run 1800 ab_twopass_batch python tools/ab_twopass_batch.py --batches 1,2,4
# 7. full-size train step s/iter (compile ~4.5 min)
run 2400 profile_train python tools/profile_train.py --steps 4 --bursts 2
echo "all done -> $out"
