#!/bin/bash
# Per-component step-time attribution at the real workload shape.
# Runs bench.py as a 16f/10-step single-window probe with INSV2V_ABLATE
# variants; wall-clock deltas attribute step time (per-op timing through
# the axon relay is unreliable — CLAUDE.md).
# Usage: tools/probe_ablate.sh <ablate-spec|none> [extra env...]
set -u
cd "$(dirname "$0")/.."
spec="$1"; shift || true
env_extra=("$@")
ablate=""
[ "$spec" != "none" ] && ablate="$spec"
echo "=== ablate=$spec ${env_extra[*]:-} ==="
env INSV2V_ABLATE="$ablate" BENCH_FRAMES=16 BENCH_STEPS=10 BENCH_REPS=2 \
  BENCH_E2E="${BENCH_E2E:-0}" BENCH_B="${BENCH_B:-0}" \
  BENCH_MFU="${BENCH_MFU:-0}" ${env_extra[@]+"${env_extra[@]}"} python bench.py 2>&1 | \
  grep -E "edit times|denoise-chain|step flops|mfu|metric" | sed "s/^/[$spec] /"
