#!/bin/bash
# Round-5 measurement battery (VERDICT r4 items 2/4/5): one same-session
# table at the SHIPPED defaults, most-important-first, each stage
# timeout-bounded so a tunnel drop keeps earlier logs.  Differences from
# chip_session.sh: drops the paged A/B + flag A/Bs (settled in r3/r4),
# adds the 100k cull_sim dump (item 3's sim input) and moves the Sponza /
# 500k decompositions (items 4/5) ahead of the smoke rows.
#
# Run from the repo root:  bash scripts/chip_session_r5.sh [outdir]

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_r5_$(date +%s)}
mkdir -p "$OUT"
echo "logs -> $OUT"

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" | tee -a "$OUT/SUMMARY"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ${SECONDS}s (+$((SECONDS - t0))s)" | tee -a "$OUT/SUMMARY"
  tail -5 "$OUT/$name.log" | sed 's/^/    /' | tee -a "$OUT/SUMMARY"
  return $rc
}

# 0. Session state: throughput probe + dispatch-latency probe.
stage calib 600 python scripts/calib_probe.py

# 1. Headline official bench (the driver's number) — includes calib in
#    its JSON line.
stage official 1800 python bench.py

# 2. Scaling battery at HEAD (VERDICT item 2; targets 100k>=8, 500k>=4,
#    2M>=1.5) + Sponza (item 4, proposed target >=4).
stage sweep_100k 1500 python scripts/large_sweep.py --side=224
stage sweep_500k 1500 python scripts/large_sweep.py --side=500
stage sweep_sponza 1800 python scripts/large_sweep.py --sponza
stage large 1500 python bench.py --large

# 3. Frame decompositions (items 4/5: name the Sponza and 500k top costs).
stage xprof_official 1500 python scripts/xprof_summary.py
stage xprof_sponza 1800 python scripts/xprof_summary.py --sponza
stage xprof_500k 1800 python scripts/xprof_summary.py --side=500
stage cull_sponza 1800 python scripts/cull_stats.py --sponza

# 4. Item-3 sim input: real per-bounce waves on the 100k scene.
stage dump_100k 1800 python scripts/cull_sim.py --dump "$OUT/waves100k.npz" --side=224 --R=0x40000

# 5. Streaming smoke rows + on-chip golden gate.
stage sweep_2m 2400 python scripts/large_sweep.py --side=1000
stage golden 2400 python scripts/golden_tpu.py
stage sweep_4m 2400 python scripts/large_sweep.py --side=1414

echo "=== DONE; summary:"
cat "$OUT/SUMMARY"
