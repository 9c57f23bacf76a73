#!/bin/bash
# Full round-3 measurement battery for one TPU chip session.
#
# The axon tunnel comes and goes; when it is up, one command should
# capture EVERY number the round needs, most-important first, each
# bounded by a timeout so a mid-run tunnel drop still leaves the
# earlier logs intact.  Outputs land in $OUT (default
# /tmp/chip_session_<ts>/), one log per workload, plus a SUMMARY line
# per completed stage.
#
# Run from the repo root:  bash scripts/chip_session.sh [outdir]

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_session_$(date +%s)}
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

# 0. Session calibration probe (VERDICT r4 item 6): a fixed device
#    workload whose wall-clock reads the chip/tunnel state, so this
#    session's numbers can be compared to other sessions as calibrated
#    ratios (utils/calib.py).
stage calib 600 python scripts/calib_probe.py

# 1. Headline official bench (the driver's number).
stage official 1800 python bench.py

# 2. Scaling curve (VERDICT item 2 targets: 100k>=8, 500k>=4, 2M>=1.5,
#    4M>=0.5).  side n => 2*n^2 triangles.
stage sweep_100k 1500 python scripts/large_sweep.py --side=224
stage sweep_500k 1500 python scripts/large_sweep.py --side=500
# (host prepare alone is ~2 min each at this size — measured on this
# image; budget for it plus the TPU warmup compile)
stage sweep_2m   2400 python scripts/large_sweep.py --side=1000
stage sweep_4m   2400 python scripts/large_sweep.py --side=1414

# 2b. Sponza-class interior (VERDICT r4 item 4: the multi-material
#     streaming regime; target >= 4 Mrays/s proposed).
stage sweep_sponza 1800 python scripts/large_sweep.py --sponza

# 3. Official --large bench (the BENCH-protocol 100k number).
stage large 1500 python bench.py --large

# 4. Paged texture A/B (VERDICT item 3 done-criterion: 512x512 floor
#    within 20% of the all-small-texture rate).
stage paged_ab 2400 python scripts/paged_ab.py

# 5. On-chip golden gate (VERDICT item 7).
stage golden 2400 python scripts/golden_tpu.py

# 6. Per-stage device timings — feeds the next optimization round.
stage profile_official 1500 python scripts/profile_stages.py
stage profile_large 1500 python scripts/profile_stages.py --large
# 6b. Frame decompositions for the regimes the r4 verdict flagged blind:
#     Sponza (where does the 1.9x per-ray slowdown go) and 500k streaming.
stage xprof_sponza 1800 python scripts/xprof_summary.py --sponza
stage cull_sponza 1800 python scripts/cull_stats.py --sponza
stage xprof_500k 1800 python scripts/xprof_summary.py --side=500

# 7. Flag A/Bs (gate/defer/shared-origin) — diagnostic, lowest priority.
stage ab_flags 3000 python scripts/ab_flags.py

echo "=== DONE; summary:"
cat "$OUT/SUMMARY"
