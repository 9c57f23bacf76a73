"""Session-calibration probe (VERDICT r4 item 6): prints the fixed-probe
wall-clock so every chip-session log opens with a chip-state reading.
Cross-session lever deltas are quoted as calibrated ratios
(rate · calib_ms / CALIB_REF_MS) alongside raw medians.

Run on the TPU chip: python scripts/calib_probe.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zig_raytracing_contest_tpu.utils.calib import (
    CALIB_REF_MS,
    DISPATCH_REF_MS,
    chip_calibration,
    dispatch_latency,
)

ms = chip_calibration()
print(f"calib_ms {ms}  (ref {CALIB_REF_MS}; session factor "
      f"{ms / CALIB_REF_MS:.3f})")
dl = dispatch_latency()
print(f"dispatch_ms {dl}  (ref {DISPATCH_REF_MS}; latency factor "
      f"{dl / DISPATCH_REF_MS:.2f} — throughput vs latency disambiguator, "
      f"utils/calib.py)")
