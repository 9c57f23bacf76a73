"""Capture a jax.profiler trace of one warm bench frame and summarize
device-op durations by kernel/fusion name.
Run: python scripts/xprof_summary.py [--large | --sponza | --side=N]
"""

import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from bench import build_bench_scene, build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene


def main():
    large = "--large" in sys.argv
    sponza = "--sponza" in sys.argv
    side = None
    for a in sys.argv[1:]:
        if a.startswith("--side="):
            side = int(a.split("=")[1])  # streaming-regime terrain (e.g. 500)
            large = True
    if sponza:
        # The measured Sponza row's protocol (docs/ROUND4.md item 5 /
        # large_sweep.py --sponza): 720p, 2 spp, 3 bounces, wave 2^18.
        cfg = Config(grid_resolution=(128, 128, 128), num_samples=2,
                     max_bounce=3, wave_size=1 << 18)
        with tempfile.TemporaryDirectory() as d:
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from sponza_builder import write_sponza_glb

            p = write_sponza_glb(Path(d) / "s.glb", detail=1.25)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1", height=720)
    else:
        cfg = Config(
            grid_resolution=(128, 128, 128),
            num_samples=2 if large else 3,
            max_bounce=3 if large else 4,
            # match bench.py (100k) / large_sweep.py (side>224 streaming)
            wave_size=(1 << 18 if side else 1 << 21) if large else 1 << 19,
        )
        with tempfile.TemporaryDirectory() as d:
            p = (
                build_large_scene(Path(d) / "s.gltf", side=side or 224)
                if large
                else build_bench_scene(Path(d) / "s.gltf")
            )
            scene, cam, _ = prepare_scene(
                str(p), cfg, camera_name="Camera 1",
                width=1280 if large else 1920, height=720 if large else 1080,
            )
    render_scene(scene, cam, cfg)  # warm/compile

    logdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(logdir):
        render_scene(scene, cam, cfg)

    traces = list(Path(logdir).rglob("*.trace.json.gz"))
    if not traces:
        print("no trace captured", Path(logdir))
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # Keep only TPU device lanes (drop host threads/python).
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "XLA" in n
    }

    totals = defaultdict(float)
    counts = defaultdict(int)
    total_dev = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        # collapse fusion ids: "fusion.123" -> "fusion", keep kernel names
        base = name.split(".")[0]
        totals[base] += dur
        counts[base] += 1
        total_dev += dur
    print(f"device pids: {sorted(device_pids)} total {total_dev:.1f} ms")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} ms  x{counts[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
