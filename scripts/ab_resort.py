"""Same-process A/B of mid-path resorts (wavefront.MID_RESORT_BOUNCES) on
the official bench — the whole-path-kernel workload where the round-4
frame profile charged bounces 1-3 (path_trace_fused, ~13% of rays live
after bounce 0) 2.9× the cost of bounce 0 (100% live): rays dying at
bounce ≥ 1 stay scattered through live blocks, so later sweeps pay for
dead lanes.  Each resort costs one extra 18-operand payload sort per wave
(~2-3 ms at 2^19 rays, scripts/micro_sort.py) and buys dead-lane
compaction + fresh corridor keys for the bounces after it.

Protocol: A/B/.../A — baseline (), each candidate, baseline again —
median-of-3 in-process reps per variant, one process, one chip session.

Round-5 second leg: MID_RESORT_PREFIX — sort only the live-region prefix
of each mid resort (the payload sort's cost is lane-count-proportional
and live-fraction-independent; after the bounce-0 sort only ~13% of
lanes are live on this scene).  Variant tokens are ``bounces@prefix``,
e.g. ``1,2@4`` = resorts after bounces 1 and 2 with 1/4-wave prefix.

Run on the TPU chip: python scripts/ab_resort.py [--variants=1;1@4;1,2@4]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import zig_raytracing_contest_tpu.render.wavefront as wf
from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene


def main():
    def parse(tok):
        # ``bounces[@prefix][n]`` — trailing n = need-set mid key
        # (wavefront.MID_SORT_NEEDSET; see cull_sim.py --simresort).
        ns = tok.endswith("n")
        if ns:
            tok = tok[:-1]
        grp, _, pfx = tok.partition("@")
        return (
            tuple(int(x) for x in grp.split(",") if x),
            int(pfx) if pfx else 1,
            ns,
        )

    variants = [((1,), 1, False), ((1, 2), 1, False), ((2,), 1, False)]
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = [parse(t) for t in a.split("=")[1].split(";")]

    cfg = Config(grid_resolution=(128, 128, 128), num_samples=3,
                 max_bounce=4, wave_size=1 << 19)
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=1920, height=1080)

    def measure():
        render_scene(scene, cam, cfg)  # warm/compile
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, stats = render_scene(scene, cam, cfg)
            rates.append(stats.segments / (time.perf_counter() - t0) / 1e6)
        rates.sort()
        return rates[1], rates[-1]

    base = (wf.MID_RESORT_BOUNCES, wf.MID_RESORT_PREFIX, wf.MID_SORT_NEEDSET)

    def set_cfg(cfg_):
        (wf.MID_RESORT_BOUNCES, wf.MID_RESORT_PREFIX,
         wf.MID_SORT_NEEDSET) = cfg_
        jax.clear_caches()

    def name(cfg_):
        return f"{cfg_[0]}@prefix{cfg_[1]}{'n' if cfg_[2] else ''}"

    # Interleaved protocol: chip sessions drift far more than lever sizes
    # (this morning's session measured the IDENTICAL binary 7.3 then 12.0
    # Mrays/s eight minutes apart while warming) — so instead of
    # A/B/.../A blocks, cycle through all variants per round (baseline
    # first) and report per-round rates; variant/baseline ratios within a
    # round share chip state.  Compiles amortize via the persistent XLA
    # cache after round 1.
    CYCLES = 4
    entries = [base] + [v for v in variants if v != base]
    rates = {name(c): [] for c in entries}
    for cyc in range(CYCLES):
        for cfg_ in entries:
            set_cfg(cfg_)
            render_scene(scene, cam, cfg)  # warm/compile this config
            t0 = time.perf_counter()
            _, stats = render_scene(scene, cam, cfg)
            r = stats.segments / (time.perf_counter() - t0) / 1e6
            rates[name(cfg_)].append(r)
            print(f"cycle {cyc} {name(cfg_)}: {r:.3f} Mrays/s", flush=True)
    base_med = sorted(rates[name(base)])[CYCLES // 2]
    for cfg_ in entries:
        rs = sorted(rates[name(cfg_)])
        med = rs[len(rs) // 2]
        ratios = sorted(
            v / b for v, b in zip(rates[name(cfg_)], rates[name(base)])
        )
        print(f"official mid_resort={name(cfg_)}: median {med:.3f} "
              f"(paired ratio median {ratios[len(ratios) // 2]:.3f}, "
              f"span {ratios[0]:.3f}-{ratios[-1]:.3f}) vs base "
              f"{base_med:.3f} Mrays/s", flush=True)
    set_cfg(base)
    return 0


if __name__ == "__main__":
    sys.exit(main())
