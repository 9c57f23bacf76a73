"""End-to-end render pipeline: scene file → PNG, with phase timing.

The orchestration mirror of the reference's main() (src/main.zig:73-143):
load → preprocess → compile → render → save, each phase timed and logged.
"compile" here covers both the grid build (the reference's meaning) and the
XLA jit of the first wave (the TPU-native addition).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..grid.builder import build_grid
from ..ops import linalg
from ..scene.camera import Camera, load_camera
from ..scene.geometry import load_geometry
from ..scene.gltf import load_gltf
from ..scene.materials import load_materials
from ..scene.types import DeviceScene, build_device_scene
from ..utils.image_io import write_png
from ..utils.timing import PhaseTimers
from .wavefront import (
    render_frame_chunk_emit,
    render_wave_accumulate_rows,
    whole_path_regime,
)

# Waves per device call when the frame renders as fori_loop chunks: bounds a
# single call's device time (long-running calls can crash the TPU worker)
# while amortizing dispatch overhead across the chunk.
WAVES_PER_CALL = 64


def _chunk_plan(num_waves: int, cap: int = WAVES_PER_CALL) -> list[int]:
    """Descending power-of-two chunk sizes: early chunks are big so their
    u8 transfers ride under later chunks' compute, and the LAST chunk is
    one wave so the only exposed device→host bytes are ~1/num_waves of
    the image (measured: [4,4,2,1,1] and [2]*6 tie at 537 ms vs 641 ms
    for one 12-wave call on the official bench).  Power-of-two sizes keep
    the number of DISTINCT sizes — and therefore of XLA chunk-program
    compiles at warmup — logarithmic."""
    plan = []
    rem = num_waves
    while rem > 0:
        c = min(cap, 1 << max(0, rem.bit_length() - 2))
        plan.append(c)
        rem -= c
    return plan

log = logging.getLogger("zig_raytracing_contest_tpu")


def _camera_device(camera: Camera):
    """Device copies of the four camera vectors, cached on the Camera.

    Measured on the axon-tunneled v5e: each eager host→device transfer is
    a blocking RPC (~10-30 ms), so four per render_scene call cost more
    than the entire shading pipeline.  The cache keys on the VALUES (the
    Camera dataclass is mutable — re-aiming it must re-upload)."""
    key = (
        tuple(map(float, camera.origin)),
        tuple(map(float, camera.lower_left_corner)),
        tuple(map(float, camera.right)),
        tuple(map(float, camera.up)),
    )
    cached = getattr(camera, "_device_vecs", None)
    if cached is None or cached[0] != key:
        dev = (
            jnp.asarray(camera.origin),
            jnp.asarray(camera.lower_left_corner),
            jnp.asarray(camera.right),
            jnp.asarray(camera.up),
        )
        camera._device_vecs = (key, dev)
        return dev
    return cached[1]


@partial(jax.jit, static_argnames=("cols",))
def _zeros_fb(cols: int):
    # jnp.zeros eagerly ships a host zero buffer over the tunnel (~30 ms
    # for a 1080p padded framebuffer); a jitted constant materializes it
    # on-device.  Field-major (3, S): accumulation is a row-wise
    # dynamic_update_slice, no AoS transposes anywhere in the frame loop.
    return jnp.zeros((3, cols), jnp.float32)


# slot_of_pixel permutations for the tiled pixel order, cached per (w, h).
_SLOT_PERM_CACHE: dict = {}


def slot_geometry(width: int, height: int, whole_path: bool):
    """(num_slots, tiles_x) of the frame's pixel-slot space.

    Whole-path frames use 32×32-pixel TILED slot order (fused.GenParams):
    each 1024-slot tile is a compact pixel square, so trace lane blocks are
    narrow square beams instead of scan-line strips (tighter per-block
    culls) and sky regions compact into whole dead blocks.  Other regimes
    keep raster order (slot == pixel id)."""
    if not whole_path:
        return width * height, 0
    tiles_x = -(-width // 32)
    tiles_y = -(-height // 32)
    return tiles_x * tiles_y * 1024, tiles_x


def _slot_of_pixel(width: int, height: int, tiles_x: int):
    """(num_pixels,) int32 device array: raster pixel id → tiled slot id."""
    key = (width, height, tiles_x)
    perm = _SLOT_PERM_CACHE.get(key)
    if perm is None:
        p = np.arange(width * height, dtype=np.int64)
        x = p % width
        y = p // width
        tile = (y // 32) * tiles_x + (x // 32)
        perm = jnp.asarray(
            tile * 1024 + (y % 32) * 32 + (x % 32), jnp.int32
        )
        _SLOT_PERM_CACHE[key] = perm
    return perm


def _pixel_of_slot(width: int, height: int, tiles_x: int, fb_cols: int):
    """(fb_cols,) int32 HOST array: slot id → raster pixel id, -1 for
    padding slots (tile overhang / wave tail).  The streaming assembly's
    scatter map — tiled order inverts _slot_of_pixel; raster order is the
    identity over the real pixels."""
    key = (width, height, tiles_x, fb_cols)
    inv = _SLOT_PERM_CACHE.get(key)
    if inv is None:
        num_pixels = width * height
        inv = np.full(fb_cols, -1, np.int64)
        if tiles_x:
            perm = np.asarray(_slot_of_pixel(width, height, tiles_x))
            inv[perm] = np.arange(num_pixels, dtype=np.int64)
        else:
            inv[:num_pixels] = np.arange(num_pixels, dtype=np.int64)
        _SLOT_PERM_CACHE[key] = inv
    return inv


@partial(jax.jit, static_argnames=("num_pixels", "spp"))
def _finalize_image_rows(fb, num_pixels: int, spp: int, slot_perm=None):
    """One device call for the frame epilogue: map slots back to raster
    pixels (tiled order only), average samples, gamma-encode.

    Returns the image FLAT (num_pixels*3,): a (N, 3) uint8 tensor lives in
    lane-padded TPU tiles, so fetching it relayouts ~42× the payload over
    the tunnel; the 1-D form transfers dense (measured ~100 ms → ~20 ms
    for a 1080p frame)."""
    if slot_perm is not None:
        fb = jnp.take(fb, slot_perm, axis=1)  # (3, num_pixels) raster order
    else:
        fb = fb[:, :num_pixels]
    return linalg.vec3_to_rgb(fb.T / spp).reshape(-1)


@dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    max_bounce: int
    segments: int  # traced path segments (= rays for Mrays/s)
    phases: dict


def prepare_scene(in_path: str, config: Config, camera_name=None, width=None, height=None):
    """Host pipeline: parse, extract, build grid, upload. Returns
    (DeviceScene, Camera, timers)."""
    timers = PhaseTimers()

    with timers.phase("load", "Loaded"):
        gltf = load_gltf(in_path, num_threads=config.host_threads)

    with timers.phase("preprocess", "Preprocessed"):
        camera = load_camera(gltf, camera_name, width, height)
        log.info("Pixels count: %d", camera.width * camera.height)
        materials = load_materials(gltf)
        log.info("Materials count: %d", materials.num_materials)
        geometry = load_geometry(gltf)
        if config.debug_checks and geometry.num_triangles:
            for name in ("positions", "normals", "texcoords"):
                arr = getattr(geometry, name)
                bad = int(np.sum(~np.isfinite(arr)))
                if bad:
                    raise FloatingPointError(
                        f"debug_checks: {bad} non-finite {name} values in "
                        f"loaded geometry"
                    )

    with timers.phase("compile", "Compiled"):
        try:
            from ..grid.native import build_grid_native

            grid = build_grid_native(
                geometry.positions, config.grid_resolution, log_fn=log.info
            )
        except Exception as exc:  # no C++ toolchain → NumPy reference builder
            log.warning("native grid builder unavailable (%s); using NumPy", exc)
            grid = build_grid(geometry.positions, config.grid_resolution, log=log.info)
        scene = build_device_scene(geometry, grid, materials, backend=config.backend)
        if scene.mxu is not None:
            log.info("Intersection backend: MXU brute force")

    return scene, camera, timers


def render_scene(
    scene: DeviceScene,
    camera: Camera,
    config: Config,
    timers: PhaseTimers | None = None,
    progressive_path: str | None = None,
    use_fused: bool | None = None,
) -> tuple[np.ndarray, RenderStats]:
    """Render to an (h, w, 3) uint8 array, looping jitted waves on device."""
    timers = timers or PhaseTimers()
    w, h, spp = camera.width, camera.height, config.num_samples
    num_pixels = w * h
    total_rays = num_pixels * spp
    if total_rays >= 1 << 31:
        # Global ray ids are int32 (pixel bases are exact int32; only the
        # per-wave offsets use f32 math).  u16×u16 dims × sane spp fit:
        # even 65535×65535 needs spp=1; 8K×8K at spp≤500 is fine.
        raise ValueError(
            f"{num_pixels} pixels × {spp} spp = {total_rays} rays exceeds "
            f"the int32 ray-id space (2^31); reduce resolution or spp."
        )
    ext = config.ext_flags
    if not ext.any:
        ext = None
    whole = whole_path_regime(scene, use_fused, ext)
    num_slots, tiles_x = slot_geometry(w, h, whole)
    total_rays = num_slots * spp
    if total_rays >= 1 << 31:  # tiled slot padding can nudge past the check
        raise ValueError(
            f"{num_slots} slots × {spp} spp = {total_rays} rays exceeds "
            f"the int32 ray-id space (2^31); reduce resolution or spp."
        )
    # Waves are quantized to spp*1024 rays: multiples of spp so every wave
    # covers whole pixel slots (scatter-free accumulation) and of 1024 for
    # the Pallas lane blocks AND the 32×32 pixel tiles of the tiled order.
    quantum = spp * 1024
    wave_size = max(
        quantum, min(config.wave_size, total_rays + quantum - 1) // quantum * quantum
    )
    # Wave-local ray ids use exact-f32 divmod: cap at 2^23 (a user-set
    # wave_size past that would silently corrupt pixel indices).
    wave_size = min(wave_size, (1 << 23) // quantum * quantum)
    num_waves = -(-total_rays // wave_size)
    wave_pixels = wave_size // spp
    fb_cols = num_waves * wave_pixels  # padded framebuffer (slot-major)
    log.info(
        "Num samples: %d, max bounce %d", config.num_samples, config.max_bounce
    )

    cam_origin, cam_llc, cam_right, cam_up = _camera_device(camera)
    base_key = jnp.uint32(config.seed)

    fb = _zeros_fb(fb_cols)
    seg_parts = []  # device scalars; converting per-wave would force a sync
    slot_perm = _slot_of_pixel(w, h, tiles_x) if tiles_x else None

    progressive = progressive_path and config.progressive_every

    with timers.phase("render", "Rendered"):
        pieces = None
        if not progressive:
            # Whole-frame path: fori_loop chunks, one device call per chunk
            # (the per-wave Python dispatch gap was ~29 ms/wave on v5e).
            # Each chunk ALSO emits its finished slots as u8 and starts the
            # device→host copy immediately: transfers overlap later chunks'
            # compute instead of serializing after the last wave (the
            # tunnel's 26 ms + 66 MB/s tax; see render_frame_chunk_emit).
            segs = jnp.int32(0)
            pieces = []
            start = 0
            for chunk in _chunk_plan(num_waves):
                fb, enc, segs = render_frame_chunk_emit(
                    scene,
                    fb,
                    cam_origin,
                    cam_llc,
                    cam_right,
                    cam_up,
                    base_key,
                    segs,
                    w,
                    h,
                    spp,
                    config.max_bounce,
                    wave_size,
                    num_slots,
                    chunk,
                    jnp.int32(start),
                    tiles_x,
                    use_fused,
                    ext,
                )
                try:
                    enc.copy_to_host_async()
                except Exception:
                    pass  # non-jax.Array backends (interpret/debug)
                pieces.append((start * wave_pixels, enc))
                start += chunk
        for wave in range(num_waves if progressive else 0):
            fb, wave_segments = render_wave_accumulate_rows(
                scene,
                fb,
                cam_origin,
                cam_llc,
                cam_right,
                cam_up,
                base_key,
                jnp.int32(wave),
                w,
                h,
                spp,
                config.max_bounce,
                wave_size,
                num_slots,
                tiles_x,
                use_fused,
                ext,
            )
            seg_parts.append(wave_segments)
            if (
                progressive_path
                and config.progressive_every
                and (wave + 1) % config.progressive_every == 0
                and wave + 1 < num_waves
            ):
                # Progressive dump: pixels not yet reached stay dark (tiled
                # order makes this blocky rather than scanline — same
                # contract: a valid partial image).
                partial_px = np.asarray(
                    _finalize_image_rows(fb, num_pixels, spp, slot_perm)
                )
                write_png(progressive_path, partial_px.reshape(h, w, 3))
        if config.debug_checks:
            # Debug mode (SURVEY §5; reference Debug/ReleaseSafe analogue,
            # build.zig:16): a NaN/Inf in accumulated radiance would clamp
            # silently at gamma encode — surface it as a typed failure with
            # the offending sample count instead.
            bad = int(jnp.sum(~jnp.isfinite(fb)))
            if bad:
                raise FloatingPointError(
                    f"debug_checks: {bad} non-finite framebuffer channel "
                    f"values before PNG encode"
                )
        if pieces is not None:
            # Streaming assembly: fetch each chunk's u8 slice (blocks until
            # that chunk's async copy lands) and scatter it into the raster
            # image while LATER chunks are still computing on device.  The
            # last 4 bytes of the final piece carry the running segment
            # total — no separate scalar round trip.
            pix_of_slot = _pixel_of_slot(w, h, tiles_x, fb_cols)
            img = np.empty((num_pixels, 3), np.uint8)
            segments = 0
            for slot0, enc in pieces:
                buf = np.asarray(enc)
                segments = int(np.frombuffer(buf[-4:].tobytes(), np.int32)[0])
                data = buf[:-4].reshape(-1, 3)
                dest = pix_of_slot[slot0 : slot0 + data.shape[0]]
                valid = dest >= 0
                img[dest[valid]] = data[valid]
            img = img.reshape(h, w, 3)
        else:
            img = np.asarray(
                _finalize_image_rows(fb, num_pixels, spp, slot_perm)
            ).reshape(h, w, 3)
            segments = int(
                np.sum([int(sp) for sp in seg_parts], dtype=np.int64)
            )

    stats = RenderStats(
        width=w,
        height=h,
        spp=spp,
        max_bounce=config.max_bounce,
        segments=segments,
        phases=timers.phases,
    )
    return img, stats


def render_file(
    in_path: str,
    out_path: str,
    config: Config,
    camera_name=None,
    width=None,
    height=None,
) -> RenderStats:
    """Full reference-equivalent run: scene file in, PNG out."""
    scene, camera, timers = prepare_scene(in_path, config, camera_name, width, height)
    progressive = out_path if config.progressive_every else None
    img, stats = render_scene(scene, camera, config, timers, progressive)
    with timers.phase("save", "Saved"):
        write_png(out_path, img)
    timers.done()
    stats.phases = timers.phases
    return stats
