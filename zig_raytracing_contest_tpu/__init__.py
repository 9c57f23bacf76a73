"""zig_raytracing_contest_tpu — a TPU-native path-tracing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
``tigrazone/zig_raytracing_contest`` reference (a Zig CPU path tracer):
glTF 2.0/GLB scene loading, uniform-grid acceleration (SAT binning +
3D-DDA traversal), multi-bounce diffuse path tracing with textures and
stochastic alpha, gamma-2.2 PNG output — re-architected as a batched
wavefront renderer sharded over TPU meshes.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA/Mosaic compilation cache (~/.cache directory).

    Every fresh process otherwise re-pays the full Mosaic compile of the
    whole-path kernels (minutes per config — a 200×200 CLI render spends
    ~3 min of its 'Rendered' phase compiling tail-wave shapes).  The cache
    is keyed on HLO + compile options + backend, so it never changes
    numerics — warm processes just skip straight to execution.  Opt out
    with ZIG_RAYTRACING_TPU_NO_CACHE=1 (e.g. to time cold compiles)."""
    import os

    if os.environ.get("ZIG_RAYTRACING_TPU_NO_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "zig_raytracing_tpu_xla"
            ),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort only
        pass


_enable_compilation_cache()
