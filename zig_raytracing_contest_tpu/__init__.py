"""zig_raytracing_contest_tpu — a TPU-native path-tracing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
``tigrazone/zig_raytracing_contest`` reference (a Zig CPU path tracer):
glTF 2.0/GLB scene loading, uniform-grid acceleration (SAT binning +
3D-DDA traversal), multi-bounce diffuse path tracing with textures and
stochastic alpha, gamma-2.2 PNG output — re-architected as a batched
wavefront renderer sharded over TPU meshes.
"""

__version__ = "0.1.0"
