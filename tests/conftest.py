"""Test harness config: force the JAX CPU backend with 8 virtual devices.

The session environment pins JAX_PLATFORMS to the real TPU platform and a
sitecustomize pre-imports jax at interpreter start, so env vars alone are
too late — jax has already snapshotted them.  jax.config.update still works
as long as no backend has been initialized, which holds at conftest time.

The 8-device CPU mesh doubles as the multi-chip simulator for sharding tests
(the reference has no distributed layer at all; our shard_map pixel-tiling is
validated here and dry-run by the driver via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
