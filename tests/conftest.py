"""Test harness config: force the JAX CPU backend with 8 virtual devices.

Must run before jax initializes its backends — pytest imports conftest.py
before any test module, so setting the env here is sufficient as long as no
module imports jax at collection time before this file loads.

The 8-device CPU mesh doubles as the multi-chip simulator for sharding tests
(the reference has no distributed layer at all; our shard_map pixel-tiling is
validated here and dry-run by the driver via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
