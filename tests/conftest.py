"""Test harness config: run everything on a local CPU backend.

The sandboxed environment registers a tunneled TPU backend ("axon") whose
remote compiles take ~40 s each; tests instead force the CPU backend with 8
virtual devices so the Pallas kernels run in interpret mode and the
sharding tests get a real 8-device mesh.  Must happen before JAX
initializes any backend.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
