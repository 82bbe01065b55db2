"""Test configuration: force CPU with 8 virtual devices.

Mirrors the reference's "run the whole stack GPU-less via lavapipe" trick
(SURVEY.md §4.7): multi-chip sharding logic is validated on a virtual CPU
mesh, never requiring real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon: tests never need the chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize registers the axon TPU plugin at
# interpreter start and force-sets jax_platforms="axon,cpu", IGNORING the
# env var.  Undo it here so tests really run on host CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
