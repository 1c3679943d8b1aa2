"""Test harness config: force CPU JAX with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(`xla_force_host_platform_device_count`), per SURVEY §4 carry-over notes.

This image routes JAX to a remote TPU via an `axon` sitecustomize that is
enabled whenever PALLAS_AXON_POOL_IPS is set; tests must run on local CPU
(fast eager dispatch, virtual multi-device), so we remove that trigger and
pin the platform BEFORE jax is imported anywhere in the test session.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sitecustomize may have imported jax already (baking JAX_PLATFORMS=axon
# into the config default); override at the config level too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
