"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): the same
sharding code paths as a TPU slice, without requiring hardware. Must set
env BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# the persistent compile cache targets the remote-compile TPU tunnel;
# for CPU CI it only adds AOT machine-feature mismatch noise
os.environ.setdefault("LDSO_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize may have imported jax with JAX_PLATFORMS=axon
# before this conftest ran; the config update below wins over the cached env.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
