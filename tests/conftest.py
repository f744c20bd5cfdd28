"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a host-platform device mesh (the driver separately dry-runs
the multi-chip path via ``__graft_entry__.dryrun_multichip``).

Note: this environment's sitecustomize registers a remote `axon` TPU PJRT
plugin and forces ``jax_platforms="axon,cpu"`` via jax.config (so the
JAX_PLATFORMS env var alone is NOT enough). We override through jax.config
after import, before any backend is initialized.
"""

import os

# Read at CPU backend init — must be set before the first jax.devices() call.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

# persistent compile cache across test processes
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
