"""Test configuration.

Tests run on CPU (``JAX_PLATFORMS=cpu``) with EIGHT virtual devices
(``--xla_force_host_platform_device_count=8``) so the sharding/mesh tests in
``tests/test_parallel.py`` exercise real multi-device semantics in-process.
(Round 1 believed this deadlocked on the 1-core box; verified round 2 that it
does not.)  The driver separately validates the multi-chip path via
``__graft_entry__.dryrun_multichip``.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (TPU); force CPU for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        f"{_flags} --xla_force_host_platform_device_count=8".strip()
    )
# The axon sitecustomize registers the TPU PJRT plugin in every python
# process and *blocks on the TPU tunnel* if another process holds the claim.
# Tests are CPU-only; drop the trigger var so registration is skipped.
# (Has effect only for pytest-spawned subprocesses; for the current process
# sitecustomize already ran at interpreter start — harmless, registration
# succeeds or is skipped, and JAX_PLATFORMS=cpu keeps compute on CPU.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

# A pytest plugin may have imported jax BEFORE this conftest ran, in which
# case jax.config latched the ambient JAX_PLATFORMS (= axon/TPU) at import
# and the env set above is ignored — tests would silently run on the TPU
# (observed r2: 4-minute single tests + Pallas paths active).  Re-point the
# live config; backends have not been initialised yet at collection time.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass
