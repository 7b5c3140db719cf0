"""Test configuration.

Tests run on CPU (``JAX_PLATFORMS=cpu``).  NOTE: this build box has a single
CPU core and ``--xla_force_host_platform_device_count`` deadlocks XLA there,
so we do NOT force a virtual device mesh here.  Sharding tests skip
themselves when fewer than 2 devices are visible; to run them locally use::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest tests/test_parallel.py

(on a multi-core machine).  The driver separately validates the multi-chip
path via ``__graft_entry__.dryrun_multichip``.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (TPU); force CPU for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers the TPU PJRT plugin in every python
# process and *blocks on the TPU tunnel* if another process holds the claim.
# Tests are CPU-only; drop the trigger var so registration is skipped.
# (Has effect only for pytest-spawned subprocesses; for the current process
# sitecustomize already ran at interpreter start — harmless, registration
# succeeds or is skipped, and JAX_PLATFORMS=cpu keeps compute on CPU.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
