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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
