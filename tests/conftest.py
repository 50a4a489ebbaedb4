"""Test harness config: run on a virtual 8-device CPU mesh by default.

Multi-chip hardware is not available in CI; sharding tests exercise a
`jax.sharding.Mesh` over 8 virtual CPU devices (set VETTORE_TEST_TPU=1 to run
the suite against the real backend instead).

Note: the ambient axon TPU plugin registers itself regardless of
JAX_PLATFORMS, so the platform must be forced via jax.config *after* import;
the virtual device count still has to be in XLA_FLAGS *before* backend init.
"""

import os

if not os.environ.get("VETTORE_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
