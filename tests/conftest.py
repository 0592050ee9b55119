"""Force an 8-device virtual CPU mesh so the suite is hermetic and fast.

The container pre-imports jax and registers a remote-TPU backend in every
Python process (PYTHONPATH sitecustomize), so plain env vars are too late:
we must switch platforms through jax.config before the first backend use.
Set DORYLUS_TEST_TPU=1 to run the suite on the real device instead.
"""

import os

if not os.environ.get("DORYLUS_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
