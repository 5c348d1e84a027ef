"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective tests work without TPU hardware (SURVEY §4).

Note: this environment registers an experimental remote-TPU PJRT plugin
("axon") from sitecustomize at interpreter startup, which (a) reads
JAX_PLATFORMS before pytest code runs and (b) tunnels to a single remote
chip that hangs under concurrent test traffic. We therefore force the CPU
platform via jax.config (which wins over the captured env var) and drop the
plugin's backend factory before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - best effort on jax internals
    pass
