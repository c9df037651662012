"""Test configuration: run everything on a virtual 8-device CPU mesh.

Correctness / parity tests are CPU per BASELINE.json:7; sharding tests use
the 8 virtual host devices (SURVEY.md §4, multi-node note).

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
remote-TPU tunnel), so the platform must be forced back to CPU *and* any
already-initialised backends cleared before the first computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend sitecustomize may have initialised
    jax.extend.backend.clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
