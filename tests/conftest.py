"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-world stand-in for multi-node fake-backend testing (SURVEY.md
§4): force the host platform and split it into 8 XLA devices so every
sharding/collective path is exercised without TPU hardware. The axon
sitecustomize pins ``jax_platforms`` on import, so the override must go
through ``jax.config`` rather than the environment variable.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
