"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests use the standard JAX trick of forcing N host
platform devices (SURVEY.md §4 implication (d)); no TPU is needed for the
suite.

Note: this environment registers a remote TPU backend via sitecustomize at
interpreter startup and pins ``jax_platforms``; plain ``JAX_PLATFORMS=cpu``
env overrides are ineffective. We must (a) set the host-device-count XLA flag
before the CPU client is instantiated and (b) re-pin the platform through
``jax.config`` after jax import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) >= 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
