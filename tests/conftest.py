"""Test configuration.

All tests run on CPU with 8 virtual devices so the multi-chip sharding
paths compile and execute without TPU hardware (the strategy recommended
in SURVEY.md §4: ``xla_force_host_platform_device_count``).

The platform is forced via ``jax.config.update`` rather than
``JAX_PLATFORMS``: site customization may import jax before this file
runs (env-var reads happen at jax import), but the config update takes
effect at backend initialization, which is lazy.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_seq(rng, length, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=length))


@pytest.fixture
def make_seq(rng):
    def _make(length, alphabet="ACGT"):
        return random_seq(rng, length, alphabet)

    return _make
