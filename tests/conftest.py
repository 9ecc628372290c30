"""Test harness: force an 8-virtual-device CPU platform.

The reference has no distributed tests (SURVEY §4); here every sharding test
runs against a virtual multi-device CPU mesh, as the driver's
``dryrun_multichip`` does. Env vars must be set before jax initializes.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the session env points at a
# tunneled TPU; tests must not fight over it and need 8 virtual devices).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's site hook pins the platform to the tunneled TPU regardless of
# JAX_PLATFORMS; override programmatically as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_interactions(
    n_users=100, n_items=50, n=1000, seed=0, metadata=False, scalar_meta=False
):
    """Synthetic interactions, reference-test-shaped
    (tests/test_model_and_features.py:12-25): users x items with optional
    list-valued category metadata."""
    r = np.random.default_rng(seed)
    users = r.integers(0, n_users, n)
    items = r.integers(0, n_items, n)
    data = {"user_id": users, "item_id": items}
    if metadata:
        if scalar_meta:
            cats = list((items % 7).astype(int))
        else:
            cats = [[int(i % 7), int(i % 3)] for i in items]
        data["category_ids"] = np.asarray(cats, dtype=object)
    return data


@pytest.fixture
def interactions():
    return make_interactions()


@pytest.fixture
def interactions_meta():
    return make_interactions(metadata=True)
