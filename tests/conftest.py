"""Test config: run JAX on CPU with 8 virtual devices so sharding /
multi-chip code paths are exercised without TPU hardware (the standard JAX
fake-multihost trick; see SURVEY.md §4)."""

import os

# Force CPU with 8 virtual devices. The container boots jax through the
# axon TPU-tunnel plugin (sitecustomize sets jax_platforms itself), so env
# vars alone don't stick — override the config before any backend
# initialization instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    """Loader for golden fixture files generated from the PyTorch reference
    (tools/gen_golden.py)."""

    cache = {}

    def load(name):
        if name not in cache:
            cache[name] = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
        return cache[name]

    return load


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))
