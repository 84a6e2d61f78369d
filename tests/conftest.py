"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must not depend on the (single) real TPU chip; multi-device
sharding tests run on a virtual 8-device CPU mesh via
--xla_force_host_platform_device_count, per the project's distributed
test strategy (SURVEY.md §4.4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax before this file runs, so the
# env var alone may be ignored; force the platform at runtime too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip recompilation
# (measured ~6x on the model compiles that dominate suite time).
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_test_cache",
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_lib():
    """Import the upstream reference's torch modules as a numerics oracle.

    librosa/soundfile are not installed in this environment; they are
    only needed by the reference's audio I/O paths, so stub them out to
    make `lib.layers` / `lib.nets` importable.
    """
    import types

    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not available")
    for name in ("librosa", "librosa.effects", "soundfile"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["librosa"].effects = sys.modules["librosa.effects"]
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from lib import layers as ref_layers  # noqa: E402
    from lib import nets as ref_nets  # noqa: E402

    return types.SimpleNamespace(layers=ref_layers, nets=ref_nets)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: test compares against the upstream reference"
    )
    config.addinivalue_line("markers", "slow: long-running integration test")
