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

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: test compares against the upstream reference"
    )
