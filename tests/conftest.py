"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield ray
    ray.shutdown()


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def sampledata() -> np.ndarray:
    """The reference suite's shared 875-point real series."""
    return np.loadtxt(os.path.join(GOLDEN_DIR, "sampledata.txt"))


def golden(name: str) -> np.ndarray:
    return np.loadtxt(os.path.join(GOLDEN_DIR, name))


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
