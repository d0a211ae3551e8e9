"""Test environment: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: the container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars set here are too late —
we must use jax.config.update to force the CPU backend, otherwise every tiny
test compile round-trips through the remote TPU compiler (~30-80s each).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (e2e pipelines, big-model compiles)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running (e2e/scaled/compile-heavy); skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
