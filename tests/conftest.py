"""Test harness configuration.

The environment preloads jax via sitecustomize and registers a tunneled TPU
("axon") backend with JAX_PLATFORMS=axon. Unit tests must run on a local
8-device virtual CPU platform instead: deterministic f32 math, no tunneled
compile latency, and multi-chip sharding paths (shard_map, collectives) get
exercised without pod hardware. jax is already imported by the time conftest
runs, but the backend is not yet initialized, so jax.config still applies.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1337)


def pytest_configure(config):
    # In `-m tpu` mode the suite must see the REAL device: switch the
    # platform list to "axon,cpu" (axon default for computation, CPU kept
    # for in-process oracles) BEFORE the backend initializes. This runs
    # the TPU tests in-process — the old child-subprocess fixture could
    # not start on this rig (the spawned child's axon registration
    # conflicts with the running session's libtpu args, ROUND4.md).
    if "tpu" in (config.option.markexpr or ""):
        try:
            jax.config.update("jax_platforms", "axon,cpu")
            os.environ.pop("JAX_PLATFORMS", None)
        except Exception:
            pass  # no axon plugin: tests will skip on device discovery
    config.addinivalue_line(
        "markers",
        "tpu: opt-in real-TPU validation (run with `pytest -m tpu`); "
        "skipped in the default CPU suite")
    config.addinivalue_line(
        "markers",
        "slow: opt-in multi-minute stress tests (run with `pytest -m slow`); "
        "skipped in the default suite")


def pytest_collection_modifyitems(config, items):
    # tpu-/slow-marked tests run only when explicitly selected via -m.
    expr = config.option.markexpr or ""
    for name in ("tpu", "slow"):
        if name in expr:
            continue
        skip = pytest.mark.skip(reason=f"{name} test; run with -m {name}")
        for item in items:
            if name in item.keywords:
                item.add_marker(skip)
