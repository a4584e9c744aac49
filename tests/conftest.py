"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX to a remote TPU ("axon") via a sitecustomize hook that
imports jax at interpreter startup and overrides the platform selection, so env
vars alone are not enough — we must update jax.config before any backend is
initialized (backends are created lazily at first use, which is after conftest).
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _babe_env_guard():
    """Restore all BABE_* env vars after every test.

    The precision/layout dispatch reads ``BABE_*`` at trace time by design,
    and ``BABE.load(precision=...)`` sets them; ``monkeypatch.delenv(...,
    raising=False)`` on an *absent* var records no undo, so a var set by the
    code under test would otherwise leak into every later test (this bit us:
    test_load_precision_int8 leaked BABE_INT8_BWD=1 and quantized the dx
    cotangent inside test_conv_int8_close_and_exact_backward's exact-backward
    assertion)."""
    saved = {k: v for k, v in os.environ.items() if k.startswith("BABE_")}
    yield
    for k in [k for k in os.environ if k.startswith("BABE_")]:
        if k not in saved:
            del os.environ[k]
    os.environ.update(saved)
