"""Evaluation metric sanity tests."""

import jax.numpy as jnp
import numpy as np

from babe_tpu.utils.metrics import lsd, lsd_high_band, si_sdr


def test_lsd_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32))
    assert float(lsd(x, x).max()) < 1e-4


def test_lsd_orders_degradations(rng):
    """A heavier lowpass must give a larger LSD."""
    from babe_tpu.ops.fir import get_FIR_lowpass, apply_fir

    x = jnp.asarray(rng.standard_normal((1, 32768)).astype(np.float32))
    y1 = apply_fir(x, get_FIR_lowpass(301, 8000.0, 1.0, 22050.0))
    y2 = apply_fir(x, get_FIR_lowpass(301, 2000.0, 1.0, 22050.0))
    l1 = float(lsd(x, y1)[0])
    l2 = float(lsd(x, y2)[0])
    assert l2 > l1 > 0

    hb1 = float(lsd_high_band(x, y1, 22050.0, 1000.0)[0])
    hb_full = float(lsd(x, y1)[0])
    assert hb1 > hb_full  # high band carries the damage


def test_si_sdr(rng):
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    assert float(si_sdr(x, 0.5 * x)[0]) > 50  # scale-invariant
    noisy = x + 0.1 * jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    v = float(si_sdr(x, noisy)[0])
    assert 10 < v < 30
