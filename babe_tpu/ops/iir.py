"""IIR filtering as a lax.scan (torchaudio.functional.lfilter / biquad equivalents).

IIR recursions are inherently sequential; the reference only uses them for
optional degradation variants (cheby1, biquad — utils/bandwidth_extension.py:120-143,
169-198), never in the training hot path, so a lax.scan over time is the right
TPU realization: it stays on device, jit-compiles once, and is differentiable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


def lfilter(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct-form-II-transposed IIR along the last axis.

    Matches torchaudio.functional.lfilter(x, a_coeffs, b_coeffs, clamp=False)
    (reference call: utils/bandwidth_extension.py:138-143).
    """
    a = jnp.asarray(a, dtype=x.dtype)
    b = jnp.asarray(b, dtype=x.dtype)
    b = b / a[0]
    a = a / a[0]
    n = a.shape[0]
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])

    def step(state, xt):
        # state: [B, n-1] delay line (transposed DF2)
        yt = b[0] * xt + state[:, 0]
        new = b[1:] * xt[:, None] - a[1:] * yt[:, None]
        state = new + jnp.concatenate(
            [state[:, 1:], jnp.zeros((state.shape[0], 1), x.dtype)], axis=1
        )
        return state, yt

    init = jnp.zeros((xf.shape[0], n - 1), dtype=x.dtype)
    _, y = jax.lax.scan(step, init, jnp.moveaxis(xf, -1, 0))
    return jnp.moveaxis(y, 0, -1).reshape(*batch_shape, x.shape[-1])


def biquad(x: jnp.ndarray, b0, b1, b2, a0, a1, a2) -> jnp.ndarray:
    """torchaudio.functional.biquad equivalent
    (reference call: utils/bandwidth_extension.py:120-137)."""
    a = jnp.stack([jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(a2)]).astype(x.dtype)
    b = jnp.stack([jnp.asarray(b0), jnp.asarray(b1), jnp.asarray(b2)]).astype(x.dtype)
    return lfilter(x, a, b)


def get_cheby1_ba(order: int, ripple: float, hi: float):
    """Chebyshev type-I lowpass (host-side scipy;
    reference: utils/bandwidth_extension.py:169-178)."""
    b, a = scipy.signal.cheby1(order, ripple, hi, btype="lowpass", output="ba")
    return b.astype(np.float32), a.astype(np.float32)


def design_biquad_lpf(fc: float, fs: float, Q: float):
    """RBJ biquad lowpass coefficients
    (reference: utils/bandwidth_extension.py:180-198)."""
    w0 = 2.0 * math.pi * fc / fs
    alpha = math.sin(w0) / 2.0 / Q
    b0 = (1.0 - math.cos(w0)) / 2.0
    b1 = 1.0 - math.cos(w0)
    b2 = b0
    a0 = 1.0 + alpha
    a1 = -2.0 * math.cos(w0)
    a2 = 1.0 - alpha
    return b0, b1, b2, a0, a1, a2
