"""FIR filter design (host-side scipy, trace-time constants) and application.

Replicates the reference's firwin-based degradations
(utils/bandwidth_extension.py:42-95): design happens on the host with scipy and
the resulting taps are baked into the jitted graph as constants; application is
a 'same'-padded correlation, exactly torch.nn.functional.conv1d semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


@functools.lru_cache(maxsize=32)
def get_FIR_lowpass(order: int, fc: float, beta: float, sr: float) -> np.ndarray:
    """Kaiser-window lowpass FIR taps, shape (order,)
    (reference: utils/bandwidth_extension.py:59-74)."""
    taps = scipy.signal.firwin(numtaps=order, cutoff=fc, width=beta,
                               window="kaiser", fs=sr)
    return taps.astype(np.float32)


@functools.lru_cache(maxsize=32)
def get_FIR_highpass(order: int, fc: float, beta: float, sr: float) -> np.ndarray:
    """Kaiser-window highpass FIR taps, shape (order-1,)
    (reference: utils/bandwidth_extension.py:42-58)."""
    taps = scipy.signal.firwin(numtaps=order - 1, cutoff=fc, width=beta,
                               window="kaiser", fs=sr, pass_zero="highpass")
    return taps.astype(np.float32)


def apply_fir(y: jnp.ndarray, taps: np.ndarray | jnp.ndarray) -> jnp.ndarray:
    """'same'-padded correlation along the last axis, matching
    F.conv1d(y, taps, padding='same') (reference: utils/bandwidth_extension.py:76-95).

    For even kernels torch 'same' pads one extra sample on the left:
    out[n] = sum_j x[n + j - (k-1-k//2)] * w[j]  with pad (k-1-k//2, k//2).
    """
    taps = jnp.asarray(taps, dtype=y.dtype)
    k = taps.shape[0]
    hi = k // 2
    lo = k - 1 - hi
    shape = y.shape
    x = y.reshape(-1, 1, shape[-1])
    out = jax.lax.conv_general_dilated(
        x, taps.reshape(1, 1, -1), window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(shape)
