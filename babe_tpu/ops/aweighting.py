"""A-weighting / pre-emphasis FIR filters for perceptual loss weighting.

Equivalent of the auraloss-derived FIRFilter used by the EDM loss when
``diff_params.aweighting.use_aweighting`` is set
(reference: utils/training_utils.py:55-138).  Design is host-side scipy
(IEC A-weighting analog prototype -> bilinear -> firls FIR fit), application is
a 'same' correlation on device.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
import scipy.signal

from babe_tpu.ops.fir import apply_fir


@functools.lru_cache(maxsize=8)
def aweighting_fir(fs: float, ntaps: int = 101) -> np.ndarray:
    """101-tap FIR fit to the IEC A-weighting curve
    (reference: utils/training_utils.py:91-122)."""
    if ntaps % 2 == 0:
        raise ValueError(f"ntaps must be odd (ntaps={ntaps})")
    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    A1000 = 1.9997
    NUMs = [(2 * np.pi * f4) ** 2 * (10 ** (A1000 / 20)), 0, 0, 0, 0]
    DENs = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    DENs = np.polymul(np.polymul(DENs, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(NUMs, DENs, fs=fs)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=fs)
    return taps.astype(np.float32)


def hp_fir(coef: float = 0.85) -> np.ndarray:
    """First-order highpass pre-emphasis (reference: utils/training_utils.py:83-86)."""
    return np.array([1.0, -coef, 0.0], dtype=np.float32)


def fd_fir(coef: float = 0.85) -> np.ndarray:
    """Folded differentiator (reference: utils/training_utils.py:87-90)."""
    return np.array([1.0, 0.0, -coef], dtype=np.float32)


def apply_aweighting(error: jnp.ndarray, fs: float, ntaps: int = 101) -> jnp.ndarray:
    return apply_fir(error, aweighting_fir(fs, ntaps))
