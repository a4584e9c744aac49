"""Parametric degradation filters and frequency-weighted norms.

TPU-native re-implementation of the blind-BWE objective machinery
(reference: utils/blind_bwe_utils.py:41-296).  All functions are pure and
differentiable; the piecewise log-log lowpass ``design_filter`` replicates the
reference's semantics exactly, including the quantized-bin breakpoint values
(H[f>=fc_i][0] continuity factor) — see
tests/test_ops.py::test_design_filter_parity for the parity check against a
literal numpy port of the reference loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from babe_tpu.ops.stft import apply_stft, apply_filter as _apply_filter


def design_filter(fc, A, f: jnp.ndarray) -> jnp.ndarray:
    """Piecewise log-log lowpass magnitude response.

    fc: breakpoint frequencies, shape (K,) (or scalar); A: slopes in dB/octave,
    shape (K,) (or scalar).  H = 1 below fc[0]; after each breakpoint fc[i] the
    response follows 10^(A[i] * log2(f/fc[i]) / 20) scaled so segments chain at
    the first frequency *bin* >= fc[i] (reference: utils/blind_bwe_utils.py:82-119).
    """
    fc = jnp.atleast_1d(jnp.asarray(fc, dtype=f.dtype))
    A = jnp.atleast_1d(jnp.asarray(A, dtype=f.dtype))
    K = fc.shape[0]
    H = jnp.ones_like(f)
    for i in range(K):  # K is static (config), unrolled at trace time
        mask = f >= fc[i]
        fci = jnp.maximum(fc[i], 1e-9)
        # clamp the argument to the masked domain (f >= fc) so the unselected
        # branch cannot overflow and poison gradients through jnp.where
        seg = 10.0 ** (A[i] * jnp.log2(jnp.maximum(f, fci) / fci) / 20.0)
        if i == 0:
            H = jnp.where(mask, seg, H)
        else:
            # chain segments: scale by previous H at the first bin >= fc[i]
            first = jnp.argmax(mask)
            cont = jnp.where(jnp.any(mask), H[first], 1.0)
            H = jnp.where(mask, seg * cont, H)
    return H


def design_filter_G(fc, A, G, f: jnp.ndarray) -> jnp.ndarray:
    """design_filter with an extra broadband gain in dB
    (reference: utils/blind_bwe_utils.py:41-80)."""
    return design_filter(fc, A, f) * 10.0 ** (jnp.asarray(G) / 20.0)


def apply_filter_fcA(x: jnp.ndarray, filter_params: jnp.ndarray, freqs: jnp.ndarray,
                     nfft: int) -> jnp.ndarray:
    """Degrade a signal with the parametric lowpass via STFT multiply
    (reference: testing/blind_bwe_sampler.py:518-520)."""
    H = design_filter(filter_params[0], filter_params[1], freqs)
    return _apply_filter(x, H, nfft)


_EPS = 1e-8


def _freq_weighting(freqs01: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Frequency weighting curves (reference: utils/blind_bwe_utils.py:162-195)."""
    if kind in (None, "None", "none"):
        return jnp.ones_like(freqs01)
    if kind == "linear":
        return freqs01
    if kind == "log":
        return jnp.log2(1 + freqs01)
    if kind == "sqrt":
        return jnp.sqrt(freqs01)
    if kind == "log2":
        return jnp.log2(freqs01)
    if kind == "log10":
        return jnp.log10(freqs01)
    if kind == "cubic":
        return freqs01**3
    if kind == "quadratic":
        return freqs01**2
    if kind == "logcubic":
        return jnp.log2(1 + freqs01**3)
    if kind == "logquadratic":
        return jnp.log2(1 + freqs01**2)
    if kind == "squared":
        return freqs01**4
    raise ValueError(f"unknown freq weighting {kind!r}")


def apply_norm_STFT_fweighted(y, den_rec, freq_weight="linear", nfft=1024):
    """L2 between complex STFTs with per-frequency weighting
    (reference: utils/blind_bwe_utils.py:148-197)."""
    X = apply_stft(den_rec, nfft)
    Xref = apply_stft(y, nfft)
    w = _freq_weighting(jnp.linspace(0.0, 1.0, X.shape[-2]), freq_weight)[:, None]
    d = (X - Xref) * w
    return jnp.sqrt(jnp.sum(jnp.abs(d) ** 2))


def apply_norm_STFTmag_fweighted(y, den_rec, freq_weight="linear", nfft=1024,
                                 logmag=False):
    """L2 between STFT magnitudes with weighting
    (reference: utils/blind_bwe_utils.py:198-248)."""
    X = jnp.abs(apply_stft(den_rec, nfft))
    Xref = jnp.abs(apply_stft(y, nfft))
    w = _freq_weighting(jnp.linspace(0.0, 1.0, X.shape[-2]), freq_weight)[:, None]
    X = X * w
    Xref = Xref * w
    if logmag:
        return jnp.sqrt(jnp.sum((jnp.log10(X + _EPS) - jnp.log10(Xref + _EPS)) ** 2))
    return jnp.sqrt(jnp.sum((X - Xref) ** 2))


def apply_filter_and_norm_STFTmag_fweighted(X, Xref, H, freq_weight="linear"):
    """The blind-filter-optimization objective: || |X|·H − |Xref| ||₂ weighted
    (reference: utils/blind_bwe_utils.py:250-296).  X, Xref are complex STFTs
    [..., F, T]; H is [F]."""
    Xm = jnp.abs(X) * H[..., :, None]
    Xr = jnp.abs(Xref)
    w = _freq_weighting(jnp.linspace(0.0, 1.0, Xm.shape[-2]), freq_weight)[:, None]
    return jnp.sqrt(jnp.sum(((Xm - Xr) * w) ** 2))


def filter_db_mse(params_true, params_est, freqs: jnp.ndarray) -> jnp.ndarray:
    """Filter-estimation metric: mean squared error between responses in dB
    (reference: testing/blind_bwe_tester_small.py:398-405)."""
    Ht = design_filter(params_true[0], params_true[1], freqs)
    He = design_filter(params_est[0], params_est[1], freqs)
    return jnp.mean((20 * jnp.log10(Ht + _EPS) - 20 * jnp.log10(He + _EPS)) ** 2)
