"""Evaluation metrics for bandwidth extension quality.

The reference computes LSD/FAD outside its repo (SURVEY.md §6); the BASELINE
north-star is "LSD within 0.1 dB of the reference on MAESTRO blind BWE", so
the framework ships the metric: log-spectral distance as defined in the BWE
literature (and the BABE paper's evaluation), plus the in-repo filter dB-MSE
(babe_tpu/ops/filters.py::filter_db_mse).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from babe_tpu.ops.stft import hann_window, stft


def lsd(x_ref: jnp.ndarray, x_est: jnp.ndarray, nfft: int = 2048,
        hop: int | None = None, eps: float = 1e-8,
        fmin_bin: int = 0, fmax_bin: int | None = None) -> jnp.ndarray:
    """Log-spectral distance in dB between reference and estimate.

    LSD = mean_t sqrt( mean_f ( 10*log10(|X|^2) - 10*log10(|X_hat|^2) )^2 )

    x_*: [..., T] aligned signals. Optional band restriction via bin range
    (BWE evaluations often report LSD only over the reconstructed band).
    """
    hop = nfft // 4 if hop is None else hop
    w = hann_window(nfft)
    X = stft(x_ref, nfft, hop, w)
    Y = stft(x_est, nfft, hop, w)
    P = 10.0 * jnp.log10(jnp.abs(X) ** 2 + eps)
    Q = 10.0 * jnp.log10(jnp.abs(Y) ** 2 + eps)
    sl = slice(fmin_bin, fmax_bin)
    d = (P[..., sl, :] - Q[..., sl, :]) ** 2
    return jnp.mean(jnp.sqrt(jnp.mean(d, axis=-2)), axis=-1)


def lsd_high_band(x_ref, x_est, fs: float, fc: float, nfft: int = 2048) -> jnp.ndarray:
    """LSD restricted to the reconstructed band [fc, fs/2] — the quantity BWE
    papers report for cutoff fc."""
    fmin_bin = int(np.ceil(fc / (fs / nfft)))
    return lsd(x_ref, x_est, nfft=nfft, fmin_bin=fmin_bin)


def si_sdr(x_ref: jnp.ndarray, x_est: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR in dB (auxiliary restoration metric)."""
    ref = x_ref - jnp.mean(x_ref, axis=-1, keepdims=True)
    est = x_est - jnp.mean(x_est, axis=-1, keepdims=True)
    alpha = jnp.sum(est * ref, -1, keepdims=True) / (
        jnp.sum(ref**2, -1, keepdims=True) + eps
    )
    target = alpha * ref
    noise = est - target
    return 10.0 * jnp.log10(
        (jnp.sum(target**2, -1) + eps) / (jnp.sum(noise**2, -1) + eps)
    )
