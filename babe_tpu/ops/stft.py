"""STFT / iSTFT matching the reference's torch.stft conventions.

Two convention sets are used by the reference:
  * blind-BWE objective STFT: hamming window, hop = NFFT//2, center=False,
    input zero-padded by NFFT at the end (utils/blind_bwe_utils.py:15-39).
  * spectrogram logging / phase retrieval: same torch.stft call shapes.

torch.hamming_window is periodic: w[n] = 0.54 - 0.46*cos(2*pi*n/N).
torch.stft(center=False) frames are x[m*hop : m*hop+NFFT]; output layout is
(batch, freq, frames) which we preserve.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hamming_window(n: int) -> np.ndarray:
    """Periodic hamming, matching torch.hamming_window(n) defaults."""
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    """Periodic hann, matching torch.hann_window(n) defaults."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame_signal(x: jnp.ndarray, nfft: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, nfft] (center=False framing)."""
    T = x.shape[-1]
    n_frames = 1 + (T - nfft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    nfft: int,
    hop: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """[..., T] -> complex [..., nfft//2+1, n_frames] (torch layout, center=False)."""
    hop = nfft // 2 if hop is None else hop
    w = hamming_window(nfft) if window is None else window
    frames = frame_signal(x, nfft, hop) * w
    X = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(X, -1, -2)


def istft(
    X: jnp.ndarray,
    nfft: int,
    hop: int | None = None,
    window: np.ndarray | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse of :func:`stft` with torch.istft's window-envelope normalization."""
    hop = nfft // 2 if hop is None else hop
    w = hamming_window(nfft) if window is None else window
    Xf = jnp.swapaxes(X, -1, -2)  # [..., n_frames, nfft//2+1]
    frames = jnp.fft.irfft(Xf, n=nfft, axis=-1) * w
    n_frames = frames.shape[-2]
    T = (n_frames - 1) * hop + nfft
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]).reshape(-1)
    y = jnp.zeros((*frames.shape[:-2], T), dtype=frames.dtype)
    y = y.at[..., idx].add(frames.reshape(*frames.shape[:-2], -1))
    env = np.zeros(T, dtype=np.float32)
    np.add.at(env, idx, np.tile(w**2, n_frames))
    y = y / jnp.maximum(env, 1e-11)
    if length is not None:
        y = y[..., :length]
    return y


def apply_stft(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """The blind-BWE analysis STFT (reference: utils/blind_bwe_utils.py:15-26).

    Zero-pads by NFFT at the end, hamming window, hop NFFT//2, center=False.
    Returns complex [..., nfft//2+1, n_frames].
    """
    pad = [(0, 0)] * (x.ndim - 1) + [(0, nfft)]
    return stft(jnp.pad(x, pad), nfft)


def apply_filter_istft(X: jnp.ndarray, H: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Multiply a frequency response onto an STFT and invert
    (reference: utils/blind_bwe_utils.py:28-39)."""
    Xf = X * H[..., :, None]
    return istft(Xf, nfft)


def apply_filter(x: jnp.ndarray, H: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """STFT-domain filtering: stft -> xH -> istft -> crop
    (reference: utils/blind_bwe_utils.py:6-13)."""
    X = apply_stft(x, nfft)
    y = apply_filter_istft(X, H, nfft)
    return y[..., : x.shape[-1]]


@functools.lru_cache(maxsize=16)
def rfftfreq(nfft: int, fs: float) -> np.ndarray:
    return np.fft.rfftfreq(nfft, d=1.0 / fs).astype(np.float32)
