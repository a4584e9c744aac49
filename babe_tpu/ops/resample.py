"""Polyphase windowed-sinc resampling as a strided convolution.

TPU-native equivalent of torchaudio.functional.resample (polyphase kernel built
host-side, applied as one strided conv — reference call sites:
utils/training_utils.py:140-221 ``resample_batch``, utils/bandwidth_extension.py:110-118).

Kernel construction mirrors torchaudio's ``sinc_interp_hann`` method:
lowpass_filter_width=6, cutoff at 0.99 * min(orig, new)/2, hann-windowed sinc,
one filter phase per output polyphase branch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> tuple[np.ndarray, int]:
    """Returns (kernel [new_freq, 1, width], width) for gcd-reduced freqs."""
    assert orig_freq > 0 and new_freq > 0
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t_pi = t * np.pi
    kernel = np.where(t_pi == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), width


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample along the last axis; output length ceil(T * new/orig)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    if orig == new:
        return x
    kernel, width = _resample_kernel(orig, new)
    shape = x.shape
    T = shape[-1]
    target_len = int(math.ceil(new * T / orig))
    xr = x.reshape(-1, 1, T)
    xp = jnp.pad(xr, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        xp, jnp.asarray(kernel)[:, None, :], window_strides=(orig,),
        padding=[(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, T//orig + ...] — polyphase branches interleave
    y = jnp.swapaxes(y, 1, 2).reshape(xr.shape[0], -1)
    y = y[:, :target_len]
    return y.reshape(*shape[:-1], target_len)


def resample_batch(audio: jnp.ndarray, fs: np.ndarray, fs_target: int,
                   length_target: int) -> jnp.ndarray:
    """GPU/TPU batch resampler handling mixed native rates
    (reference: utils/training_utils.py:140-221).

    ``fs`` is a host numpy array of per-item sample rates; items are grouped by
    rate (static shapes per group) and cropped/padded to ``length_target``.
    """
    fs = np.asarray(fs).reshape(-1)
    out = []
    for i in range(audio.shape[0]):
        a = audio[i : i + 1]
        f = int(fs[i])
        if f != fs_target:
            if f == 44100 and fs_target == 22050:
                a = resample(a, 2, 1)
            elif f == 48000 and fs_target == 22050:
                a = resample(a, 320, 147)
            else:
                a = resample(a, f, fs_target)
        if a.shape[-1] < length_target:
            a = jnp.pad(a, ((0, 0), (0, length_target - a.shape[-1])))
        out.append(a[..., :length_target])
    return jnp.concatenate(out, axis=0)
