"""Degradation operators for inverse problems, as pure closures.

The conceptual core of the reference's sampler layer (SURVEY.md L6b): every
inverse task is a lambda ``degradation(x)`` handed to a guided sampler
(reference: testing/edm_sampler.py:231-305, 308-384;
testing/blind_bwe_sampler.py:211-230, 518-520).  Here each factory returns a
jit-traceable pure function; filter design happens host-side at closure-build
time and is baked into the graph as constants.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from babe_tpu.ops import fir, iir
from babe_tpu.ops.filters import design_filter
from babe_tpu.ops.resample import resample
from babe_tpu.ops.stft import apply_filter


def make_fir(taps: np.ndarray) -> Callable:
    """FIR lowpass/highpass conv (reference: edm_sampler.py:245-252)."""
    return lambda x: fir.apply_fir(x, taps)


def make_iir(b: np.ndarray, a: np.ndarray) -> Callable:
    """cheby1-style IIR via lax.scan (reference: edm_sampler.py:253-255)."""
    return lambda x: iir.lfilter(x, a, b)


def make_biquad(coeffs) -> Callable:
    b0, b1, b2, a0, a1, a2 = coeffs
    return lambda x: iir.biquad(x, b0, b1, b2, a0, a1, a2)


def make_decimate(factor: int) -> Callable:
    """Naive decimation x[0:-1:factor] (reference: edm_sampler.py:259-260)."""
    return lambda x: x[..., 0:-1:factor]


def make_resample(factor: float, N: int = 100) -> Callable:
    """(reference: edm_sampler.py:262-264)"""
    return lambda x: resample(x, int(N * factor), N)


def make_mask(mask: jnp.ndarray) -> Callable:
    """Inpainting / compressive sensing (reference: edm_sampler.py:231-243,344-357)."""
    return lambda x: mask * x


def make_clip(clip_value: float) -> Callable:
    """Declipping (reference: edm_sampler.py:359-384)."""
    return lambda x: jnp.clip(x, -clip_value, clip_value)


def make_stft_mag(win_size: int, hop_size: int) -> Callable:
    """Phase retrieval |STFT| (reference: edm_sampler.py:308-336)."""
    from babe_tpu.ops.stft import stft, hamming_window

    w = hamming_window(win_size)

    def deg(x):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, win_size)]
        return jnp.abs(stft(jnp.pad(x, pad), win_size, hop_size, w))

    return deg


def make_fcA(freqs: jnp.ndarray, nfft: int) -> Callable:
    """Parametric STFT-domain lowpass; takes (x, params[2,K])
    (reference: blind_bwe_sampler.py:518-520)."""

    def deg(x, params):
        H = design_filter(params[0], params[1], freqs)
        return apply_filter(x, H, nfft)

    return deg


def make_masked_composite(mask: jnp.ndarray, base: Callable) -> Callable:
    """AR-outpainting observation model: mask*x + (1-mask)*base(x)
    (reference: blind_bwe_sampler.py:259-303 predict_bwe_AR)."""
    return lambda x, *a: mask * x + (1 - mask) * base(x, *a)


def prepare_filter(args, sample_rate: float):
    """Host-side filter preparation dispatch
    (reference: utils/bandwidth_extension.py:7-40). Returns (filt, type)."""
    f = args.tester.bandwidth_extension.filter
    ftype = f.type
    if ftype == "firwin":
        return fir.get_FIR_lowpass(int(f.order), float(f.fc), float(f.beta), sample_rate), ftype
    if ftype == "firwin_hpf":
        return fir.get_FIR_highpass(int(f.order), float(f.fc), float(f.beta), sample_rate), ftype
    if ftype == "cheby1":
        b, a = iir.get_cheby1_ba(int(f.order), float(f.ripple), 2 * float(f.fc) / sample_rate)
        return (b, a), ftype
    if ftype == "biquad":
        return iir.design_biquad_lpf(float(f.fc), sample_rate, float(f.biquad.Q)), ftype
    if ftype == "resample":
        return sample_rate / float(f.resample.fs), ftype
    if ftype == "decimate":
        return int(args.tester.bandwidth_extension.decimate.factor), ftype
    raise NotImplementedError(f"filter type {ftype}")


def degradation_from_filter(filt, filt_type: str) -> Callable:
    """(reference: edm_sampler.py:266-305 predict_bwe dispatch)"""
    if filt_type in ("firwin", "firwin_hpf"):
        return make_fir(filt)
    if filt_type == "cheby1":
        b, a = filt
        return make_iir(b, a)
    if filt_type == "biquad":
        return make_biquad(filt)
    if filt_type == "resample":
        return make_resample(filt)
    if filt_type == "decimate":
        return make_decimate(filt)
    raise NotImplementedError(filt_type)
