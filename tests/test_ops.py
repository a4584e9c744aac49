"""DSP op parity tests — golden values against torch/scipy (SURVEY.md §4 layer 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal
import torch

from babe_tpu.ops import filters, fir, iir, resample, stft


# ---------------------------------------------------------------- STFT parity


def test_stft_matches_torch(rng):
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    nfft = 1024
    X = np.asarray(stft.apply_stft(jnp.asarray(x), nfft))
    xt = torch.from_numpy(x)
    xt = torch.cat((xt, torch.zeros(2, nfft)), 1)
    Xt = torch.stft(
        xt, nfft, hop_length=nfft // 2, window=torch.hamming_window(nfft),
        center=False, onesided=True, return_complex=True,
    ).numpy()
    assert X.shape == Xt.shape
    np.testing.assert_allclose(X, Xt, atol=2e-3)


def test_istft_matches_torch(rng):
    x = rng.standard_normal((2, 8192 + 1024)).astype(np.float32)
    nfft = 1024
    X = stft.stft(jnp.asarray(x), nfft)
    y = np.asarray(stft.istft(X, nfft))
    Xt = torch.stft(
        torch.from_numpy(x), nfft, hop_length=nfft // 2,
        window=torch.hamming_window(nfft), center=False, return_complex=True,
    )
    yt = torch.istft(
        Xt, nfft, hop_length=nfft // 2, window=torch.hamming_window(nfft),
        center=False, return_complex=False,
    ).numpy()
    n = min(y.shape[-1], yt.shape[-1])
    np.testing.assert_allclose(y[..., :n], yt[..., :n], atol=2e-4)


def test_stft_filter_roundtrip(rng):
    """apply_filter with H=1 must reconstruct the signal (interior samples)."""
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    H = jnp.ones(513)
    y = np.asarray(filters._apply_filter(jnp.asarray(x), H, 1024))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[:, 1024:-1024], x[:, 1024:-1024], atol=1e-3)


# ------------------------------------------------------- design_filter parity


def _design_filter_reference(fc, A, f):
    """Literal numpy port of utils/blind_bwe_utils.py:82-119 for golden values."""
    fc = np.atleast_1d(np.asarray(fc, dtype=np.float64))
    A = np.atleast_1d(np.asarray(A, dtype=np.float64))
    H = np.zeros_like(f)
    H[f < fc[0]] = 1.0
    H[f >= fc[0]] = 10 ** (A[0] * np.log2(f[f >= fc[0]] / fc[0]) / 20)
    for i in range(1, len(fc)):
        H[f >= fc[i]] = (
            10 ** (A[i] * np.log2(f[f >= fc[i]] / fc[i]) / 20) * H[f >= fc[i]][0]
        )
    return H


@pytest.mark.parametrize(
    "fc,A",
    [
        ([1000.0], [-20.0]),
        ([280.0, 285.0, 290.0, 295.0, 300.0], [-15.0, -17.0, -20.0, -25.0, -30.0]),
        ([500.0, 4000.0], [-10.0, -60.0]),
    ],
)
def test_design_filter_parity(fc, A):
    f = np.fft.rfftfreq(4096, d=1 / 22050).astype(np.float64)
    ref = _design_filter_reference(fc, A, f)
    ours = np.asarray(
        filters.design_filter(jnp.asarray(fc), jnp.asarray(A), jnp.asarray(f))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_design_filter_differentiable():
    f = jnp.asarray(np.fft.rfftfreq(1024, d=1 / 22050).astype(np.float32))

    def loss(params):
        return jnp.sum(filters.design_filter(params[0], params[1], f))

    p = jnp.asarray([[1000.0, 2000.0], [-10.0, -30.0]])
    g = jax.grad(loss)(p)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_blind_objective_grad(rng):
    """The blind-BWE objective is differentiable in (fc, A)."""
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    y = x * 0.5
    X = stft.apply_stft(jnp.asarray(x), 1024)
    Y = stft.apply_stft(jnp.asarray(y), 1024)
    freqs = jnp.asarray(np.fft.rfftfreq(1024, 1 / 22050).astype(np.float32))

    def obj(params):
        H = filters.design_filter(params[0], params[1], freqs)
        return filters.apply_filter_and_norm_STFTmag_fweighted(X, Y, H, "sqrt")

    p = jnp.asarray([[300.0], [-20.0]])
    v, g = jax.value_and_grad(obj)(p)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------- FIR/IIR parity


def test_fir_matches_torch(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    taps = fir.get_FIR_lowpass(500, 1000.0, 1.0, 22050.0)
    ours = np.asarray(fir.apply_fir(jnp.asarray(x), taps))
    theirs = torch.nn.functional.conv1d(
        torch.from_numpy(x).unsqueeze(1),
        torch.from_numpy(taps).view(1, 1, -1),
        padding="same",
    ).squeeze(1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_lfilter_matches_scipy(rng):
    x = rng.standard_normal((1, 2048)).astype(np.float32)
    b, a = iir.get_cheby1_ba(6, 0.05, 0.25)
    ours = np.asarray(iir.lfilter(jnp.asarray(x), a, b))
    ref = scipy.signal.lfilter(b.astype(np.float64), a.astype(np.float64), x[0])
    np.testing.assert_allclose(ours[0], ref, atol=5e-3)


def test_biquad(rng):
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    coeffs = iir.design_biquad_lpf(1000.0, 22050.0, 0.707)
    ours = np.asarray(iir.biquad(jnp.asarray(x), *coeffs))
    b = np.array(coeffs[:3], dtype=np.float64)
    a = np.array(coeffs[3:], dtype=np.float64)
    ref = scipy.signal.lfilter(b, a, x[0])
    np.testing.assert_allclose(ours[0], ref, atol=1e-4)


# --------------------------------------------------------------- resampling


def test_resample_tone():
    """A mid-band tone survives 44.1k->22.05k resampling with low error."""
    fs = 44100
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    y = np.asarray(resample.resample(jnp.asarray(x), 2, 1))
    assert y.shape[-1] == fs // 2
    t2 = np.arange(fs // 2) / (fs / 2)
    ref = np.sin(2 * np.pi * 1000.0 * t2)
    # ignore filter edge transients
    err = np.abs(y[0, 200:-200] - ref[200:-200]).max()
    assert err < 1e-3


def test_resample_identity(rng):
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    y = np.asarray(resample.resample(jnp.asarray(x), 3, 3))
    np.testing.assert_allclose(y, x)


def test_resample_batch_mixed(rng):
    a44 = rng.standard_normal((1, 44100)).astype(np.float32)
    a48 = rng.standard_normal((1, 48000)).astype(np.float32)
    batch = np.concatenate([a44, np.pad(a48, ((0, 0), (0, 0)))[:, :44100]], 0)
    out = resample.resample_batch(
        jnp.asarray(batch), np.array([44100, 48000]), 22050, 20000
    )
    assert out.shape == (2, 20000)
    assert np.all(np.isfinite(np.asarray(out)))
