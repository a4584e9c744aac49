"""Tests for the cqt_nsgt_pytorch-compatible CQT frame (mode="oct_pow2").

The compat mode re-derives the frame construction of the external package the
reference model was trained with (reference: networks/cqtdiff+.py:620 builds
CQT_nsgt(num_octs, bins_per_oct, mode="oct", window=("kaiser", beta), fs,
audio_len); :18 notes the package uses powers of two for the time sizes).

Offline we can verify: the structural facts (pow2 time sizes, exact halving,
expected M_top at the flagship config), perfect reconstruction on the octave
band subspace, the hpf-mask identity, and conjugate-mirror handling near
Nyquist.  A direct numerical parity test against the real package activates
automatically when `cqt_nsgt_pytorch` is importable (no egress here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from babe_tpu.ops.cqt import CQT

FS = 22050.0


@pytest.fixture(scope="module")
def cqt_small():
    # small but structurally complete: 4 octaves, 8 bins/oct, ~1 s
    return CQT(4, 8, FS, 22050, window="kaiser", beta=1.0, mode="oct_pow2")


def test_flagship_shapes_pow2():
    """The published checkpoint's transform: 7 octs x 64 bins @ 184184 samples
    must give pow2 time sizes topping out at 2048 (bandwidth of the top bin:
    f/q ~ 239.4 Hz -> 2000 bins -> next pow2)."""
    c = CQT(7, 64, FS, 184184, window="kaiser", beta=1.0, mode="oct_pow2")
    assert c.Ls == 184184  # package pads nothing
    assert c.M == (32, 64, 128, 256, 512, 1024, 2048)
    for m in c.M:
        assert m & (m - 1) == 0  # powers of two


def test_exact_halving_and_painless(cqt_small):
    M = cqt_small.M
    for a, b in zip(M, M[1:]):
        assert 2 * a == b
    # painless: every band's window support fits its octave's time size
    for p in cqt_small._plans:
        support = (p.w_ana != 0).sum(axis=1)
        assert (support <= p.M).all()


def test_perfect_reconstruction_on_band_subspace(cqt_small):
    """bwd(fwd(.)) acts as identity on signals whose spectrum lives where the
    octave bands fully cover the frame (mask == 1).  Note apply_hpf_DC is a
    frame *multiplier* (mask), not a projection — in compat mode the top band
    overlaps the Nyquist band over a wide region, so idempotence only holds
    on the mask==1 subspace."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 22050)).astype(np.float32)
    X = np.fft.rfft(x, axis=-1)
    X[:, np.asarray(cqt_small._mask) < 0.999999] = 0.0
    xb = jnp.asarray(np.fft.irfft(X, n=22050, axis=-1), jnp.float32)
    y = cqt_small.bwd(cqt_small.fwd(xb), length=22050)
    err = float(jnp.linalg.norm(y - xb) / jnp.linalg.norm(xb))
    assert err < 1e-4, err


def test_bwd_fwd_equals_mask(cqt_small):
    """bwd(fwd(x)) == apply_hpf_DC(x) — the frame-algebra identity."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 22050)), jnp.float32)
    via_transform = cqt_small.bwd(cqt_small.fwd(x), length=22050)
    via_mask = cqt_small.apply_hpf_DC(x)
    assert float(jnp.max(jnp.abs(via_transform - via_mask))) < 1e-4


def test_nyquist_straddling_band():
    """The compat grid's top bin sits AT Nyquist; its window straddles into
    the conjugate mirror.  A tone near Nyquist must round-trip through the
    conj-gather path without energy loss or imaginary leakage."""
    c = CQT(4, 8, FS, 22050, window="kaiser", beta=1.0, mode="oct_pow2")
    t = np.arange(22050) / FS
    f0 = 0.97 * FS / 2
    x = jnp.asarray(np.cos(2 * np.pi * f0 * t)[None], jnp.float32)
    # frame identity: bwd(fwd(x)) == mask . X == apply_hpf_DC(x), exactly —
    # even where the mask is partial (band/Nyquist overlap region)
    xb = c.apply_hpf_DC(x)
    y = c.bwd(c.fwd(x), length=22050)
    assert float(jnp.linalg.norm(y - xb) / (jnp.linalg.norm(xb) + 1e-9)) < 1e-3
    # top-octave coefficients must be finite and nonzero
    top = c.fwd(x)[-1]
    assert bool(jnp.all(jnp.isfinite(jnp.abs(top))))
    assert float(jnp.abs(top).max()) > 0


def test_sinusoid_lands_in_right_bin(cqt_small):
    """A tone at bin k's center frequency peaks in bin k of its octave."""
    k = 20  # global bin index (octave 2, local bin 4)
    f0 = float(cqt_small.freqs[k])
    t = np.arange(22050) / FS
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t)[None], jnp.float32)
    coeffs = cqt_small.fwd(x)
    oct_idx, local = divmod(k, 8)
    mags = jnp.abs(coeffs[oct_idx])[0]  # [bins, M]
    peak_bin = int(jnp.argmax(jnp.max(mags, axis=-1)))
    assert abs(peak_bin - local) <= 1


def test_grid_differs_from_native():
    """Compat uses the LogScale-inclusive grid (odiv = num_octs/(K-1)); the
    top bin sits at Nyquist, unlike native's nyq*2^(-1/bpo)."""
    cn = CQT(4, 8, FS, 22050, mode="native")
    cc = CQT(4, 8, FS, 22050, mode="oct_pow2")
    assert cc.freqs[-1] > cn.freqs[-1]
    assert abs(cc.freqs[-1] - FS / 2) < 1.0
    assert abs(cc.freqs[0] - (FS / 2) / 2**4) < 1.0


def test_jit_and_grad_compat():
    c = CQT(3, 4, FS, 4096, mode="oct_pow2")

    def roundtrip_energy(x):
        return jnp.sum(c.bwd(c.fwd(x), length=4096) ** 2)

    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4096)),
                    jnp.float32)
    g = jax.jit(jax.grad(roundtrip_energy))(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))


# ------------------------------------------------- convention-pinning invariants
# (VERDICT r2 next #3c: numeric invariants that pin the remaining free
# conventions of the re-derived compat frame — coefficient scale on unit
# tones, even-length window split — so a future live-parity run can only
# fail on genuinely unknowable package quirks.)


def test_unit_tone_coefficient_scale_per_octave(cqt_small):
    """Coefficient-scale convention: analysis is plain-ifft (scale 1) with
    window peak 1.0 at slot 0.  For a unit cosine at bin k's on-grid center
    frequency l0, the spectrum is a single spike X[l0] = Ls/2, so
    sum_n c_k[n] == slb[pos=0] == X[l0] * w_peak == Ls/2 EXACTLY.  Any
    change to the scale convention (e.g. the package's sqrt normalization,
    a 2/Ls analysis scale, or a peak-elsewhere window roll) breaks this."""
    c = cqt_small
    Ls = c.Ls
    centers = np.round(np.asarray(c.freqs) * Ls / c.fs).astype(int)
    t = np.arange(Ls)
    for octave in range(c.num_octs):
        k = octave * c.bins_per_oct + c.bins_per_oct // 2
        l0 = centers[k]
        x = jnp.asarray(np.cos(2 * np.pi * l0 * t / Ls)[None], jnp.float32)
        coeffs = c.fwd(x)
        s = complex(jnp.sum(coeffs[octave][0, c.bins_per_oct // 2]))
        expected = Ls / 2.0
        assert abs(s - expected) / expected < 1e-3, (
            f"octave {octave}: sum {s} != {expected}"
        )


def test_even_window_split_convention(cqt_small):
    """Even-length windows are the symmetric (m+1)-point window with the
    LAST sample dropped: support offsets d in [-m/2, m/2-1] — the extra
    sample sits on the NEGATIVE-frequency side.  Pinned directly on the
    plan arrays: peak 1.0 at slot 0, symmetric pairs for |d| < m/2, the
    +m/2 slot empty, the -m/2 slot occupied."""
    c = cqt_small
    Lg = np.asarray([int((p.w_ana[j] != 0).sum())
                     for p in c._plans for j in range(c.bins_per_oct)])
    checked = 0
    for o, p in enumerate(c._plans):
        for j in range(c.bins_per_oct):
            m = int((p.w_ana[j] != 0).sum())
            if m % 2 or m >= p.M:  # need even support without wraparound
                continue
            w = p.w_ana[j]
            assert w[0] == 1.0, "window peak must be 1.0 at slot 0"
            for d in range(1, m // 2):
                left, right = w[(-d) % p.M], w[d % p.M]
                assert abs(left - right) < 1e-6, (o, j, d, left, right)
            assert w[(m // 2) % p.M] == 0.0, "split must drop the +m/2 sample"
            assert w[(-(m // 2)) % p.M] > 0.0, "-m/2 sample must be kept"
            checked += 1
    assert checked > 0, f"no even-length bands found (supports: {Lg})"


def test_octave_ordering_and_dtype(cqt_small):
    """fwd returns lowest octave FIRST (the model consumes X_list[-1-i],
    highest first — reference networks/cqtdiff+.py:743-753), complex64,
    [B, bins_per_oct, M_o] with M_o doubling."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 22050)),
                    jnp.float32)
    coeffs = cqt_small.fwd(x)
    assert len(coeffs) == cqt_small.num_octs
    for o, cs in enumerate(coeffs):
        assert cs.dtype == jnp.complex64
        assert cs.shape == (1, cqt_small.bins_per_oct, cqt_small.M[o])
    # energy concentrates with frequency ordering: a high tone lands in the
    # LAST tuple entry, a low tone in the FIRST
    t = np.arange(22050) / FS
    hi = jnp.asarray(np.sin(2 * np.pi * 0.8 * FS / 2 * t)[None], jnp.float32)
    lo = jnp.asarray(np.sin(2 * np.pi * FS / 2 / 2**4 * 1.1 * t)[None],
                     jnp.float32)
    ch, cl = cqt_small.fwd(hi), cqt_small.fwd(lo)
    eh = [float(jnp.sum(jnp.abs(c) ** 2)) for c in ch]
    el = [float(jnp.sum(jnp.abs(c) ** 2)) for c in cl]
    assert int(np.argmax(eh)) == cqt_small.num_octs - 1
    assert int(np.argmax(el)) == 0


# ---------------------------------------------------------------- live parity
try:  # pragma: no cover - activates when the real package is available
    import torch  # noqa: F401
    from cqt_nsgt_pytorch import CQT_nsgt  # type: ignore

    HAVE_PKG = True
except Exception:
    HAVE_PKG = False


@pytest.mark.skipif(not HAVE_PKG, reason="cqt_nsgt_pytorch not installed")
def test_parity_against_real_package():
    """Numerical parity vs the package the checkpoint was trained with.
    Runs automatically once cqt_nsgt_pytorch is installable."""
    import torch

    num_octs, bpo, L = 4, 8, 22050
    ref = CQT_nsgt(num_octs, bpo, mode="oct", window=("kaiser", 1.0),
                   fs=int(FS), audio_len=L, dtype=torch.float32)
    ours = CQT(num_octs, bpo, FS, L, window="kaiser", beta=1.0,
               mode="oct_pow2")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, L)).astype(np.float32)
    ref_out = ref.fwd(torch.from_numpy(x).unsqueeze(1))
    our_out = ours.fwd(jnp.asarray(x))
    assert len(ref_out) == len(our_out)
    for r, o in zip(ref_out, our_out):
        r = r.squeeze(1).numpy()
        o = np.asarray(o)
        assert r.shape == o.shape, (r.shape, o.shape)
        denom = np.abs(r).max() + 1e-9
        assert np.abs(r - o).max() / denom < 1e-3
