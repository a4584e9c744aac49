"""NSGT-CQT invariants (SURVEY.md §4: unit layer — PR, adjointness, shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from babe_tpu.ops.cqt import CQT, next_fast_len

FS = 22050.0
LEN = 22050 * 2  # small config for speed


@pytest.fixture(scope="module")
def cqt():
    return CQT(7, 64, FS, LEN)


def test_next_fast_len():
    assert next_fast_len(184184) == 184320
    for n in (100, 257, 44100):
        m = next_fast_len(n)
        assert m >= n and m % 2 == 0
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        assert k == 1


def test_shapes_halving(cqt):
    x = jnp.zeros((3, LEN))
    C = cqt.fwd(x)
    assert len(C) == 7
    for o in range(7):
        b, m = C[o].shape[1:]
        assert b == 64
        assert C[o].dtype == jnp.complex64
        if o > 0:
            assert m == 2 * C[o - 1].shape[-1]
    assert cqt.bwd(C).shape == (3, LEN)


def test_bwdfwd_equals_hpf_mask(cqt, rng):
    """bwd(fwd(x)) must equal apply_hpf_DC(x) — both are the octave-band mask."""
    x = jnp.asarray(rng.standard_normal((2, LEN)).astype(np.float32))
    a = cqt.bwd(cqt.fwd(x))
    b = cqt.apply_hpf_DC(x)
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-5


def test_perfect_reconstruction_bandlimited(cqt, rng):
    """Exact PR (fp32 level) for signals inside the flat region of the mask."""
    Ls = cqt.Ls
    x = rng.standard_normal((2, Ls))
    X = np.fft.rfft(x, axis=-1)
    fr = np.fft.rfftfreq(Ls, 1 / FS)
    X[:, ~((fr > 200) & (fr < 10000))] = 0
    xb = np.fft.irfft(X, n=Ls, axis=-1).astype(np.float32)
    xr = cqt.bwd(cqt.fwd(jnp.asarray(xb)), length=Ls)
    assert np.linalg.norm(xr - xb) / np.linalg.norm(xb) < 1e-5


def test_mask_flat_band(cqt):
    m = cqt._mask
    fr = np.fft.rfftfreq(cqt.Ls, 1 / FS)
    flat = np.abs(m - 1) < 1e-5
    assert flat.mean() > 0.9
    # the octave band region [fmin, fmax] should be essentially all flat
    inner = (fr > cqt.freqs[0] * 1.1) & (fr < cqt.freqs[-1] * 0.98)
    assert flat[inner].mean() > 0.999


def test_tone_coefficient_scale(cqt):
    """A unit sinusoid at a bin center produces coefficients of magnitude ~1."""
    k = 5 * 64 + 32
    t = np.arange(LEN) / FS
    tone = np.sin(2 * np.pi * cqt.freqs[k] * t).astype(np.float32)[None]
    C = cqt.fwd(jnp.asarray(tone))
    peak = float(jnp.abs(C[5]).max())
    assert 0.5 < peak < 2.0


def test_differentiable(cqt, rng):
    x = jnp.asarray(rng.standard_normal((1, LEN)).astype(np.float32))

    def loss(x):
        C = cqt.fwd(x)
        y = cqt.bwd(C)
        return jnp.sum(y**2) + sum(jnp.sum(jnp.abs(c) ** 2) for c in C)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_vjp_jvp_consistency(cqt, rng):
    """bwd is linear; its vjp must be the transpose of its jvp:
    <x_cot, jvp(dC)> == Re<vjp(x_cot), dC> (JAX complex-cotangent convention)."""
    key = jax.random.PRNGKey(0)
    dC = tuple(
        jax.random.normal(jax.random.fold_in(key, o), (1, 64, m), dtype=jnp.complex64)
        for o, m in enumerate(cqt.M)
    )
    x_cot = jnp.asarray(rng.standard_normal((1, LEN)).astype(np.float32))
    zeros = tuple(jnp.zeros_like(c) for c in dC)
    # bwd is linear, so its jvp IS bwd itself (forward-mode is unavailable
    # through the scatter-free custom_vjp)
    y_dot = cqt.bwd(dC)
    _, vjp = jax.vjp(lambda z: cqt.bwd(z), zeros)
    ct = vjp(x_cot)[0]
    lhs = float(jnp.sum(x_cot * y_dot))
    rhs = float(
        sum(jnp.sum(g * c).real for c, g in zip(dC, jax.tree.leaves(ct)))
    )
    assert abs(lhs - rhs) / (abs(lhs) + 1e-9) < 1e-3


def test_jit_compatible(cqt, rng):
    x = jnp.asarray(rng.standard_normal((1, LEN)).astype(np.float32))
    f = jax.jit(lambda x: cqt.bwd(cqt.fwd(x)))
    a = f(x)
    b = cqt.bwd(cqt.fwd(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_small_configs():
    """Other published configs build: 16 kHz CocoChorales-style, short audio."""
    for num_octs, bpo, fs, length in [(7, 64, 16000.0, 16000), (5, 32, 22050.0, 8192)]:
        c = CQT(num_octs, bpo, fs, length)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, length)), dtype=jnp.float32)
        C = c.fwd(x)
        y = c.bwd(C)
        assert y.shape == (1, length)
        assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("mode", ["native", "oct_pow2"])
def test_cqt_custom_vjp_matches_autodiff(rng, mode):
    """The scatter-free custom vjps of fwd_spectrum/bwd_spectrum must equal
    jax's own transposition of the gather implementations (which lowers to
    TPU scatters — the reason for the custom path)."""
    import jax

    c = CQT(3, 8, 4096.0, 2048, window="kaiser", beta=1.0, mode=mode)
    n_rbins = c.Ls // 2 + 1
    X = jnp.asarray((rng.standard_normal((2, n_rbins))
                     + 1j * rng.standard_normal((2, n_rbins))).astype(np.complex64))

    # fwd_spectrum adjoint
    coeffs, vjp_custom = jax.vjp(c.fwd_spectrum, X)
    _, vjp_auto = jax.vjp(c._fwd_spectrum_impl, X)
    gs = tuple(
        jnp.asarray((rng.standard_normal(co.shape)
                     + 1j * rng.standard_normal(co.shape)).astype(np.complex64))
        for co in coeffs
    )
    np.testing.assert_allclose(np.asarray(vjp_custom(gs)[0]),
                               np.asarray(vjp_auto(gs)[0]),
                               rtol=1e-4, atol=1e-4)

    # bwd_spectrum adjoint
    Y, bvjp_custom = jax.vjp(c.bwd_spectrum, coeffs)
    _, bvjp_auto = jax.vjp(c._bwd_spectrum_impl, coeffs)
    gY = jnp.asarray((rng.standard_normal(Y.shape)
                      + 1j * rng.standard_normal(Y.shape)).astype(np.complex64))
    for a, b in zip(bvjp_custom(gY)[0], bvjp_auto(gY)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cqt_grad_through_roundtrip(rng):
    """End-to-end gradient through fwd+bwd equals the autodiff of the
    implementation path (guided-sampling usage)."""
    import jax

    c = CQT(3, 8, 4096.0, 2048, window="kaiser", beta=1.0, mode="native")
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))

    def loss_pub(x):
        return jnp.sum(jnp.abs(c.bwd(c.fwd(x), length=2048)) ** 2)

    def loss_impl(x):
        X = c.spectrum(x)
        Y = c._bwd_spectrum_impl(c._fwd_spectrum_impl(X))
        y = jnp.fft.irfft(Y, n=c.Ls, axis=-1)[..., :2048]
        return jnp.sum(jnp.abs(y) ** 2)

    gp = jax.grad(loss_pub)(x)
    gi = jax.grad(loss_impl)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gi),
                               rtol=1e-3, atol=1e-4)
