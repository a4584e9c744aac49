"""Sampler tests: scan-vs-loop parity, guided sampling, blind filter fitting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from babe_tpu.diffusion.edm import EDM, EDMParams
from babe_tpu.ops.filters import design_filter
from babe_tpu.ops.stft import apply_stft, rfftfreq
from babe_tpu.sampling.blind import BlindConfig, BlindSampler
from babe_tpu.sampling.degradations import make_fir, make_mask
from babe_tpu.sampling.heun import Sampler, SamplerConfig
from babe_tpu.ops.fir import get_FIR_lowpass

FS = 22050.0
LEN = 2048


def toy_denoiser(x, sigma):
    """An analytically known denoiser: prior x ~ N(0, I) gives
    D(x) = x / (1 + sigma^2). Lets us test sampler mechanics without a net."""
    return x / (1.0 + sigma**2)


@pytest.fixture
def edm():
    return EDM(EDMParams(sigma_data=1.0, sigma_min=1e-4, sigma_max=1.0, ro=8,
                         ro_train=8, Schurn=5))


def python_reference_heun(x, t, gamma, denoiser, key):
    """Literal translation of the reference loop (edm_sampler.py:184-229),
    deterministic when gamma == 0."""
    T = len(t) - 1
    for i in range(T):
        assert float(gamma[i]) == 0.0
        t_hat = t[i]
        x_hat = x
        x_den = denoiser(x_hat, t_hat)
        score = (x_den - x_hat) / t_hat**2
        d = -t_hat * score
        h = t[i + 1] - t_hat
        if t[i + 1] != 0:
            x_prime = x_hat + h * d
            score2 = (denoiser(x_prime, t[i + 1]) - x_prime) / t[i + 1] ** 2
            d_prime = -t[i + 1] * score2
            x = x_hat + h * 0.5 * (d + d_prime)
        else:
            x = x_hat + h * d
    return x


def test_scan_matches_python_loop(edm):
    """With Schurn=0 the scan must reproduce the reference recursion exactly."""
    edm0 = EDM(edm.p.updated(Schurn=0.0))
    cfg = SamplerConfig(T=12, order=2, xi=0.0, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=False)
    s = Sampler(toy_denoiser, edm0, cfg)
    key = jax.random.PRNGKey(3)
    x = s.predict_unconditional(key, (2, LEN))

    t = np.asarray(edm0.create_schedule(12))
    gamma = np.asarray(edm0.get_gamma(jnp.asarray(t)))
    k0 = jax.random.split(key)[1]
    x0 = np.asarray(jax.random.normal(k0, (2, LEN))) * t[0]
    x_ref = python_reference_heun(x0, t, gamma, toy_denoiser, key)
    # fp32 scan vs fp64 python loop: accumulation differences only
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=2e-3)


def test_unconditional_statistics(edm):
    """Sampling from the N(0,1) prior model should return ~unit-variance noise."""
    cfg = SamplerConfig(T=20, order=2, xi=0.0, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=False)
    s = Sampler(toy_denoiser, edm, cfg)
    x = s.predict_unconditional(jax.random.PRNGKey(0), (4, LEN))
    assert np.all(np.isfinite(np.asarray(x)))
    std = float(jnp.std(x))
    assert 0.6 < std < 1.4


def test_guided_inpainting(edm):
    """Reconstruction guidance pulls samples toward the observed region."""
    cfg = SamplerConfig(T=15, order=2, xi=0.5, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=False,
                        norm_fn=lambda y, d: jnp.sqrt(jnp.sum((y - d) ** 2)))
    s = Sampler(toy_denoiser, edm, cfg)
    mask = jnp.zeros((1, LEN)).at[:, : LEN // 2].set(1.0)
    target = jax.random.normal(jax.random.PRNGKey(9), (1, LEN)) * mask
    x = s.predict_inpainting(jax.random.PRNGKey(1), target, mask)
    assert np.all(np.isfinite(np.asarray(x)))
    err_obs = float(jnp.mean((x * mask - target)[:, : LEN // 2] ** 2))
    assert err_obs < 0.5  # much closer than an independent prior draw (~2.0)


def test_bwe_fir(edm):
    cfg = SamplerConfig(T=8, order=2, xi=0.25, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=False,
                        norm_fn=lambda y, d: jnp.sqrt(jnp.sum((y - d) ** 2)))
    s = Sampler(toy_denoiser, edm, cfg)
    taps = get_FIR_lowpass(101, 2000.0, 1.0, FS)
    y = make_fir(taps)(jax.random.normal(jax.random.PRNGKey(2), (1, LEN)))
    x = s.predict_bwe(jax.random.PRNGKey(4), y, taps, "firwin")
    assert x.shape == y.shape
    assert np.all(np.isfinite(np.asarray(x)))


def blind_sampler(edm, T=8, xi=0.25, max_iter=40):
    cfg = SamplerConfig(T=T, order=2, xi=xi, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=False, start_sigma=0.2,
                        norm_fn=lambda y, d: jnp.sqrt(jnp.sum((y - d) ** 2)))
    blind = BlindConfig(
        nfft=512, sample_rate=FS, max_iter=max_iter,
        init_fc=(1000.0,), init_A=(-20.0,), fcmax=FS / 2,
    )
    return BlindSampler(toy_denoiser, edm, cfg, blind)


def test_fit_params_recovers_filter(edm, rng):
    """The projected-GD inner loop should recover a known 1-slope lowpass."""
    s = blind_sampler(edm, max_iter=400)
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    true_params = jnp.asarray([[3000.0], [-40.0]])
    y = s.degradation_fcA(x, true_params)
    Xden = apply_stft(x, s.blind.nfft)
    Y = apply_stft(y, s.blind.nfft)
    est = s.fit_params(Xden, Y, s.blind.initial_params()[:, :1] * 0 + jnp.asarray([[500.0], [-10.0]]))
    fc_est = float(est[0, 0])
    assert 2000.0 < fc_est < 4500.0, f"fc estimate {fc_est} too far from 3000"


def test_fit_params_near_converged_no_nan(edm, rng):
    """Regression: when the initial params already match the true filter,
    the sufficient-statistics quadratic form H^2*a - 2*H*b + c cancels to
    ~0 and fp32 rounding can drive it negative — the sqrt must not NaN and
    the fit must return finite params (clamp in _objective_from_stats)."""
    s = blind_sampler(edm, max_iter=50)
    true_params = jnp.asarray([[3000.0], [-40.0]])
    # stats constructed so the quadratic form cancels to an exactly NEGATIVE
    # sum at true_params (the fp32-rounding regime, made deterministic):
    # a=1, b=H, c=H^2-eps  =>  s = sum(H^2 - 2H^2 + H^2 - eps) = -eps*len
    H = design_filter(true_params[0], true_params[1], s.freqs)
    stats = (jnp.ones_like(H), H, H * H - 1e-6)
    obj = s._objective_from_stats(stats, true_params)
    g = jax.grad(lambda p: s._objective_from_stats(stats, p))(true_params)
    assert np.isfinite(float(obj)), "sqrt of negative cancelled sum NaN'd"
    assert np.all(np.isfinite(np.asarray(g))), "gradient through clamp NaN'd"
    # and the real fit path starting AT the optimum stays finite + in place
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    y = s.degradation_fcA(x, true_params)
    Xden = apply_stft(x, s.blind.nfft)
    Y = apply_stft(y, s.blind.nfft)
    est = s.fit_params(Xden, Y, true_params)
    assert np.all(np.isfinite(np.asarray(est)))
    assert abs(float(est[0, 0]) - 3000.0) < 300.0


def test_predict_blind_bwe_runs(edm):
    s = blind_sampler(edm, T=6, max_iter=10)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, LEN)) * 0.5
    x, params = s.predict_blind_bwe(jax.random.PRNGKey(6), y)
    assert x.shape == y.shape
    assert params.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(x)))
    assert np.all(np.isfinite(np.asarray(params)))


def test_predict_blind_bwe_rid(edm):
    s = blind_sampler(edm, T=5, max_iter=5)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, LEN)) * 0.5
    x, params, dens, t, filts, scores = s.predict_blind_bwe(
        jax.random.PRNGKey(6), y, rid=True
    )
    assert dens.shape == (5, 1, LEN)
    assert filts.shape == (5, 2, 1)
    assert t.shape == (6,)
    # score trajectory (reference blind_bwe_sampler.py:417,463,491 data_score)
    assert scores.shape == (5, 1, LEN)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_shared_stft_guidance_gradient_matches_direct(edm, rng):
    """The single-STFT guidance chain (stft vjp -> objective vjp, VERDICT r3
    #2) must produce the same gradient as directly differentiating
    norm_fn(y, apply_filter(x, H)) — the form the stage() used before."""
    from babe_tpu.ops.stft import apply_filter_istft, apply_filter

    nfft = 1024
    L = 4096
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.3)
    freqs = jnp.asarray(rfftfreq(nfft, FS))
    H = design_filter(jnp.asarray([2000.0]), jnp.asarray([-30.0]), freqs)
    norm_fn = lambda a, b: jnp.sqrt(jnp.sum((a - b) ** 2))

    g_direct = jax.grad(
        lambda xd: norm_fn(y, apply_filter(xd, H, nfft)))(x)

    X, stft_pull = jax.vjp(lambda x_: apply_stft(x_, nfft), x)

    def obj_from_X(Xv):
        return norm_fn(y, apply_filter_istft(Xv, H, nfft)[..., :L])

    val, obj_pull = jax.vjp(obj_from_X, X)
    g_shared = stft_pull(obj_pull(jnp.ones_like(val))[0])[0]
    np.testing.assert_allclose(np.asarray(g_shared), np.asarray(g_direct),
                               rtol=1e-5, atol=1e-7)


def test_predict_bwe_ar(edm):
    s = blind_sampler(edm, T=5, max_iter=5)
    mask = jnp.zeros((1, LEN)).at[:, : LEN // 4].set(1.0)
    y_prev = jax.random.normal(jax.random.PRNGKey(7), (1, LEN))
    ylpf = jax.random.normal(jax.random.PRNGKey(8), (1, LEN)) * 0.3
    params = jnp.asarray([[2000.0], [-30.0]])
    x = s.predict_bwe_AR(jax.random.PRNGKey(9), ylpf, y_prev, params, "fc_A",
                         mask, smooth_mask_size=50)
    assert x.shape == (1, LEN)
    assert np.all(np.isfinite(np.asarray(x)))


def test_compute_sweep(edm, rng):
    s = blind_sampler(edm)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    y = s.degradation_fcA(x, jnp.asarray([[2000.0], [-30.0]]))
    norms, grads = s.compute_sweep(x, y, fc_s=jnp.logspace(2.5, 4, 5),
                                   A_s=jnp.linspace(-60, -10, 4))
    assert norms.shape == (5, 4)
    assert grads.shape == (5, 4, 2)


def test_informed_bwe_filter_fit_tracking(edm):
    """Diagnostic filter tracking during informed fc_A sampling."""
    s = blind_sampler(edm, T=5, max_iter=5)
    params = jnp.asarray([[2000.0], [-30.0]])
    y = s.degradation_fcA(jax.random.normal(jax.random.PRNGKey(2), (1, LEN)), params)
    x, dens, t, filts = s.predict_bwe(jax.random.PRNGKey(3), y, params, "fc_A",
                                      test_filter_fit=True)
    assert x.shape == y.shape
    assert dens.shape[0] == 5 and filts.shape == (5, 2, 1)
    assert np.all(np.isfinite(np.asarray(filts)))
