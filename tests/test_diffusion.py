"""EDM math unit tests (SURVEY.md §4: precond identities, schedule endpoints)
with golden values from the reference formulas executed in torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from babe_tpu.diffusion.edm import EDM, EDMParams
from babe_tpu.diffusion.edm_eps import EDMEps
from babe_tpu.diffusion.edm_pd import EDMPD


def edm():
    return EDM(EDMParams())  # published MAESTRO defaults


def test_precond_identities():
    e = edm()
    sd = e.p.sigma_data
    for sig in (1e-4, 0.063, 1.0, 10.0):
        s = jnp.asarray(sig)
        # Karras identities: cskip + (cout/sigma)*? -> check literal formulas
        assert np.isclose(float(e.cskip(s)), sd**2 / (sig**2 + sd**2))
        assert np.isclose(float(e.cout(s)), sig * sd / np.sqrt(sd**2 + sig**2))
        assert np.isclose(float(e.cin(s)), 1 / np.sqrt(sd**2 + sig**2))
        assert np.isclose(float(e.cnoise(s)), 0.25 * np.log(sig))
        # EDM invariant: cout^2 + (sigma_data*cin*sigma... ) variance preserving
        assert np.isclose(
            float(e.cskip(s)) ** 2 * sig**2 + float(e.cout(s)) ** 2,
            sig**2 * sd**2 / (sig**2 + sd**2) + sd**4 * sig**2 / (sig**2 + sd**2) ** 2,
        )


def test_schedule_matches_reference_torch():
    """Golden values: the literal torch formula from diff_params/edm.py:55-64."""
    e = edm()
    T = 35
    ours = np.asarray(e.create_schedule(T))
    i = torch.arange(0, T + 1)
    ro, smin, smax = e.p.ro, e.p.sigma_min, e.p.sigma_max
    t = (smax ** (1 / ro) + i / (T - 1) * (smin ** (1 / ro) - smax ** (1 / ro))) ** ro
    t[-1] = 0
    np.testing.assert_allclose(ours, t.numpy(), rtol=1e-5)
    assert np.isclose(ours[0], e.p.sigma_max, rtol=1e-5)
    assert np.isclose(ours[T - 1], e.p.sigma_min, rtol=1e-4)
    assert ours[T] == 0.0


def test_warm_start_schedule():
    e = edm()
    t = np.asarray(e.create_schedule_from_initial_t(0.2, 35))
    assert np.isclose(t[0], 0.2, rtol=1e-5)
    assert t[-1] == 0.0
    assert np.all(np.diff(t[:-1]) < 0)


def test_gamma():
    e = EDM(EDMParams(Schurn=5, Stmin=0, Stmax=50))
    t = e.create_schedule(35)
    g = np.asarray(e.get_gamma(t))
    assert np.isclose(g[0], min(5 / 36, 2**0.5 - 1))
    assert g[-1] == 0.0  # t == 0 is not > Stmin


def test_sample_ptrain_range():
    e = edm()
    s = np.asarray(e.sample_ptrain_safe(jax.random.PRNGKey(0), 1000))
    assert s.min() >= e.p.sigma_min * 0.99
    assert s.max() <= e.p.sigma_max * 1.01


def test_loss_fn_perfect_denoiser():
    """A perfect net (predicting the target) gives ~zero loss."""
    e = edm()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256)) * e.p.sigma_data

    captured = {}

    def oracle_net(inp, cnoise):
        sigma = jnp.exp(4.0 * cnoise)
        # reconstruct the exact target from the loss definition:
        # input = cin(x+n); target = (x - cskip(x+n))/cout
        xn = inp / e.cin(sigma)
        return (x - e.cskip(sigma) * xn) / e.cout(sigma)

    err2, sigma = e.loss_fn(jax.random.PRNGKey(2), oracle_net, x)
    assert float(err2.mean()) < 1e-6


def test_eps_variant_roundtrips():
    e = EDMEps(EDMParams(), T=10, gamma0=-13.3, gamma1=5.0)
    g = jnp.asarray([-5.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(e.t_to_gamma(e.gamma_to_t(g))), np.asarray(g), rtol=1e-5
    )
    sig = jnp.asarray([0.01, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(e.gamma_to_sigma(e.sigma_to_gamma(sig))), np.asarray(sig),
        rtol=1e-5,
    )
    a, s = e.gamma_2_as(jnp.asarray(0.0))
    assert np.isclose(float(a**2 + s**2), 1.0)


def test_eps_ddim_runs():
    e = EDMEps(EDMParams(), T=8)
    net = lambda z, t: z * 0.1  # dummy eps predictor
    out = e.reverse_process_ddim(jax.random.PRNGKey(0), (1, 128), net)
    assert out.shape == (1, 128)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pd_loss_and_sample():
    p = EDMParams(sigma_min=1e-3, sigma_max=1.0, ro=7)
    e = EDMPD(p, boundaries_T=8)
    net = lambda xn, cn: xn * 0.5
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128)) * 0.1
    err2, sig = e.loss_fn_PD(jax.random.PRNGKey(1), net, net, x, stage=0)
    assert np.all(np.isfinite(np.asarray(err2)))
    z = e.PD_sample(jax.random.PRNGKey(2), 1, 128, net, stage=0)
    assert np.all(np.isfinite(np.asarray(z)))
