"""EDM diffusion parameterization (Karras et al. 2022), functional-core JAX.

Mirrors the reference formulas exactly (diff_params/edm.py:7-207) but as pure
functions on a frozen parameter dataclass, so schedules/preconditioning trace
into jit and the trainer/sampler stay functional.

Formula parity notes (reference line cites):
  * cskip/cout/cin/cnoise               diff_params/edm.py:108-139
  * denoiser D(x) = cskip x + cout net  :144-159
  * rho-schedule with the reference's (nb_steps-1) divisor quirk and t[-1]=0  :55-64
  * warm-start schedule from initial_t  :66-75
  * training-sigma sampling uses the schedule distribution (ro_train)  :88-96
  * gamma stochasticity (Schurn capped at sqrt(2)-1, St window)  :38-53
  * loss target (x - cskip(x+n))/cout with optional CQT DC correction and
    A-weighting  :161-206
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable

import jax
import jax.numpy as jnp

from babe_tpu.ops.aweighting import aweighting_fir
from babe_tpu.ops.fir import apply_fir


@dataclass(frozen=True)
class EDMParams:
    sigma_data: float = 0.063
    sigma_min: float = 1e-5
    sigma_max: float = 10.0
    ro: float = 13.0
    ro_train: float = 10.0
    Schurn: float = 5.0
    Snoise: float = 1.0
    Stmin: float = 0.0
    Stmax: float = 50.0
    P_mean: float = -1.2
    P_std: float = 1.2

    @classmethod
    def from_config(cls, dp: Any) -> "EDMParams":
        """Build from a diff_params config node (training or tester block)."""
        def get(k, d):
            try:
                v = dp[k]
            except (KeyError, TypeError):
                return d
            return float(v)

        return cls(
            sigma_data=get("sigma_data", 0.063),
            sigma_min=get("sigma_min", 1e-5),
            sigma_max=get("sigma_max", 10.0),
            ro=get("ro", 13.0),
            ro_train=get("ro_train", 10.0),
            Schurn=get("Schurn", 5.0),
            Snoise=get("Snoise", 1.0),
            Stmin=get("Stmin", 0.0),
            Stmax=get("Stmax", 50.0),
            P_mean=get("P_mean", -1.2),
            P_std=get("P_std", 1.2),
        )

    def updated(self, **kw) -> "EDMParams":
        return replace(self, **kw)


class EDM:
    """EDM preconditioning + schedules + loss.

    ``net`` passed to :meth:`denoiser`/:meth:`loss_fn` is any callable
    ``net(x[B,T], cnoise[B,1]) -> x_hat[B,T]`` (already bound to parameters).
    """

    def __init__(self, p: EDMParams, aweighting: bool = False,
                 aweighting_ntaps: int = 101, sample_rate: float = 22050.0,
                 cqt_hpf: Callable | None = None):
        self.p = p
        self.use_aweighting = aweighting
        self._aw_taps = (
            aweighting_fir(sample_rate, aweighting_ntaps) if aweighting else None
        )
        self.cqt_hpf = cqt_hpf  # optional apply_hpf_DC for the loss correction

    @classmethod
    def from_config(cls, args: Any, cqt_hpf: Callable | None = None) -> "EDM":
        dp = args.diff_params
        aw = bool(dp.get_path("aweighting.use_aweighting", False))
        return cls(
            EDMParams.from_config(dp),
            aweighting=aw,
            aweighting_ntaps=int(dp.get_path("aweighting.ntaps", 101)),
            sample_rate=float(args.exp.sample_rate),
            cqt_hpf=cqt_hpf,
        )

    # ------------------------------------------------------------ precond

    def cskip(self, sigma):
        sd2 = self.p.sigma_data**2
        return sd2 / (sigma**2 + sd2)

    def cout(self, sigma):
        sd = self.p.sigma_data
        return sigma * sd * (sd**2 + sigma**2) ** -0.5

    def cin(self, sigma):
        return (self.p.sigma_data**2 + sigma**2) ** -0.5

    def cnoise(self, sigma):
        return 0.25 * jnp.log(sigma)

    def lambda_w(self, sigma):
        return (sigma * self.p.sigma_data) ** -2 * (self.p.sigma_data**2 + sigma**2)

    def denoiser(self, xn, net, sigma):
        """D(x; sigma) = cskip*x + cout*net(cin*x, cnoise)
        (reference: diff_params/edm.py:144-159). sigma: [B,1] or scalar."""
        sigma = jnp.asarray(sigma)
        if sigma.ndim == 0:
            sigma = sigma[None, None]
        elif sigma.ndim == 1:
            sigma = sigma[:, None]
        return self.cskip(sigma) * xn + self.cout(sigma) * net(
            self.cin(sigma) * xn, self.cnoise(sigma)
        )

    # ------------------------------------------------------------ schedules

    def create_schedule(self, nb_steps: int) -> jnp.ndarray:
        """rho-schedule, nb_steps+1 entries, last forced to 0
        (reference: diff_params/edm.py:55-64, including the (nb_steps-1) divisor)."""
        p = self.p
        i = jnp.arange(0, nb_steps + 1)
        t = (
            p.sigma_max ** (1 / p.ro)
            + i / (nb_steps - 1) * (p.sigma_min ** (1 / p.ro) - p.sigma_max ** (1 / p.ro))
        ) ** p.ro
        return t.at[-1].set(0.0)

    def create_schedule_from_initial_t(self, initial_t: float, nb_steps: int) -> jnp.ndarray:
        """Warm-start schedule (reference: diff_params/edm.py:66-75)."""
        p = self.p
        i = jnp.arange(0, nb_steps + 1)
        t = (
            initial_t ** (1 / p.ro)
            + i / (nb_steps - 1) * (p.sigma_min ** (1 / p.ro) - initial_t ** (1 / p.ro))
        ) ** p.ro
        return t.at[-1].set(0.0)

    def get_gamma(self, t: jnp.ndarray) -> jnp.ndarray:
        """Per-step stochasticity (reference: diff_params/edm.py:38-53)."""
        p = self.p
        N = t.shape[0]
        inside = jnp.logical_and(t > p.Stmin, t < p.Stmax)
        g = jnp.minimum(p.Schurn / N, 2 ** 0.5 - 1)
        return jnp.where(inside, g, 0.0)

    # ------------------------------------------------------------ training

    def sample_ptrain_safe(self, key, N: int) -> jnp.ndarray:
        """sigma ~ schedule distribution with ro_train
        (reference: diff_params/edm.py:88-96)."""
        p = self.p
        a = jax.random.uniform(key, (N,))
        return (
            p.sigma_max ** (1 / p.ro_train)
            + a * (p.sigma_min ** (1 / p.ro_train) - p.sigma_max ** (1 / p.ro_train))
        ) ** p.ro_train

    def sample_ptrain_lognormal(self, key, N: int) -> jnp.ndarray:
        """Karras lognormal (defined but unused by the reference,
        diff_params/edm.py:78-86)."""
        p = self.p
        ln = jax.random.normal(key, (N,)) * p.P_std + p.P_mean
        return jnp.clip(jnp.exp(ln), p.sigma_min, p.sigma_max)

    def sample_prior(self, key, shape, sigma) -> jnp.ndarray:
        return jax.random.normal(key, shape) * sigma

    def prepare_train_preconditioning(self, key, x, sigma):
        """(input, target, cnoise) (reference: diff_params/edm.py:161-174)."""
        noise = self.sample_prior(key, x.shape, sigma)
        cskip, cout, cin = self.cskip(sigma), self.cout(sigma), self.cin(sigma)
        target = (1.0 / cout) * (x - cskip * (x + noise))
        return cin * (x + noise), target, self.cnoise(sigma)

    def loss_fn(self, key, net, x, use_cqt_DC_correction: bool = False):
        """Per-sample squared error and the sigmas used
        (reference: diff_params/edm.py:177-206)."""
        k_sigma, k_noise = jax.random.split(key)
        sigma = self.sample_ptrain_safe(k_sigma, x.shape[0])[:, None]
        inp, target, cnoise = self.prepare_train_preconditioning(k_noise, x, sigma)
        estimate = net(inp, cnoise)
        error = estimate - target
        if use_cqt_DC_correction and self.cqt_hpf is not None:
            error = self.cqt_hpf(error)
        if self.use_aweighting:
            error = apply_fir(error, self._aw_taps)
        return error**2, sigma
