"""Epsilon/VDM-style EDM variant for running diffwave-sr-type checkpoints.

Re-implementation of diff_params/edm_eps.py (333 LoC): a logSNR-linear
scheduler with gamma<->t<->sigma<->(alpha, s) conversions, a DDIM reverse
process, and a denoiser that maps the EDM sigma onto the (a, s)
parameterization and returns x0 = (z - s*eps_hat)/a.

Training side (create_schedule, sample_ptrain_safe,
prepare_train_preconditioning, loss_fn) is inherited from EDM *on purpose*:
the reference's eps-file "overrides" (diff_params/edm_eps.py:157-333) are
formula-identical copies of the base EDM methods (diff_params/edm.py:55-206)
— the eps parameterization only changes the DENOISER mapping, not the
training loss pipeline.  tests/test_edm_eps_parity.py proves every
training-side quantity numerically against the reference module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from babe_tpu.diffusion.edm import EDM, EDMParams


class EDMEps(EDM):
    def __init__(self, p: EDMParams, T: int = 1000, gamma0: float = -13.3,
                 gamma1: float = 5.0, **kw):
        super().__init__(p, **kw)
        self.T = int(T)
        self.gamma0 = float(gamma0)
        self.gamma1 = float(gamma1)

    @classmethod
    def from_config(cls, args, cqt_hpf=None) -> "EDMEps":
        dp = args.diff_params
        return cls(
            EDMParams.from_config(dp),
            T=int(dp.get("T", 1000)),
            gamma0=float(dp.get_path("scheduler.gamma0", -13.3)),
            gamma1=float(dp.get_path("scheduler.gamma1", 5.0)),
            cqt_hpf=cqt_hpf,
        )

    # ------------------------------------------ scheduler conversions
    # (reference: diff_params/edm_eps.py:52-114)

    def logsnr_linear(self, t):
        t = jnp.clip(t, 0.0, 1.0)
        return self.gamma0 * (1 - t) + self.gamma1 * t, t

    def gamma_to_t(self, gamma):
        return (gamma - self.gamma0) / (self.gamma1 - self.gamma0)

    def t_to_gamma(self, t):
        return self.gamma0 + t * (self.gamma1 - self.gamma0)

    def gamma_2_as(self, gamma):
        var = jax.nn.sigmoid(gamma)
        return jnp.sqrt(1 - var), jnp.sqrt(var)

    def gamma_to_sigma(self, gamma):
        return jnp.sqrt(jnp.exp(gamma))

    def sigma_to_gamma(self, sigma):
        return jnp.log(sigma**2)

    def sigma_to_t(self, sigma):
        return self.gamma_to_t(self.sigma_to_gamma(sigma))

    def gamma2logas(self, g):
        log_var = -jax.nn.softplus(-g)
        return 0.5 * (-g + log_var), log_var

    # ------------------------------------------------------- denoiser

    def denoiser(self, xn, net, sigma):
        """sigma -> (a, s); x0 = (z - s*eps_hat)/a
        (reference: diff_params/edm_eps.py:248-287)."""
        sigma = jnp.asarray(sigma)
        if sigma.ndim == 0:
            sigma = sigma[None, None]
        elif sigma.ndim == 1:
            sigma = sigma[:, None]
        gamma = self.sigma_to_gamma(sigma)
        t = self.gamma_to_t(gamma)
        a, s = self.gamma_2_as(gamma)
        z_t = a * xn
        t = jnp.broadcast_to(t, (z_t.shape[0], 1))
        eps_hat = net(z_t, t)
        return (-s * eps_hat + z_t) / a

    # -------------------------------------------------- DDIM reverse

    def reverse_process_ddim(self, key, shape, net):
        """(reference: diff_params/edm_eps.py:116-139) as a lax.scan."""
        tt = jnp.linspace(0.0, 1.0, self.T + 1)
        gamma, steps = self.logsnr_linear(tt)
        Pm1 = -jnp.expm1((gamma[1:] - gamma[:-1]) * 0.5)
        log_alpha, log_var = self.gamma2logas(gamma)
        alpha_st = jnp.exp(log_alpha[:-1] - log_alpha[1:])
        std = jnp.exp(0.5 * log_var)

        z = jax.random.normal(key, shape)

        def step(z_t, idx):
            t = self.T - idx  # T .. 1
            s = t - 1
            step_t = jnp.broadcast_to(steps[t][None, None], (shape[0], 1))
            noise_hat = net(z_t, step_t)
            z_t = z_t * alpha_st[s] + std[s] * Pm1[s] * noise_hat
            return z_t, None

        z, _ = jax.lax.scan(step, z, jnp.arange(self.T))
        return z
