"""Progressive distillation (PD) EDM variant.

Re-implementation of diff_params/edm_PD.py: a boundary schedule, a teacher
2x-ODE-step distillation loss, and the distilled few-step sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from babe_tpu.diffusion.edm import EDM, EDMParams


class EDMPD(EDM):
    def __init__(self, p: EDMParams, boundaries_T: int = 16, **kw):
        super().__init__(p, **kw)
        self.boundaries = self.create_schedule(int(boundaries_T))

    @classmethod
    def from_config(cls, args, cqt_hpf=None) -> "EDMPD":
        dp = args.diff_params
        return cls(
            EDMParams.from_config(dp),
            boundaries_T=int(dp.get_path("PD.boundaries.T", 16)),
            cqt_hpf=cqt_hpf,
        )

    def ode_update(self, x, sigma_1, sigma_0, net_teacher):
        """One deterministic ODE step (reference: diff_params/edm_PD.py:214-217)."""
        x0_hat = self.denoiser(x, net_teacher, sigma_0)
        score = (x0_hat - x) / sigma_0**2
        return x - (sigma_1 - sigma_0) * sigma_0 * score

    def loss_fn_PD(self, key, net, net_teacher, x, stage: int):
        """Teacher double-step -> student single-step target
        (reference: diff_params/edm_PD.py:220-293)."""
        schedule = self.boundaries[:: 2**stage] if stage > 0 else self.boundaries
        schedule = schedule[::-1]
        k_i, k_n = jax.random.split(key)
        if schedule.shape[0] > 3:
            j = jax.random.randint(k_i, (x.shape[0], 1), 1, schedule.shape[0] // 2)
            i = j * 2 + 1
        else:
            i = jnp.full((x.shape[0], 1), 2)
        sigma_0 = schedule[i]
        sigma_1 = schedule[i - 1]
        sigma_2 = schedule[i - 2]

        noise = self.sample_prior(k_n, x.shape, sigma_0)
        cskip_0, cout_0, cin_0 = self.cskip(sigma_0), self.cout(sigma_0), self.cin(sigma_0)
        cnoise_0 = self.cnoise(sigma_0)

        zn = x + noise
        z_teacher = self.ode_update(zn, sigma_1, sigma_0, net_teacher)
        z_teacher = self.ode_update(z_teacher, sigma_2, sigma_1, net_teacher)
        r = sigma_2 / sigma_0
        x0_student = (z_teacher - r * zn) / (1 - r)
        target = jax.lax.stop_gradient((1.0 / cout_0) * (x0_student - cskip_0 * zn))

        estimate = net(cin_0 * zn, cnoise_0)
        error = estimate - target
        if self.cqt_hpf is not None:
            # CQT DC/Nyquist correction: the network discards those bands, so
            # their error components must not be propagated (mirrors
            # EDM.loss_fn; reference: diff_params/edm.py:195-199 applied the
            # same way in the PD loss path)
            error = self.cqt_hpf(error)
        return error**2, sigma_0

    def PD_sample(self, key, N: int, L: int, net, stage: int):
        """Distilled few-step sampler (reference: diff_params/edm_PD.py:295-314)."""
        schedule = self.boundaries[:: 2 ** (stage + 1)][::-1]
        z = jax.random.normal(key, (N, L)) * schedule[-1]
        n = schedule.shape[0]
        for i in range(n - 1):
            sigma_0 = schedule[n - 1 - i]
            sigma_1 = schedule[n - 2 - i]
            z = self.ode_update(z, sigma_1, sigma_0, net)
        return z
