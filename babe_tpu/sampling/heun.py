"""Second-order stochastic Heun sampler as a single jitted lax.scan.

TPU-native realization of the reference EDM sampler
(testing/edm_sampler.py:166-229): the whole reverse process — stochastic
timestep move, denoiser evaluation, Tweedie score, reconstruction-guidance
gradients (jax.grad through the jitted U-Net replaces torch.autograd.grad at
testing/edm_sampler.py:73-74), optional data-consistency replacement, and the
2nd-order correction — runs on device in one compiled scan.  The final step
(t_{i+1} == 0) is peeled out of the scan so no model evaluation ever sees
sigma == 0 (cnoise = log sigma).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from babe_tpu.diffusion.edm import EDM
from babe_tpu.ops.filters import (
    apply_norm_STFT_fweighted,
    apply_norm_STFTmag_fweighted,
)


def make_norm_fn(ps_cfg: Any) -> Callable:
    """Reconstruction-error norm from the posterior_sampling config block
    (reference: blind_bwe_sampler.py:99-117)."""
    norm = ps_cfg.get("norm", 2)
    stft_cfg = ps_cfg.get("stft_distance", {})
    if norm == "smoothl1":
        beta = float(ps_cfg.get("smoothl1_beta", 1.0))

        def fn(y, den_rec):
            d = y - den_rec
            ad = jnp.abs(d)
            return jnp.sum(jnp.where(ad < beta, 0.5 * d**2 / beta, ad - 0.5 * beta))

        return fn
    if norm == "cosine":
        def fn(y, den_rec):
            cos = jnp.sum(y * den_rec, -1) / (
                jnp.linalg.norm(y, axis=-1) * jnp.linalg.norm(den_rec, axis=-1) + 1e-6
            )
            return jnp.sum(jnp.clip(1 - cos, 0))

        return fn
    if stft_cfg and stft_cfg.get("use", False):
        nfft = int(stft_cfg.get("nfft", 2048))
        fw = ps_cfg.get("freq_weighting", "None")
        if stft_cfg.get("mag", False):
            logmag = bool(stft_cfg.get("logmag", False))
            return lambda y, d: apply_norm_STFTmag_fweighted(y, d, fw, nfft, logmag)
        return lambda y, d: apply_norm_STFT_fweighted(y, d, fw, nfft)
    ord_ = float(norm)

    def fn(y, den_rec):
        d = (y - den_rec).reshape(y.shape[0], -1)
        return jnp.sum(jnp.linalg.norm(d, ord=ord_, axis=-1))

    return fn


@dataclass
class SamplerConfig:
    T: int = 35
    order: int = 2
    xi: float = 0.0
    data_consistency: bool = False
    snoise: float = 1.0
    snr_observations: float | None = None  # per-stage observation noise (dB)
    start_sigma: float | None = None
    filter_out_cqt_DC_Nyq: bool = True
    norm_fn: Callable = None  # set via make_norm_fn
    audio_len: int = 184184

    @classmethod
    def from_args(cls, args) -> "SamplerConfig":
        t = args.tester
        ss = t.posterior_sampling.get("start_sigma", "None")
        return cls(
            T=int(t.T),
            order=int(t.order),
            xi=float(t.posterior_sampling.xi),
            data_consistency=bool(t.posterior_sampling.data_consistency),
            snoise=float(t.diff_params.get("Snoise", 1.0))
            if not t.diff_params.get("same_as_training", True)
            else float(args.diff_params.get("Snoise", 1.0)),
            start_sigma=None if ss in ("None", None) else float(ss),
            snr_observations=(
                None
                if t.posterior_sampling.get("SNR_observations", "None") in ("None", None)
                else float(t.posterior_sampling.SNR_observations)
            ),
            filter_out_cqt_DC_Nyq=bool(t.get("filter_out_cqt_DC_Nyq", True)),
            norm_fn=make_norm_fn(t.posterior_sampling),
            audio_len=int(args.exp.audio_len),
        )


class Sampler:
    """EDM Heun sampler over a bound denoiser.

    Args:
      denoiser: callable (x[B,T], sigma[B,1]) -> x_hat[B,T] — the full EDM
        preconditioned denoiser D(x; sigma) (network already bound).
      edm: EDM instance used *only* for schedules/gamma (its params may differ
        from training — reference update_diff_params, edm_sampler.py:34-44).
      hpf: optional apply_hpf_DC projection applied to denoised estimates
        (reference: edm_sampler.py:61-62).
    """

    def __init__(self, denoiser: Callable, edm: EDM, cfg: SamplerConfig,
                 hpf: Callable | None = None):
        self.denoiser = denoiser
        self.edm = edm
        self.cfg = cfg
        self.hpf = hpf if cfg.filter_out_cqt_DC_Nyq else None

    # ----------------------------------------------------------- internals

    def _denoise(self, x, t):
        sig = jnp.broadcast_to(jnp.asarray(t)[None, None], (x.shape[0], 1))
        x_hat = self.denoiser(x, sig)
        if self.hpf is not None:
            x_hat = self.hpf(x_hat)
        return x_hat

    def _score(self, x, t, y=None, degradation=None, key=None):
        """(reference: edm_sampler.py:47-134; blind_bwe_sampler.py:75-209)"""
        cfg = self.cfg
        if y is None:
            x_hat = self._denoise(x, t)
            return (x_hat - x) / t**2
        if cfg.snr_observations is not None and key is not None:
            # per-call observation noise for regularization in informed
            # guidance (reference: blind_bwe_sampler.py:80-86 adds fresh noise
            # inside get_score when SNR_observations is set)
            snr = 10.0 ** (cfg.snr_observations / 10.0)
            sig = jnp.sqrt(jnp.var(y, -1, keepdims=True) / snr)
            y = y + sig * jax.random.normal(key, y.shape)
        if cfg.xi > 0:
            def loss(x_):
                x_hat = self._denoise(x_, t)
                return cfg.norm_fn(y, degradation(x_hat)), x_hat

            (nval, x_hat), grads = jax.value_and_grad(loss, has_aux=True)(x)
            normguide = jnp.linalg.norm(grads) / cfg.audio_len**0.5
            # base-sampler scaling: xi / (normguide * t + 1e-6)
            # (reference edm_sampler.py:80; NB the BLIND sampler uses
            # xi/(normguide+1e-6) * grads / t — blind.py keeps that form,
            # blind_bwe_sampler.py:127-135)
            s = cfg.xi / (normguide * t + 1e-6)
            score = (x_hat - x) / t**2 - s * grads
            if cfg.data_consistency:
                x_dc = score * t**2 + x
                x_dc = y + x_dc - degradation(x_dc)
                score = (x_dc - x) / t**2
            return score
        x_hat = self._denoise(x, t)
        x_hat = y + x_hat - degradation(x_hat)  # replacement method
        return (x_hat - x) / t**2

    def _run(self, key, shape, y=None, degradation=None, rid=False,
             x_init=None, score_postprocess=None):
        """``x_init``: optional explicit initial state (already scaled by
        t[0]); replaces the prior draw — used for warm-start experiments and
        for deterministic golden-trajectory tests against the reference.

        ``score_postprocess``: optional pure callable ``(score, x, t) -> score``
        applied after every score evaluation — the functional replacement for
        the reference's in-place score-method override (e.g. the AR smooth-mask
        data-consistency step, blind_bwe_sampler.py:259-303)."""
        cfg = self.cfg
        # warm start only when the observation lives in signal space
        # (phase-retrieval/resample observations have different shapes)
        warm = (
            cfg.start_sigma is not None and y is not None
            and tuple(y.shape) == tuple(shape)
        )
        if warm:
            t = self.edm.create_schedule_from_initial_t(cfg.start_sigma, cfg.T)
        else:
            t = self.edm.create_schedule(cfg.T)
        gamma = self.edm.get_gamma(t)
        key, k0 = jax.random.split(key)
        if x_init is not None:
            x = x_init
        else:
            x = jax.random.normal(k0, shape) * t[0]
            if warm:
                x = y + x

        base_score = partial(self._score, y=y, degradation=degradation)
        if score_postprocess is None:
            score = base_score
        else:
            def score(x, t, key=None):
                return score_postprocess(base_score(x, t, key=key), x, t)

        if cfg.order == 2:
            # Predictor/corrector unrolled into 2 half-steps per scan iteration
            # so the body instantiates the (expensive) score evaluation ONCE —
            # halves the compiled program size vs. two call sites.
            def half_step(carry, inp):
                x, x_hat, d1, key = carry
                t_i, t_ip1, g, phase0 = inp
                key, k_eps = jax.random.split(key)
                t_hat = t_i + g * t_i
                eps = jax.random.normal(k_eps, x.shape) * cfg.snoise
                x_hat_new = x + jnp.sqrt(jnp.clip(t_hat**2 - t_i**2, 0.0)) * eps
                h = t_ip1 - t_hat
                x_prime = x_hat + h * d1
                x_eval = jnp.where(phase0, x_hat_new, x_prime)
                t_eval = jnp.where(phase0, t_hat, t_ip1)
                key, k_sc = jax.random.split(key)
                sc = score(x_eval, t_eval, key=k_sc)
                d = -t_eval * sc
                d1_new = jnp.where(phase0, d, d1)
                x_hat_out = jnp.where(phase0, x_hat_new, x_hat)
                x_new = jnp.where(phase0, x, x_hat + h * 0.5 * (d1 + d))
                out = (sc * t_eval**2 + x_eval) if rid else None
                return (x_new, x_hat_out, d1_new, key), out

            n = cfg.T - 1
            rep = lambda a: jnp.repeat(a, 2)
            inps = (
                rep(t[:-2]), rep(t[1:-1]), rep(gamma[:-2]),
                jnp.tile(jnp.asarray([True, False]), n),
            )
            carry = (x, jnp.zeros_like(x), jnp.zeros_like(x), key)
            (x, _, _, key), denoised = jax.lax.scan(half_step, carry, inps)
            if rid:
                denoised = denoised[::2]
        else:
            def step(carry, inp):
                x, key = carry
                t_i, t_ip1, g = inp
                key, k_eps = jax.random.split(key)
                t_hat = t_i + g * t_i
                eps = jax.random.normal(k_eps, x.shape) * cfg.snoise
                x_hat = x + jnp.sqrt(jnp.clip(t_hat**2 - t_i**2, 0.0)) * eps
                key, k_sc = jax.random.split(key)
                sc = score(x_hat, t_hat, key=k_sc)
                x_new = x_hat + (t_ip1 - t_hat) * (-t_hat * sc)
                out = (sc * t_hat**2 + x_hat) if rid else None
                return (x_new, key), out

            inps = (t[:-2], t[1:-1], gamma[:-2])
            (x, key), denoised = jax.lax.scan(step, (x, key), inps)
        t_last = t[cfg.T - 1]
        g_last = gamma[cfg.T - 1]
        key, k_eps = jax.random.split(key)
        t_hat = t_last + g_last * t_last
        eps = jax.random.normal(k_eps, x.shape) * cfg.snoise
        x_hat = x + jnp.sqrt(jnp.clip(t_hat**2 - t_last**2, 0.0)) * eps
        key, k_sc = jax.random.split(key)
        sc = score(x_hat, t_hat, key=k_sc)
        x = x_hat + (0.0 - t_hat) * (-t_hat * sc)
        if rid:
            last_den = sc * t_hat**2 + x_hat
            denoised = jnp.concatenate([denoised, last_den[None]], axis=0)
            return x, denoised, t
        return x

    # ------------------------------------------------------------- public

    def predict_unconditional(self, key, shape, rid: bool = False,
                              x_init=None):
        """(reference: edm_sampler.py:136-143)"""
        return self._run(key, shape, rid=rid, x_init=x_init)

    def predict_conditional(self, key, y, degradation, rid: bool = False,
                            x_init=None, score_postprocess=None):
        """(reference: edm_sampler.py:157-164)"""
        return self._run(key, y.shape, y=y, degradation=degradation, rid=rid,
                         x_init=x_init, score_postprocess=score_postprocess)

    def predict_resample(self, key, y, shape, degradation, rid: bool = False):
        return self._run(key, shape, y=y, degradation=degradation, rid=rid)

    def predict_inpainting(self, key, y_masked, mask, rid: bool = False):
        """(reference: edm_sampler.py:234-243)"""
        from babe_tpu.sampling.degradations import make_mask

        return self.predict_conditional(key, y_masked, make_mask(mask), rid=rid)

    def predict_bwe(self, key, ylpf, filt, filt_type: str, rid: bool = False):
        """(reference: edm_sampler.py:266-305)"""
        from babe_tpu.sampling import degradations as D

        deg = D.degradation_from_filter(filt, filt_type)
        if filt_type in ("resample", "decimate"):
            return self.predict_resample(
                key, ylpf, (ylpf.shape[0], self.cfg.audio_len), deg, rid=rid
            )
        return self.predict_conditional(key, ylpf, deg, rid=rid)

    def predict_declipping(self, key, y_clipped, clip_value, rid: bool = False):
        """(reference: edm_sampler.py:359-384)"""
        from babe_tpu.sampling.degradations import make_clip

        return self.predict_conditional(key, y_clipped, make_clip(clip_value), rid=rid)

    def predict_compsens(self, key, y_masked, mask, rid: bool = False):
        """(reference: edm_sampler.py:337-357)"""
        return self.predict_inpainting(key, y_masked, mask, rid=rid)

    def predict_phase_retrieval(self, key, y_mag, win_size, hop_size, rid=False):
        """(reference: edm_sampler.py:308-336)"""
        from babe_tpu.sampling.degradations import make_stft_mag

        deg = make_stft_mag(win_size, hop_size)
        return self.predict_resample(
            key, y_mag, (y_mag.shape[0], self.cfg.audio_len), deg, rid=rid
        )

    def predict_autoregressive(self, key, shape, N: int, overlap: float):
        """Unconditional continuation by masked outpainting
        (reference: edm_sampler.py:386-418). Host loop over chunks, jitted
        per-chunk sampling."""
        from babe_tpu.sampling.degradations import make_mask

        endmask = int(overlap * shape[-1])
        mask = jnp.ones((1, self.cfg.audio_len)).at[:, endmask:].set(0.0)
        key, k0 = jax.random.split(key)
        x = self.predict_unconditional(k0, shape)
        xcat = x
        for _ in range(N - 1):
            key, ki = jax.random.split(key)
            x_masked = jnp.zeros((1, self.cfg.audio_len))
            x_masked = x_masked.at[:, :endmask].set(x[:, -endmask:])
            x = self.predict_conditional(ki, x_masked, make_mask(mask))
            xcat = jnp.concatenate([xcat, x[..., endmask:]], axis=-1)
        return xcat
