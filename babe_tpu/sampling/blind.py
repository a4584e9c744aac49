"""BABE blind sampler: joint posterior sampling + degradation-filter estimation.

TPU-native re-design of the paper's core contribution
(reference: testing/blind_bwe_sampler.py:12-769).  The whole reverse process is
one jitted lax.scan; per Heun stage:

  1. denoise via jax.vjp (one forward, keeping the pullback),
  2. projected-gradient filter fit: a lax.while_loop of at most ``max_iter``
     iterations on the (fc_k, A_k) parameters minimizing the freq-weighted
     STFT-mag mismatch, with per-parameter step sizes, sequential monotonicity
     clamps and tolerance early-exit (reference fit_params :533-595),
  3. reconstruction-guidance gradients through the network pullback with the
     *updated* filter (reference :685-757 ordering),
  4. Tweedie score + guidance, optional data consistency, Heun update.

The observation STFT is computed once (the reference recomputes it every
stage — identical values, wasted FLOPs).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from babe_tpu.diffusion.edm import EDM
from babe_tpu.ops.filters import (
    apply_filter_and_norm_STFTmag_fweighted,
    design_filter,
)
from babe_tpu.ops.stft import apply_filter_istft, apply_stft, rfftfreq
from babe_tpu.sampling.heun import Sampler, SamplerConfig
from babe_tpu.sampling import degradations as D


@dataclass
class BlindConfig:
    nfft: int = 4096
    sample_rate: float = 22050.0
    mu: tuple[float, float] = (1000.0, 10.0)
    tol: tuple[float, float] = (5e-3, 5e-3)
    max_iter: int = 100
    clamp_fc: bool = True
    clamp_A: bool = True
    only_negative_A: bool = True
    fcmin: float = 20.0
    fcmax: float = 11025.0
    Amin: float = -50.0
    Amax: float = 30.0
    init_fc: tuple = (280, 285, 290, 295, 300)
    init_A: tuple = (-15, -17, -20, -25, -30)
    freq_weighting_filter: str = "sqrt"
    sigma_den_estimate: float = 0.0

    @classmethod
    def from_args(cls, args) -> "BlindConfig":
        bb = args.tester.blind_bwe
        fcmax = bb.get("fcmax", "nyquist")
        if fcmax == "nyquist":
            fcmax = float(args.exp.sample_rate) / 2
        return cls(
            nfft=int(bb.NFFT),
            sample_rate=float(args.exp.sample_rate),
            mu=tuple(float(m) for m in bb.optimization.mu),
            tol=tuple(float(t) for t in bb.optimization.tol),
            max_iter=int(bb.optimization.max_iter),
            clamp_fc=bool(bb.optimization.clamp_fc),
            clamp_A=bool(bb.optimization.clamp_A),
            only_negative_A=bool(bb.optimization.get("only_negative_A", True)),
            fcmin=float(bb.fcmin),
            fcmax=float(fcmax),
            Amin=float(bb.Amin),
            Amax=float(bb.Amax),
            init_fc=tuple(bb.initial_conditions.fc),
            init_A=tuple(bb.initial_conditions.A),
            freq_weighting_filter=str(
                args.tester.posterior_sampling.get("freq_weighting_filter", "sqrt")
            ),
            sigma_den_estimate=float(bb.get("sigma_den_estimate", 0.0) or 0.0),
        )

    def initial_params(self) -> jnp.ndarray:
        return jnp.asarray([list(self.init_fc), list(self.init_A)], dtype=jnp.float32)


class BlindSampler(Sampler):
    """Extends the Heun sampler with joint filter estimation."""

    def __init__(self, denoiser, edm: EDM, cfg: SamplerConfig, blind: BlindConfig,
                 hpf=None):
        super().__init__(denoiser, edm, cfg, hpf=hpf)
        self.blind = blind
        self.freqs = jnp.asarray(rfftfreq(blind.nfft, blind.sample_rate))

    # ------------------------------------------------------ filter optimizer

    def _clamp(self, p: jnp.ndarray) -> jnp.ndarray:
        """Sequential monotonicity clamps (reference: blind_bwe_sampler.py:576-583)."""
        b = self.blind
        fc, A = p[0], p[1]
        K = fc.shape[0]
        if b.clamp_fc:
            fcs = [jnp.clip(fc[0], b.fcmin, b.fcmax)]
            for k in range(1, K):
                fcs.append(jnp.clip(fc[k], fcs[-1] + 1.0, b.fcmax))
            fc = jnp.stack(fcs)
        if b.clamp_A:
            amax0 = -1.0 if b.only_negative_A else b.Amax
            As = [jnp.clip(A[0], b.Amin, amax0)]
            for k in range(1, K):
                amax = As[-1] if b.only_negative_A else b.Amax
                As.append(jnp.clip(A[k], b.Amin, amax))
            A = jnp.stack(As)
        return jnp.stack([fc, A])

    def _objective(self, Xden, Y, params):
        """(reference optimizer_func: blind_bwe_sampler.py:522-531)"""
        H = design_filter(params[0], params[1], self.freqs)
        return apply_filter_and_norm_STFTmag_fweighted(
            Xden, Y, H, self.blind.freq_weighting_filter
        )

    def _fit_stats(self, Xden, Y):
        """Per-frequency sufficient statistics of the fit objective.

        || (|X|·H - |Y|) w ||^2 = sum_F w_F^2 (H_F^2 a_F - 2 H_F b_F + c_F)
        with a = sum_{B,T} |X|^2, b = sum |X||Y|, c = sum |Y|^2 — EXACT, so
        the <=100-iteration GD loop touches only [F]-length vectors instead
        of the full (B, F, T) magnitudes every iteration (same objective and
        gradients as reference blind_bwe_sampler.py:522-531)."""
        from babe_tpu.ops.filters import _freq_weighting

        Xm, Ym = jnp.abs(Xden), jnp.abs(Y)
        w = _freq_weighting(
            jnp.linspace(0.0, 1.0, Xm.shape[-2]), self.blind.freq_weighting_filter
        )
        w2 = w * w
        a = jnp.sum(Xm * Xm, axis=(0, -1)) * w2
        bb = jnp.sum(Xm * Ym, axis=(0, -1)) * w2
        c = jnp.sum(Ym * Ym, axis=(0, -1)) * w2
        return a, bb, c

    def _objective_from_stats(self, stats, params):
        a, bb, c = stats
        H = design_filter(params[0], params[1], self.freqs)
        # The quadratic form equals sum(((|X|H - |Y|) w)^2) >= 0, but fp32
        # cancellation can drive the summed-stats form slightly negative once
        # the fit is near-converged (|X|H ~= |Y|), which would NaN the sqrt
        # and poison the filter params.  Clamping to a tiny positive floor
        # also keeps the sqrt gradient finite there (max picks the constant,
        # so GD simply stops — matching the reference's tolerance exit).
        s = jnp.sum(H * H * a - 2.0 * H * bb + c)
        return jnp.sqrt(jnp.maximum(s, 1e-12))

    def fit_params(self, Xden, Y, params0):
        """Projected gradient descent with tolerance early-exit
        (reference: blind_bwe_sampler.py:533-595) as a lax.while_loop."""
        b = self.blind
        mu = jnp.asarray(b.mu)[:, None]
        stats = self._fit_stats(Xden, Y)
        grad_fn = jax.grad(lambda p: self._objective_from_stats(stats, p))

        def cond(state):
            _, _, i, done = state
            return jnp.logical_and(i < b.max_iter, jnp.logical_not(done))

        def body(state):
            p, _, i, _ = state
            g = grad_fn(p)
            newp = self._clamp(p - mu * g)
            done = jnp.logical_and(
                jnp.abs(newp[0] - p[0]).mean() < b.tol[0],
                jnp.abs(newp[1] - p[1]).mean() < b.tol[1],
            )
            return (newp, p, i + 1, done)

        state = (params0, params0, jnp.asarray(0), jnp.asarray(False))
        p, _, _, _ = jax.lax.while_loop(cond, body, state)
        return p

    # ------------------------------------------------------------ main loop

    def degradation_fcA(self, x, params):
        return D.make_fcA(self.freqs, self.blind.nfft)(x, params)

    def predict_blind_bwe(self, key, y, rid: bool = False):
        """(reference: blind_bwe_sampler.py:619-769)

        Returns (x, filter_params) or, with rid, (x, filter_params,
        data_denoised[T,B,L], t[T+1], data_filters[T,2,K],
        data_score[T,B,L]) — the score trajectory matches the reference's
        rich-info capture (blind_bwe_sampler.py:417,463,491 stores
        data_score alongside denoised/filters).
        """
        cfg = self.cfg
        b = self.blind
        deg = self.degradation_fcA
        Y = apply_stft(y, b.nfft)
        params0 = b.initial_params()

        if cfg.start_sigma is None:
            t = self.edm.create_schedule(cfg.T)
        else:
            t = self.edm.create_schedule_from_initial_t(cfg.start_sigma, cfg.T)
        gamma = self.edm.get_gamma(t)
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, y.shape) * t[0]
        if cfg.start_sigma is not None:
            x = y + x

        def stage(x_hat, t_cur, params, key):
            """One guided score evaluation with filter re-fit."""
            y_obs = y
            if cfg.snr_observations is not None:
                # per-stage observation noise for regularization
                # (reference: blind_bwe_sampler.py:80-86, 542-548)
                key, kn = jax.random.split(key)
                snr = 10.0 ** (cfg.snr_observations / 10.0)
                sig = jnp.sqrt(jnp.var(y, -1, keepdims=True) / snr)
                y_obs = y + sig * jax.random.normal(kn, y.shape)
            x_den, pullback = jax.vjp(lambda x_: self._denoise(x_, t_cur), x_hat)
            x_den_d = jax.lax.stop_gradient(x_den)
            if b.sigma_den_estimate > 0:
                # the fit sees a noise-regularized copy of the denoised
                # estimate — its STFT differs from the guidance STFT, so the
                # two passes cannot be shared on this (non-default) path
                key, kn = jax.random.split(key)
                den_for_fit = x_den_d + b.sigma_den_estimate * jax.random.normal(
                    kn, x_den_d.shape
                )
                Xden = apply_stft(den_for_fit, b.nfft)
                params = self.fit_params(Xden, Y, params)
                g_xden = jax.grad(
                    lambda xd: cfg.norm_fn(y_obs, deg(xd, params)))(x_den)
            else:
                # ONE analysis STFT of x_den serves both the filter fit and
                # the reconstruction-guidance gradient (they consumed two
                # identical transforms before — VERDICT r3 #2): keep the
                # STFT's pullback, fit on the stopped-gradient spectrum,
                # then chain the guidance cotangent back through it.
                X, stft_pull = jax.vjp(
                    lambda x_: apply_stft(x_, b.nfft), x_den)
                params = self.fit_params(
                    jax.lax.stop_gradient(X), Y, params)
                H = design_filter(params[0], params[1], self.freqs)
                L = x_den.shape[-1]

                def obj_from_X(Xv):
                    xf = apply_filter_istft(Xv, H, b.nfft)[..., :L]
                    return cfg.norm_fn(y_obs, xf)

                val, obj_pull = jax.vjp(obj_from_X, X)
                g_xden = stft_pull(obj_pull(jnp.ones_like(val))[0])[0]
            rec = pullback(g_xden)[0]
            normguide = jnp.linalg.norm(rec) / cfg.audio_len**0.5
            s = cfg.xi / (normguide + 1e-6)
            score = (x_den_d - x_hat) / t_cur**2 - s * rec / t_cur
            if cfg.data_consistency:
                x_dc = score * t_cur**2 + x_hat
                x_dc = y + x_dc - deg(x_dc, params)
                score = (x_dc - x_hat) / t_cur**2
            return score, params, x_den_d, key

        if cfg.order == 2:
            # predictor/corrector as 2 half-steps with ONE stage() per scan
            # body (see heun.py — halves the compiled program size)
            def half_step(carry, inp):
                x, x_hat, d1, params, key = carry
                t_i, t_ip1, g, phase0 = inp
                key, k_eps = jax.random.split(key)
                t_hat = t_i + g * t_i
                eps = jax.random.normal(k_eps, x.shape)
                x_hat_new = x + jnp.sqrt(jnp.clip(t_hat**2 - t_i**2, 0.0)) * eps
                h = t_ip1 - t_hat
                x_prime = x_hat + h * d1
                x_eval = jnp.where(phase0, x_hat_new, x_prime)
                t_eval = jnp.where(phase0, t_hat, t_ip1)
                sc, params, x_den, key = stage(x_eval, t_eval, params, key)
                d = -t_eval * sc
                d1_new = jnp.where(phase0, d, d1)
                x_hat_out = jnp.where(phase0, x_hat_new, x_hat)
                x_new = jnp.where(phase0, x, x_hat + h * 0.5 * (d1 + d))
                out = (x_den, params, sc) if rid else None
                return (x_new, x_hat_out, d1_new, params, key), out

            n = cfg.T - 1
            rep = lambda a: jnp.repeat(a, 2)
            inps = (
                rep(t[:-2]), rep(t[1:-1]), rep(gamma[:-2]),
                jnp.tile(jnp.asarray([True, False]), n),
            )
            carry = (x, jnp.zeros_like(x), jnp.zeros_like(x), params0, key)
            (x, _, _, params, key), ys = jax.lax.scan(half_step, carry, inps)
            if rid:
                ys = jax.tree.map(lambda a: a[::2], ys)
        else:
            def step(carry, inp):
                x, params, key = carry
                t_i, t_ip1, g = inp
                key, k_eps = jax.random.split(key)
                t_hat = t_i + g * t_i
                eps = jax.random.normal(k_eps, x.shape)
                x_hat = x + jnp.sqrt(jnp.clip(t_hat**2 - t_i**2, 0.0)) * eps
                score, params, x_den, key = stage(x_hat, t_hat, params, key)
                x_new = x_hat + (t_ip1 - t_hat) * (-t_hat * score)
                return (x_new, params, key), (
                    (x_den, params, score) if rid else None
                )

            inps = (t[:-2], t[1:-1], gamma[:-2])
            (x, params, key), ys = jax.lax.scan(step, (x, params0, key), inps)

        # final step: t_{i+1} == 0, 1st-order Euler (never evaluate at sigma=0)
        t_last, g_last = t[cfg.T - 1], gamma[cfg.T - 1]
        key, k_eps = jax.random.split(key)
        t_hat = t_last + g_last * t_last
        x_hat = x + jnp.sqrt(jnp.clip(t_hat**2 - t_last**2, 0.0)) * jax.random.normal(
            k_eps, x.shape
        )
        score, params, x_den, key = stage(x_hat, t_hat, params, key)
        x = x_hat - t_hat * score * (0.0 - t_hat)

        if rid:
            dens, filts, scores = ys
            dens = jnp.concatenate([dens, x_den[None]], axis=0)
            filts = jnp.concatenate([filts, params[None]], axis=0)
            scores = jnp.concatenate([scores, score[None]], axis=0)
            return x, params, dens, t, filts, scores
        return x, params

    # ----------------------------------------------- informed / AR variants

    def predict_bwe(self, key, ylpf, filt, filt_type: str, rid: bool = False,
                    test_filter_fit: bool = False, compute_sweep: bool = False):
        """Informed BWE incl. the fc_A parametric type
        (reference: blind_bwe_sampler.py:306-364).

        With ``test_filter_fit`` the filter optimizer is run diagnostically at
        every step on the denoised estimates (guidance still uses the fixed
        known filter) and the trajectory of fitted parameters is returned —
        (x, data_denoised, t, data_filters) (reference: predict() at
        blind_bwe_sampler.py:419-465 with test_filter_fit=True).  With
        ``compute_sweep`` additionally evaluates the (fc, A) loss-landscape
        grid at every step and returns
        (x, data_denoised, t, data_filters, data_norms, data_grads)
        (reference: blind_bwe_sampler.py:598-616 + predict :467-498)."""
        if not test_filter_fit:
            if filt_type == "fc_A":
                params = jnp.asarray(filt, dtype=jnp.float32)
                deg = lambda x: self.degradation_fcA(x, params)
                return self.predict_conditional(key, ylpf, deg, rid=rid)
            return super().predict_bwe(key, ylpf, filt, filt_type, rid=rid)

        # diagnostic filter tracking alongside informed sampling
        if filt_type == "fc_A":
            fixed = jnp.asarray(filt, dtype=jnp.float32)
            deg = lambda x: self.degradation_fcA(x, fixed)
        else:
            deg = D.degradation_from_filter(filt, filt_type)
        cfg = self.cfg
        b = self.blind
        Y = apply_stft(ylpf, b.nfft)
        fit_init = b.initial_params()
        if cfg.start_sigma is None:
            t = self.edm.create_schedule(cfg.T)
        else:
            t = self.edm.create_schedule_from_initial_t(cfg.start_sigma, cfg.T)
        gamma = self.edm.get_gamma(t)
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, ylpf.shape) * t[0]
        if cfg.start_sigma is not None:
            x = ylpf + x

        def diag(x_den, params):
            """per-step diagnostics: fitted filter (+ optional sweep grid)."""
            Xd = apply_stft(jax.lax.stop_gradient(x_den), b.nfft)
            params = self.fit_params(Xd, Y, params)
            if compute_sweep:
                norms, grads = self.compute_sweep(
                    jax.lax.stop_gradient(x_den), ylpf
                )
                return params, (norms, grads)
            return params, (jnp.zeros(()), jnp.zeros(()))

        def half_step(carry, inp):
            x, x_hat, d1, params, key = carry
            t_i, t_ip1, g, phase0 = inp
            key, k_eps = jax.random.split(key)
            t_hat = t_i + g * t_i
            x_hat_new = x + jnp.sqrt(jnp.clip(t_hat**2 - t_i**2, 0.0)) * (
                jax.random.normal(k_eps, x.shape) * cfg.snoise
            )
            h = t_ip1 - t_hat
            x_eval = jnp.where(phase0, x_hat_new, x_hat + h * d1)
            t_eval = jnp.where(phase0, t_hat, t_ip1)
            key, k_sc = jax.random.split(key)
            sc = self._score(x_eval, t_eval, y=ylpf, degradation=deg, key=k_sc)
            x_den = sc * t_eval**2 + x_eval
            params, sweep = diag(x_den, params)
            d = -t_eval * sc
            d1_new = jnp.where(phase0, d, d1)
            x_hat_out = jnp.where(phase0, x_hat_new, x_hat)
            x_new = jnp.where(phase0, x, x_hat + h * 0.5 * (d1 + d))
            return (x_new, x_hat_out, d1_new, params, key), (x_den, params, sweep)

        n = cfg.T - 1
        rep = lambda a: jnp.repeat(a, 2)
        inps = (rep(t[:-2]), rep(t[1:-1]), rep(gamma[:-2]),
                jnp.tile(jnp.asarray([True, False]), n))
        carry = (x, jnp.zeros_like(x), jnp.zeros_like(x), fit_init, key)
        (x, _, _, params, key), (dens, filts, sweeps) = jax.lax.scan(
            half_step, carry, inps
        )
        # final Euler step
        t_last, g_last = t[cfg.T - 1], gamma[cfg.T - 1]
        key, k_eps = jax.random.split(key)
        t_hat = t_last + g_last * t_last
        x_hat = x + jnp.sqrt(jnp.clip(t_hat**2 - t_last**2, 0.0)) * (
            jax.random.normal(k_eps, x.shape) * cfg.snoise
        )
        key, k_sc = jax.random.split(key)
        sc = self._score(x_hat, t_hat, y=ylpf, degradation=deg, key=k_sc)
        x = x_hat + t_hat**2 * sc
        x_den = sc * t_hat**2 + x_hat
        params, sweep_last = diag(x_den, params)
        dens = jnp.concatenate([dens[::2], x_den[None]], axis=0)
        filts = jnp.concatenate([filts[::2], params[None]], axis=0)
        if compute_sweep:
            norms = jnp.concatenate([sweeps[0][::2], sweep_last[0][None]], 0)
            grads = jnp.concatenate([sweeps[1][::2], sweep_last[1][None]], 0)
            return x, dens, t, filts, norms, grads
        return x, dens, t, filts

    def predict_bwe_AR(self, key, ylpf, y_masked, filt, filt_type: str, mask,
                       smooth_mask_size: int = 0, rid: bool = False,
                       smooth_mask=None):
        """Autoregressive chunk continuation: composite observation
        mask*y_prev + (1-mask)*lpf(x), optional hann-feathered data-consistency
        inpainting of the overlap (reference: blind_bwe_sampler.py:232-303).

        ``smooth_mask`` may be precomputed on host and passed as a traced
        array — this keeps one jitted program valid for every chunk mask
        (the AR testers change the mask only on the final short chunk)."""
        if filt_type == "fc_A":
            params = jnp.asarray(filt, dtype=jnp.float32)
            base = lambda x: self.degradation_fcA(x, params)
        elif filt_type == "firwin":
            base = D.make_fir(filt)
        else:
            raise NotImplementedError(filt_type)
        y = mask * y_masked + (1 - mask) * ylpf
        deg = lambda x: mask * x + (1 - mask) * base(x)

        if smooth_mask is not None or smooth_mask_size > 0:
            smooth = (
                smooth_mask if smooth_mask is not None
                else prepare_smooth_mask(mask, smooth_mask_size)
            )
            y_sm = smooth * y_masked

            def dc_postprocess(sc, x, t):
                # data-consistency replacement on the feathered overlap region
                x_hat = sc * t**2 + x
                x_hat = y_sm + x_hat - smooth * x_hat
                return (x_hat - x) / t**2

            return self.predict_conditional(
                key, y, deg, rid=rid, score_postprocess=dc_postprocess
            )
        return self.predict_conditional(key, y, deg, rid=rid)

    def compute_sweep(self, denoised, y, fc_s=None, A_s=None):
        """(fc, A) loss-landscape diagnostic grid, vmapped instead of the
        reference's python double loop (blind_bwe_sampler.py:598-616)."""
        fc_s = jnp.logspace(2.5, 4, 15) if fc_s is None else fc_s
        A_s = jnp.linspace(-80, -5, 12) if A_s is None else A_s
        Xden = apply_stft(denoised, self.blind.nfft)
        Y = apply_stft(y, self.blind.nfft)

        def one(fc, A):
            p = jnp.stack([fc[None], A[None]])
            val, g = jax.value_and_grad(lambda q: self._objective(Xden, Y, q))(p)
            return val, g[:, 0]

        f = jax.vmap(jax.vmap(one, in_axes=(None, 0)), in_axes=(0, None))
        norms, grads = f(fc_s, A_s)
        return norms, grads


def prepare_smooth_mask(mask: jnp.ndarray, size: int = 10) -> jnp.ndarray:
    """Hann-feather the 1->0 / 0->1 transitions of a binary mask
    (reference: blind_bwe_sampler.py:232-257). Host-side numpy (masks are
    built on host by the testers)."""
    m = np.asarray(mask)
    B, N = m.shape
    row = m[0].copy().astype(np.float32)
    # torch.hann_window(2*size) is periodic: w[n] = 0.5 - 0.5 cos(pi n / size)
    n = np.arange(2 * size)
    hann = (0.5 - 0.5 * np.cos(np.pi * n / size)).astype(np.float32)
    hann_left, hann_right = hann[:size], hann[size:]
    out = row.copy()
    prev = 1.0
    for i in range(N):
        if row[i] != prev:
            if row[i] == 0:
                out[i - size : i] = hann_right[:size]
            else:
                out[i : i + size] = hann_left[:size]
        prev = row[i]
    return jnp.broadcast_to(jnp.asarray(out)[None], (B, N))
