"""Unified experiment driver ("tester") covering all reference tester modes.

The reference ships five ~85%-duplicated tester classes
(testing/tester.py, blind_bwe_tester{,_small,_mushra}.py,
denoise_and_bwe_tester.py — SURVEY.md §2.5).  Here they are one driver with a
mode dispatch (``dodajob``), mirroring the union of behaviors:

  unconditional            testing/tester.py:226-240
  inpainting               testing/tester.py:242-331
  bwe (informed)           testing/blind_bwe_tester.py:582-694
  blind_bwe (synthetic)    testing/blind_bwe_tester.py:1037-1224
  real_blind_bwe           testing/blind_bwe_tester.py:871-1035
  real_blind_bwe_complete  testing/blind_bwe_tester.py:710-868 (AR chunks)
  formal_test_bwe          testing/blind_bwe_tester.py:321-578 (OLA/AR, resume)
  formal_test_bwe_small    testing/blind_bwe_tester_small.py:300-430 (dB-MSE)
  mushra                   testing/blind_bwe_tester_mushra.py:1001-1212
  denoise modes            testing/denoise_and_bwe_tester.py:109-413

All sampling runs on device through the jitted samplers; the tester is a thin
host loop doing IO, chunking and logging.
"""

from __future__ import annotations

import glob as _glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from babe_tpu.diffusion.edm import EDM, EDMParams
from babe_tpu.ops.filters import design_filter, filter_db_mse
from babe_tpu.ops.resample import resample
from babe_tpu.ops.stft import apply_filter, rfftfreq
from babe_tpu.parallel.mesh import batch_sharding, make_mesh
from babe_tpu.sampling import degradations as D
from babe_tpu.sampling.blind import BlindConfig, BlindSampler
from babe_tpu.sampling.heun import SamplerConfig
from babe_tpu.training.trainer import ORBAX_ARGS_SIDECAR, ORBAX_EXT
from babe_tpu.utils import logging as ulog
from babe_tpu.utils.torch_ckpt import fill_variables


class Tester:
    def __init__(self, args, model, diff_params: EDM, test_set=None, denoiser=None):
        self.args = args
        self.model = model
        self.test_set = test_set
        self.denoiser = denoiser  # (model, variables) STFT denoiser or None
        self.it = 0
        self.key = jax.random.PRNGKey(int(args.exp.get("seed", 42)) + 1)

        # tester-side diffusion params (reference update_diff_params,
        # blind_bwe_sampler.py:50-60)
        tcfg = args.tester
        if bool(tcfg.diff_params.get("same_as_training", True)):
            self.edm = diff_params
        else:
            self.edm = EDM(EDMParams.from_config(tcfg.diff_params))
        self.train_edm = diff_params

        self.variables = None
        self.scfg = SamplerConfig.from_args(args)
        self.blind_cfg = BlindConfig.from_args(args)
        self.fs = int(args.exp.sample_rate)
        self.audio_len = int(args.exp.audio_len)
        base = os.path.join(str(args.model_dir), "outputs")
        self.paths = {}
        for mode in ("unconditional", "bwe", "inpainting", "blind_bwe",
                     "real_blind_bwe", "complete", "formal", "mushra"):
            self.paths[mode] = os.path.join(base, mode)
        # honor the exp.wandb / logging config instead of hard-coding it off
        # (reference: blind_bwe_tester.py:196-206 sets up a wandb run when
        # configured; wandb is optional here — JSONL is always written)
        wandb_cfg = args.exp.get("wandb", {}) or {}
        use_wandb = bool(wandb_cfg.get("use", False))  # opt-in (offline envs)
        log_cfg = args.get("logging", {}) or {}
        if "log" in log_cfg and not bool(log_cfg.get("log", True)):
            use_wandb = False
        self.metrics = ulog.MetricsLogger(
            base, use_wandb=use_wandb, config=args.to_dict(),
            project=str(wandb_cfg.get("project", "babe-tpu") or "babe-tpu"),
        )
        self._jit_cache: dict = {}
        # evaluation mesh: independent test items / OLA chunks are sharded
        # over all available chips (SURVEY.md §2.10 inference mapping —
        # "embarrassingly parallel per-chip chunk/test-item sharding");
        # a 1-device mesh degenerates to the single-chip path
        self.mesh = make_mesh()
        self.n_devices = int(self.mesh.devices.size)

    # ------------------------------------------------------------- plumbing

    def _shard(self, arr) -> jnp.ndarray:
        """Place a host batch on the eval mesh, sharded along axis 0
        (batch size must be a multiple of the device count — callers pad)."""
        arr = jnp.asarray(arr)
        if self.n_devices <= 1:
            return arr
        if arr.shape[0] % self.n_devices:
            # warn once per distinct batch size, not per placement — long
            # OLA evaluations hit this on every trailing chunk batch
            seen = getattr(self, "_unsharded_warned", set())
            if arr.shape[0] not in seen:
                print(
                    f"NOTE: batch of {arr.shape[0]} not divisible by "
                    f"{self.n_devices} devices — running unsharded on one chip"
                )
                seen.add(arr.shape[0])
                self._unsharded_warned = seen
            return arr
        return jax.device_put(arr, batch_sharding(self.mesh))

    def next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def load_checkpoint(self, path: str):
        """Load ours (.ckpt pickle) or reference torch (.pt) checkpoints
        (reference: blind_bwe_tester.py:238-272 + 7-way legacy loader)."""
        template = self.model.init(jax.random.PRNGKey(0), batch=1)
        if path.endswith(".pt"):
            import torch

            from babe_tpu.utils.torch_ckpt import (
                convert_state_dict,
                extract_network_state,
            )

            if getattr(getattr(self.model, "cqt", None), "mode", None) == "native":
                print(
                    "WARNING: loading a PyTorch checkpoint with the 'native' "
                    "CQT frame. Published reference weights were trained with "
                    "the cqt_nsgt_pytorch frame — use network=cqtdiff+_ckpt "
                    "(network.cqt.mode=oct_pow2) for faithful reconstruction."
                )

            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            converted = convert_state_dict(extract_network_state(ckpt, prefer="ema"))
            self.variables = fill_variables(template, converted, strict=True)
            self.it = int(ckpt.get("it", 0)) if isinstance(ckpt, dict) else 0
            if getattr(getattr(self.model, "cqt", None), "mode", None) in (
                "oct_pow2", "compat",
            ):
                self._frame_self_check()
        else:
            if path.rstrip("/").endswith(ORBAX_EXT) or os.path.isdir(path):
                import json

                import orbax.checkpoint as ocp

                path = path.rstrip("/")
                payload = dict(
                    ocp.StandardCheckpointer().restore(os.path.abspath(path))
                )
                sidecar = os.path.join(path, ORBAX_ARGS_SIDECAR)
                if os.path.exists(sidecar):
                    with open(sidecar) as f:
                        payload["args"] = json.load(f)
            else:
                with open(path, "rb") as f:
                    payload = pickle.load(f)
            src = payload.get("ema", payload.get("params"))
            self._check_ckpt_compat(template, src, payload, path)
            self.variables = {
                "params": jax.tree.map(jnp.asarray, src),
                "buffers": jax.tree.map(jnp.asarray, payload.get("buffers", {})),
            }
            self.it = int(payload.get("it", 0))
        self._jit_cache.clear()

    def _check_ckpt_compat(self, template, src, payload, path):
        """Fail at LOAD time with an actionable message when the checkpoint
        doesn't fit the built model (otherwise the mismatch surfaces later
        as a cryptic XLA shape error deep in the CQT / first conv).

        Two layers: (a) param-tree shape check vs the model template;
        (b) if the checkpoint recorded its training args, diff the network
        config and audio_len and name the keys that changed."""
        t_leaves = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(template["params"])}
        s_leaves = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                    jax.tree_util.tree_leaves_with_path(src)}
        bad = [
            f"  {k}: checkpoint {s_leaves.get(k)} vs model {t_leaves.get(k)}"
            for k in sorted(set(t_leaves) | set(s_leaves))
            if t_leaves.get(k) != s_leaves.get(k)
        ]
        hints = []
        saved_args = payload.get("args") or {}
        saved_net = saved_args.get("network", {})
        cur_net = self.args.network.to_dict() if hasattr(
            self.args.network, "to_dict") else dict(self.args.network)
        for key in sorted(set(saved_net) | set(cur_net)):
            if key in ("layout_pin",):  # runtime knobs, not architecture
                continue
            if saved_net.get(key) != cur_net.get(key) and key in saved_net:
                hints.append(
                    f"  network.{key}: trained with {saved_net.get(key)!r}, "
                    f"building with {cur_net.get(key)!r}")
        saved_len = (saved_args.get("exp") or {}).get("audio_len")
        cur_len = int(self.args.exp.audio_len)
        if saved_len is not None and int(saved_len) != cur_len:
            hints.append(
                f"  exp.audio_len: trained with {saved_len}, building with "
                f"{cur_len} (the CQT frame is audio_len-specific; also check "
                f"the tester mode's own audio_len override)")
        if bad:
            raise ValueError(
                f"checkpoint {path} does not fit the built model — "
                f"{len(bad)} parameter shape mismatch(es):\n"
                + "\n".join(bad[:8])
                + ("\n  ..." if len(bad) > 8 else "")
                + ("\nconfig differences vs the checkpoint's training args:\n"
                   + "\n".join(hints) if hints else "")
            )
        if hints:
            print("NOTE: checkpoint fits, but its recorded training config "
                  "differs from the current one:\n" + "\n".join(hints))

    def _frame_self_check(self):
        """Loud sanity check when torch weights meet the re-derived compat
        CQT frame (VERDICT r2 next #3b).

        At sigma == sigma_data the EDM preconditioning gives cskip = 1/2:
        half of D(x) = cskip*x + cout*net(cin*x) must come from the network.
        A TRAINED denoiser fed a clean in-band test signal returns D(x) ~= x
        (relative residual well under ~0.35); if the frame's conventions
        (coefficient scale, window split, octave ordering) diverged from the
        cqt_nsgt_pytorch frame the checkpoint was trained with, the network
        sees out-of-distribution coefficients and the residual lands near the
        no-network value of 0.5 or above — failing loudly at load time
        instead of decoding garbage.  Random-init / synthetic-test
        checkpoints are EXPECTED to warn here."""
        den, hpf = self._denoiser_fn()
        sigma_data = float(self.edm.p.sigma_data)
        # in-band test signal: one tone per octave of the model's CQT ladder,
        # scaled to the training data RMS (sigma_data)
        freqs = np.asarray(self.model.cqt.freqs)
        bpo = self.model.cqt.bins_per_oct
        picks = freqs[bpo // 2::bpo]
        t_ax = np.arange(self.audio_len) / self.fs
        x = np.sum([np.sin(2 * np.pi * f * t_ax) for f in picks], axis=0)
        x = x / np.std(x) * sigma_data
        x = jnp.asarray(x[None], jnp.float32)
        if hpf is not None:
            x = hpf(x)
        sig = jnp.full((1, 1), sigma_data, jnp.float32)
        x_hat = jax.jit(den)(x, sig)
        resid = float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x))
        if resid > 0.35:
            print(
                f"WARNING: frame self-check FAILED (relative denoiser "
                f"residual {resid:.3f} at sigma={sigma_data:g}; trained "
                f"weights + matching CQT frame should give << 0.35, a wrong "
                f"frame or untrained weights give ~0.5+). If these are "
                f"published weights, the oct_pow2 frame likely mismatches "
                f"the cqt_nsgt_pytorch frame they were trained with."
            )
        else:
            print(f"frame self-check OK (denoiser residual {resid:.3f} "
                  f"at sigma={sigma_data:g})")

    def set_variables(self, params, buffers, it: int = 0):
        self.variables = {"params": params, "buffers": buffers}
        self.it = it
        self._jit_cache.clear()

    def _denoiser_fn(self):
        assert self.variables is not None, "load a checkpoint first"
        v = self.variables
        if self.scfg.filter_out_cqt_DC_Nyq and hasattr(self.model, "fused_denoiser"):
            # hpf folded into the denoiser's spectrum pass (2 FFTs saved/eval)
            return self.model.fused_denoiser(v, self.edm), None
        den = lambda x, sigma: self.edm.denoiser(
            x, lambda xx, cn: self.model.apply(v, xx, cn), sigma
        )
        return den, getattr(self.model, "apply_hpf_DC", None)

    def sampler(self) -> BlindSampler:
        den, hpf = self._denoiser_fn()
        return BlindSampler(den, self.edm, self.scfg, self.blind_cfg, hpf=hpf)

    def _jitted(self, name: str, fn, **jit_kw):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, **jit_kw)
        return self._jit_cache[name]

    # ------------------------------------------------------------- helpers

    def resample_audio(self, seg: np.ndarray, fs: int) -> np.ndarray:
        """Resample to model fs and crop/pad to audio_len
        (reference: blind_bwe_tester.py resample_audio)."""
        seg = np.atleast_2d(np.asarray(seg, dtype=np.float32))
        if fs != self.fs:
            seg = np.asarray(resample(jnp.asarray(seg), int(fs), self.fs))
        if seg.shape[-1] < self.audio_len:
            seg = np.pad(seg, ((0, 0), (0, self.audio_len - seg.shape[-1])))
        return seg[..., : self.audio_len]

    def apply_lowpass_fcA(self, seg, params) -> jnp.ndarray:
        """(reference: blind_bwe_tester.py:700-704)"""
        nfft = self.blind_cfg.nfft
        freqs = jnp.asarray(rfftfreq(nfft, self.fs))
        H = design_filter(jnp.asarray(params[0]), jnp.asarray(params[1]), freqs)
        return apply_filter(jnp.asarray(seg), H, nfft)

    def _test_filter(self):
        tf = self.args.tester.blind_bwe.test_filter
        return np.asarray([np.atleast_1d(tf.fc), np.atleast_1d(tf.A)], dtype=np.float32)

    def _prepare_informed_filter(self, typefilter: str):
        if typefilter == "fc_A":
            return self._test_filter(), "fc_A"
        return D.prepare_filter(self.args, self.fs)

    def _maybe_add_snr_noise(self, y: jnp.ndarray, snr_db) -> jnp.ndarray:
        """(reference: blind_bwe_tester.py:636-641)"""
        if snr_db in (None, "None"):
            return y
        snr = 10 ** (float(snr_db) / 10)
        sigma = jnp.sqrt(jnp.var(y, -1, keepdims=True) / snr)
        return y + sigma * jax.random.normal(self.next_key(), y.shape)

    # ---------------------------------------------------------------- modes

    def sample_unconditional(self):
        """(reference: blind_bwe_tester.py:306-320)"""
        ucfg = self.args.tester.unconditional
        shape = (int(ucfg.num_samples), int(ucfg.audio_len))
        s = self.sampler()
        jit_kw = {}
        if self.n_devices > 1 and shape[0] % self.n_devices == 0:
            # generate samples data-parallel across the eval mesh
            jit_kw["out_shardings"] = batch_sharding(self.mesh)
        run = self._jitted("uncond", lambda k: s.predict_unconditional(k, shape),
                           **jit_kw)
        preds = np.asarray(run(self.next_key()))
        ulog.write_audio_file(preds, self.fs, "unconditional", self.paths["unconditional"])
        return preds

    def test_inpainting(self):
        """Masked-gap restoration demo (reference: testing/tester.py:242-300)."""
        if self.test_set is None:
            print("No test set specified, skipping inpainting test")
            return None
        icfg = self.args.tester.inpainting
        gap = int(float(icfg.gap_length) * self.fs / 1000)
        gap = min(gap, self.audio_len // 2)  # a gap larger than the segment
        # would zero the whole observation and degenerate the guidance
        start = icfg.get("start_gap_idx", None)
        start = (self.audio_len - gap) // 2 if start in (None, "None") else int(
            float(start) * self.fs / 1000
        )
        mask = np.ones((1, self.audio_len), np.float32)
        mask[:, start : start + gap] = 0.0
        mask = jnp.asarray(mask)
        s = self.sampler()
        run = self._jitted(
            "inpaint", lambda k, ym: s.predict_inpainting(k, ym, mask)
        )
        outs = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            seg = jnp.asarray(self.resample_audio(original, fs))
            pred = run(self.next_key(), seg * mask)
            outs.append(np.asarray(pred))
            n = os.path.splitext(name)[0]
            ulog.write_audio_file(np.asarray(pred), self.fs, n, self.paths["inpainting"])
        return np.concatenate(outs, 0) if outs else None

    def test_bwe(self, typefilter=None, test_filter_fit=None, compute_sweep=None):
        """Informed BWE over the test set (reference: blind_bwe_tester.py:582-694).

        With ``test_filter_fit`` the filter optimizer runs diagnostically at
        every step (guidance uses the fixed known filter) and the fitted
        (fc, A) trajectory is saved per item; with ``compute_sweep`` the
        (fc, A) loss-landscape grid is evaluated per step and dumped as
        data_norms<i>.npy / data_grads<i>.npy (reference :646-653)."""
        if self.test_set is None:
            print("No test set specified, skipping bwe test")
            return None
        be = self.args.tester.bandwidth_extension
        if test_filter_fit is None:
            test_filter_fit = bool(be.get("test_filter_fit", False))
        if compute_sweep is None:
            compute_sweep = bool(be.get("compute_sweep", False))
        typefilter = typefilter or be.filter.type
        filt, ftype = self._prepare_informed_filter(typefilter)
        os.makedirs(self.paths["bwe"], exist_ok=True)
        s = self.sampler()
        run = self._jitted(
            f"bwe_{ftype}_fit{test_filter_fit}_sw{compute_sweep}",
            lambda k, y: s.predict_bwe(
                k, y, filt, ftype,
                test_filter_fit=test_filter_fit, compute_sweep=compute_sweep,
            ),
        )
        outs = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            n = os.path.splitext(name)[0]
            seg = jnp.asarray(self.resample_audio(original, fs))
            if ftype == "fc_A":
                y = self.apply_lowpass_fcA(seg, filt)
            else:
                y = D.degradation_from_filter(filt, ftype)(seg)
            y = self._maybe_add_snr_noise(
                y, self.args.tester.blind_bwe.get("SNR_observations", "None")
            )
            out = run(self.next_key(), y)
            if test_filter_fit and compute_sweep:
                pred, dens, t, filts, norms, grads = out
                np.save(os.path.join(self.paths["bwe"], f"data_norms{i}.npy"),
                        np.asarray(norms))
                np.save(os.path.join(self.paths["bwe"], f"data_grads{i}.npy"),
                        np.asarray(grads))
            elif test_filter_fit:
                pred, dens, t, filts = out
            else:
                pred = out
            if test_filter_fit:
                ulog.save_trajectory(self.paths["bwe"], n + "_filter_fit",
                                     denoised=dens, t=t, filters=filts)
                ulog.plot_filter_response(
                    [np.asarray(filts[-1]), np.asarray(filt)]
                    if ftype == "fc_A" else [np.asarray(filts[-1])],
                    rfftfreq(self.blind_cfg.nfft, self.fs),
                    os.path.join(self.paths["bwe"], n + "_fitted_filter.png"),
                    labels=["fitted", "reference"] if ftype == "fc_A"
                    else ["fitted"],
                )
            pred = np.asarray(pred)
            outs.append(pred)
            ulog.write_audio_file(np.asarray(seg), self.fs, n, self.paths["bwe"] + "_original")
            ulog.write_audio_file(np.asarray(y), self.fs, n, self.paths["bwe"] + "_degraded")
            ulog.write_audio_file(pred, self.fs, n, self.paths["bwe"] + "_reconstructed")
        return np.concatenate(outs, 0) if outs else None

    def test_blind_bwe(self, typefilter="fc_A", compute_sweep=False):
        """Synthetic blind BWE (reference: blind_bwe_tester.py:1037-1224)."""
        if self.test_set is None:
            print("No test set specified, skipping blind bwe test")
            return None
        bb = self.args.tester.blind_bwe
        da_filter = self._test_filter()
        s = self.sampler()
        run = self._jitted(
            "blind_bwe", lambda k, y: s.predict_blind_bwe(k, y, rid=True)
        )
        results = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            n = os.path.splitext(name)[0]
            seg = jnp.asarray(self.resample_audio(original, fs))
            # gain normalization (reference :1081-1091)
            sn = bb.get("sigma_norm", "None")
            if sn not in (None, "None"):
                seg = float(sn) * seg / jnp.std(seg, -1, keepdims=True)
            gain = float(bb.get("gain_boost", 0) or 0)
            if gain != 0:
                seg = seg * 10 ** (gain / 20)
            y = self.apply_lowpass_fcA(seg, da_filter)
            y = self._maybe_add_snr_noise(y, bb.get("SNR_observations", "None"))
            pred, est_params, dens, t, filts, scores = run(self.next_key(), y)
            y_est = self.apply_lowpass_fcA(seg, est_params)
            dbmse = float(
                filter_db_mse(
                    jnp.asarray(da_filter), est_params,
                    jnp.asarray(rfftfreq(self.blind_cfg.nfft, self.fs)),
                )
            )
            from babe_tpu.utils.metrics import lsd, lsd_high_band

            fc0 = float(np.atleast_1d(np.asarray(da_filter[0]))[0])
            self.metrics.log(
                {"mode": "blind_bwe", "item": n, "filter_db_mse": dbmse,
                 "lsd": float(lsd(seg, pred).mean()),
                 "lsd_high_band": float(
                     lsd_high_band(seg, pred, self.fs, fc0).mean()
                 ),
                 # degraded-input baseline: the number BWE must beat
                 "lsd_degraded": float(lsd(seg, y).mean()),
                 "lsd_high_band_degraded": float(
                     lsd_high_band(seg, y, self.fs, fc0).mean()
                 ),
                 "fc_est": np.asarray(est_params[0]).tolist(),
                 "A_est": np.asarray(est_params[1]).tolist()},
                step=i,
            )
            for tag, audio in (("original", seg), ("degraded", y),
                               ("reconstructed", pred), ("estimate", y_est)):
                ulog.write_audio_file(np.asarray(audio), self.fs, n,
                                      self.paths["blind_bwe"] + "_" + tag)
            ulog.save_trajectory(self.paths["blind_bwe"], n + "_rid",
                                 denoised=dens, t=t, filters=filts,
                                 score=scores)
            ulog.diffusion_spec_animation(
                dens, t, os.path.join(self.paths["blind_bwe"], n + "_anim.gif"),
                fs=self.fs,
            )
            ulog.plot_filter_response(
                [np.asarray(est_params), da_filter],
                rfftfreq(self.blind_cfg.nfft, self.fs),
                os.path.join(self.paths["blind_bwe"], n + "_filter.png"),
                labels=["estimated", "reference"],
            )
            results.append((np.asarray(pred), np.asarray(est_params)))
        return results

    def test_real_blind_bwe(self, typefilter="fc_A", compute_sweep=False):
        """Blind BWE on real recordings (reference: blind_bwe_tester.py:871-1035)."""
        bb = self.args.tester.blind_bwe
        path = str(bb.real_recordings.path)
        files = sorted(_glob.glob(os.path.join(path, "*.wav")))
        files = files[: int(bb.real_recordings.num_samples)]
        if not files:
            print("no real recordings found, skipping")
            return None
        from babe_tpu.data.wavio import read_wav, to_mono

        s = self.sampler()
        run = self._jitted(
            "blind_bwe", lambda k, y: s.predict_blind_bwe(k, y, rid=True)
        )
        results = []
        for i, f in enumerate(files):
            d, fs = read_wav(f)
            n = os.path.splitext(os.path.basename(f))[0] + typefilter
            seg = jnp.asarray(self.resample_audio(to_mono(d), fs))
            sn = bb.get("sigma_norm", "None")
            if sn not in (None, "None"):
                seg = float(sn) * seg / jnp.std(seg, -1, keepdims=True)
            pred, est_params, dens, t, filts, scores = run(self.next_key(), seg)
            ulog.write_audio_file(np.asarray(seg), self.fs, n,
                                  self.paths["real_blind_bwe"] + "_degraded")
            ulog.write_audio_file(np.asarray(pred), self.fs, n,
                                  self.paths["real_blind_bwe"] + "_reconstructed")
            ulog.save_trajectory(self.paths["real_blind_bwe"], n + "_rid",
                                 denoised=dens, t=t, filters=filts,
                                 score=scores)
            self.metrics.log({"mode": "real_blind_bwe", "item": n,
                              "fc_est": np.asarray(est_params[0]).tolist(),
                              "A_est": np.asarray(est_params[1]).tolist()}, step=i)
            results.append((np.asarray(pred), np.asarray(est_params)))
        return results

    # ------------------------------------------- long-form (AR / OLA) modes

    def _ar_loop(self, degraded: np.ndarray, est_filter, ftype: str):
        """AR-chunked informed BWE over a full recording
        (reference: blind_bwe_tester.py:786-867)."""
        cr = self.args.tester.complete_recording
        segL = self.audio_len
        overlap = int(float(cr.overlap) * self.fs)
        discard_end = 200
        s = self.sampler()
        run_first = self._jitted(
            f"ar_first_{ftype}",
            lambda k, y: s.predict_bwe(k, y, est_filter, ftype),
        )
        smooth = 50 if bool(cr.get("inpaint_DC", False)) else 0
        mask = np.ones((1, segL), np.float32)
        mask[:, overlap:] = 0
        # ONE jitted AR-step program for every chunk including the final short
        # one: the mask and its host-feathered smooth variant are traced
        # arguments, not closed-over constants (avoids a recompile per file)
        from babe_tpu.sampling.blind import prepare_smooth_mask

        def _smooth_of(m: np.ndarray) -> jnp.ndarray:
            if smooth > 0:
                return jnp.asarray(prepare_smooth_mask(jnp.asarray(m), smooth))
            return jnp.asarray(m)  # placeholder (unused when feathering off)

        run_ar = self._jitted(
            f"ar_step_{ftype}_dc{smooth}",
            lambda k, y, ym, m, sm: s.predict_bwe_AR(
                k, y, ym, est_filter, ftype, m,
                smooth_mask=sm if smooth > 0 else None,
            ),
        )
        mask_j = jnp.asarray(mask)
        mask_sm = _smooth_of(mask)
        L = degraded.shape[-1]
        final = np.zeros_like(degraded)
        ix = 0
        seg = jnp.asarray(degraded[..., :segL])
        pred = np.asarray(run_first(self.next_key(), seg))
        prev = pred[..., : segL - discard_end]
        final[..., : segL - discard_end] = prev
        ix += segL - overlap - discard_end
        while ix < L - segL - discard_end:
            y_masked = np.zeros((1, segL), np.float32)
            y_masked[..., :overlap] = prev[..., segL - overlap - discard_end :]
            seg = jnp.asarray(degraded[..., ix : ix + segL])
            pred = np.asarray(
                run_ar(self.next_key(), seg, jnp.asarray(y_masked), mask_j, mask_sm)
            )
            prev = pred[..., : segL - discard_end]
            final[..., ix : ix + segL - discard_end] = prev
            ix += segL - overlap - discard_end
        # last (possibly short) segment, zero-padded (reference :840-860) —
        # same compiled program, different mask DATA (no recompile per file)
        seg = degraded[..., ix:]
        y_masked = np.zeros((1, segL), np.float32)
        y_masked[..., :overlap] = pred[..., -overlap:]
        last_mask = mask.copy()
        if seg.shape[-1] < segL:
            seg_zp = np.pad(seg, ((0, 0), (0, segL - seg.shape[-1])))
            y_masked[..., seg.shape[-1] :] = seg_zp[..., seg.shape[-1] :]
            last_mask[..., seg.shape[-1] :] = 0
        else:
            seg_zp = seg[..., :segL]
        pred = np.asarray(
            run_ar(self.next_key(), jnp.asarray(seg_zp), jnp.asarray(y_masked),
                   jnp.asarray(last_mask), _smooth_of(last_mask))
        )
        final[..., ix:] = pred[..., : seg.shape[-1]]
        return final

    def test_real_blind_bwe_complete(self, typefilter="fc_A", use_denoiser=None):
        """Whole-recording restoration: (optional denoise) -> normalize ->
        blind filter estimate on segments -> AR-chunked informed BWE
        (reference: blind_bwe_tester.py:710-868,
        denoise_and_bwe_tester.py:248-413)."""
        from babe_tpu.data.wavio import read_wav, to_mono

        cr = self.args.tester.complete_recording
        filename = str(cr.path)
        d, fs = read_wav(filename)
        degraded = np.atleast_2d(to_mono(d)).astype(np.float32)
        if fs != self.fs:
            degraded = np.asarray(resample(jnp.asarray(degraded), fs, self.fs))

        if use_denoiser is None:
            use_denoiser = bool(cr.get("use_denoiser", False))
        if use_denoiser and self.denoiser is not None:
            degraded = np.asarray(self.apply_denoiser(jnp.asarray(degraded)))

        std = degraded.std(-1, keepdims=True)
        target_std = float(cr.get("std", 0.1))
        degraded = target_std * degraded / std

        snr_extra = cr.get("SNR_extra_noise", "None")
        if snr_extra not in (None, "None"):
            snr = 10 ** (float(snr_extra) / 10)
            sigma = np.sqrt(target_std**2 / snr)
            degraded = degraded + sigma * np.random.default_rng(0).standard_normal(
                degraded.shape
            ).astype(np.float32)

        segL = self.audio_len
        ix_first = int(self.fs * float(cr.get("ix_start", 0)))
        nseg = int(cr.get("n_segments_blindstep", 1))
        rng = np.random.default_rng(0)
        ys = [degraded[..., ix_first : ix_first + segL]]
        for _ in range(nseg - 1):
            ix = int(rng.integers(0, degraded.shape[-1] - segL))
            ys.append(degraded[..., ix : ix + segL])
        y = jnp.asarray(np.concatenate(ys, axis=0))

        s = self.sampler()
        run_blind = self._jitted(
            f"blind_n{y.shape[0]}", lambda k, yy: s.predict_blind_bwe(k, yy)
        )
        _, est_filter = run_blind(self.next_key(), y)
        est_filter = np.asarray(est_filter)
        self.metrics.log({"mode": "complete", "fc_est": est_filter[0].tolist(),
                          "A_est": est_filter[1].tolist()})

        final = self._ar_loop(degraded, jnp.asarray(est_filter), "fc_A")
        final = final * std / target_std
        n = os.path.splitext(os.path.basename(filename))[0] + typefilter
        out = ulog.write_audio_file(final, self.fs, n + ".reconstructed",
                                    self.paths["complete"])
        return final, est_filter

    def formal_test_bwe(self, typefilter=None, blind=False, robustness=False):
        """Directory batch evaluation with OLA cross-fade or AR continuation,
        idempotent resume (reference: blind_bwe_tester.py:321-578)."""
        from babe_tpu.data.wavio import read_wav, to_mono

        ft = self.args.tester.formal_test
        typefilter = typefilter or self.args.tester.bandwidth_extension.filter.type
        filt, ftype = self._prepare_informed_filter(typefilter)
        if robustness:
            rf = ft.robustness_filter
            from babe_tpu.ops.fir import get_FIR_lowpass

            filt = get_FIR_lowpass(int(rf.order), float(rf.fc), float(rf.beta), self.fs)
            ftype = "firwin"
        filenames = sorted(_glob.glob(os.path.join(str(ft.path), "*.wav")))
        path_out = str(ft.folder)
        os.makedirs(path_out, exist_ok=True)
        segL = self.audio_len
        discard_end = 200
        use_ar = bool(ft.get("use_AR", False))
        OLA = int(ft.get("OLA", 2048))
        s = self.sampler()
        hann = np.hanning(2 * OLA + 1)[:-1].astype(np.float32)  # periodic-ish

        for filename in filenames:
            n = os.path.splitext(os.path.basename(filename))[0]
            out_path = os.path.join(path_out, n + ".wav")
            if os.path.exists(out_path):  # idempotent restart (reference :377-385)
                continue
            d, fs = read_wav(filename)
            Dg = np.atleast_2d(to_mono(d)).astype(np.float32)
            if ftype == "fc_A":
                degraded = np.asarray(self.apply_lowpass_fcA(jnp.asarray(Dg), filt))
            else:
                degraded = np.asarray(D.degradation_from_filter(filt, ftype)(jnp.asarray(Dg)))
            if fs != self.fs:
                degraded = np.asarray(resample(jnp.asarray(degraded), fs, self.fs))
            L = degraded.shape[-1]
            if L < segL:
                print(
                    f"SKIPPED {filename}: length {L} < segment length {segL} "
                    "(formal_test_bwe requires at least one full segment)"
                )
                continue
            final = np.zeros_like(degraded)
            filter_data = []

            if use_ar and not blind:
                final = self._ar_loop(degraded, filt if ftype == "fc_A" else jnp.asarray(filt), ftype)
            else:
                # OLA chunks are independent — batch them through one jitted
                # sampler call (the reference loops them at batch size 1,
                # blind_bwe_tester.py:359 "not the most efficient way").
                hop = segL - discard_end - OLA
                starts = list(range(0, max(L - segL - discard_end, 1), hop))
                tail_ix = starts[-1] + hop
                segs = [degraded[0, ix : ix + segL] for ix in starts]
                tail = degraded[0, tail_ix:]
                tail_len = tail.shape[-1]
                segs.append(np.pad(tail, (0, segL - tail_len))
                            if tail_len < segL else tail[:segL])
                segs = np.stack(segs)  # [n_chunks, segL]
                if blind:
                    # per-chunk blind estimation is embarrassingly parallel
                    # with PER-ITEM filters: vmap the whole blind sampler over
                    # the chunk axis (each lane gets its own key, filter fit,
                    # and guidance normalization — semantically the bs=1 loop
                    # the reference runs, blind_bwe_tester.py:359 "not the
                    # most efficient way"), then shard the chunk batch across
                    # the eval mesh like the informed path (VERDICT r3 #3).
                    cb = max(int(ft.get("chunk_batch", 4)), 1)
                    cb = -(-cb // self.n_devices) * self.n_devices
                    if segs.shape[0] % cb:
                        reps = cb - segs.shape[0] % cb
                        segs_in = np.concatenate(
                            [segs, segs[-1:].repeat(reps, 0)], 0)
                    else:
                        segs_in = segs
                    run_blind_b = self._jitted(
                        f"formal_blind_b{cb}",
                        lambda ks, ys: jax.vmap(
                            lambda k, y: s.predict_blind_bwe(k, y[None])
                        )(ks, ys),
                    )
                    preds, ests = [], []
                    for b0 in range(0, segs_in.shape[0], cb):
                        nb = segs_in[b0 : b0 + cb].shape[0]
                        keys = jnp.stack([self.next_key() for _ in range(nb)])
                        pred_b, est_b = run_blind_b(
                            self._shard(keys),
                            self._shard(segs_in[b0 : b0 + cb]),
                        )
                        preds.append(np.asarray(pred_b)[:, 0])
                        ests.append(np.asarray(est_b))
                    preds = np.concatenate(preds, 0)[: segs.shape[0]]
                    ests = np.concatenate(ests, 0)[: segs.shape[0]]
                    filter_data = [((row,), ests[row])
                                   for row in range(ests.shape[0])]
                else:
                    # informed chunks share the filter: batch them AND shard
                    # the chunk batch across the eval mesh (per-chip OLA
                    # chunk parallelism — SURVEY.md §2.10)
                    cb = max(int(ft.get("chunk_batch", 4)), 1)
                    cb = -(-cb // self.n_devices) * self.n_devices
                    if segs.shape[0] % cb:  # pad to a full batch (static shapes)
                        reps = cb - segs.shape[0] % cb
                        segs_in = np.concatenate([segs, segs[-1:].repeat(reps, 0)], 0)
                    else:
                        segs_in = segs
                    run_b = self._jitted(
                        f"formal_b{cb}_{ftype}",
                        lambda k, y: s.predict_bwe(k, y, filt, ftype),
                    )
                    preds = []
                    for b0 in range(0, segs_in.shape[0], cb):
                        pred_b = run_b(
                            self.next_key(), self._shard(segs_in[b0 : b0 + cb])
                        )
                        preds.append(np.asarray(pred_b))
                    preds = np.concatenate(preds, 0)[: segs.shape[0]]

                for row, ix in enumerate(starts):
                    win = preds[row, : segL - discard_end].copy()
                    if row > 0:
                        win[:OLA] *= hann[:OLA]
                    win[-OLA:] *= hann[OLA:]
                    if row == 0:
                        final[0, : segL - discard_end] = win
                    else:
                        final[0, ix : ix + segL - discard_end] += win
                # tail_len can exceed segL by up to discard_end (the loop
                # stops at the last FULL segment + discard margin); the
                # prediction only covers segL samples, so clamp the write
                # and fall back to the degraded input for the residual
                # <= discard_end samples at the very end of the file (the
                # reference crashes on this case, blind_bwe_tester.py:563-564)
                m = min(tail_len, segL)
                win = preds[-1, :m].copy()
                win[:OLA] *= hann[:OLA]
                final[0, tail_ix : tail_ix + m] += win
                if tail_len > segL:
                    final[0, tail_ix + segL :] = degraded[0, tail_ix + segL :]
                    # short linear crossfade across the splice so the
                    # enhanced tail doesn't hard-cut into the raw degraded
                    # fill (an audible click otherwise; ADVICE r4)
                    xf = min(int(OLA), segL, tail_ix + segL)
                    if xf > 1:
                        sp = tail_ix + segL - xf
                        ramp = np.linspace(1.0, 0.0, xf, endpoint=False,
                                           dtype=np.float32)
                        final[0, sp : sp + xf] = (
                            final[0, sp : sp + xf] * ramp
                            + degraded[0, sp : sp + xf] * (1.0 - ramp))

            ulog.write_audio_file(final, self.fs, n, path_out)
            if blind:
                with open(os.path.join(path_out, n + ".filter_data.pkl"), "wb") as f:
                    pickle.dump(filter_data, f)

    def formal_test_bwe_small(self):
        """Fixed-length pre-cut wavs, fc_A degradation, filter dB-MSE metric
        (reference: blind_bwe_tester_small.py:300-430)."""
        from babe_tpu.data.wavio import read_wav, to_mono

        ft = self.args.tester.formal_test
        da_filter = self._test_filter()
        filenames = sorted(_glob.glob(os.path.join(str(ft.path), "*.wav")))
        path_out = str(ft.folder)
        os.makedirs(path_out, exist_ok=True)
        s = self.sampler()
        run_blind = self._jitted(
            "formal_blind", lambda k, y: s.predict_blind_bwe(k, y)
        )
        freqs = jnp.asarray(rfftfreq(self.blind_cfg.nfft, self.fs))
        mses = []
        for i, filename in enumerate(filenames):
            n = os.path.splitext(os.path.basename(filename))[0]
            out_path = os.path.join(path_out, n + ".wav")
            if os.path.exists(out_path):
                continue
            d, fs = read_wav(filename)
            seg = jnp.asarray(self.resample_audio(to_mono(d), fs))
            y = self.apply_lowpass_fcA(seg, da_filter)
            pred, est = run_blind(self.next_key(), y)
            mse = float(filter_db_mse(jnp.asarray(da_filter), est, freqs))
            mses.append(mse)
            self.metrics.log({"mode": "formal_small", "item": n,
                              "filter_db_mse": mse}, step=i)
            ulog.write_audio_file(np.asarray(pred), self.fs, n, path_out)
        if mses:
            print(f"filter dB-MSE mean over {len(mses)} items: {np.mean(mses):.3f}")
        return mses

    def test_mushra(self, typefilter="fc_A", compute_sweep=False):
        """Generate MUSHRA listening-test stimuli from a recordings dir
        (reference: blind_bwe_tester_mushra.py:1001-1212).  Per item writes
        the full stimulus set: original (hidden reference), degraded (the
        lowpass anchor built from tester.blind_bwe.test_filter), and the blind
        reconstruction, plus the rid trajectory; with compute_sweep also the
        per-item data_t/data_denoised/data_filters npy dumps (:1119-1125)."""
        from babe_tpu.data.wavio import read_wav, to_mono

        bb = self.args.tester.blind_bwe
        files = sorted(
            _glob.glob(os.path.join(str(bb.real_recordings.path), "*.wav"))
        )[: int(bb.real_recordings.num_samples)]
        da_filter = self._test_filter()
        os.makedirs(self.paths["mushra"], exist_ok=True)
        s = self.sampler()
        run_blind = self._jitted(
            "blind_bwe", lambda k, y: s.predict_blind_bwe(k, y, rid=True)
        )
        for i, f in enumerate(files):
            d, fs = read_wav(f)
            n = os.path.splitext(os.path.basename(f))[0] + typefilter
            seg = jnp.asarray(to_mono(d), jnp.float32)[None, : self.audio_len]
            if seg.shape[-1] < self.audio_len:
                seg = jnp.pad(seg, ((0, 0), (0, self.audio_len - seg.shape[-1])))
            y = self.apply_lowpass_fcA(seg, da_filter)
            y = self._maybe_add_snr_noise(y, bb.get("SNR_observations", "None"))
            pred, est, dens, t, filts, scores = run_blind(self.next_key(), y)
            # 4th stimulus: the estimated filter re-applied to the original
            # (reference blind_bwe_tester_mushra.py:1003-1004
            # "degraded_estimate_audio" column)
            y_est = self.apply_lowpass_fcA(seg, est)
            for tag, audio in (("original", seg), ("degraded", y),
                               ("reconstructed", pred),
                               ("degraded_estimate", y_est)):
                ulog.write_audio_file(np.asarray(audio), self.fs, n,
                                      self.paths["mushra"] + "_" + tag)
            ulog.save_trajectory(self.paths["mushra"], n + "_rid",
                                 denoised=dens, t=t, filters=filts,
                                 score=scores)
            if compute_sweep:
                np.save(os.path.join(self.paths["mushra"], f"data_t{i}.npy"),
                        np.asarray(t))
                np.save(os.path.join(self.paths["mushra"],
                                     f"data_denoised{i}.npy"), np.asarray(dens))
                np.save(os.path.join(self.paths["mushra"],
                                     f"data_filters{i}.npy"), np.asarray(filts))

    # ------------------------------------------- additional inverse problems

    def test_declipping(self):
        """Declipping at a target SDR (reference: edm_sampler.py:359-384 +
        tester declipping config block)."""
        if self.test_set is None:
            return None
        sdr = float(self.args.tester.declipping.get("SDR", 3))
        s = self.sampler()
        outs = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            seg = jnp.asarray(self.resample_audio(original, fs))
            # find the clip level giving the requested SDR
            level = jnp.std(seg) * 10 ** (-sdr / 20) * 2
            y = jnp.clip(seg, -level, level)
            run = self._jitted(
                "declip", lambda k, yy, lv: s.predict_declipping(k, yy, lv)
            )
            pred = np.asarray(run(self.next_key(), y, level))
            outs.append(pred)
            n = os.path.splitext(name)[0]
            ulog.write_audio_file(pred, self.fs, n, self.paths["bwe"] + "_declipped")
        return np.concatenate(outs, 0) if outs else None

    def test_phase_retrieval(self):
        """(reference: edm_sampler.py:308-336 + phase_retrieval config)"""
        if self.test_set is None:
            return None
        pr = self.args.tester.phase_retrieval
        win, hop = int(pr.win_size), int(pr.hop_size)
        s = self.sampler()
        run = self._jitted(
            "pr", lambda k, ym: s.predict_phase_retrieval(k, ym, win, hop)
        )
        outs = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            seg = jnp.asarray(self.resample_audio(original, fs))
            y_mag = D.make_stft_mag(win, hop)(seg)
            pred = np.asarray(run(self.next_key(), y_mag))
            outs.append(pred)
            n = os.path.splitext(name)[0]
            ulog.write_audio_file(pred, self.fs, n, self.paths["bwe"] + "_pr")
        return np.concatenate(outs, 0) if outs else None

    def test_comp_sens(self):
        """Compressive sensing: random sample mask
        (reference: edm_sampler.py:337-357 + comp_sens config)."""
        if self.test_set is None:
            return None
        pct = float(self.args.tester.comp_sens.get("percentage", 5))
        mask = (
            jax.random.uniform(jax.random.PRNGKey(0), (1, self.audio_len))
            < pct / 100.0
        ).astype(jnp.float32)
        s = self.sampler()
        run = self._jitted(
            "compsens", lambda k, ym: s.predict_compsens(k, ym, mask)
        )
        outs = []
        for i in range(len(self.test_set)):
            original, fs, name = self.test_set[i]
            seg = jnp.asarray(self.resample_audio(original, fs))
            pred = np.asarray(run(self.next_key(), seg * mask))
            outs.append(pred)
            n = os.path.splitext(name)[0]
            ulog.write_audio_file(pred, self.fs, n, self.paths["bwe"] + "_cs")
        return np.concatenate(outs, 0) if outs else None

    # --------------------------------------------------------- denoiser chain

    def apply_denoiser(self, x: jnp.ndarray) -> jnp.ndarray:
        """Chunked OLA denoising with hamming cross-fade
        (reference: denoise_and_bwe_tester.py:109-141)."""
        assert self.denoiser is not None
        model, variables = self.denoiser
        return model.apply_chunked_ola(variables, x)

    # ------------------------------------------------------------- dispatch

    def dodajob(self):
        """(reference: blind_bwe_tester.py:1228-1256)"""
        modes = list(self.args.tester.modes)
        results = {}
        for mode in modes:
            if mode == "unconditional":
                results[mode] = self.sample_unconditional()
            elif mode == "inpainting":
                results[mode] = self.test_inpainting()
            elif mode == "bwe":
                results[mode] = self.test_bwe()
            elif mode == "blind_bwe":
                results[mode] = self.test_blind_bwe()
            elif mode == "real_blind_bwe":
                results[mode] = self.test_real_blind_bwe()
            elif mode == "real_blind_bwe_complete":
                results[mode] = self.test_real_blind_bwe_complete()
            elif mode == "formal_test_bwe":
                ft = self.args.tester.formal_test
                results[mode] = self.formal_test_bwe(
                    blind=bool(ft.get("blind", False)),
                    robustness=bool(ft.get("robustness", False)),
                )
            elif mode == "declipping":
                results[mode] = self.test_declipping()
            elif mode == "phase_retrieval":
                results[mode] = self.test_phase_retrieval()
            elif mode == "comp_sens":
                results[mode] = self.test_comp_sens()
            elif mode == "formal_test_bwe_small":
                results[mode] = self.formal_test_bwe_small()
            elif mode == "mushra":
                results[mode] = self.test_mushra(
                    compute_sweep=bool(
                        self.args.tester.blind_bwe.get("compute_sweep", False)
                    )
                )
            else:
                raise NotImplementedError(f"tester mode {mode!r}")
        self.close()
        return results

    def close(self):
        """Release the metrics JSONL handle (and wandb run). Idempotent —
        called at the end of ``dodajob`` and safe for library embedders."""
        self.metrics.close()
