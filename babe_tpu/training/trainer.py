"""Training runtime: optax Adam + LR ramp + grad clip + EMA, DP-sharded step.

Functional re-design of the reference Trainer (training/trainer.py:35-589):
all mutable training state lives in one pytree (TrainState) threaded through a
single jitted, data-parallel train step; host-side code only feeds batches,
logs, and checkpoints.

Parity notes:
  * Adam betas/eps and lr from exp config (reference utils/setup.py:70-73),
  * linear LR ramp-up lr * min(it/rampup, 1) (training/trainer.py:402-405),
  * global-norm grad clip (:412-413),
  * EMA rate 0.9999 with linear warmup over ema_rampup *samples*
    (t = it * batch, :426-439),
  * sigma-binned loss statistics for logging (:314-361 — here computed
    on-device and reduced to a small vector).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from babe_tpu.diffusion.edm import EDM
from babe_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

# orbax checkpoint layout, shared with the tester's loader
# (babe_tpu/testers/tester.py imports these — keep in sync by reference)
ORBAX_EXT = ".orbax"
ORBAX_ARGS_SIDECAR = "train_args.json"


@flax.struct.dataclass
class TrainState:
    params: Any
    buffers: Any
    opt_state: Any
    ema: Any
    it: jnp.ndarray  # scalar int32


def make_optimizer(exp_cfg) -> optax.GradientTransformation:
    lr = float(exp_cfg.lr)
    rampup = max(int(exp_cfg.get("lr_rampup_it", 0)), 1)
    sched = lambda step: lr * jnp.minimum(step / rampup, 1.0)
    chain = []
    if exp_cfg.get("use_grad_clip", True):
        chain.append(optax.clip_by_global_norm(float(exp_cfg.get("max_grad_norm", 1.0))))
    opt = exp_cfg.get("optimizer", {})
    chain.append(
        optax.adam(
            learning_rate=sched,
            b1=float(opt.get("beta1", 0.9)),
            b2=float(opt.get("beta2", 0.999)),
            eps=float(opt.get("eps", 1e-8)),
        )
    )
    return optax.chain(*chain)


def make_train_step(model, edm: EDM, optimizer, exp_cfg, num_sigma_bins: int = 10,
                    teacher_apply=None, pd_stage: int = 0):
    """Returns step(state, batch, key) -> (state, metrics) — pure, jittable.

    With ``teacher_apply`` (a bound (x, cnoise) -> out closure over frozen
    teacher weights) and an EDMPD diff-params object, the step drives
    progressive distillation through ``loss_fn_PD`` instead of the standard
    EDM loss (reference: diff_params/edm_PD.py:220-293 — the reference never
    wired a teacher into its trainer; this completes that path)."""
    ema_rate = float(exp_cfg.get("ema_rate", 0.9999))
    ema_rampup = float(exp_cfg.get("ema_rampup", 10000))
    batch_size = int(exp_cfg.get("batch", 4))
    use_dc = bool(exp_cfg.get("use_cqt_DC_correction", False))
    smin, smax = edm.p.sigma_min, edm.p.sigma_max
    bin_edges = jnp.logspace(
        jnp.log10(smin), jnp.log10(smax), num_sigma_bins
    )

    num_accum = int(exp_cfg.get("num_accumulation_rounds", 1))

    if teacher_apply is not None:
        assert hasattr(edm, "loss_fn_PD"), (
            "teacher plumbing requires EDMPD diff params"
        )

        def loss_fn(params, buffers, batch, key):
            net = lambda x, cn: model.apply(
                {"params": params, "buffers": buffers}, x, cn
            )
            error2, sigma = edm.loss_fn_PD(
                key, net, teacher_apply, batch, pd_stage
            )
            return error2.mean(), (error2, sigma)
    else:
        def loss_fn(params, buffers, batch, key):
            net = lambda x, cn: model.apply(
                {"params": params, "buffers": buffers}, x, cn
            )
            error2, sigma = edm.loss_fn(key, net, batch, use_cqt_DC_correction=use_dc)
            return error2.mean(), (error2, sigma)

    def step(state: TrainState, batch, key):
        # training always differentiates the exact full-precision convs,
        # even if a same-process BABE.load(precision='int8') set
        # BABE_INT8_BWD=1 for inference (conv_kernels.exact_backward wins
        # over the env var at trace time; QAT under BABE_PRECISION=int8
        # keeps its quantized FORWARD — only the backward is pinned exact)
        from babe_tpu.ops.conv_kernels import exact_backward

        with exact_backward():
            return _step_body(state, batch, key)

    def _step_body(state: TrainState, batch, key):
        if num_accum > 1:
            # gradient accumulation: batch is [rounds*B, T], averaged grads
            # (reference: training/trainer.py:387-398)
            rounds = batch.reshape(num_accum, -1, *batch.shape[1:])
            keys = jax.random.split(key, num_accum)

            def accum(carry, inp):
                b, k = inp
                (l, (e2, sig)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.buffers, b, k
                )
                g_sum, l_sum = carry
                return (jax.tree.map(jnp.add, g_sum, g), l_sum + l), (e2, sig)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), (e2s, sigs) = jax.lax.scan(
                accum, (zeros, 0.0), (rounds, keys)
            )
            grads = jax.tree.map(lambda g: g / num_accum, g_sum)
            loss = l_sum / num_accum
            error2 = e2s.reshape(-1, *e2s.shape[2:])
            sigma = sigs.reshape(-1, *sigs.shape[2:])
        else:
            (loss, (error2, sigma)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.buffers, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # non-finite guard: a NaN/inf loss or gradient would permanently
        # poison params/opt_state/EMA in one donated step.  Branchless
        # select keeps the previous state instead (costs one tree-select,
        # <1 ms at 40 M params); the host loop warns and halts on repeats.
        finite = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        pick = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new, old)
        params = pick(params, state.params)
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "shape") else n,
            opt_state, state.opt_state,
        )

        # EMA with linear warmup over samples (reference :426-439); a
        # non-finite step keeps the EMA untouched too (blending toward the
        # reverted params during warmup would still drag the EMA)
        t = state.it.astype(jnp.float32) * batch_size
        s = jnp.where(
            t < ema_rampup, jnp.clip(t / ema_rampup, 0.0, ema_rate), ema_rate
        )
        ema = pick(
            jax.tree.map(lambda e, p: e * s + p * (1.0 - s), state.ema, params),
            state.ema,
        )

        # sigma-binned loss stats (on-device, small vector out)
        per_item = error2.mean(axis=tuple(range(1, error2.ndim)))
        sig = sigma.reshape(-1)
        bin_idx = jnp.searchsorted(bin_edges, sig)
        sums = jnp.zeros(num_sigma_bins + 1).at[bin_idx].add(per_item)
        sqsums = jnp.zeros(num_sigma_bins + 1).at[bin_idx].add(per_item**2)
        counts = jnp.zeros(num_sigma_bins + 1).at[bin_idx].add(1.0)

        new_state = TrainState(
            params=params, buffers=state.buffers, opt_state=opt_state,
            # a skipped (non-finite) step must not advance the iteration
            # clock either: LR ramp and EMA warmup are keyed on `it`, so
            # "state untouched" includes the schedules (VERDICT r3 #5)
            ema=ema, it=state.it + finite.astype(jnp.int32),
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "nonfinite": ~finite,
            "sigma_bin_sums": sums,
            "sigma_bin_sqsums": sqsums,
            "sigma_bin_counts": counts,
        }
        return new_state, metrics

    return step


class Trainer:
    """Imperative shell around the functional train step
    (role of reference training/trainer.py Trainer)."""

    def __init__(self, args, dset, model, edm: EDM, tester=None, mesh=None,
                 teacher=None):
        """``teacher``: optional frozen variables dict enabling progressive-
        distillation training (requires EDMPD diff params; the PD stage is
        read from diff_params.PD.stage, default 0)."""
        self.args = args
        self.dset = dset  # iterator yielding host numpy batches [B, T] (+fs)
        self.model = model
        self.edm = edm
        self.tester = tester
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.optimizer = make_optimizer(args.exp)
        teacher_apply = None
        if teacher is not None:
            teacher_apply = lambda x, cn: model.apply(teacher, x, cn)
        self._pd_stage = int(args.get_path("diff_params.PD.stage", 0) or 0)

        key = jax.random.PRNGKey(int(args.exp.get("seed", 42)))
        self.key, init_key = jax.random.split(key)
        variables = model.init(init_key, batch=1)
        self.state = TrainState(
            params=variables["params"],
            buffers=variables.get("buffers", {}),
            opt_state=self.optimizer.init(variables["params"]),
            ema=jax.tree.map(jnp.copy, variables["params"]),
            it=jnp.asarray(0, jnp.int32),
        )
        self.total_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )

        num_bins = int(args.get_path("logging.num_sigma_bins", 10))
        step = make_train_step(model, edm, self.optimizer, args.exp, num_bins,
                               teacher_apply=teacher_apply,
                               pd_stage=self._pd_stage)
        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        state_sh = jax.tree.map(lambda _: rep, self.state)
        self._jit_step = jax.jit(
            step,
            in_shardings=(state_sh, bs, rep),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,),
        )
        self._resumed = False
        if bool(args.exp.get("resume", False)):
            self._resumed = self.resume_from_checkpoint()

        from babe_tpu.utils.logging import MetricsLogger
        from babe_tpu.utils.profiling import ScheduledProfiler

        self.metrics_log = MetricsLogger(
            os.path.join(str(args.model_dir), "train_logs"),
            use_wandb=bool(args.get_path("exp.wandb.project", None))
            and bool(args.get_path("logging.log", False)),
            config=args.to_dict(),
        )
        self.profiler = ScheduledProfiler.from_config(args)
        self._stat_buffer: list[dict] = []
        # sigma bins for aggregate reporting (reference: trainer.py:156-161)
        nb = int(args.get_path("logging.num_sigma_bins", 10))
        self.sigma_bins = np.logspace(
            np.log10(edm.p.sigma_min), np.log10(edm.p.sigma_max), nb
        )

    # ----------------------------------------------------------- checkpoints

    @property
    def _ckpt_backend(self) -> str:
        """'pickle' (default, single-file, reference-equivalent) or 'orbax'
        (directory-per-checkpoint via orbax.checkpoint.StandardCheckpointer —
        the TPU-idiomatic path: tensor-store backed, multi-host aware,
        forward-compatible with sharded arrays)."""
        backend = str(self.args.exp.get("ckpt_backend", "pickle")).lower()
        if backend not in ("pickle", "orbax"):
            raise ValueError(
                f"exp.ckpt_backend={backend!r}: must be 'pickle' or 'orbax'"
            )
        return backend

    def _ckpt_path(self, it: int) -> str:
        ext = ".ckpt" if self._ckpt_backend == "pickle" else ORBAX_EXT
        return os.path.join(
            str(self.args.model_dir), f"{self.args.exp.exp_name}-{it}{ext}"
        )

    def _state_payload(self):
        return {
            "it": int(self.state.it),
            "params": jax.tree.map(np.asarray, self.state.params),
            "buffers": jax.tree.map(np.asarray, self.state.buffers),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.state.opt_state,
            ),
            "ema": jax.tree.map(np.asarray, self.state.ema),
        }

    def save_checkpoint(self):
        """{it, network, optimizer, ema, args} equivalent
        (reference: training/trainer.py:273-293)."""
        it = int(self.state.it)
        os.makedirs(str(self.args.model_dir), exist_ok=True)
        path = self._ckpt_path(it)
        if self._ckpt_backend == "orbax":
            import json

            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, self._state_payload(), force=True)
            ckptr.wait_until_finished()
            with open(os.path.join(path, ORBAX_ARGS_SIDECAR), "w") as f:
                json.dump(self.args.to_dict(), f, default=str)
        else:
            payload = dict(self._state_payload(), args=self.args.to_dict())
            with open(path, "wb") as f:
                pickle.dump(payload, f)
        if bool(self.args.get_path("logging.remove_last_checkpoint", False)):
            prev = getattr(self, "_latest_ckpt", None)
            if prev and os.path.exists(prev) and prev != path:
                if os.path.isdir(prev):
                    import shutil

                    shutil.rmtree(prev)
                else:
                    os.remove(prev)
        self._latest_ckpt = path
        return path

    def resume_from_checkpoint(self, path: str | None = None) -> bool:
        """Latest exp_name-*.ckpt glob resume (reference :243-270)."""
        import glob as _glob
        import re

        if path is None:
            base = os.path.join(
                str(self.args.model_dir), f"{self.args.exp.exp_name}-*"
            )
            cands = _glob.glob(base + ".ckpt") + _glob.glob(base + ORBAX_EXT)
            rx = re.compile(
                rf"{re.escape(str(self.args.exp.exp_name))}-(\d+)\.(ckpt|orbax)$"
            )
            # ignore checkpoint-like names without a numeric iteration
            # (e.g. a manual '...-best.ckpt' copy must not crash the resume)
            matched = [(int(rx.search(p).group(1)), p)
                       for p in cands if rx.search(p)]
            if not matched:
                return False
            path = max(matched)[1]
        path = path.rstrip("/")
        if path.endswith(ORBAX_EXT) or os.path.isdir(path):
            import orbax.checkpoint as ocp

            template = self._state_payload()
            payload = ocp.StandardCheckpointer().restore(
                os.path.abspath(path), template
            )
        else:
            try:
                with open(path, "rb") as f:
                    payload = pickle.load(f)
            except OSError:
                return False

        def refill(template, data):
            flat_t, treedef = jax.tree.flatten(template)
            flat_d = jax.tree.leaves(data)
            if len(flat_t) != len(flat_d):
                raise ValueError(
                    f"checkpoint {path} does not fit this model/optimizer: "
                    f"{len(flat_d)} stored leaves vs {len(flat_t)} expected "
                    f"— was it saved with a different network config or "
                    f"optimizer? (delete it or fix the config to resume)"
                )
            return jax.tree.unflatten(treedef, [jnp.asarray(d) for d in flat_d])

        self.state = TrainState(
            params=refill(self.state.params, payload["params"]),
            buffers=refill(self.state.buffers, payload["buffers"]),
            opt_state=jax.tree.unflatten(
                jax.tree.structure(self.state.opt_state),
                [
                    jnp.asarray(d) if hasattr(d, "shape") else d
                    for d in jax.tree.leaves(payload["opt_state"])
                ],
            ),
            ema=refill(self.state.ema, payload["ema"]),
            it=jnp.asarray(payload["it"], jnp.int32),
        )
        self._latest_ckpt = path
        print(f"resumed from {path} (it={int(payload['it'])})")
        return True

    # ------------------------------------------------------------- main loop

    def get_batch(self):
        batch = next(self.dset)
        if isinstance(batch, tuple):
            audio, fs = batch
            from babe_tpu.ops.resample import resample_batch

            return np.asarray(
                resample_batch(
                    jnp.asarray(audio), np.asarray(fs),
                    int(self.args.exp.sample_rate), int(self.args.exp.audio_len),
                )
            )
        audio = np.asarray(batch)
        rf = int(self.args.exp.get("resample_factor", 1))
        if rf != 1:
            from babe_tpu.ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), rf, 1))
        return audio[:, : int(self.args.exp.audio_len)]

    def train_step(self):
        batch = self.get_batch()
        self.key, k = jax.random.split(self.key)
        batch = jax.device_put(batch, batch_sharding(self.mesh))
        self.state, metrics = self._jit_step(self.state, batch, k)
        return metrics

    # ------------------------------------------------------------- logging

    def easy_logging(self, it: int):
        """Aggregate and emit buffered scalar stats
        (reference easy_logging: training/trainer.py:441-474)."""
        if not self._stat_buffer:
            return
        losses = np.asarray([m["loss"] for m in self._stat_buffer])
        gnorms = np.asarray([m["grad_norm"] for m in self._stat_buffer])
        sums = np.sum([m["sigma_bin_sums"] for m in self._stat_buffer], axis=0)
        sqsums = np.sum(
            [m["sigma_bin_sqsums"] for m in self._stat_buffer], axis=0
        )
        counts = np.sum([m["sigma_bin_counts"] for m in self._stat_buffer], axis=0)
        per_bin = sums / np.maximum(counts, 1.0)
        per_bin_std = np.sqrt(
            np.maximum(sqsums / np.maximum(counts, 1.0) - per_bin**2, 0.0)
        )
        rec = {
            "loss": float(losses.mean()),
            "loss_std": float(losses.std()),
            "grad_norm": float(gnorms.mean()),
        }
        for edge, v, c in zip(self.sigma_bins, per_bin, counts):
            if c > 0:
                rec[f"error_sigma_{edge:.3g}"] = float(v)
        self.metrics_log.log(rec, step=it)
        # loss-vs-sigma plot (reference: utils/logging.py plot_loss_by_sigma,
        # emitted from easy_logging — trainer.py:441-474)
        used = counts[: len(self.sigma_bins)] > 0
        if used.any():
            from babe_tpu.utils import logging as ulog

            ulog.plot_loss_by_sigma(
                per_bin[: len(self.sigma_bins)][used],
                per_bin_std[: len(self.sigma_bins)][used],
                self.sigma_bins[used],
                os.path.join(str(self.args.model_dir), "train_logs",
                             "loss_by_sigma.png"),
            )
        self._stat_buffer.clear()

    def freq_logging(self, it: int, batch: np.ndarray):
        """Per-octave CQT energy of the training error — the reference's
        frequency-binned loss reporting (training/trainer.py:314-361), done
        on-device with the model's own CQT instead of host librosa."""
        if not hasattr(self.model, "cqt"):
            return
        self.key, k = jax.random.split(self.key)

        def stats(params, buffers, x, key):
            net = lambda xx, cn: self.model.apply(
                {"params": params, "buffers": buffers}, xx, cn
            )
            err2, sigma = self.edm.loss_fn(key, net, x)
            err = jnp.sqrt(err2)
            C = self.model.cqt.fwd(err)
            return jnp.asarray([jnp.mean(jnp.abs(c)) for c in C])

        fn = self._jit_cache_get("freq_stats", stats)
        vals = np.asarray(
            fn(self.state.params, self.state.buffers, jnp.asarray(batch), k)
        )
        rec = {f"error_oct_{o}": float(v) for o, v in enumerate(vals)}
        self.metrics_log.log(rec, step=it)

    def log_feature_stats(self, it: int, batch: np.ndarray):
        """Per-layer activation statistics via flax capture_intermediates —
        the surgeon_pytorch equivalent (reference: training/trainer.py:296-312)."""
        self.key, k1, k2 = jax.random.split(self.key, 3)
        sigma = self.edm.sample_ptrain_safe(k1, batch.shape[0])[:, None]
        inp, _, cnoise = self.edm.prepare_train_preconditioning(
            k2, jnp.asarray(batch), sigma
        )
        coeffs = self.model.cqt.fwd(inp)
        _, interms = self.model.net.apply(
            {"params": self.state.params, "buffers": self.state.buffers},
            coeffs, cnoise, capture_intermediates=True, mutable=["intermediates"],
        )
        rec = {}
        flat = jax.tree_util.tree_flatten_with_path(interms)[0]
        for path, leaf in flat[:200]:
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path
            )
            arr = np.asarray(leaf)
            if np.iscomplexobj(arr):
                arr = np.abs(arr)
            rec[f"feat/{name}/mean"] = float(arr.mean())
            rec[f"feat/{name}/std"] = float(arr.std())
        self.metrics_log.log(rec, step=it)

    def heavy_logging(self, it: int):
        """Run tester demos from the current EMA weights
        (reference heavy_logging: training/trainer.py:476-523)."""
        if self.tester is None:
            return
        self.tester.set_variables(self.state.ema, self.state.buffers, it=it)
        try:
            preds = self.tester.sample_unconditional()
            # spectrogram PNG of the demo (reference heavy_logging logs
            # plot_spectrogram_from_raw_audio — trainer.py:476-523)
            if preds is not None:
                from babe_tpu.utils import logging as ulog

                ulog.plot_spectrogram(
                    preds, self.args.get_path("logging.stft", {}),
                    os.path.join(str(self.args.model_dir), "train_logs",
                                 f"uncond_spec_it{it}.png"),
                )
            modes = list(self.args.get_path("tester.modes", []))
            if "inpainting" in modes:
                self.tester.test_inpainting()
            if "bwe" in modes:
                self.tester.test_bwe()
        except Exception:
            # demo failures must not kill a long training run, but they must
            # be LOUD (full traceback) so tester regressions surface — and
            # strict mode (tests / debugging) re-raises
            import traceback

            print("heavy logging demo FAILED:")
            traceback.print_exc()
            if bool(self.args.get_path("logging.strict_demos", False)) or (
                os.environ.get("BABE_STRICT_DEMOS", "") not in ("", "0")
            ):
                raise

    def _jit_cache_get(self, name, fn):
        cache = getattr(self, "_aux_jit", None)
        if cache is None:
            cache = self._aux_jit = {}
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    # ------------------------------------------------------------ main loop

    def training_loop(self, max_its: int | None = None):
        log_cfg = self.args.get("logging", {})
        save_interval = int(log_cfg.get("save_interval", 10000))
        log_interval = int(log_cfg.get("log_interval", 100))
        heavy_interval = int(log_cfg.get("heavy_log_interval", 50000))
        freq_interval = int(log_cfg.get("freq_cqt_logging", 0) or 0)
        feat_interval = (
            int(log_cfg.get("log_feature_stats_interval", 0))
            if log_cfg.get("log_feature_stats", False)
            else 0
        )
        max_nonfinite = int(log_cfg.get("max_consecutive_nonfinite", 20))
        it0 = int(self.state.it)
        t_start = time.time()
        last_batch = None
        nonfinite_streak = 0
        while max_its is None or int(self.state.it) < max_its:
            batch = self.get_batch()
            last_batch = batch
            self.key, k = jax.random.split(self.key)
            sharded = jax.device_put(batch, batch_sharding(self.mesh))
            self.state, metrics = self._jit_step(self.state, sharded, k)
            self.profiler.step()
            it = int(self.state.it)
            if bool(metrics.get("nonfinite", False)):
                # the jitted step kept params/opt_state/EMA intact; keep the
                # NaN metrics out of the stats window too (one bad step
                # would otherwise NaN the whole log interval's means)
                nonfinite_streak += 1
                print(
                    f"WARNING: non-finite loss/grads at it {it} — update "
                    f"skipped ({nonfinite_streak} consecutive)", flush=True,
                )
                if nonfinite_streak >= max_nonfinite:
                    raise RuntimeError(
                        f"{nonfinite_streak} consecutive non-finite training "
                        f"steps at it {it}; halting (tune lr/grad-clip, or "
                        f"raise logging.max_consecutive_nonfinite)"
                    )
            else:
                nonfinite_streak = 0
                self._stat_buffer.append(
                    {k2: np.asarray(v) for k2, v in metrics.items()}
                )
            if it % log_interval == 0:
                loss = float(metrics["loss"])
                rate = (it - it0) / max(time.time() - t_start, 1e-9)
                print(f"it {it} loss {loss:.5f} it/s {rate:.2f}", flush=True)
                self.easy_logging(it)
            if freq_interval and it % freq_interval == 0:
                self.freq_logging(it, last_batch)
            if feat_interval and it > 0 and it % feat_interval == 0:
                self.log_feature_stats(it, last_batch)
            if it > 0 and it % save_interval == 0 and log_cfg.get("save_model", True):
                self.save_checkpoint()
            if heavy_interval and it > 0 and it % heavy_interval == 0:
                self.heavy_logging(it)
        self.profiler.close()
        return self.state
