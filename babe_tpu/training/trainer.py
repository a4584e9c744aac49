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
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from babe_tpu.diffusion.edm import EDM
from babe_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


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


def make_train_step(model, edm: EDM, optimizer, exp_cfg, num_sigma_bins: int = 10):
    """Returns step(state, batch, key) -> (state, metrics) — pure, jittable."""
    ema_rate = float(exp_cfg.get("ema_rate", 0.9999))
    ema_rampup = float(exp_cfg.get("ema_rampup", 10000))
    batch_size = int(exp_cfg.get("batch", 4))
    use_dc = bool(exp_cfg.get("use_cqt_DC_correction", False))
    smin, smax = edm.p.sigma_min, edm.p.sigma_max
    bin_edges = jnp.logspace(
        jnp.log10(smin), jnp.log10(smax), num_sigma_bins
    )

    def loss_fn(params, buffers, batch, key):
        net = lambda x, cn: model.apply(
            {"params": params, "buffers": buffers}, x, cn
        )
        error2, sigma = edm.loss_fn(key, net, batch, use_cqt_DC_correction=use_dc)
        return error2.mean(), (error2, sigma)

    def step(state: TrainState, batch, key):
        (loss, (error2, sigma)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.buffers, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA with linear warmup over samples (reference :426-439)
        t = state.it.astype(jnp.float32) * batch_size
        s = jnp.where(
            t < ema_rampup, jnp.clip(t / ema_rampup, 0.0, ema_rate), ema_rate
        )
        ema = jax.tree.map(lambda e, p: e * s + p * (1.0 - s), state.ema, params)

        # sigma-binned loss stats (on-device, small vector out)
        per_item = error2.mean(axis=tuple(range(1, error2.ndim)))
        sig = sigma.reshape(-1)
        bin_idx = jnp.searchsorted(bin_edges, sig)
        sums = jnp.zeros(num_sigma_bins + 1).at[bin_idx].add(per_item)
        counts = jnp.zeros(num_sigma_bins + 1).at[bin_idx].add(1.0)

        new_state = TrainState(
            params=params, buffers=state.buffers, opt_state=opt_state,
            ema=ema, it=state.it + 1,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "sigma_bin_sums": sums,
            "sigma_bin_counts": counts,
        }
        return new_state, metrics

    return step


class Trainer:
    """Imperative shell around the functional train step
    (role of reference training/trainer.py Trainer)."""

    def __init__(self, args, dset, model, edm: EDM, tester=None, mesh=None):
        self.args = args
        self.dset = dset  # iterator yielding host numpy batches [B, T] (+fs)
        self.model = model
        self.edm = edm
        self.tester = tester
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.optimizer = make_optimizer(args.exp)

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
        step = make_train_step(model, edm, self.optimizer, args.exp, num_bins)
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

    # ----------------------------------------------------------- checkpoints

    def _ckpt_path(self, it: int) -> str:
        return os.path.join(
            str(self.args.model_dir), f"{self.args.exp.exp_name}-{it}.ckpt"
        )

    def save_checkpoint(self):
        """{it, network, optimizer, ema, args} equivalent
        (reference: training/trainer.py:273-293)."""
        it = int(self.state.it)
        os.makedirs(str(self.args.model_dir), exist_ok=True)
        payload = {
            "it": it,
            "params": jax.tree.map(np.asarray, self.state.params),
            "buffers": jax.tree.map(np.asarray, self.state.buffers),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.state.opt_state,
            ),
            "ema": jax.tree.map(np.asarray, self.state.ema),
            "args": self.args.to_dict(),
        }
        path = self._ckpt_path(it)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        if bool(self.args.get_path("logging.remove_last_checkpoint", False)):
            prev = getattr(self, "_latest_ckpt", None)
            if prev and os.path.exists(prev) and prev != path:
                os.remove(prev)
        self._latest_ckpt = path
        return path

    def resume_from_checkpoint(self, path: str | None = None) -> bool:
        """Latest exp_name-*.ckpt glob resume (reference :243-270)."""
        import glob as _glob
        import re

        if path is None:
            pattern = os.path.join(
                str(self.args.model_dir), f"{self.args.exp.exp_name}-*.ckpt"
            )
            cands = _glob.glob(pattern)
            if not cands:
                return False
            rx = re.compile(rf"{re.escape(str(self.args.exp.exp_name))}-(\d+)\.ckpt")
            cands.sort(key=lambda p: int(rx.search(p).group(1)))
            path = cands[-1]
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        except OSError:
            return False

        def refill(template, data):
            flat_t, treedef = jax.tree.flatten(template)
            flat_d = jax.tree.leaves(data)
            assert len(flat_t) == len(flat_d)
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

    def training_loop(self, max_its: int | None = None):
        log_cfg = self.args.get("logging", {})
        save_interval = int(log_cfg.get("save_interval", 10000))
        log_interval = int(log_cfg.get("log_interval", 100))
        it0 = int(self.state.it)
        t_start = time.time()
        while max_its is None or int(self.state.it) < max_its:
            metrics = self.train_step()
            it = int(self.state.it)
            if it % log_interval == 0:
                loss = float(metrics["loss"])
                rate = (it - it0) / max(time.time() - t_start, 1e-9)
                print(f"it {it} loss {loss:.5f} it/s {rate:.2f}", flush=True)
            if it > 0 and it % save_interval == 0 and log_cfg.get("save_model", True):
                self.save_checkpoint()
        return self.state
