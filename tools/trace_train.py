"""xprof device trace of the full jitted training step (loss -> grads ->
Adam -> EMA) at the published MAESTRO config, with per-HLO-category totals.

Companion to tools/bench_train.py: attributes the measured ms/step to conv
fusions / loop fusions / copies etc., and lets the block-remat recompute
cost be isolated (BABE_TRAIN_REMAT=0 at batch 1 fits HBM without remat).

Usage:  BABE_TRAIN_REMAT=0|1 python tools/trace_train.py [batch] [audio_len]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

import trace_nfe  # noqa: E402  (capture/parse/summarize plumbing)
from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.diffusion.edm import EDM  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.training.trainer import (  # noqa: E402
    TrainState,
    make_optimizer,
    make_train_step,
)

trace_nfe.LOGDIR = "/tmp/xprof_train"
trace_nfe.ITERS = 1  # one train step per capture


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    audio_len = int(sys.argv[2]) if len(sys.argv) > 2 else 184184
    remat = os.environ.get("BABE_TRAIN_REMAT", "1") != "0"

    args = _flagship_args(audio_len=audio_len)
    args.exp["batch"] = batch
    args.exp["remat"] = remat
    # trace the program production training actually runs: train.py defaults
    # layout_pin off (the cotangent pin is a guided-sampler optimization and
    # costs ~+47% on the train step; see blocks._pin_spec)
    args.network["layout_pin"] = "off"
    model = CQTDiffPlus.from_config(args)
    edm = EDM.from_config(args, cqt_hpf=model.apply_hpf_DC)
    optimizer = make_optimizer(args.exp)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    state = TrainState(
        params=variables["params"], buffers=variables.get("buffers", {}),
        opt_state=optimizer.init(variables["params"]),
        ema=jax.tree.map(jnp.copy, variables["params"]),
        it=jnp.asarray(0, jnp.int32),
    )
    step = jax.jit(make_train_step(model, edm, optimizer, args.exp))

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, audio_len)) * 0.063
    key = jax.random.PRNGKey(2)

    t0 = time.time()
    state, metrics = step(state, x, key)
    float(metrics["loss"])
    print(f"compile+first {time.time() - t0:.0f}s "
          f"(batch={batch} remat={remat})", file=sys.stderr)
    state, metrics = step(state, x, key)
    float(metrics["loss"])

    os.makedirs(trace_nfe.LOGDIR, exist_ok=True)
    with jax.profiler.trace(trace_nfe.LOGDIR):
        state, metrics = step(state, x, key)
        float(metrics["loss"])
    trace_nfe.summarize(trace_nfe.parse(), batch)


if __name__ == "__main__":
    main()
