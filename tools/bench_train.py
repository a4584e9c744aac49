"""Training-step throughput on the real TPU at the published MAESTRO config.

The reference trained MAESTRO_22k_8s for 850k iterations at batch 4 on one
A100 (conf/exp/maestro22k_8s.yaml:18-53, training.sh:36).  This bench runs
the full jitted+donated DP train step (EDM loss -> grads -> Adam -> EMA ->
sigma-binned stats; babe_tpu/training/trainer.py) on one v5e chip at the
same segment length (184184 samples = 8.35 s @ 22.05 kHz) and prints
steps/s and audio-seconds-trained per wall second.

Usage: python tools/bench_train.py [batch ...]   (default: 4 8)
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.diffusion.edm import EDM  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.training.trainer import TrainState, make_optimizer, make_train_step  # noqa: E402

SEG_SECONDS = 184184 / 22050.0


def bench(batch: int, remat: bool = True, remat_policy: str = "full") -> float:
    args = _flagship_args()  # audio_len=184184, published arch, bf16 compute
    args.exp["batch"] = batch
    # batch 4 without remat needs ~24 GB (16 GB HBM); batch 1 fits either way,
    # letting BABE_TRAIN_REMAT=0 measure the remat recompute cost directly.
    # BABE_TRAIN_REMAT_POLICY=save_convs saves conv outputs inside blocks
    # (backward recomputes only elementwise chains).
    args.exp["remat"] = remat
    args.exp["remat_policy"] = remat_policy
    # train.py defaults the guided-sampler layout pin off for training
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
    step = make_train_step(model, edm, optimizer, args.exp)
    jstep = jax.jit(step, donate_argnums=(0,))

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 184184), jnp.float32) * 0.063
    key = jax.random.PRNGKey(2)

    t0 = time.time()
    state, metrics = jstep(state, x, key)
    float(metrics["loss"])
    compile_s = time.time() - t0

    # per-chunk timing, report the MIN: the axon tunnel adds multi-second
    # stalls at random (measured 1039 vs 12895 ms/step on identical runs),
    # so a single mean is meaningless.  Chunks of 3 steps amortize dispatch.
    walls = []
    for r in range(5):
        t0 = time.time()
        for i in range(3):
            state, metrics = jstep(state, x, jax.random.fold_in(key, 3 * r + i))
        float(metrics["loss"])
        walls.append((time.time() - t0) / 3)
    wall = min(walls)
    rt = batch * SEG_SECONDS / wall
    print(f"train batch={batch} remat={remat} policy={remat_policy}: {wall * 1e3:.0f} ms/step (min of {len(walls)} x3)  "
          f"{1.0 / wall:.2f} steps/s  {rt:.2f}x realtime audio trained/chip  "
          f"(loss {float(metrics['loss']):.4f}, compile+first {compile_s:.0f}s; "
          f"all chunks ms: {[int(w * 1e3) for w in walls]})")
    return rt


def main():
    import os
    remat = os.environ.get("BABE_TRAIN_REMAT", "1") != "0"
    policy = os.environ.get("BABE_TRAIN_REMAT_POLICY", "full")
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    for b in batches:
        bench(b, remat=remat, remat_policy=policy)


if __name__ == "__main__":
    main()
