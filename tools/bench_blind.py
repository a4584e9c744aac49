"""Blind-BWE throughput on the real TPU: the paper's actual workload.

Runs the full BABE sampler (69 guided NFEs, each with a jax.vjp pullback
through the network for reconstruction guidance plus the <=100-iteration
projected-GD filter fit) at the conf/tester/blind_bwe.yaml settings on
5 s clips, batch 8, and prints the realtime factor per chip.
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
from babe_tpu.config import default_config  # noqa: E402
from babe_tpu.diffusion.edm import EDM, EDMParams  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.sampling.blind import BlindConfig, BlindSampler  # noqa: E402
from babe_tpu.sampling.heun import SamplerConfig, make_norm_fn  # noqa: E402


def main():
    fs, sec, T = 22050, 5.0, 35
    L = int(fs * sec)
    batch = 8

    margs = _flagship_args(audio_len=L)
    model = CQTDiffPlus.from_config(margs)
    variables = model.init(jax.random.PRNGKey(0), batch=1)

    args = default_config(["tester=blind_bwe", f"exp.audio_len={L}"])
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    cfg = SamplerConfig.from_args(args)
    cfg.audio_len = L
    bcfg = BlindConfig.from_args(args)
    sampler = BlindSampler(model.fused_denoiser(variables, edm), edm, cfg,
                           bcfg, hpf=None)

    y = jax.random.normal(jax.random.PRNGKey(1), (batch, L), jnp.float32) * 0.06
    run = jax.jit(lambda k, yy: sampler.predict_blind_bwe(k, yy)[:2])

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    out = run(key, y)
    jax.tree_util.tree_map(np.asarray, out)
    compile_s = time.time() - t0
    walls = []
    for i in range(3):
        t0 = time.time()
        out = run(jax.random.PRNGKey(3 + i), y)
        jax.tree_util.tree_map(np.asarray, out)
        walls.append(time.time() - t0)
    wall = min(walls)
    rt = batch * sec / wall
    print(f"blind BWE: wall/iter={wall:.2f}s  {rt:.2f}x realtime/chip  "
          f"({wall / 69 * 1e3:.0f} ms/NFE incl. guidance vjp + filter fit)  "
          f"compile+first={compile_s:.0f}s")


if __name__ == "__main__":
    main()
