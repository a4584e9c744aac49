"""Batch-size scaling curve for the 35-step sampling bench (real TPU).

Sweeps BENCH_BATCH over a list and reports realtime-factor per chip for each
— the metric is throughput/chip, so the optimal batch is wherever the curve
flattens (HBM-bound).  Results feed PROFILE.md and choose bench.py's default.
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.diffusion.edm import EDM, EDMParams  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.sampling.heun import Sampler, SamplerConfig  # noqa: E402


def main():
    fs, sec, T = 22050, 5.0, 35
    L = int(fs * sec)
    batches = [int(b) for b in (sys.argv[1:] or ["4", "8", "16", "32"])]

    args = _flagship_args(audio_len=L)
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    cfg = SamplerConfig(T=T, order=2, xi=0.0, audio_len=L,
                        filter_out_cqt_DC_Nyq=True)
    sampler = Sampler(model.fused_denoiser(variables, edm), edm, cfg, hpf=None)

    key = jax.random.PRNGKey(0)
    print("| batch | wall/iter s | x realtime/chip | ms/NFE/item |")
    print("|---|---|---|---|")
    for b in batches:
        run = jax.jit(lambda k, b=b: sampler.predict_unconditional(k, (b, L)))
        t0 = time.time()
        np.asarray(run(key)[:, :8])
        comp = time.time() - t0
        walls = []
        for i in range(3):
            t0 = time.time()
            np.asarray(run(jax.random.fold_in(key, i))[:, :8])
            walls.append(time.time() - t0)
        wall = min(walls)
        rt = b * sec / wall
        print(f"| {b} | {wall:.2f} | {rt:.2f} | "
              f"{wall / 69 / b * 1000:.1f} |  (compile+first {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
