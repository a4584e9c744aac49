"""Benchmark: audio seconds generated / second / chip at 35-step EDM sampling.

Driving metric from BASELINE.md: unconditional CQTDiff+ sampling of 5-second
mono 22.05 kHz clips with the 35-step 2nd-order stochastic Heun sampler
(69 denoiser evaluations).  North-star: > 10x realtime per chip, so
vs_baseline = realtime_factor / 10.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Runs the int8 conv path by default (BENCH_PRECISION=bf16 reverts): eligible
(5,3) convs at C>=96 compute on the MXU in int8 with per-item activation
scales derived analytically from the GroupNorm statistics
(BABE_INT8_SCALE=bound, babe_tpu/ops/conv_kernels.py).  Quality evidence
gating this default (VERDICT r3 next-#1): tools/quality_int8.py --mode lsd
on a TRAINED checkpoint (blind-BWE LSD delta int8-vs-bf16 under the
0.05 dB bar; bound mode -0.0068 dB mean), --mode traj (same-seed flagship
trajectory divergence, reported in PROFILE.md), and tools/capability_e2e.py
passing under int8.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    # measured-optimal settings (PROFILE.md rounds 6-7); env overrides win
    precision = os.environ.get("BENCH_PRECISION", "int8")
    if precision == "int8":
        os.environ.setdefault("BABE_PRECISION", "int8")
        # analytic-bound activation scales + MINC=96: 92.2 ms/NFE vs 96.4
        # for dynamic amax at MINC=128 (tools/time_nfe.py, round 7)
        os.environ.setdefault("BABE_INT8_SCALE", "bound")
        os.environ.setdefault("BABE_INT8_MINC", "96")
        os.environ.setdefault("BABE_LAYOUT_PIN", "fwd<=64")

    import jax

    # persistent compilation cache: first-compile of the 35-step sampling scan
    # through the remote-compile tunnel is minutes; subsequent runs are instant
    jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_args
    from babe_tpu.diffusion.edm import EDM, EDMParams
    from babe_tpu.models.cqtdiff import CQTDiffPlus
    from babe_tpu.sampling.heun import Sampler, SamplerConfig

    fs = 22050
    seconds = 5.0
    audio_len = int(fs * seconds)
    # throughput keeps scaling with batch under int8 (bf16 was flat past 8):
    # 6.27x @ b8, 6.57x @ b16, 6.71x @ b32 realtime/chip — the quantized
    # convs raised the MXU rate so the fixed per-step work amortizes further.
    # BENCH_BATCH overrides.
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    T = 35

    args = _flagship_args(audio_len=audio_len)
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)

    # tester-side diff params (conf/tester/blind_bwe.yaml:55-68)
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    cfg = SamplerConfig(T=T, order=2, xi=0.0, audio_len=audio_len,
                        filter_out_cqt_DC_Nyq=True)
    # fused CQT/hpf denoiser: hpf already folded in (see CQTDiffPlus.fused_denoiser)
    sampler = Sampler(model.fused_denoiser(variables, edm), edm, cfg, hpf=None)

    import numpy as np

    # shard the generated batch across all available chips (per-chip item
    # parallelism — throughput metric is per chip, wall time uses them all)
    n_dev = len(jax.devices())
    jit_kw = {}
    if n_dev > 1:
        from babe_tpu.parallel.mesh import batch_sharding, make_mesh

        batch = -(-batch // n_dev) * n_dev  # round up to a full mesh
        jit_kw["out_shardings"] = batch_sharding(make_mesh(n_dev))

    run = jax.jit(lambda key: sampler.predict_unconditional(key, (batch, audio_len)),
                  **jit_kw)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = run(key)
    # force a device->host transfer: block_until_ready under-reports on
    # remote-tunneled backends
    np.asarray(out[:, :8])
    compile_and_first = time.time() - t0

    # best-of-n: the remote-TPU tunnel adds run-to-run noise; the fastest
    # iteration is the cleanest estimate of device throughput
    n_iters = 4
    walls = []
    for i in range(n_iters):
        t0 = time.time()
        out = run(jax.random.fold_in(key, i))
        np.asarray(out[:, :8])
        walls.append(time.time() - t0)
    wall = min(walls)

    audio_seconds = batch * seconds
    rt_factor = audio_seconds / wall / n_dev  # metric is per chip
    # spread quantifies tunnel/run-to-run noise so round-over-round deltas
    # are interpretable (VERDICT r3 #6): worst-vs-best iteration, fractional
    spread = (max(walls) - min(walls)) / min(walls)
    result = {
        "metric": "audio_sec_generated_per_sec_per_chip_35step",
        "value": round(rt_factor, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt_factor / 10.0, 3),
        "spread": round(spread, 4),
        "iters": n_iters,
        "batch": batch,
        "precision": os.environ.get("BABE_PRECISION", "bf16"),
    }

    # fixed-batch-8 companion number: rounds 1-3 benched at batch 8, round 4
    # moved the headline to batch 32 (int8 keeps amortizing with batch), so
    # the series needs both to stay interpretable round-over-round
    # (VERDICT r4 weak #3).  BENCH_B8=0 skips (e.g. for quick sweeps).
    if batch != 8 and os.environ.get("BENCH_B8", "1") != "0" and n_dev == 1:
        run8 = jax.jit(
            lambda key: sampler.predict_unconditional(key, (8, audio_len)))
        np.asarray(run8(key)[:, :8])  # compile + first
        walls8 = []
        for i in range(3):
            t0 = time.time()
            out8 = run8(jax.random.fold_in(key, 100 + i))
            np.asarray(out8[:, :8])
            walls8.append(time.time() - t0)
        result["value_b8"] = round(8 * seconds / min(walls8), 3)
        result["spread_b8"] = round((max(walls8) - min(walls8))
                                    / min(walls8), 4)
    print(json.dumps(result))
    print(
        f"# batch={batch} T={T} wall/iter={wall:.2f}s "
        f"compile+first={compile_and_first:.1f}s device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
