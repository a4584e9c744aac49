"""Component-level TPU profile of the flagship sampling path (bench config:
batch 8, 5 s @ 22.05 kHz, bf16).

Method: the axon tunnel adds ~27 ms of per-call dispatch overhead, so every
component is iterated INSIDE one jitted lax.scan (the component's output is
the next iteration's input, preventing dead-code elimination) and the
per-iteration time is (wall - floor) / iters.  The floor is measured with an
empty scan of the same output arity.

Produces the PROFILE.md breakdown.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.diffusion.edm import EDM, EDMParams  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.models.blocks import (  # noqa: E402
    BiasFreeGroupNorm, Conv2d, ResnetBlock, resample_time,
)

FS = 22050
SEC = 5.0
L = int(FS * SEC)
B = 8
DT = jnp.bfloat16

FLOOR_MS = None


def _time(jf, *args, n=4):
    t0 = time.time()
    np.asarray(jf(*args))
    compile_s = time.time() - t0
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jf(*args))
        walls.append(time.time() - t0)
    return min(walls) * 1000.0, compile_s


def measure_floor():
    global FLOOR_MS
    x = jnp.zeros((8,), jnp.float32)
    jf = jax.jit(lambda x: jnp.sum(x * 2.0))
    FLOOR_MS, _ = _time(jf, x, n=8)
    print(f"dispatch floor: {FLOOR_MS:.1f} ms", file=sys.stderr)


def bench_scan(fn, x0, iters=16, n=4, label=""):
    """Time fn iterated `iters` times in one jit; returns per-iter ms."""

    def looped(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.abs(l)).astype(jnp.float32) for l in leaves)

    jf = jax.jit(looped)
    wall, compile_s = _time(jf, x0, n=n)
    per = (wall - FLOOR_MS) / iters
    return per, compile_s


def main():
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    measure_floor()
    args = _flagship_args(audio_len=L)
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    den = model.fused_denoiser(variables, edm)

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L), jnp.float32)

    rows = []

    # full denoiser per NFE (carry the audio through)
    ms, cs = bench_scan(lambda xx: den(xx, jnp.full((B, 1), 0.1)), x, iters=8)
    rows.append((f"fused denoiser (1 NFE, batch {B})", ms, cs))

    # batch scaling of the denoiser
    for bb in (4, 16):
        xb = jax.random.normal(key, (bb, L), jnp.float32)
        ms, cs = bench_scan(
            lambda xx, bb=bb: den(xx, jnp.full((bb, 1), 0.1)), xb, iters=8
        )
        rows.append((f"fused denoiser (1 NFE, batch {bb})", ms, cs))

    # U-Net only (coeffs -> coeffs carry)
    coeffs = jax.jit(lambda x: model.cqt.fwd(x))(x)
    cnoise = edm.cnoise(jnp.full((B, 1), 0.1))
    ms, cs = bench_scan(
        lambda c: model.net.apply(variables, c, cnoise), coeffs, iters=8
    )
    rows.append(("U-Net only", ms, cs))

    # CQT round trip
    ms, cs = bench_scan(
        lambda xx: model.cqt.bwd(model.cqt.fwd(xx), length=L), x, iters=16
    )
    rows.append(("CQT fwd+bwd", ms, cs))

    # per-level encoder ResnetBlocks, with / without GroupNorm
    Ns = (64, 96, 96, 128, 128, 256, 256)
    num_dils = (2, 3, 4, 5, 6, 7, 7)
    bpo = 64
    M_top = model.cqt.M[-1]
    emb = jax.random.normal(jax.random.PRNGKey(99), (B, 256), DT)
    lvl_gn, lvl_nognorm = 0.0, 0.0
    for i in range(7):
        F = (i + 1) * bpo
        T = M_top >> i
        C = Ns[i]
        xin = jax.random.normal(jax.random.PRNGKey(i), (B, F, T, C), DT)
        for use_norm, tag in ((True, ""), (False, " no-GN")):
            blk = ResnetBlock(C, C, use_norm, num_dils=num_dils[i],
                              emb_dim=256, Fdim=F)
            p = blk.init(jax.random.PRNGKey(7), xin, emb)
            ms, cs = bench_scan(
                lambda xx, p=p, blk=blk: blk.apply(p, xx, emb), xin, iters=12
            )
            gflop = num_dils[i] * 2 * B * F * T * C * C * 15 / 1e9
            rows.append((f"enc{i} Res F={F} T={T} C={C} d={num_dils[i]}{tag} "
                         f"[{gflop / ms:.0f} TF/s]", ms, cs))
            if use_norm:
                lvl_gn += ms
            else:
                lvl_nognorm += ms

    # isolated pieces at two representative shapes
    for (F, T, C) in ((64, 1280, 64), (384, 40, 256)):
        xin = jax.random.normal(jax.random.PRNGKey(3), (B, F, T, C), DT)
        gn = BiasFreeGroupNorm(C, 8)
        p = gn.init(jax.random.PRNGKey(0), xin)
        ms, cs = bench_scan(lambda xx: gn.apply(p, xx).astype(DT), xin, iters=24)
        rows.append((f"GroupNorm F={F} T={T} C={C}", ms, cs))
        for dil in (1, 32 if F > 64 else 8):
            cv = Conv2d(C, (5, 3), dilation=(dil, 1))
            pc = cv.init(jax.random.PRNGKey(5), xin)
            ms, cs = bench_scan(lambda xx, pc=pc, cv=cv: cv.apply(pc, xx),
                                xin, iters=24)
            gflop = 2 * B * F * T * C * C * 15 / 1e9
            rows.append((f"conv5x3 F={F} T={T} C={C} dil={dil} "
                         f"[{gflop / ms:.0f} TF/s]", ms, cs))
        ms, cs = bench_scan(
            lambda xx: resample_time(resample_time(xx, up=False), up=True),
            xin, iters=24,
        )
        rows.append((f"resample down+up F={F} T={T} C={C}", ms, cs))

    print("\n| component | per-iter ms | compile s |")
    print("|---|---|---|")
    for name, ms, cs in rows:
        print(f"| {name} | {ms:8.2f} | {cs:6.1f} |")
    print(f"\nsum enc blocks: GN {lvl_gn:.1f} ms, no-GN {lvl_nognorm:.1f} ms")
    print(f"dispatch floor: {FLOOR_MS:.2f} ms")


if __name__ == "__main__":
    main()
