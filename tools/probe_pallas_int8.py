"""Probe: int8 Pallas economics on the real TPU, BEFORE building the fused
int8 ResnetBlock stage (VERDICT r4 next-#1).

Questions answered (each a standalone measurement, scan-amortized to remove
the ~27 ms axon dispatch floor):
  1. does Mosaic lower int8 x int8 -> int32 jnp.dot onto the MXU, and at
     what rate vs bf16 at the fused stage's GEMM shapes (M, 3Cp) @ (3Cp, Cp)?
  2. what does the implicit-GEMM patch build cost in int8 vs bf16 (the
     bf16 fused kernel was VPU-bound on exactly this)?

Usage:  python tools/probe_pallas_int8.py [reps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def scan_loop(body, x, n=24):
    def f(c, _):
        return body(c), None

    return jax.lax.scan(f, x, None, length=n)[0]


# ---------------------------------------------------------- 1: plain GEMM


def gemm_kernel(a_ref, b_ref, o_ref, acc):
    acc[:] = jnp.dot(a_ref[:], b_ref[:],
                     preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8
                     else jnp.float32)
    o_ref[:] = acc[:].astype(o_ref.dtype)


def make_gemm(M, K, N, dt, ot, acct):
    return pl.pallas_call(
        functools.partial(gemm_kernel),
        out_shape=jax.ShapeDtypeStruct((M, N), ot),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, N), acct)],
    )


def probe_gemm(M=2048, K=384, N=128, reps=30):
    print(f"-- plain pallas GEMM ({M},{K})@({K},{N}), scan x16 --")
    for name, dt, ot, acct in [("bf16", jnp.bfloat16, jnp.bfloat16, jnp.float32),
                               ("int8", jnp.int8, jnp.int32, jnp.int32)]:
        try:
            call = make_gemm(M, K, N, dt, ot, acct)
            if dt == jnp.int8:
                a = jnp.ones((M, K), jnp.int8)
                b = jnp.ones((K, N), jnp.int8)
            else:
                a = jnp.ones((M, K), dt)
                b = jnp.ones((K, N), dt)

            @jax.jit
            def run(a, b):
                def body(c, _):
                    o = call(c, b)
                    # feed output back (cast) to serialize iterations
                    return (o[:, :K] if N >= K else
                            jnp.tile(o, (1, K // N))).astype(a.dtype), None

                return jax.lax.scan(body, a, None, length=16)[0]

            dt_s, _ = timed(run, a, b, iters=reps)
            ops = 2 * M * K * N * 16
            print(f"  {name}: {dt_s*1e3:8.3f} ms/scan  "
                  f"{ops/dt_s/1e12:7.1f} Tops/s")
        except Exception as e:
            print(f"  {name}: FAILED — {type(e).__name__}: {e}")


# ------------------------------------------------- 2: patch-build + GEMM
# Mimics one fused-stage tile: hbuf (nrows, BTw, Cp) -> 15 shifted patch
# copies -> 5 dots of (M, 3Cp)@(3Cp, Cp), double-buffered patches.


def make_stage(nrows, BF, BT, Cp, d, dt, reps_inner=8):
    BTw = BT + 16
    M = BF * BT
    ot = jnp.int32 if dt == jnp.int8 else jnp.float32
    acct = jnp.int32 if dt == jnp.int8 else jnp.float32

    def kernel(h_ref, w_ref, o_ref, hb, patch, acc):
        hb[...] = h_ref[...]

        def one(it, carry):
            for kf in range(5):
                base = kf * d
                pb = kf % 2
                for kt in range(3):
                    sl = hb[pl.ds(base, BF), pl.ds(7 + kt, BT), :]
                    patch[pb, :, kt * Cp:(kt + 1) * Cp] = sl.reshape(M, Cp)
                pk = jnp.dot(patch[pb], w_ref[kf], preferred_element_type=acct)
                if kf == 0:
                    acc[:] = pk
                else:
                    acc[:] = acc[:] + pk
            # data dependency: next iteration's patch sees this acc, so the
            # compiler cannot hoist the loop-invariant patch build + dots
            hb[pl.ds(0, 8), pl.ds(0, 8), :] = acc[0:8, 0:Cp].reshape(
                8, 1, Cp).astype(hb.dtype) + hb[pl.ds(0, 8), pl.ds(0, 8), :]
            return carry

        jax.lax.fori_loop(0, reps_inner, one, 0)
        o_ref[:] = acc[:].astype(ot)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, Cp), ot),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nrows, BT + 16, Cp), dt),
                        pltpu.VMEM((2, M, 3 * Cp), dt),
                        pltpu.VMEM((M, Cp), acct)],
    ), M


def probe_stage(BF=16, BT=128, Cp=128, d=2, reps=30):
    nrows = BF + 4 * d
    print(f"-- patch-build+GEMM tile: nrows={nrows} BF={BF} BT={BT} Cp={Cp} "
          f"(x8 inner) --")
    for name, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
        try:
            call, M = make_stage(nrows, BF, BT, Cp, d, dt)
            h = (jnp.ones((nrows, BT + 16, Cp), dt))
            w = jnp.ones((5, 3 * Cp, Cp), dt)
            run = jax.jit(lambda h, w: call(h, w))
            dt_s, _ = timed(run, h, w, iters=reps)
            ops = 2 * M * 3 * Cp * Cp * 5 * 8
            print(f"  {name}: {dt_s*1e3:8.3f} ms/call  "
                  f"{ops/dt_s/1e12:7.1f} Tops/s (incl. patch build)")
        except Exception as e:
            print(f"  {name}: FAILED — {type(e).__name__}: {e}")


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print("devices:", jax.devices())
    probe_gemm(reps=reps)
    probe_gemm(M=2048, K=768, N=256, reps=reps)
    probe_stage(reps=reps)
    probe_stage(BF=8, BT=128, Cp=256, d=1, reps=reps)
