"""Probe int8 conv/dot throughput vs bf16 at the CQTDiff+ level shapes.

The bf16 conv budget is trace-proven MXU-fill-bound at (C/128)^2 rates
(PROFILE.md round 4); v5e's MXU is specified at 2x throughput for int8
(394 TOPS vs 197 TFLOP/s bf16).  Before building a quantized conv path
(VERDICT r3 next-#1) this measures whether XLA's TPU conv/dot emitters
actually realize that 2x on these exact shapes, including the
quantize/dequantize epilogues a real mixed-precision network would pay.

Variants per level shape (B=8, (5,3) window, SAME, F-dilated):
  * bf16 conv                       (the shipped baseline)
  * int8 conv -> int32 accum        (pure kernel rate)
  * int8 conv + requant epilogue    (int32 -> scale -> clip -> int8: the
                                     realistic steady-state inner loop)
  * int8 GEMM vs bf16 GEMM          (M=B*F*T, K=15C, N=C ceiling probe)

All timings scan-amortized (tunnel dispatch floor removed).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B = 8
FLOOR = None


def timeit(jf, *a, n=4):
    t0 = time.time()
    np.asarray(jf(*a))
    comp = time.time() - t0
    w = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jf(*a))
        w.append(time.time() - t0)
    return min(w) * 1000, comp


def scan_bench(fn, x, iters=24):
    def looped(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(jnp.abs(out).astype(jnp.float32))

    wall, _ = timeit(jax.jit(looped), x)
    return (wall - FLOOR) / iters


def conv(x, w, dil, **kw):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw,
    )


def requant(acc_i32, scale):
    y = acc_i32.astype(jnp.float32) * scale
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def main():
    global FLOOR
    FLOOR, _ = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)

    shapes = [  # (F, T, C, dil_f)
        (64, 1280, 64, 2),
        (128, 640, 96, 4),
        (256, 160, 128, 16),
        (384, 40, 256, 64),
    ]
    # tunnel compiles are slow: select a subset via argv (e.g. `256` for the
    # C=256 level) so one invocation stays under the shell timeout; the
    # persistent compile cache makes re-runs instant
    if len(sys.argv) > 1:
        want = {int(a) for a in sys.argv[1:]}
        shapes = [s for s in shapes if s[2] in want]
    key = jax.random.PRNGKey(0)
    print("| shape | variant | ms | TF(op)/s |")
    print("|---|---|---|---|")
    for F, T, C, d in shapes:
        gf = 2 * B * F * T * C * C * 15 / 1e9
        dil = (d, 1)
        rows = []

        xb = jax.random.normal(key, (B, F, T, C), jnp.bfloat16)
        wb = jax.random.normal(key, (5, 3, C, C), jnp.bfloat16) * 0.02
        rows.append(("bf16 conv", scan_bench(lambda xx: conv(xx, wb, dil), xb)))

        xi = jax.random.randint(key, (B, F, T, C), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (5, 3, C, C), -127, 127, jnp.int8)

        def conv_i8(xx):
            acc = conv(xx, wi, dil, preferred_element_type=jnp.int32)
            # keep carry dtype: cheap shift back to int8 (no scale math)
            return (acc >> 8).astype(jnp.int8)

        rows.append(("int8 conv (>>8 carry)", scan_bench(conv_i8, xi)))

        scale = 1.0 / (127.0 * 15 * C)

        def conv_i8_rq(xx):
            acc = conv(xx, wi, dil, preferred_element_type=jnp.int32)
            return requant(acc, scale)

        rows.append(("int8 conv + requant", scan_bench(conv_i8_rq, xi)))

        # mixed: bf16 activations x int8 weights (does XLA keep a fast path?)
        def conv_mixed(xx):
            return conv(xx, wi.astype(jnp.bfloat16), dil)

        rows.append(("bf16 act x dequant w", scan_bench(conv_mixed, xb)))

        # realistic steady state: bf16 carry, per-item dynamic activation
        # quantization in-body, weights already int8 (hoisted outside the
        # loop) — the model's actual inner-loop shape
        sw = jnp.full((C,), 0.02 / 127.0, jnp.float32)

        def conv_realistic(xx):
            x32 = xx.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True)
            s = jnp.maximum(amax, 1e-20) / 127.0
            q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
            q = jax.lax.optimization_barrier(q)
            acc = conv(q, wi, dil, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s * sw)).astype(jnp.bfloat16)

        rows.append(("int8 +act-quant (w hoisted)",
                     scan_bench(conv_realistic, xb)))

        # same but quantizing the WEIGHT in-body too (what a naive per-call
        # implementation pays when XLA does not hoist it out of the scan)
        wb32 = wb.astype(jnp.float32)

        def conv_wquant(xx):
            x32 = xx.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True)
            s = jnp.maximum(amax, 1e-20) / 127.0
            q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
            q = jax.lax.optimization_barrier(q)
            wa = jnp.max(jnp.abs(wb32), axis=(0, 1, 2))
            ws = jnp.maximum(wa, 1e-20) / 127.0
            wq = jnp.clip(jnp.round(wb32 / ws), -127, 127).astype(jnp.int8)
            acc = conv(q, wq, dil, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s * ws)).astype(jnp.bfloat16)

        rows.append(("int8 +act+w quant in-body",
                     scan_bench(conv_wquant, xb)))

        # GEMM ceilings
        M = B * F * T
        ab = jax.random.normal(key, (M, 15 * C), jnp.bfloat16)
        bb = jax.random.normal(key, (15 * C, C), jnp.bfloat16) * 0.02
        cb = jax.random.normal(key, (C, 15 * C), jnp.bfloat16) * 0.02
        rows.append(("bf16 GEMM x2", scan_bench(lambda aa: (aa @ bb) @ cb, ab)))

        ai = jax.random.randint(key, (M, 15 * C), -127, 127, jnp.int8)
        bi = jax.random.randint(key, (15 * C, C), -127, 127, jnp.int8)
        ci = jax.random.randint(key, (C, 15 * C), -127, 127, jnp.int8)

        def gemm_i8(aa):
            y = jax.lax.dot(aa, bi, preferred_element_type=jnp.int32)
            y8 = (y >> 8).astype(jnp.int8)
            z = jax.lax.dot(y8, ci, preferred_element_type=jnp.int32)
            return (z >> 8).astype(jnp.int8)

        rows.append(("int8 GEMM x2", scan_bench(gemm_i8, ai)))
        gf_gemm = 2 * (2 * M * 15 * C * C) / 1e9
        for name, ms in rows:
            g = gf_gemm if "GEMM" in name else gf
            print(f"| F={F} T={T} C={C} | {name} | {ms:6.2f} | {g/ms:5.0f} |",
                  flush=True)


if __name__ == "__main__":
    main()
