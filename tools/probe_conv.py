"""Probe XLA-TPU conv lowering variants at the CQTDiff+ level shapes.

Questions:
  * how much of the C<=128 conv inefficiency is layout (dilated axis = F,
    the major spatial dim) vs channel-width (K=N=C < 128 MXU lanes)?
  * does a (B, T, F, C) layout (dilation on the minor spatial dim) lower
    better than the current (B, F, T, C)?
  * what is the raw GEMM ceiling at the same M/K/N?

All timings scan-amortized (tunnel dispatch floor ~27 ms).
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
DT = jnp.bfloat16
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
        return jnp.sum(jnp.abs(out)).astype(jnp.float32)

    wall, _ = timeit(jax.jit(looped), x)
    return (wall - FLOOR) / iters


def conv(x, w, dims, dil):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=dil, dimension_numbers=dims,
    )


def main():
    global FLOOR
    FLOOR, _ = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)

    shapes = [  # (F, T, C, dil_f)
        (64, 1280, 64, 2),
        (128, 640, 96, 4),
        (192, 320, 96, 8),
        (256, 160, 128, 16),
        (384, 40, 256, 64),
    ]
    key = jax.random.PRNGKey(0)
    print("| shape | variant | ms | TF/s |")
    print("|---|---|---|---|")
    for F, T, C, d in shapes:
        gf = 2 * B * F * T * C * C * 15 / 1e9
        rows = []
        # current: NHWC with H=F (dilated), W=T
        x = jax.random.normal(key, (B, F, T, C), DT)
        w = jax.random.normal(key, (5, 3, C, C), DT) * 0.02
        for dil in ((1, 1), (d, 1)):
            ms = scan_bench(
                lambda xx: conv(xx, w, ("NHWC", "HWIO", "NHWC"), dil), x
            )
            rows.append((f"F-major dil={dil[0]}", ms))
        # swapped: NHWC with H=T, W=F (dilated axis minor-adjacent)
        xt = jax.random.normal(key, (B, T, F, C), DT)
        wt = jax.random.normal(key, (3, 5, C, C), DT) * 0.02
        for dil in ((1, 1), (1, d)):
            ms = scan_bench(
                lambda xx: conv(xx, wt, ("NHWC", "HWIO", "NHWC"), dil), xt
            )
            rows.append((f"T-major dil={dil[1]}", ms))
        # GEMM ceiling: M = B*F*T, K = 15*C, N = C
        M = B * F * T
        a = jax.random.normal(key, (M, 15 * C), DT)
        bm = jax.random.normal(key, (15 * C, C), DT) * 0.02
        pad = jax.random.normal(key, (C, 15 * C), DT) * 0.02

        def gemm(aa):
            # chain two matmuls so output shape == input shape for the scan
            return (aa @ bm) @ pad

        ms = scan_bench(gemm, a)
        rows.append(("GEMM MxKxN + back", ms))
        gf_gemm = 2 * (2 * M * 15 * C * C) / 1e9
        for name, ms in rows:
            g = gf_gemm if name.startswith("GEMM") else gf
            print(f"| F={F} T={T} C={C} | {name} | {ms:6.2f} | {g/ms:5.0f} |",
                  flush=True)


if __name__ == "__main__":
    main()
