"""TPU microbenchmark: implicit-GEMM Pallas conv (conv_kernels.conv5x3_dilated)
vs XLA lax.conv at every flagship (5,3) conv shape, plus conv1x1 vs lax.

Scan-amortized (axon dispatch overhead), bf16 inputs, fp32 accumulation.
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

from babe_tpu.ops import conv_kernels as ck  # noqa: E402

FLOOR = None


def timeit(jf, *a, n=4):
    np.asarray(jf(*a))
    w = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jf(*a))
        w.append(time.time() - t0)
    return min(w) * 1000


def scan_ms(fn, x, iters=12):
    def looped(x):
        def body(c, _):
            y = fn(c)
            return y[..., :x.shape[-1]] if y.shape[-1] >= x.shape[-1] else jnp.tile(
                y, (1, 1, 1, -(-x.shape[-1] // y.shape[-1])))[..., :x.shape[-1]], None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    return (timeit(jax.jit(looped), x) - FLOOR) / iters


LEVELS = [
    # (F, T, C, N, d) encoder/decoder 5x3 shapes of the 5 s bench config
    (64, 1280, 64, 64, 1), (64, 1280, 64, 64, 2),
    (128, 640, 96, 96, 1), (128, 640, 96, 96, 4),
    (192, 320, 96, 96, 1), (192, 320, 96, 96, 8),
    (256, 160, 128, 128, 8),
    (320, 80, 128, 128, 16),
    (384, 40, 256, 256, 1), (384, 40, 256, 256, 32), (384, 40, 256, 256, 64),
    (448, 20, 256, 256, 1), (448, 20, 256, 256, 64),
    (128, 640, 64, 64, 4),   # decoder ups_5 shape
]


def main():
    global FLOOR
    FLOOR = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    B = 8

    tot_x, tot_p = 0.0, 0.0
    for (F, T, C, N, d) in LEVELS:
        x = jax.random.normal(key, (B, F, T, C), jnp.bfloat16)
        w = jax.random.normal(key, (5, 3, C, N), jnp.bfloat16) * 0.05
        gf = 2 * B * F * T * C * N * 15 / 1e12

        # correctness spot check on device
        yr = np.asarray(ck.conv_xla(x, w, (d, 1)), np.float32)
        yp = np.asarray(ck.conv5x3_dilated(x, w, d), np.float32)
        err = np.max(np.abs(yr - yp)) / (np.max(np.abs(yr)) + 1e-9)
        plan = ck._plan(B, F, T, C, N, d)

        a = scan_ms(lambda xx: ck.conv_xla(xx, w, (d, 1)), x)
        b = scan_ms(lambda xx: ck.conv5x3_dilated(xx, w, d), x)
        tot_x += a
        tot_p += b
        print(f"({B},{F},{T},{C}->{N}) d={d:2d} plan={plan}: "
              f"xla {a:6.2f} ms [{gf / (a / 1e3):4.0f} TF/s]  "
              f"pallas {b:6.2f} ms [{gf / (b / 1e3):4.0f} TF/s]  relerr {err:.1e}",
              flush=True)
    print(f"\nTOTALS over probed shapes: xla {tot_x:.1f} ms  pallas {tot_p:.1f} ms")


if __name__ == "__main__":
    main()
