"""Bisect the (8,448,20,256) in-situ conv slowness: isolated single conv runs
at 156-203 TF/s, but inside the model the same conv runs at 60-65. Is it the
chain structure (7 different dilated convs back to back), the distinct weight
tensors, or something else?  Scan-amortized on the real TPU.
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

FLOOR = None
B, F, T, C = 8, 448, 20, 256
GF1 = 2 * B * F * T * C * C * 15 / 1e12  # per conv


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
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))
    return (timeit(jax.jit(looped), x) - FLOOR) / iters


def conv(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    global FLOOR
    FLOOR = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, F, T, C), jnp.bfloat16)
    ws = [jax.random.normal(jax.random.fold_in(key, i),
                            (5, 3, C, C), jnp.bfloat16) * 0.02
          for i in range(7)]
    dils = [1, 2, 4, 8, 16, 32, 64]

    # 1. single conv d=64, same weights every iteration (the isolated case)
    ms = scan_ms(lambda c: conv(c, ws[0], 64), x)
    print(f"single conv d=64, reused weights : {ms:6.2f} ms "
          f"[{GF1 / (ms / 1e3):4.0f} TF/s]", flush=True)

    # 2. chain of 7 convs, distinct weights + dilations (the model case)
    def chain(c):
        h = c
        for w, d in zip(ws, dils):
            h = conv(h, w, d)
        return h * (1.0 / 7)

    ms = scan_ms(chain, x)
    print(f"chain of 7 (distinct w, dils)    : {ms:6.2f} ms "
          f"[{7 * GF1 / (ms / 1e3):4.0f} TF/s]", flush=True)

    # 3. chain of 7, all d=64 (isolate the dilation mix)
    def chain64(c):
        h = c
        for w in ws:
            h = conv(h, w, 64)
        return h * (1.0 / 7)

    ms = scan_ms(chain64, x)
    print(f"chain of 7 (distinct w, all d=64): {ms:6.2f} ms "
          f"[{7 * GF1 / (ms / 1e3):4.0f} TF/s]", flush=True)

    # 4. chain of 7, same weight tensor (isolate weight streaming)
    def chain_samew(c):
        h = c
        for d in dils:
            h = conv(h, ws[0], d)
        return h * (1.0 / 7)

    ms = scan_ms(chain_samew, x)
    print(f"chain of 7 (same w, mixed dils)  : {ms:6.2f} ms "
          f"[{7 * GF1 / (ms / 1e3):4.0f} TF/s]", flush=True)

    # 5. with elementwise + barrier between convs (the real block structure)
    from babe_tpu.models.blocks import gelu_exact

    def chain_ew(c):
        h = c
        for w, d in zip(ws, dils):
            g = gelu_exact(h * 0.9)
            g = jax.lax.optimization_barrier(g)
            h = (h + conv(g, w, d) * 0.1) * 0.7071
        return h

    ms = scan_ms(chain_ew, x)
    print(f"chain of 7 + gelu/residual/barrier: {ms:6.2f} ms "
          f"[{7 * GF1 / (ms / 1e3):4.0f} TF/s of conv work]", flush=True)


if __name__ == "__main__":
    main()
