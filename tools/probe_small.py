"""Quick TPU probes for the conv-budget findings (tools/conv_budget.py):

1. 1x1 convs at tiny/small C run far above the BW floor in situ — does a
   plain reshape+dot formulation beat lax.conv at those shapes?
2. XLA 5x3 dilated conv at the exact in-situ trouble shapes, isolated, to
   separate "shape is slow" from "context is slow".

Scan-amortized timing (axon dispatch ~27ms), bf16.
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


def conv1x1_lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1_dot(x, w):
    B, F, T, C = x.shape
    return jnp.einsum("bftc,cn->bftn", x, w[0, 0])


def conv53_lax(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    global FLOOR
    FLOOR = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    def keep_shape(f, x):
        """Wrap f so the scan carry keeps x's shape (slice/tile the output)."""
        Ci = x.shape[-1]

        def g(xx):
            y = f(xx).astype(xx.dtype)
            Co = y.shape[-1]
            if Co == Ci:
                return y
            if Co > Ci:
                return y[..., :Ci]
            reps = -(-Ci // Co)
            return jnp.tile(y, (1, 1, 1, reps))[..., :Ci]

        return g

    print("\n== 1x1 conv: lax.conv vs dot (bf16) ==", flush=True)
    for (B, F, T, Ci, Co) in [
        (8, 64, 1280, 64, 64), (8, 64, 1280, 2, 64), (8, 64, 1280, 64, 2),
        (8, 128, 640, 96, 96), (8, 448, 20, 256, 256),
    ]:
        x = jax.random.normal(key, (B, F, T, Ci), jnp.bfloat16)
        w = jax.random.normal(key, (1, 1, Ci, Co), jnp.bfloat16)
        bw = (B * F * T * (Ci + Co) * 2) / 1e9  # GB
        a = scan_ms(keep_shape(lambda xx: conv1x1_lax(xx, w), x), x)
        b = scan_ms(keep_shape(lambda xx: conv1x1_dot(xx, w), x), x)
        print(f"({B},{F},{T},{Ci}->{Co}): lax {a:6.2f} ms  dot {b:6.2f} ms  "
              f"(BW floor ~{bw / 0.819:.2f} ms)", flush=True)

    def conv53_split(x, w, d):
        """5x dil-F-shifted 1x3 convs summed: does XLA like kf=1 windows?"""
        B, F, T, C = x.shape
        xp = jnp.pad(x, ((0, 0), (2 * d, 2 * d), (0, 0), (0, 0)))
        out = None
        for kf in range(5):
            part = jax.lax.conv_general_dilated(
                jax.lax.dynamic_slice_in_dim(xp, kf * d, F, axis=1),
                w[kf:kf + 1], (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = part if out is None else out + part
        return out

    print("\n== 5x3 dilated conv: lax vs 5x(1x3 shifted) (bf16) ==", flush=True)
    for (F, T, C, d) in [(192, 320, 96, 8), (192, 320, 96, 1), (128, 640, 96, 4),
                         (64, 1280, 64, 2), (448, 20, 256, 64), (448, 20, 256, 1),
                         (384, 40, 256, 32)]:
        x = jax.random.normal(key, (8, F, T, C), jnp.bfloat16)
        w = jax.random.normal(key, (5, 3, C, C), jnp.bfloat16)
        gf = 2 * 8 * F * T * C * C * 15 / 1e12
        a = scan_ms(lambda xx: conv53_lax(xx, w, d), x)
        b = scan_ms(lambda xx: conv53_split(xx, w, d), x)
        print(f"(8,{F},{T},{C}) d={d}: lax {a:6.2f} ms [{gf / (a / 1e3):4.0f} TF/s]"
              f"  split {b:6.2f} ms [{gf / (b / 1e3):4.0f} TF/s]", flush=True)


if __name__ == "__main__":
    main()
