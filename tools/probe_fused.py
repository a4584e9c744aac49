"""TPU A/B of the fused dilation-stage kernel variants (kt3 vs kf5) at the
flagship level shapes, scan-amortized.  Reference anchors: the XLA in-situ
per-stage costs from tools/conv_budget.py.

Usage: python tools/probe_fused.py [kt3|kf5|both]
"""

from __future__ import annotations

import os
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
B = 8


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
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return (timeit(jax.jit(looped), x) - FLOOR) / iters


# (F, T, C, d) — encoder stages of the 5 s bench config
LEVELS = [
    (64, 1280, 64, 2),
    (128, 640, 96, 4),
    (192, 320, 96, 8),
    (256, 160, 128, 8),
    (384, 40, 256, 32),
    (448, 20, 256, 64),
]


def main():
    global FLOOR
    FLOOR = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    variants = ["kt3", "kf5"] if which == "both" else [which]
    key = jax.random.PRNGKey(0)

    for (F, T, C, d) in LEVELS:
        Cp = ck._round128(C)
        T8 = -(-T // 8) * 8
        xp = jax.random.normal(key, (B, F + 4 * d, T8 + 16, Cp), jnp.bfloat16)
        lanes_ok = jax.lax.broadcasted_iota(jnp.int32, xp.shape, 3) < C
        rows = jax.lax.broadcasted_iota(jnp.int32, xp.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, xp.shape, 2)
        ok = (lanes_ok & (rows >= 2 * d) & (rows < 2 * d + F)
              & (cols >= 8) & (cols < 8 + T))
        xp = xp * ok.astype(jnp.bfloat16)
        w4 = jax.random.normal(key, (5, 3, Cp, Cp), jnp.bfloat16) * 0.05
        a = jnp.ones((B, Cp), jnp.float32)
        s = jnp.full((B, Cp), 0.3, jnp.float32)
        static = (d, d, F, T, C, Cp)  # dm = d for a single stage
        gf = 2 * B * F * T * C * C * 15 / 1e12  # real flops

        line = f"(F{F} T{T} C{C} d{d:2d})"
        outs = {}
        for v in variants:
            os.environ["BABE_FUSED_VARIANT"] = v
            plan = ck._fused_plan(B, F, T, Cp, d, v)

            def fn(carry, static=static, w4=w4, a=a, s=s):
                xx, zz = carry  # ping-pong pair, as in the real chain
                y, _ = ck.fused_stage_padded(xx, zz, w4, a, s, static)
                return (y, xx)

            ms = scan_ms(fn, (xp, jnp.zeros_like(xp)))
            outs[v] = ms
            line += f"  {v}: {ms:6.2f} ms [{gf / (ms / 1e3):4.0f} rTF/s] plan={plan}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
