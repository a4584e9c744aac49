"""Wall-time the fwd (or vjp) NFE scan — quick A/B harness for layout/fusion
experiments (BABE_LAYOUT_PIN etc.).  Usage:
    BABE_LAYOUT_PIN='fwd<=64' python tools/time_nfe.py [batch] [sec] [fwd|vjp]
Prints ms/NFE (scan of 8 iterations, min of 4 runs, dispatch floor removed).
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from tools.trace_nfe import ITERS, build  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    mode = sys.argv[3] if len(sys.argv) > 3 else "fwd"
    jf, x = build(batch, sec, mode)

    def t(f, *a, n=4):
        t0 = time.time()
        np.asarray(f(*a))
        comp = time.time() - t0
        w = []
        for _ in range(n):
            t0 = time.time()
            np.asarray(f(*a))
            w.append(time.time() - t0)
        return min(w), comp

    import jax.numpy as jnp

    floor, _ = t(jax.jit(lambda z: jnp.sum(z * 2)), jnp.zeros((8,)), n=8)
    wall, comp = t(jf, x)
    per = (wall - floor) * 1e3 / ITERS
    print(f"mode={mode} batch={batch} sec={sec}: {per:.1f} ms/NFE "
          f"(wall {wall:.3f}s, compile {comp:.0f}s, floor {floor*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
