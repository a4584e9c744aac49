"""Probe: space-to-depth (T-phase→channel) packing for the C<128 dilated
(5,3) convs.

PROFILE.md's binding constraint is MXU lane fill (C/128)^2: the C=64/96
levels run at 50-100 TF/s vs ~190 at C>=128.  Packing two adjacent time
samples into channels turns a (5,3) conv over (F,T,C) into a (5,2) conv
over (F,T/2,2C) with a 75%-dense packed kernel: 1.33x the FLOPs at (ideally)
the full-lane rate — a projected ~2x speedup at C=64.

The input pack is a pure reshape (C-minor contiguity); the output unpack is
two slices + concat + reshape (phase-1 outputs are computed shifted by one
packed step so both phases share the same 2-tap window).

Usage: python tools/probe_s2d.py [check|tpu|tpu-int8]
  check    — numeric parity vs conv_xla on CPU
  tpu      — scan-amortized timing at the model's level shapes (bf16)
  tpu-int8 — the same question on the int8 conv path

MEASURED (both negative — kept as the record):
  bf16 (round 4): 0.67-1.08x — the 1.33x packed FLOPs outweigh the fill
  gain at XLA's bf16 conv rates.
  int8 (round 7): 0.37-0.71x vs plain int8 — worse still; XLA's int8 conv
  emitter gets no benefit from T-phase channel packing at these shapes
  ((64,1280,64)d2 1.37->1.92 ms, (128,640,96)d4 1.46->3.76,
  (192,320,96)d8 1.13->3.05, scan-amortized, v5e).
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

from babe_tpu.ops.conv_kernels import conv_xla  # noqa: E402

B = 8


def pack_weights(w):
    """(5,3,C,N) SAME conv kernel -> (5,2,2C,2N) packed kernel.

    Output phase 0 sits at packed position u with taps (u-1, u); output
    phase 1 is computed at packed position u with the SAME taps but
    represents y[2u-1] (one-step shift, undone in the unpack slice)."""
    k5, k3, C, N = w.shape
    W = jnp.zeros((k5, 2, 2 * C, 2 * N), w.dtype)
    # phase-0 outputs: y[2u] = w0*x[2u-1] + w1*x[2u] + w2*x[2u+1]
    #   x[2u-1] = p1[u-1] (tap 0, in-phase 1); x[2u]=p0[u] (tap 1, phase 0);
    #   x[2u+1] = p1[u] (tap 1, in-phase 1)
    W = W.at[:, 0, C:, :N].set(w[:, 0])
    W = W.at[:, 1, :C, :N].set(w[:, 1])
    W = W.at[:, 1, C:, :N].set(w[:, 2])
    # phase-1 outputs (shifted): y[2u-1] = w0*x[2u-2] + w1*x[2u-1] + w2*x[2u]
    #   = w0*p0[u-1] + w1*p1[u-1] + w2*p0[u]
    W = W.at[:, 0, :C, N:].set(w[:, 0])
    W = W.at[:, 0, C:, N:].set(w[:, 1])
    W = W.at[:, 1, :C, N:].set(w[:, 2])
    return W


def conv_s2d(x, w, d):
    B_, F, T, C = x.shape
    N = w.shape[3]
    X = x.reshape(B_, F, T // 2, 2 * C)
    W = pack_weights(w)
    out = jax.lax.conv_general_dilated(
        X, W, (1, 1), padding=((2 * d, 2 * d), (1, 1)),
        rhs_dilation=(d, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ph0 = out[:, :, : T // 2, :N]
    ph1 = out[:, :, 1:, N:]
    return jnp.concatenate([ph0, ph1], axis=-1).reshape(B_, F, T, N)


def check():
    key = jax.random.PRNGKey(0)
    for (F, T, C, d) in [(16, 32, 4, 2), (8, 10, 3, 1), (64, 128, 8, 4)]:
        x = jax.random.normal(key, (2, F, T, C), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (5, 3, C, C), jnp.float32)
        ref = conv_xla(x, w, (d, 1))
        got = conv_s2d(x, w, d)
        err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"F={F} T={T} C={C} d={d}: rel err {err:.2e}")
        assert err < 1e-5, "MISMATCH"
    print("parity OK")


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


def tpu():
    global FLOOR
    FLOOR, _ = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    DT = jnp.bfloat16
    shapes = [  # (F, T, C, dil_f) — the sub-128-lane model levels + control
        (64, 1280, 64, 2),
        (128, 640, 96, 4),
        (192, 320, 96, 8),
        (256, 160, 128, 16),
    ]
    print("| shape | baseline ms (TF/s) | s2d ms (eff TF/s) | speedup |")
    print("|---|---|---|---|")
    for F, T, C, d in shapes:
        gf = 2 * B * F * T * C * C * 15 / 1e9  # useful FLOPs (both variants)
        x = jax.random.normal(key, (B, F, T, C), DT)
        w = jax.random.normal(key, (5, 3, C, C), DT) * 0.02
        wp = pack_weights(w)

        base = scan_bench(lambda xx: conv_xla(xx, w, (d, 1)), x)

        def s2d_pre(xx):  # packed weights precomputed (as a trainer would)
            B_, F_, T_, C_ = xx.shape
            X = xx.reshape(B_, F_, T_ // 2, 2 * C_)
            out = jax.lax.conv_general_dilated(
                X, wp, (1, 1), padding=((2 * d, 2 * d), (1, 1)),
                rhs_dilation=(d, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            ph0 = out[:, :, : T_ // 2, :C_]
            ph1 = out[:, :, 1:, C_:]
            return jnp.concatenate([ph0, ph1], axis=-1).reshape(xx.shape)

        s2 = scan_bench(s2d_pre, x)
        print(f"| ({F},{T},{C}) d{d} | {base:.2f} ({gf/base:.0f}) "
              f"| {s2:.2f} ({gf/s2:.0f}) | {base/s2:.2f}x |")


def tpu_int8():
    """int8 re-run of the s2d question: in bf16 s2d lost (0.67-1.08x,
    round-4 probe) because the packed conv's 1.33x FLOPs outweighed the
    fill gain.  At int8 the C>=128 MXU rate is ~2.3-2.7x bf16 while C=64
    gains only 1.15x (PROFILE.md round 6) — packing C=64->128 should now
    realize the int8 rate exactly where plain int8 buys nothing."""
    global FLOOR
    FLOOR, _ = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    print(f"floor {FLOOR:.1f} ms", file=sys.stderr)
    from babe_tpu.ops.conv_kernels import (_quant_act_per_item,
                                           _quant_weight_per_cout)
    key = jax.random.PRNGKey(0)
    DT = jnp.bfloat16
    shapes = [
        (64, 1280, 64, 2),
        (128, 640, 96, 4),
        (192, 320, 96, 8),
    ]
    print("| shape | bf16 ms | int8 ms | int8+s2d ms | s2d speedup vs int8 |")
    print("|---|---|---|---|---|")
    for F, T, C, d in shapes:
        gf = 2 * B * F * T * C * C * 15 / 1e9
        x = jax.random.normal(key, (B, F, T, C), DT)
        w = jax.random.normal(key, (5, 3, C, C), DT) * 0.02
        wp = pack_weights(w.astype(jnp.float32))
        qwp, swp = _quant_act_q(wp)
        qw, sw = _quant_weight_per_cout(w.astype(jnp.float32))

        base = scan_bench(lambda xx: conv_xla(xx, w, (d, 1)), x)

        def int8_plain(xx):
            qx, sx = _quant_act_per_item(xx)
            qx = jax.lax.optimization_barrier(qx)
            acc = jax.lax.conv_general_dilated(
                qx, qw, (1, 1), "SAME", rhs_dilation=(d, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (sx * sw)).astype(xx.dtype)

        def int8_s2d(xx):
            B_, F_, T_, C_ = xx.shape
            qx, sx = _quant_act_per_item(xx)
            qx = jax.lax.optimization_barrier(qx)
            X = qx.reshape(B_, F_, T_ // 2, 2 * C_)
            acc = jax.lax.conv_general_dilated(
                X, qwp, (1, 1), padding=((2 * d, 2 * d), (1, 1)),
                rhs_dilation=(d, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * (sx * swp)).astype(xx.dtype)
            ph0 = out[:, :, : T_ // 2, :C_]
            ph1 = out[:, :, 1:, C_:]
            return jnp.concatenate([ph0, ph1], axis=-1).reshape(xx.shape)

        i8 = scan_bench(int8_plain, x)
        s2 = scan_bench(int8_s2d, x)
        print(f"| ({F},{T},{C}) d{d} | {base:.2f} ({gf/base:.0f} TF/s) "
              f"| {i8:.2f} ({gf/i8:.0f}) | {s2:.2f} ({gf/s2:.0f}) "
              f"| {i8/s2:.2f}x |")


def _quant_act_q(wp):
    """Per-output-channel int8 quantization of the packed kernel (zeros in
    the 75%-dense pack quantize to exact 0)."""
    from babe_tpu.ops.conv_kernels import _quant_weight_per_cout
    return _quant_weight_per_cout(wp)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        import os
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        check()
    elif mode == "tpu-int8":
        tpu_int8()
    else:
        tpu()
