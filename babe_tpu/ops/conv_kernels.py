"""TPU conv kernels for the CQTDiff+ hot path.

Motivation (measured, tools/trace_nfe.py + tools/conv_budget.py): 95 % of the
per-NFE device time of the flagship sampler is convolution fusions, and XLA's
lowering of the model's frequency-dilated (5,3) convs collapses at the small-
channel levels — 14–29 TF/s at (8,192,320,96), 31–43 TF/s at (8,448,20,256),
16–18 TF/s at (8,64,1280,64) — while its 1x1 convs run ~4x above the HBM
bandwidth floor.  (Reference architecture: networks/cqtdiff+.py:382-493 —
the ResnetBlock dilated conv stack this kernel serves.)

Two replacements, both drop-in 'SAME' NHWC convolutions:

* ``conv1x1``: a plain reshape+matmul — measured at the bandwidth floor
  (0.26 ms vs lax.conv's 0.99 ms at (8,64,1280,64)).
* ``conv5x3_dilated``: a Pallas implicit-GEMM kernel.  The (kf=5) x (kt=3)
  taps are gathered into a VMEM patch matrix per kf-row (K = 3C contraction
  feeding the MXU instead of XLA's per-tap K = C), tiles stream HBM->VMEM
  with double-buffered async DMA (the F-halo of the dilated window is read
  once per tile, not once per tap), and accumulation is fp32.

The Pallas kernel carries a ``jax.custom_vjp`` whose backward is built with
``jax.linear_transpose`` (no forward recomputation), so it is safe inside
the guided-sampling vjp (testing/blind_bwe_sampler.py:75-135 semantics);
``conv1x1`` is a plain einsum and relies on standard autodiff.

Backend selection: ``set_backend("pallas"|"xla"|"auto")`` or env
``BABE_CONV_BACKEND``; "auto" uses Pallas on TPU when the shape tiles, XLA
otherwise (CPU tests exercise the kernel in interpret mode explicitly).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BACKEND = os.environ.get("BABE_CONV_BACKEND", "auto")
_INTERPRET = False  # tests flip this to run the kernel on CPU


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "pallas", "xla")
    _BACKEND = name


# ------------------------------------------------------- reduced precision
#
# v5e's MXU runs int8 at ~2x bf16 throughput, and the bf16 conv budget is
# trace-proven MXU-fill-bound (PROFILE.md round 4) — reduced precision is
# the one lever left toward the 10x north-star (VERDICT r3 next-#1).
# Measured on the real chip (tools/probe_int8.py): the (8,384,40,256)
# level conv drops 1.12 -> 0.42 ms *including* the requant epilogue.
#
# Scheme (weight-only information loss is NOT enough — a bf16 x int8 conv
# measured exactly at bf16 speed, same probe):
#   * weights: per-output-channel symmetric int8 (scale = amax/127 over
#     kh,kw,cin), quantized from the fp32 params at trace time,
#   * activations: per-item dynamic symmetric int8 (scale = amax/127 over
#     F,T,C per batch item — no calibration pass, no saved state, exact
#     ranges at every sigma of the reverse process),
#   * conv accumulates int8 x int8 -> int32 (preferred_element_type), the
#     epilogue rescales by s_x[b] * s_w[co] and casts back to x.dtype, so
#     everything around the conv is numerically unchanged.
#   * backward: straight-through — the custom vjp differentiates the
#     ORIGINAL-precision conv (standard estimator; keeps the guided
#     sampler's reconstruction gradients and training exact-precision).
#
# Opt-in via BABE_PRECISION=int8 (bench.py enables it for the headline
# metric; quality gate: tools/quality_int8.py — trajectory divergence and
# LSD delta vs the bf16 path, plus tools/capability_e2e.py).
# BABE_INT8_MINC bounds which levels quantize (default depends on the
# scale mode, see _int8_minc): the C>=128 convs run at 317-378 TF(op)/s
# int8 (81-96% of v5e's 394 TOPS spec); at C=96 the conv gain is cancelled
# by the quantize passes under dynamic amax but realized under the analytic
# bound scales (BABE_INT8_SCALE=bound, PROFILE.md round 7); the C<=64
# levels are MXU-fill-bound in ANY precision.


def _precision() -> str:
    return os.environ.get("BABE_PRECISION", "bf16")


# Training must keep the exact conv backward even when a same-process
# BABE.load(precision='int8') has enabled BABE_INT8_BWD for inference: the
# quantized dx cotangent is an inference-only trade (guided-sampler
# reconstruction gradients, LSD-gated), not a training estimator.  The
# trainer wraps its step body in exact_backward(), which wins over the env
# var at trace time (ADVICE r4 medium: api.py/env cross-talk).
_EXACT_BWD = False


@contextlib.contextmanager
def exact_backward():
    """Force the exact full-precision conv backward for everything traced
    inside this context, regardless of BABE_INT8_BWD."""
    global _EXACT_BWD
    prev = _EXACT_BWD
    _EXACT_BWD = True
    try:
        yield
    finally:
        _EXACT_BWD = prev


def _int8_bwd_active() -> bool:
    return (not _EXACT_BWD) and os.environ.get("BABE_INT8_BWD", "0") == "1"


def _int8_minc() -> int:
    # measured end-to-end optima (PROFILE.md rounds 6-7, tools/time_nfe.py):
    # with the analytic-bound scales the C=96 levels turn from a wash into a
    # -3 ms/NFE win (92.2 vs 95.2 at MINC=128); under dynamic amax the
    # quantize passes cancel C=96's conv gain and 128 is optimal.  C<=64 is
    # MXU-fill-bound in any precision (plain int8 1.37 vs bf16 1.31 ms
    # isolated; s2d packing loses too — tools/probe_s2d.py).
    default = "96" if _int8_scale_mode() == "bound" else "128"
    return int(os.environ.get("BABE_INT8_MINC", default))


def _quant_act_per_item(x):
    """(B, ..., C) -> int8 with per-item scale [B, 1...]."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=tuple(range(1, x.ndim)), keepdims=True)
    amax = jnp.maximum(amax, 1e-20)
    s = amax / 127.0
    q = jnp.clip(jnp.round(x32 * (127.0 / amax)),
                 -127.0, 127.0).astype(jnp.int8)
    return q, s


def _quant_act_with_scale(x, amax_bound):
    """Quantize with a per-item scale KNOWN BEFORE x is computed.

    amax_bound: (B,) fp32 upper bound on max|x| per item.  Because the
    scale does not depend on x's values, the quantize is a pure elementwise
    map — XLA fuses the whole producer chain (GN normalize + sigma affine +
    gelu) straight into the int8 write, so the bf16 activation NEVER
    materializes and the separate amax reduce pass disappears (the two
    extra passes that made C=96 a wash under dynamic amax, PROFILE.md
    round 6).  The caller inflates the analytic bound by BOUND_SAFETY
    (models/blocks.py) to cover bf16 rounding of the folded GN scale and
    the gelu polynomial's ~7e-4 overshoot, so the realized amax never
    exceeds the hint — no clipping, only a slightly coarser step (measured
    against the LSD gate, not bitwise)."""
    bshape = (-1,) + (1,) * (x.ndim - 1)
    amax = jnp.maximum(amax_bound, 1e-20)
    s = (amax / 127.0).reshape(bshape)
    # multiply by the (B,)-sized reciprocal instead of a full-tensor
    # divide (several VPU ops/element saved in the fused quantize chain)
    inv = (127.0 / amax).reshape(bshape)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                 -127.0, 127.0).astype(jnp.int8)
    return q, s


def _quant_weight_per_cout(w):
    """(kh, kw, ci, co) -> int8 with per-output-channel scale [co]."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)))
    s = jnp.maximum(amax, 1e-20) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _conv_int8_impl(x, w, dilation, with_q=False):
    qx, sx = _quant_act_per_item(x)
    qw, sw = _quant_weight_per_cout(w)
    # barrier: without it the TPU conv emitter folds the quantize chain into
    # the conv input and re-evaluates it once per kernel tap (15x).
    # BABE_INT8_INNER_BARRIER=0 is the A/B switch for re-measuring that.
    if os.environ.get("BABE_INT8_INNER_BARRIER", "1") != "0":
        qx = jax.lax.optimization_barrier(qx)
    acc = jax.lax.conv_general_dilated(
        qx, qw, (1, 1), "SAME", rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = sx * sw  # (B,1,1,1) x (co,) -> (B,1,1,co)
    out = (acc.astype(jnp.float32) * scale).astype(x.dtype)
    return (out, qx, sx) if with_q else out


def _int8_bwd_from_q(dilation, qx, sx, w, g):
    """Straight-through backward from the SAVED int8 activation.

    Saving (qx, sx) instead of the bf16 conv input matters inside the
    guided sampler's vjp: the bound-mode forward never materializes the
    bf16 activation (the producer chain fuses into the int8 write), and a
    residual holding x would force exactly that materialization back —
    plus the residual traffic halves.  dw = g (x) dequant(qx) is the TRUE
    weight gradient of the quantized forward (the activation quantize is
    upstream of w), so this is also the more faithful QAT estimator; dx
    stays the exact conv transpose in w (straight-through on both
    quantizations), or the quantized transpose under BABE_INT8_BWD=1."""
    xhat = (qx.astype(jnp.float32) * sx).astype(g.dtype)
    if _int8_bwd_active():
        # dx on the int8 MXU: for a stride-1 'SAME' conv with odd kernel
        # and symmetric dilation padding, the input cotangent is the 'SAME'
        # correlation of g with the spatially-flipped, io-swapped kernel at
        # the same rhs_dilation — the same quantized-conv implementation
        # applies (per-item dynamic scales on g).  Intended for the guided
        # sampler's input-only vjp (dw is DCE'd there since params are
        # closure constants); training forces the exact path via
        # exact_backward().
        wT = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
        dx = _conv_int8_impl(g, wT, dilation)
    else:
        dx = jax.linear_transpose(
            lambda xx: conv_xla(xx, w, dilation),
            jax.ShapeDtypeStruct(qx.shape, g.dtype))(g)[0]
    dw = jax.linear_transpose(
        lambda ww: conv_xla(xhat, ww, dilation),
        jax.ShapeDtypeStruct(w.shape, w.dtype))(g)[0]
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_int8(x, w, dilation=(1, 1)):
    """'SAME' NHWC conv computed in int8 on the MXU (see the scheme note
    above); gradients are straight-through w.r.t. both quantizations."""
    return _conv_int8_impl(x, w, dilation)


def _conv_int8_fwd(x, w, dilation):
    out, qx, sx = _conv_int8_impl(x, w, dilation, with_q=True)
    return out, (qx, sx, w)


def _conv_int8_bwd(dilation, res, g):
    qx, sx, w = res
    return _int8_bwd_from_q(dilation, qx, sx, w, g)


conv_int8.defvjp(_conv_int8_fwd, _conv_int8_bwd)


def _conv_int8_hinted_impl(x, w, amax_bound, dilation, with_q=False):
    qx, sx = _quant_act_with_scale(x, amax_bound)
    qw, sw = _quant_weight_per_cout(w)
    if os.environ.get("BABE_INT8_INNER_BARRIER", "1") != "0":
        qx = jax.lax.optimization_barrier(qx)
    acc = jax.lax.conv_general_dilated(
        qx, qw, (1, 1), "SAME", rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    return (out, qx, sx) if with_q else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_int8_hinted(x, w, amax_bound, dilation=(1, 1)):
    """conv_int8 with an analytically-known per-item activation scale.

    amax_bound (B,) fp32 must satisfy amax_bound >= max|x| per item — the
    caller derives it from the producer's GroupNorm statistics (see
    ResnetBlock: |gelu(v)| <= |v|, so amax_c(carrier)/denom_c *
    |gamma_n*(gamma+1)|, inflated by BOUND_SAFETY for bf16/poly rounding,
    bounds the conv input before it is computed).
    With the scale independent of x's values the quantize is pure
    elementwise and the producer chain fuses into the int8 write: no bf16
    materialization, no amax pass.  Backward is straight-through like
    conv_int8; the bound gets a zero cotangent (quantization treated as
    identity)."""
    return _conv_int8_hinted_impl(x, w, amax_bound, dilation)


def _conv_int8_hinted_fwd(x, w, amax_bound, dilation):
    out, qx, sx = _conv_int8_hinted_impl(x, w, amax_bound, dilation,
                                         with_q=True)
    # residuals hold the int8 activation, NOT x: a residual on x would
    # force the bf16 materialization bound mode exists to avoid (and did,
    # inside the guided sampler's vjp forward, until round 5)
    return out, (qx, sx, w, amax_bound)


def _conv_int8_hinted_bwd(dilation, res, g):
    qx, sx, w, amax_bound = res
    dx, dw = _int8_bwd_from_q(dilation, qx, sx, w, g)
    return (dx, dw, jnp.zeros_like(amax_bound))


conv_int8_hinted.defvjp(_conv_int8_hinted_fwd, _conv_int8_hinted_bwd)


def _int8_scale_mode() -> str:
    """'bound' (default): the caller-supplied analytic amax bound where
    available (the ResnetBlock dilated convs — the GN statistics give the
    scale before the activation exists, so the quantize fuses into the
    producer chain with no amax pass and no bf16 materialization); falls
    back to dynamic amax where no hint is passed (pyramid convs, 1x1s,
    cotangents).  'amax': per-item dynamic scales everywhere.
    Quality (trained ckpt, every level quantized, tools/quality_int8.py
    --mode lsd): bound-mode blind-BWE LSD delta vs bf16 = -0.0068 dB mean
    (high-band -0.0083) — same class as dynamic amax (-0.0025)."""
    return os.environ.get("BABE_INT8_SCALE", "bound")


def _dot1x1_int8_impl(x, w):
    qx, sx = _quant_act_per_item(x)
    qw, sw = _quant_weight_per_cout(w[0, 0])
    qx = jax.lax.optimization_barrier(qx)
    acc = jnp.einsum("bftc,cn->bftn", qx, qw,
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


@jax.custom_vjp
def dot1x1_int8(x, w):
    """1x1 'SAME' conv as an int8 matmul (w: [1,1,Cin,Cout]); same
    quantization scheme and straight-through backward as conv_int8."""
    return _dot1x1_int8_impl(x, w)


def _dot1x1_int8_fwd(x, w):
    return _dot1x1_int8_impl(x, w), (x, w)


def _dot1x1_int8_bwd(res, g):
    x, w = res
    _, pull = jax.vjp(lambda x_, w_: conv1x1(x_, w_), x, w)
    return pull(g)


dot1x1_int8.defvjp(_dot1x1_int8_fwd, _dot1x1_int8_bwd)


def _int8_ops() -> str:
    # 'conv' (default): only the (5,3) dilated convs — they are MXU-fill /
    # compute-bound and gain 1.7-2.7x from int8 (tools/probe_int8.py).
    # The 1x1s run AT the HBM bandwidth floor in bf16; quantizing them adds
    # two extra passes (amax + quantize) for an op whose time is traffic,
    # not MACs.  'all' quantizes the 1x1s too (measured slower end-to-end).
    return os.environ.get("BABE_INT8_OPS", "conv")


def _int8_active(cin: int, cout: int, is_1x1: bool = False) -> bool:
    if _precision() != "int8" or min(cin, cout) < _int8_minc():
        return False
    return (not is_1x1) or _int8_ops() == "all"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


# --------------------------------------------------------------- reference


def conv_xla(x, w, dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1(x, w):
    """1x1 'SAME' conv as a matmul (w: [1,1,Cin,Cout]); fp32 accumulation
    like the TPU conv unit, output in x.dtype."""
    y = jnp.einsum("bftc,cn->bftn", x, w[0, 0].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def conv1x1_convworld(x, w):
    """1x1 conv lowered as a CONVOLUTION in the forward (keeps the op in the
    conv layout world — a matmul here costs two relayout copies between the
    neighbouring (5,3) convs) but with a MATMUL backward: XLA's transposed
    1x1-conv emitter measured 6-20 TF/s in the guided sampler's vjp program
    (tools/conv_budget.py, vjp mode) vs the HBM-bandwidth-floor dot.

    Measured NEUTRAL end-to-end on the guided vjp step (the slow per-op rows
    were in the jvp portion of that program, where this vjp doesn't apply),
    so it stays opt-in via BABE_PROJ_BWD=dot (blocks.py dispatch)."""
    return conv_xla(x, w, (1, 1))


def _c1cw_fwd(x, w):
    return conv_xla(x, w, (1, 1)), (x, w)


def _c1cw_bwd(res, g):
    x, w = res
    w2 = w[0, 0]
    dx = jnp.einsum("bftn,cn->bftc", g, w2.astype(g.dtype),
                    preferred_element_type=jnp.float32).astype(g.dtype)
    dw = jnp.einsum("bftc,bftn->cn", x, g,
                    preferred_element_type=jnp.float32)[None, None]
    return dx, dw.astype(w.dtype)


conv1x1_convworld.defvjp(_c1cw_fwd, _c1cw_bwd)


# ------------------------------------------------------------ tile planning


def _divisors_desc(n):
    return [k for k in range(n, 0, -1) if n % k == 0]


def _plan(B, F, T, C, N, d, itembytes=2, vmem_budget=10 * 2**20):
    """Pick (BF, BT, per_slab, T8) for the kernel, or None if untileable.

    Minimizes total HBM read bytes (halo amplification), tie-breaking toward
    larger M = BF*BT (MXU efficiency)."""
    T8 = -(-T // 8) * 8
    best = None
    for BT in _divisors_desc(T8):
        # HBM DMA windows must be 8-aligned along the sublane (T) dim
        if BT > 512 or BT % 8:
            continue
        for BF in _divisors_desc(F):
            M = BF * BT
            if not (128 <= M <= 4096):
                continue
            per_slab = d >= BF
            nrows = 5 * BF if per_slab else BF + 4 * d
            vmem = (
                2 * nrows * (BT + 8) * C * itembytes      # xbuf
                + M * 3 * C * itembytes                    # patch
                + M * N * 4                                # acc (f32)
                + 2 * M * N * itembytes                    # obuf
                + 5 * 3 * C * N * itembytes                # weights
            )
            if vmem > vmem_budget:
                continue
            ntiles = B * (F // BF) * (T8 // BT)
            read = ntiles * nrows * (BT + 8) * C  # matches the BTp DMA window
            key = (read, -M)
            if best is None or key < best[0]:
                best = (key, (BF, BT, per_slab, T8))
    return None if best is None else best[1]


# ------------------------------------------------------------ pallas kernel


@functools.lru_cache(maxsize=None)
def _build_call(B, F, T8, C, N, d, BF, BT, per_slab, in_dtype_name,
                out_dtype_name, interpret):
    in_dtype = jnp.dtype(in_dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    BTp = BT + 8  # 8-aligned T halo window (1 left + BT + 7 right)
    nF, nT = F // BF, T8 // BT
    ntiles = B * nF * nT
    nrows = 5 * BF if per_slab else BF + 4 * d
    M = BF * BT

    def kernel(xp_ref, wk_ref, out_ref, xbuf, patch, acc, obuf, sin, sout):
        def coords(t):
            b = t // (nF * nT)
            r = t % (nF * nT)
            return b, r // nT, r % nT

        def dma_ins(slot, t):
            b, i, j = coords(t)
            f0 = i * BF
            t0 = j * BT
            if per_slab:
                return [
                    pltpu.make_async_copy(
                        xp_ref.at[b, pl.ds(f0 + kf * d, BF), pl.ds(t0, BTp), :],
                        xbuf.at[slot, pl.ds(kf * BF, BF)],
                        sin.at[slot, kf],
                    )
                    for kf in range(5)
                ]
            return [
                pltpu.make_async_copy(
                    xp_ref.at[b, pl.ds(f0, nrows), pl.ds(t0, BTp), :],
                    xbuf.at[slot],
                    sin.at[slot, 0],
                )
            ]

        def dma_out(slot, t):
            b, i, j = coords(t)
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_ref.at[b, pl.ds(i * BF, BF), pl.ds(j * BT, BT), :],
                sout.at[slot],
            )

        for c in dma_ins(0, 0):
            c.start()

        def body(t, carry):
            slot = t % 2

            @pl.when(t + 1 < ntiles)
            def _():
                for c in dma_ins((t + 1) % 2, t + 1):
                    c.start()

            for c in dma_ins(slot, t):
                c.wait()

            for kf in range(5):
                base = kf * BF if per_slab else kf * d
                for kt in range(3):
                    sl = xbuf[slot, pl.ds(base, BF), pl.ds(kt, BT), :]
                    patch[:, kt * C:(kt + 1) * C] = sl.reshape(M, C)
                pk = jnp.dot(patch[:], wk_ref[kf],
                             preferred_element_type=jnp.float32)
                if kf == 0:
                    acc[:] = pk
                else:
                    acc[:] = acc[:] + pk

            @pl.when(t >= 2)
            def _():
                dma_out(slot, t - 2).wait()

            obuf[slot] = acc[:].astype(out_dtype).reshape(BF, BT, N)
            dma_out(slot, t).start()
            return carry

        jax.lax.fori_loop(0, ntiles, body, 0)

        @pl.when(ntiles >= 2)
        def _():
            dma_out((ntiles - 2) % 2, ntiles - 2).wait()

        dma_out((ntiles - 1) % 2, ntiles - 1).wait()

    flops = 2 * B * F * T8 * C * N * 15
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, F, T8, N), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nrows, BTp, C), in_dtype),
            pltpu.VMEM((M, 3 * C), in_dtype),
            pltpu.VMEM((M, N), jnp.float32),
            pltpu.VMEM((2, BF, BT, N), out_dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (B * F * T8 * (C + N)),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def _pallas_forward(x, w, d, plan):
    B, F, T, C = x.shape
    N = w.shape[-1]
    BF, BT, per_slab, T8 = plan
    # Mosaic HBM-slice rules: DMA windows need 8-aligned offset/length along
    # the sublane (T) dim and a 128-multiple minor (C) dim.  T is padded
    # 1 left + 7 right beyond T8; C and N are zero-padded to 128 multiples
    # (the pads fuse into neighbouring elementwise chains in situ).
    Cp, Np = _round128(C), _round128(N)
    xp = jnp.pad(x, ((0, 0), (2 * d, 2 * d), (1, 7 + (T8 - T)),
                     (0, Cp - C)))
    wk = jnp.pad(w.astype(x.dtype), ((0, 0), (0, 0), (0, Cp - C),
                                     (0, Np - N))).reshape(5, 3 * Cp, Np)
    call = _build_call(B, F, T8, Cp, Np, d, BF, BT, per_slab,
                       x.dtype.name, x.dtype.name, _INTERPRET)
    out = call(xp, wk)
    if T8 != T or Np != N:
        out = out[:, :, :T, :N]
    return out


# ----------------------------------------------------------- public + vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv5x3_pallas(x, w, static):
    d, plan = static
    return _pallas_forward(x, w, d, plan)


def _fwd(x, w, static):
    return _conv5x3_pallas(x, w, static), (x, w)


def _bwd(static, res, g):
    d, _ = static
    x, w = res
    dx = jax.linear_transpose(
        lambda xx: conv_xla(xx, w, (d, 1)), x)(g)[0]
    dw = jax.linear_transpose(
        lambda ww: conv_xla(x, ww, (d, 1)), w)(g)[0]
    return dx, dw


_conv5x3_pallas.defvjp(_fwd, _bwd)


def conv5x3_dilated(x, w, d: int):
    """'SAME' NHWC conv, kernel (5,3), rhs_dilation (d,1).  Pallas on TPU
    when the shape tiles; XLA otherwise."""
    B, F, T, C = x.shape
    kf, kt, Ci, N = w.shape
    assert (kf, kt) == (5, 3) and Ci == C
    if _BACKEND != "pallas":  # opt-in for now (see fused_stage_active)
        return conv_xla(x, w, (d, 1))
    if not _on_tpu() and not _INTERPRET:
        # Mosaic lowering only exists for TPU; honor the opt-in gracefully
        return conv_xla(x, w, (d, 1))
    if C < 32:  # zero-pad waste to 128 lanes would dwarf the tiny FLOPs
        return conv_xla(x, w, (d, 1))
    plan = _plan(B, F, T, _round128(C), _round128(N), d)
    if plan is None:
        return conv_xla(x, w, (d, 1))
    return _conv5x3_pallas(x, w.astype(x.dtype), (d, (plan)))


# ----------------------------------------------------- fused dilated stage
#
# One ResnetBlock dilation step (networks/cqtdiff+.py:444-460 semantics):
#     h   = gelu(x * a)                     a = (gamma_sigma + 1) / gn_denom
#     y   = (x + conv5x3_d(h, w) * s) / sqrt(2)
# plus the (sum, sum-of-squares) per-channel moments of y that the NEXT
# stage's BiasFreeGroupNorm needs — all in a single pass over x.
#
# Chained padded layout: activations travel as (B, F + 4*d, T8 + 16, Cp)
# buffers whose F/T margins hold garbage (cheaper than zeroing); the kernel
# masks out-of-range taps with the global row/col index, so no host-side
# zero-pad pass is needed between stages.  Real data lives at
# [:, 2*d : 2*d + F, 8 : 8 + T, :C].


def fused_stage_active() -> bool:
    """Whether ResnetBlock should route its dilation stack through the
    fused Pallas stage.  Opt-in (BABE_CONV_BACKEND=pallas) while the kernel
    trails XLA's in-situ convs end-to-end — see PROFILE.md round-3 notes:
    the fused path measured 218 ms/NFE vs 164 ms for XLA+1x1-dots (patch
    build cost); default stays 'auto' = XLA until the kernel wins."""
    if _BACKEND == "pallas":
        # Mosaic lowering only exists for TPU; on other backends the opt-in
        # is honored only in interpret mode (tests)
        return _on_tpu() or _INTERPRET
    return False


# erf(z) ~ z * P(z^2): degree-10 Chebyshev fit on |z| <= 3.2 converted to
# the power basis (|err| <= 9e-6; clamped to sign(z) beyond, erf(3.2) is
# within 6e-6 of 1).  Pure polynomial — no exp/reciprocal — so it is cheap
# on the VPU in both the forward AND its autodiff (the gelu-backward chains
# dominate the guided sampler's elementwise time).
_ERF_C = (1.1283750399e+00, -3.7607088364e-01, 1.1265245796e-01,
          -2.6595735634e-02, 5.0087573199e-03, -7.4968982878e-04,
          8.6683659408e-05, -7.3661495009e-06, 4.2725490474e-07,
          -1.4950546990e-08, 2.3633496703e-10)


def _erf_poly(z):
    """Chebyshev erf on the (already clamped) argument."""
    v = z * z
    p = _ERF_C[-1]
    for c in _ERF_C[-2::-1]:
        p = p * v + c
    return z * p


def _gelu_impl(x):
    xf = x.astype(jnp.float32)
    z = jnp.clip(xf * 0.7071067811865475, -3.2, 3.2)
    return (0.5 * xf * (1.0 + _erf_poly(z))).astype(x.dtype)


# degree-6 minimax fit of the same erf form (|erf err| <= 1.4e-3, so
# |gelu err| <= 6.7e-4 * |x|).  For a gelu whose output feeds an int8
# quantize with per-item scale bound/127 the poly error sits 5.9x below
# the quantization HALF-step (3.9e-3 * bound, and the analytic bound covers
# the pre-gelu values the error scales with) — strictly inside the noise
# the int8 path already accepts.  8 fewer VPU ops/element in the fused
# GN-affine-gelu-quantize chain, which is VPU-bound, not HBM-bound
# (clamp_convert fusions, tools/trace_nfe.py round 8).
_ERF_C6 = (1.1264247159e+00, -3.6561742760e-01, 9.7881790600e-02,
           -1.7389500700e-02, 1.8964682000e-03, -1.1349870000e-04,
           2.8324000000e-06)


def _erf_poly6(z):
    v = z * z
    p = _ERF_C6[-1]
    for c in _ERF_C6[-2::-1]:
        p = p * v + c
    return z * p


def _gelu_cheap_impl(x):
    xf = x.astype(jnp.float32)
    z = jnp.clip(xf * 0.7071067811865475, -3.2, 3.2)
    return (0.5 * xf * (1.0 + _erf_poly6(z))).astype(x.dtype)


_INV_SQRT2PI = 0.3989422804014327


def _gelu_deriv(x):
    """gelu'(x) = 0.5*(1+erf(x/sqrt2)) + x*phi(x), phi the std normal pdf.
    Uses the same clamped erf polynomial as the forward (consistent to
    ~1e-5) plus ONE exp — ~30 VPU ops."""
    xf = x.astype(jnp.float32)
    z = jnp.clip(xf * 0.7071067811865475, -3.2, 3.2)
    return 0.5 * (1.0 + _erf_poly(z)) + xf * (
        _INV_SQRT2PI * jnp.exp(-0.5 * xf * xf)
    )


@jax.custom_vjp
def _gelu_exact(x):
    """Exact-erf gelu for TPU compute paths (Mosaic has no erf/erfc
    lowering, and XLA's own erf expansion costs ~50 VPU ops/element).

    fp32 internals, |gelu error| <= ~1e-5*|x| — three orders of magnitude
    below bf16 resolution, so golden parity with
    torch.nn.GELU(approximate='none') is unaffected.

    Carries a custom vjp: without it, XLA's backward fusions rematerialize
    the whole producer chain (concat + GroupNorm + affine + the 10-degree
    Horner) AND differentiate it by a second Horner chain plus the clamp's
    select/divide machinery — ~140 VPU ops/element, measured at VPU
    speed-of-light in the guided sampler (multiply_reduce fusions,
    tools/trace_nfe.py vjp mode).  The custom backward is the direct
    analytic derivative (~30 ops) against the saved input."""
    return _gelu_impl(x)


def _gelu_fwd(x):
    return _gelu_impl(x), x


def _gelu_bwd(x, g):
    return ((g.astype(jnp.float32) * _gelu_deriv(x)).astype(g.dtype),)


_gelu_exact.defvjp(_gelu_fwd, _gelu_bwd)


@jax.custom_vjp
def _gelu_for_int8(x):
    """gelu whose output is about to be int8-quantized: degree-6 erf (see
    _ERF_C6 — error strictly below the quantization half-step), exact
    analytic derivative in the backward (same as _gelu_exact, so the
    guided sampler's reconstruction gradients keep full accuracy).
    BABE_INT8_GELU=exact reverts to the degree-10 forward for A/B."""
    if os.environ.get("BABE_INT8_GELU", "cheap") == "exact":
        return _gelu_impl(x)
    return _gelu_cheap_impl(x)


def _gelu_i8_fwd(x):
    return _gelu_for_int8(x), x


_gelu_for_int8.defvjp(_gelu_i8_fwd, _gelu_bwd)



def _dil_stage_ref(xp, prev, w4, a, s, static):
    """XLA reference of fused_stage_padded (also its vjp body).

    Layout contract (uniform across a dilation chain): activations are
    (B, F + 4*dm, T8 + 16, Cp) with real data at
    [:, 2*dm : 2*dm + F, 8 : 8 + T, :C] and ZERO margins / fake T cols /
    channel lanes.  `prev` is the ping-pong scratch buffer whose storage
    the Pallas output aliases; its values are ignored (margins must be
    zero, which the chain maintains).
    w4 is the zero-padded HWIO kernel (5, 3, Cp, Cp)."""
    dm, d, F, T, C, Cp = static
    del prev
    x = xp[:, 2 * dm:2 * dm + F, 8:8 + T, :C]
    w = w4[:, :, :C, :C]
    # _gelu_exact (|err| <= ~1e-5) instead of jax.nn.gelu: this function is
    # also the fused stages' custom-vjp BODY, and XLA's autodiff of the
    # native erf gelu rematerializes the producer chain at ~140 VPU
    # ops/element (the round-4 finding) — the custom vjp keeps the guided
    # sampler's backward at the analytic-derivative cost.
    h = _gelu_exact(x * a[:, None, None, :C].astype(x.dtype))
    y = (x + conv_xla(h, w, (d, 1)) * s[:, None, None, :C].astype(x.dtype))
    y = y / jnp.sqrt(2.0).astype(x.dtype)
    y32 = y.astype(jnp.float32)
    mom = jnp.stack([jnp.sum(y32, (1, 2)), jnp.sum(y32 * y32, (1, 2))])
    mom = jnp.pad(mom, ((0, 0), (0, 0), (0, Cp - C)))
    T8 = xp.shape[2] - 16
    yp = jnp.pad(y, ((0, 0), (2 * dm, 2 * dm), (8, 8 + (T8 - T)),
                     (0, Cp - C)))
    return yp, mom


@functools.lru_cache(maxsize=None)
def _build_fused_call(B, F, T, T8, C, Cp, dm, d, BF, BT, per_slab,
                      dtype_name, interpret, variant="kt3"):
    """One fused ResnetBlock dilation stage (see fused_stage_padded).

    variant='kt3': per-kf patch over the 3 kt taps (K=3*Cp, 15
    sublane-shifted VMEM copies).  variant='kf5': patch over the 5 kf taps
    with full-window columns (K=5*Cp, 5 fully aligned copies) and the kt
    taps realized as 3 dots + sublane-shifted fp32 accumulation.
    Patches are double-buffered so Mosaic can overlap the vector-unit
    patch build of tap k+1 with the MXU dot of tap k.

    The output aliases the `prev` operand's buffer (input_output_aliases),
    so the zero margins written once at chain entry survive every stage —
    no masking or margin zeroing anywhere in the hot loop."""
    dt = jnp.dtype(dtype_name)
    BTw = BT + 16
    nF, nT = F // BF, T8 // BT
    ntiles = B * nF * nT
    nrows = 5 * BF if per_slab else BF + 4 * d
    M = BF * BT
    M2 = BF * BTw
    SQ2INV = 0.7071067811865475
    roff = 2 * dm - 2 * d  # window row offset inside the uniform margins

    def kernel(xp_ref, prev_ref, wk_ref, a_ref, s_ref, out_ref, mom_ref,
               xbuf, hbuf, patch, acc, obuf, sin, sout):
        del prev_ref  # storage donor only
        mom_ref[...] = jnp.zeros((2, B, Cp), jnp.float32)

        def coords(t):
            b = t // (nF * nT)
            r = t % (nF * nT)
            return b, r // nT, r % nT

        def dma_ins(slot, t):
            b, i, j = coords(t)
            f0 = i * BF + roff
            t0 = j * BT
            if per_slab:
                return [
                    pltpu.make_async_copy(
                        xp_ref.at[b, pl.ds(f0 + kf * d, BF), pl.ds(t0, BTw), :],
                        xbuf.at[slot, pl.ds(kf * BF, BF)],
                        sin.at[slot, kf])
                    for kf in range(5)
                ]
            return [pltpu.make_async_copy(
                xp_ref.at[b, pl.ds(f0, nrows), pl.ds(t0, BTw), :],
                xbuf.at[slot], sin.at[slot, 0])]

        def dma_out(slot, t):
            b, i, j = coords(t)
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_ref.at[b, pl.ds(i * BF + 2 * dm, BF),
                           pl.ds(j * BT + 8, BT), :],
                sout.at[slot])

        for c in dma_ins(0, 0):
            c.start()

        def body(t, carry):
            slot = t % 2
            b, i, j = coords(t)

            @pl.when(t + 1 < ntiles)
            def _():
                for c in dma_ins((t + 1) % 2, t + 1):
                    c.start()

            for c in dma_ins(slot, t):
                c.wait()

            # ---- prologue: h = gelu(x * a).  No masks: the layout
            # contract guarantees zero margins, and gelu(0 * a) == 0, so
            # out-of-range taps contribute exactly the conv zero padding.
            # Row strips bound the fp32 temporaries on the vector stack.
            av = a_ref[b, :].astype(dt)  # (Cp,)
            CH = 8
            while CH * 2 <= nrows and CH * 2 * BTw * Cp * 16 <= 2 * 2**20:
                CH *= 2
            for r0 in range(0, nrows, CH):
                rn = min(CH, nrows - r0)
                xt = xbuf[slot, pl.ds(r0, rn)]  # (rn, BTw, Cp)
                hbuf[pl.ds(r0, rn)] = _gelu_exact(xt * av[None, None, :])

            if variant == "kt3":
                # ---- implicit GEMM, per-kf patch over kt (K = 3*Cp)
                for kf in range(5):
                    base = kf * BF if per_slab else kf * d
                    pb = kf % 2
                    for kt in range(3):
                        sl = hbuf[pl.ds(base, BF), pl.ds(7 + kt, BT), :]
                        patch[pb, :, kt * Cp:(kt + 1) * Cp] = sl.reshape(M, Cp)
                    pk = jnp.dot(patch[pb], wk_ref[kf],
                                 preferred_element_type=jnp.float32)
                    if kf == 0:
                        acc[:] = pk
                    else:
                        acc[:] = acc[:] + pk
                acc3 = acc[:].reshape(BF, BT, Cp)
            else:
                # ---- 'kf5': aligned full-window patch over kf (K = 5*Cp),
                # kt taps as 3 dots + sublane-shifted fp32 accumulation
                for kf in range(5):
                    base = kf * BF if per_slab else kf * d
                    sl = hbuf[pl.ds(base, BF), :, :]  # aligned, full cols
                    patch[0, :, kf * Cp:(kf + 1) * Cp] = sl.reshape(M2, Cp)
                for kt in range(3):
                    pk = jnp.dot(patch[0], wk_ref[kt],
                                 preferred_element_type=jnp.float32)
                    p3 = pk.reshape(BF, BTw, Cp)[:, 7 + kt:7 + kt + BT, :]
                    if kt == 0:
                        acc[...] = p3
                    else:
                        acc[...] = acc[...] + p3
                acc3 = acc[...]

            # ---- epilogue: y = (x + conv*s)/sqrt(2)
            sv = s_ref[b, :]  # (Cp,) f32
            x0 = xbuf[slot, pl.ds(2 * d if not per_slab else 2 * BF, BF),
                      pl.ds(8, BT), :]
            y3 = (x0.astype(jnp.float32)
                  + acc3 * sv[None, None, :]) * SQ2INV
            if T8 != T:
                # zero the T..T8 fake cols (conv spill) to keep the layout
                # contract and the moments exact
                ocol = (j * BT) + (
                    jax.lax.broadcasted_iota(jnp.int32, (BF, BT, Cp), 1))
                y3 = jnp.where(ocol < T, y3, jnp.zeros_like(y3))

            mom_ref[0, b, :] = mom_ref[0, b, :] + jnp.sum(y3, axis=(0, 1))
            mom_ref[1, b, :] = mom_ref[1, b, :] + jnp.sum(y3 * y3, axis=(0, 1))

            @pl.when(t >= 2)
            def _():
                dma_out(slot, t - 2).wait()

            obuf[slot] = y3.astype(dt)
            dma_out(slot, t).start()
            return carry

        jax.lax.fori_loop(0, ntiles, body, 0)

        @pl.when(ntiles >= 2)
        def _():
            dma_out((ntiles - 2) % 2, ntiles - 2).wait()

        dma_out((ntiles - 1) % 2, ntiles - 1).wait()

    flops = 2 * B * F * T8 * Cp * Cp * 15
    if variant == "kt3":
        patch_scr = pltpu.VMEM((2, M, 3 * Cp), dt)
        acc_scr = pltpu.VMEM((M, Cp), jnp.float32)
    else:
        patch_scr = pltpu.VMEM((1, M2, 5 * Cp), dt)
        acc_scr = pltpu.VMEM((BF, BT, Cp), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, F + 4 * dm, T8 + 16, Cp), dt),
            jax.ShapeDtypeStruct((2, B, Cp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nrows, BTw, Cp), dt),
            pltpu.VMEM((nrows, BTw, Cp), dt),
            patch_scr,
            acc_scr,
            pltpu.VMEM((2, BF, BT, Cp), dt),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * B * F * T8 * Cp,
            transcendentals=B * F * T8 * Cp,
        ),
        interpret=interpret,
    )


def _fused_plan(B, F, T, C, d, variant="kt3", itembytes=2,
                vmem_budget=12 * 2**20):
    """Tile plan for the fused stage."""
    T8 = -(-T // 8) * 8
    best = None
    for BT in _divisors_desc(T8):
        if BT > 512 or BT % 8:
            continue
        for BF in _divisors_desc(F):
            M = BF * BT
            if not (128 <= M <= 4096):
                continue
            per_slab = d >= BF
            nrows = 5 * BF if per_slab else BF + 4 * d
            if variant == "kt3":
                patch_b = 2 * M * 3 * C * itembytes
                acc_b = M * C * 4
                dot_tmp = M * C * 4
            else:
                M2 = BF * (BT + 16)
                patch_b = M2 * 5 * C * itembytes
                acc_b = M * C * 4
                dot_tmp = 2 * M2 * C * 4  # pk + shifted slice temps
            vmem = (
                3 * nrows * (BT + 16) * C * itembytes     # xbuf x2 + hbuf
                + patch_b
                + acc_b
                + 2 * M * C * itembytes                    # obuf
                + 15 * C * C * itembytes                   # weights
                + 3 * M * C * 4 + dot_tmp                  # f32 temps
                + 2 * 2**20                                # prologue strips
            )
            if vmem > vmem_budget:
                continue
            ntiles = B * (F // BF) * (T8 // BT)
            read = ntiles * nrows * (BT + 16) * C
            key = (read, -M)
            if best is None or key < best[0]:
                best = (key, (BF, BT, per_slab, T8))
    return None if best is None else best[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_stage_padded(xp, prev, w4, a, s, static):
    """Fused ResnetBlock dilation stage on the chained padded layout.

    xp:   (B, F+4dm, T8+16, Cp) activations — real data at
          [:, 2dm:2dm+F, 8:8+T, :C]; margins, fake T cols and channel
          lanes [C:Cp) are ZERO (established once at chain entry and
          preserved by every stage via output aliasing).
    prev: same-shaped ping-pong buffer whose storage the output reuses
          (values ignored; margins must be zero).
    w4:   (5, 3, Cp, Cp) zero-padded HWIO kernel.
    a:    (B, Cp) f32 prologue multiplier  (gamma_sigma+1)/gn_denom.
    s:    (B, Cp) f32 epilogue gate scale.
    static: (dm, d, F, T, C, Cp) — dm is the chain's maximum dilation
          (uniform margin), d this stage's dilation.
    Returns (yp, moments): yp in prev's storage, moments = per-(B, Cp)
    [sum, sum of squares] of the real output region.
    """
    dm, d, F, T, C, Cp = static
    B = xp.shape[0]
    T8 = xp.shape[2] - 16
    if _BACKEND == "xla" or (_BACKEND == "auto"
                             and not (_on_tpu() or _INTERPRET)):
        return _dil_stage_ref(xp, prev, w4, a, s, static)
    variant = os.environ.get("BABE_FUSED_VARIANT", "kt3")
    plan = _fused_plan(B, F, T, Cp, d, variant)
    if plan is None and variant != "kt3":
        variant = "kt3"
        plan = _fused_plan(B, F, T, Cp, d, variant)
    if plan is None:
        return _dil_stage_ref(xp, prev, w4, a, s, static)
    BF, BT, per_slab, T8p = plan
    assert T8p == T8, (T8p, T8)
    if variant == "kt3":
        wk = w4.reshape(5, 3 * Cp, Cp)
    else:  # (3, 5*Cp, Cp): kt-major dots over kf-batched K
        wk = jnp.transpose(w4, (1, 0, 2, 3)).reshape(3, 5 * Cp, Cp)
    call = _build_fused_call(B, F, T, T8, C, Cp, dm, d, BF, BT, per_slab,
                             xp.dtype.name, _INTERPRET, variant)
    return call(xp, prev, wk.astype(xp.dtype), a.astype(jnp.float32),
                s.astype(jnp.float32))


def _fused_fwd(xp, prev, w4, a, s, static):
    return fused_stage_padded(xp, prev, w4, a, s, static), (xp, w4, a, s)


def _fused_bwd(static, res, g):
    xp, w4, a, s = res
    prev = jnp.zeros_like(xp)
    _, vjp = jax.vjp(
        lambda xx, ww, aa, ss: _dil_stage_ref(xx, prev, ww, aa, ss, static),
        xp, w4, a, s)
    dx, dw, da, ds = vjp(g)
    return dx, jnp.zeros_like(xp), dw, da, ds


fused_stage_padded.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------ fused dilated stage, int8
#
# The int8 re-economization of fused_stage_padded (VERDICT r4 next-#1).
# The bf16 fused kernel lost to XLA because the implicit-GEMM patch build is
# VPU-bound (each element crosses the vector unit ~15x); at int8 the patch
# bytes halve AND the dots run at the 394-TOPS MXU rate, while the kernel
# eliminates exactly the HBM traffic XLA cannot fuse across a conv: the
# GN-stats read pass, the quantize write+read, the requant output, and the
# residual-mix pass (the 22.7 ms/NFE "loop fusions" bucket in the round-7
# trace).  Per stage, ONE read of the carrier and ONE write of the output:
#
#     h_q  = int8( gelu(x * a) * 127/bound )          (prologue, in VMEM)
#     acc  = conv5x3_d(h_q, w_q)  int8 x int8 -> int32  (implicit GEMM)
#     y    = x * 1/sqrt2 + acc * post                  (epilogue, fp32)
#     mom  = [sum(y), sum(y^2), amax|y|] per (B, C)    (for the NEXT stage's
#                                                        GN stats AND bound)
#
# The amax row is what makes the chain self-sufficient: the analytic bound
# for stage i+1 needs per-channel amax of stage i's output, which the
# epilogue computes in-register for free.  Scales follow conv_int8_hinted:
# per-item activation bound (inflated by the caller), per-output-channel
# weight scales, straight-through exact backward.


def _quant_i8(hf, iv):
    """f32 -> int8 with per-item scale vector iv = 127/bound (broadcast)."""
    return jnp.clip(jnp.round(hf * iv), -127.0, 127.0).astype(jnp.int8)


def _dil_stage_int8_ref(xp, prev, qw, a, ivb, post, static):
    """XLA reference of the int8 fused stage (same quantized math as the
    Pallas kernel; CPU fallback and interpret-mode test oracle).

    qw: (5, 3, Cp, Cp) int8 weights; ivb/post: (B, Cp) f32 per-item
    quantize reciprocal / dequant-gate-invsqrt2 epilogue factor."""
    dm, d, F, T, C, Cp = static
    del prev, C
    B = xp.shape[0]
    T8 = xp.shape[2] - 16
    x = xp[:, 2 * dm:2 * dm + F, 8:8 + T, :]
    hf = _gelu_cheap_impl(x.astype(jnp.float32) * a[:, None, None, :])
    q = _quant_i8(hf, ivb[:, None, None, :])
    acc = jax.lax.conv_general_dilated(
        q, qw, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y3 = (x.astype(jnp.float32) * jnp.float32(SQRT2_INV)
          + acc.astype(jnp.float32) * post[:, None, None, :])
    mom = jnp.stack([jnp.sum(y3, (1, 2)), jnp.sum(y3 * y3, (1, 2)),
                     jnp.max(jnp.abs(y3), (1, 2))])
    yp = jnp.pad(y3.astype(xp.dtype),
                 ((0, 0), (2 * dm, 2 * dm), (8, 8 + (T8 - T)), (0, 0)))
    return yp, mom


SQRT2_INV = 0.7071067811865475


@functools.lru_cache(maxsize=None)
def _build_fused_int8_call(B, F, T, T8, C, Cp, dm, d, BF, BT, per_slab,
                           dtype_name, interpret):
    """One int8 fused ResnetBlock dilation stage (see fused_stage_int8)."""
    dt = jnp.dtype(dtype_name)
    BTw = BT + 16
    nF, nT = F // BF, T8 // BT
    ntiles = B * nF * nT
    nrows = 5 * BF if per_slab else BF + 4 * d
    M = BF * BT
    roff = 2 * dm - 2 * d

    def kernel(xp_ref, prev_ref, wk_ref, a_ref, iv_ref, post_ref,
               out_ref, mom_ref, xbuf, hq, patch, acc, obuf, sin, sout):
        del prev_ref  # storage donor only
        mom_ref[...] = jnp.zeros((3, B, Cp), jnp.float32)

        def coords(t):
            b = t // (nF * nT)
            r = t % (nF * nT)
            return b, r // nT, r % nT

        def dma_ins(slot, t):
            b, i, j = coords(t)
            f0 = i * BF + roff
            t0 = j * BT
            if per_slab:
                return [
                    pltpu.make_async_copy(
                        xp_ref.at[b, pl.ds(f0 + kf * d, BF), pl.ds(t0, BTw), :],
                        xbuf.at[slot, pl.ds(kf * BF, BF)],
                        sin.at[slot, kf])
                    for kf in range(5)
                ]
            return [pltpu.make_async_copy(
                xp_ref.at[b, pl.ds(f0, nrows), pl.ds(t0, BTw), :],
                xbuf.at[slot], sin.at[slot, 0])]

        def dma_out(slot, t):
            b, i, j = coords(t)
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_ref.at[b, pl.ds(i * BF + 2 * dm, BF),
                           pl.ds(j * BT + 8, BT), :],
                sout.at[slot])

        for c in dma_ins(0, 0):
            c.start()

        def body(t, carry):
            slot = t % 2
            b, i, j = coords(t)

            @pl.when(t + 1 < ntiles)
            def _():
                for c in dma_ins((t + 1) % 2, t + 1):
                    c.start()

            for c in dma_ins(slot, t):
                c.wait()

            # ---- prologue: h_q = int8(gelu(x * a) * 127/bound).  The
            # layout contract guarantees zero margins; gelu(0)=0 -> q=0, so
            # out-of-range taps contribute exactly the conv zero padding.
            av = a_ref[b, :]      # (Cp,) f32
            ivv = iv_ref[b, :]    # (Cp,) f32 (same value in every lane)
            CH = 8
            while CH * 2 <= nrows and CH * 2 * BTw * Cp * 16 <= 2 * 2**20:
                CH *= 2
            for r0 in range(0, nrows, CH):
                rn = min(CH, nrows - r0)
                xt = xbuf[slot, pl.ds(r0, rn)]  # (rn, BTw, Cp) dt
                hf = _gelu_cheap_impl(
                    xt.astype(jnp.float32) * av[None, None, :])
                hq[pl.ds(r0, rn)] = _quant_i8(hf, ivv[None, None, :])

            # ---- implicit GEMM, per-kf patch over kt (K = 3*Cp), int8
            for kf in range(5):
                base = kf * BF if per_slab else kf * d
                pb = kf % 2
                for kt in range(3):
                    sl = hq[pl.ds(base, BF), pl.ds(7 + kt, BT), :]
                    patch[pb, :, kt * Cp:(kt + 1) * Cp] = sl.reshape(M, Cp)
                pk = jnp.dot(patch[pb], wk_ref[kf],
                             preferred_element_type=jnp.int32)
                if kf == 0:
                    acc[:] = pk
                else:
                    acc[:] = acc[:] + pk

            # ---- epilogue: y = x/sqrt2 + acc * post; moments + amax
            pv = post_ref[b, :]  # (Cp,) f32
            x0 = xbuf[slot, pl.ds(2 * d if not per_slab else 2 * BF, BF),
                      pl.ds(8, BT), :]
            y3 = (x0.astype(jnp.float32) * jnp.float32(SQRT2_INV)
                  + acc[:].reshape(BF, BT, Cp).astype(jnp.float32)
                  * pv[None, None, :])
            if T8 != T:
                ocol = (j * BT) + (
                    jax.lax.broadcasted_iota(jnp.int32, (BF, BT, Cp), 1))
                y3 = jnp.where(ocol < T, y3, jnp.zeros_like(y3))

            mom_ref[0, b, :] = mom_ref[0, b, :] + jnp.sum(y3, axis=(0, 1))
            mom_ref[1, b, :] = mom_ref[1, b, :] + jnp.sum(y3 * y3, axis=(0, 1))
            mom_ref[2, b, :] = jnp.maximum(
                mom_ref[2, b, :], jnp.max(jnp.abs(y3), axis=(0, 1)))

            @pl.when(t >= 2)
            def _():
                dma_out(slot, t - 2).wait()

            obuf[slot] = y3.astype(dt)
            dma_out(slot, t).start()
            return carry

        jax.lax.fori_loop(0, ntiles, body, 0)

        @pl.when(ntiles >= 2)
        def _():
            dma_out((ntiles - 2) % 2, ntiles - 2).wait()

        dma_out((ntiles - 1) % 2, ntiles - 1).wait()

    flops = 2 * B * F * T8 * Cp * Cp * 15
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, F + 4 * dm, T8 + 16, Cp), dt),
            jax.ShapeDtypeStruct((3, B, Cp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nrows, BTw, Cp), dt),
            pltpu.VMEM((nrows, BTw, Cp), jnp.int8),
            pltpu.VMEM((2, M, 3 * Cp), jnp.int8),
            pltpu.VMEM((M, Cp), jnp.int32),
            pltpu.VMEM((2, BF, BT, Cp), dt),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * B * F * T8 * Cp,
            transcendentals=B * F * T8 * Cp,
        ),
        interpret=interpret,
    )


def _fused_plan_int8(B, F, T, C, d, vmem_budget=12 * 2**20):
    """Tile plan for the int8 fused stage (same search as _fused_plan with
    the int8/int32 buffer sizes)."""
    T8 = -(-T // 8) * 8
    best = None
    for BT in _divisors_desc(T8):
        if BT > 512 or BT % 8:
            continue
        for BF in _divisors_desc(F):
            M = BF * BT
            if not (128 <= M <= 4096):
                continue
            per_slab = d >= BF
            nrows = 5 * BF if per_slab else BF + 4 * d
            vmem = (
                2 * nrows * (BT + 16) * C * 2      # xbuf x2 (dt)
                + nrows * (BT + 16) * C            # hq (int8)
                + 2 * M * 3 * C                    # patch x2 (int8)
                + M * C * 4                        # acc (int32)
                + 2 * M * C * 2                    # obuf (dt)
                + 15 * C * C                       # weights (int8)
                + 3 * M * C * 4                    # f32 epilogue temps
                + 2 * 2**20                        # prologue strips
            )
            if vmem > vmem_budget:
                continue
            ntiles = B * (F // BF) * (T8 // BT)
            read = ntiles * nrows * (BT + 16) * C
            key = (read, -M)
            if best is None or key < best[0]:
                best = (key, (BF, BT, per_slab, T8))
    return None if best is None else best[1]


def _fused_stage_int8_impl(xp, prev, w4, a, s, bound, static):
    dm, d, F, T, C, Cp = static
    B = xp.shape[0]
    T8 = xp.shape[2] - 16
    qw, sw = _quant_weight_per_cout(w4)            # (5,3,Cp,Cp) i8, (Cp,) f32
    bnd = jnp.maximum(bound.astype(jnp.float32), 1e-20)  # (B,)
    ivb = jnp.broadcast_to((127.0 / bnd)[:, None], (B, Cp))
    post = ((bnd / 127.0)[:, None] * sw[None, :]
            * s.astype(jnp.float32) * jnp.float32(SQRT2_INV))
    if not (_on_tpu() or _INTERPRET):
        return _dil_stage_int8_ref(xp, prev, qw, a.astype(jnp.float32),
                                   ivb, post, static)
    plan = _fused_plan_int8(B, F, T, Cp, d)
    if plan is None:
        return _dil_stage_int8_ref(xp, prev, qw, a.astype(jnp.float32),
                                   ivb, post, static)
    BF, BT, per_slab, T8p = plan
    assert T8p == T8, (T8p, T8)
    wk = qw.reshape(5, 3 * Cp, Cp)
    call = _build_fused_int8_call(B, F, T, T8, C, Cp, dm, d, BF, BT,
                                  per_slab, xp.dtype.name, _INTERPRET)
    return call(xp, prev, wk, a.astype(jnp.float32), ivb, post)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_stage_int8(xp, prev, w4, a, s, bound, static):
    """int8 fused ResnetBlock dilation stage on the chained padded layout.

    Same layout contract as fused_stage_padded; additionally:
    bound: (B,) fp32 per-item upper bound on max|gelu(x*a)| (the caller
          derives it analytically from the PREVIOUS stage's amax row and
          inflates by BOUND_SAFETY — models/blocks.py).
    Returns (yp, moments) with moments (3, B, Cp) = [sum, sum of squares,
    per-channel amax] of the real output region — the amax row feeds the
    next stage's bound, so the whole chain quantizes with zero extra
    passes over the activations.
    Backward is straight-through on the exact-precision stage
    (_dil_stage_ref), matching conv_int8_hinted semantics; bound gets a
    zero cotangent."""
    return _fused_stage_int8_impl(xp, prev, w4, a, s, bound, static)


def _fused_i8_fwd(xp, prev, w4, a, s, bound, static):
    return (_fused_stage_int8_impl(xp, prev, w4, a, s, bound, static),
            (xp, w4, a, s, bound))


def _fused_i8_bwd(static, res, g):
    xp, w4, a, s, bound = res
    g_yp, g_mom3 = g
    prev = jnp.zeros_like(xp)
    _, vjp = jax.vjp(
        lambda xx, ww, aa, ss: _dil_stage_ref(xx, prev, ww, aa, ss, static),
        xp, w4, a, s)
    dx, dw, da, ds = vjp((g_yp, g_mom3[:2]))
    return (dx, jnp.zeros_like(xp), dw, da, ds, jnp.zeros_like(bound))


fused_stage_int8.defvjp(_fused_i8_fwd, _fused_i8_bwd)


def int8_fused_minc() -> int | None:
    """Channel threshold for routing ResnetBlock dilation chains through the
    int8 fused Pallas stage, or None when inactive.  BABE_INT8_FUSED=1
    fuses every level the plain int8 path quantizes (>= BABE_INT8_MINC);
    a number fuses levels with at least that many channels (independent of
    BABE_INT8_MINC, so C=64 can be probed: its padded-to-128 fused
    economics differ from the unfused plain-int8 wash).  Requires the
    analytic-bound scale mode (the prologue's scale must be known before
    the activation exists)."""
    spec = os.environ.get("BABE_INT8_FUSED", "0")
    if spec in ("0", "", "off"):
        return None
    if _precision() != "int8" or _int8_scale_mode() != "bound":
        return None
    if not (_on_tpu() or _INTERPRET):
        return None
    return _int8_minc() if spec in ("1", "on") else int(spec)




def conv2d_same(x, w, dilation=(1, 1), scale_hint=None):
    """Dispatcher used by the model blocks: picks the fastest implementation
    for a 'SAME' NHWC conv with odd kernel.  scale_hint, when given under
    int8, is a per-item (B,) fp32 upper bound on max|x| (see
    conv_int8_hinted)."""
    kf, kt = w.shape[0], w.shape[1]
    if (kf, kt) == (1, 1):
        if _int8_active(w.shape[2], w.shape[3], is_1x1=True):
            return dot1x1_int8(x, w)
        if os.environ.get("BABE_1X1", "dot") == "conv":
            return conv_xla(x, w, (1, 1))
        return conv1x1(x, w)
    if _int8_active(w.shape[2], w.shape[3]):
        dil = tuple(int(d) for d in dilation)
        if scale_hint is not None:
            return conv_int8_hinted(x, w, scale_hint, dil)
        return conv_int8(x, w, dil)
    if (kf, kt) == (5, 3) and int(dilation[1]) == 1:
        return conv5x3_dilated(x, w, int(dilation[0]))
    return conv_xla(x, w, dilation)
