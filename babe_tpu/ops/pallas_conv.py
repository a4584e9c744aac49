"""Pallas TPU kernel: frequency-dilated (kf, kt) conv as in-VMEM im2col matmul.

EXPERIMENTAL — correct but NOT enabled in the model. Measured on v5e
(batch 8, bf16, the CQTDiff+ level shapes), XLA's native conv lowering wins:

    level (F, T, C, df)        pallas     XLA
    (64, 1280,  64,  2)        35 TF      52 TF
    (128, 640,  96,  4)        62 TF      85 TF
    (256, 160, 128, 16)        95 TF     113 TF
    (384,  40, 256, 32)       115 TF     134 TF
    (448,  20, 256, 64)        79 TF     103 TF

The hypothesis was that pairing kernel taps into K=2C contractions would beat
XLA's per-tap K=C contraction at the C=64/96 levels; in practice the
Element-indexed input block (required for overlapping dilated windows) defeats
Mosaic's pipelining — the padded input is buffered per grid row and refetched
per F-tile — and the in-VMEM tap concatenation adds vector-memory traffic that
outweighs the MXU win.  Kept as working, tested infrastructure for future
kernel work (fusing the surrounding GroupNorm/GELU into the matmul epilogue is
the next thing to try).

API: ``dilated_conv_nhwc(x, w, dilation)`` — 'SAME' NHWC conv with
rhs_dilation=(df, 1); jax.custom_vjp with an XLA backward.  Falls back to
lax.conv when shapes don't tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_ref(x, w, dilation):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _pallas_forward(x, w, dilation, f_tile, interpret=False):
    df, _ = dilation
    kf, kt, C, N = w.shape
    B, F, T, _ = x.shape
    PF, PT = (kf - 1) * df // 2, (kt - 1) // 2
    Tp = T + 2 * PT
    ntaps = kf * kt

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((f_tile * T, N), jnp.float32)
        taps = [(i, j) for i in range(kf) for j in range(kt)]
        # tap pairs -> K=2C contractions (full MXU width when C=64)
        for p in range(0, ntaps - 1, 2):
            (i1, j1), (i2, j2) = taps[p], taps[p + 1]
            t1 = x_ref[0, i1 * df : i1 * df + f_tile, j1 : j1 + T, :]
            t2 = x_ref[0, i2 * df : i2 * df + f_tile, j2 : j2 + T, :]
            pat = jnp.concatenate(
                [t1.reshape(f_tile * T, C), t2.reshape(f_tile * T, C)], axis=-1
            )
            acc = acc + jnp.dot(pat, w_ref[p * C : (p + 2) * C, :],
                                preferred_element_type=jnp.float32)
        i, j = taps[-1]
        tl = x_ref[0, i * df : i * df + f_tile, j : j + T, :]
        acc = acc + jnp.dot(tl.reshape(f_tile * T, C),
                            w_ref[(ntaps - 1) * C :, :],
                            preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(f_tile, T, N).astype(o_ref.dtype)

    xp = jnp.pad(x, ((0, 0), (PF, PF), (PT, PT), (0, 0)))
    wm = w.reshape(ntaps * C, N)
    E = pl.Element
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, F, T, N), x.dtype),
        grid=(B, F // f_tile),
        in_specs=[
            pl.BlockSpec(
                (E(1), E(f_tile + 2 * PF), E(Tp), E(C)),
                lambda b, fi: (b, fi * f_tile, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ntaps * C, N), lambda b, fi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f_tile, T, N), lambda b, fi: (b, fi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wm)


def _pick_f_tile(F: int) -> int | None:
    for f_tile in (8, 16, 32, 64):
        if F % f_tile == 0:
            return f_tile
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dilated_conv_nhwc(x, w, dilation: tuple[int, int], interpret: bool = False):
    """'SAME' NHWC conv with rhs_dilation=(df, 1); Pallas forward, XLA vjp."""
    return _forward(x, w, dilation, interpret)


def _forward(x, w, dilation, interpret):
    if dilation[1] != 1:
        return _conv_ref(x, w, dilation)
    f_tile = _pick_f_tile(x.shape[1])
    if f_tile is None or x.shape[3] % 8 != 0 or x.shape[2] % 8 != 0:
        return _conv_ref(x, w, dilation)
    return _pallas_forward(x, w, dilation, f_tile, interpret=interpret)


def _fwd(x, w, dilation, interpret):
    return _forward(x, w, dilation, interpret), (x, w)


def _bwd(dilation, interpret, res, g):
    x, w = res
    # dx: correlate the cotangent with the spatially-flipped transposed kernel
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    dx = _conv_ref(g, w_flip, dilation)
    # dw: contract batch+space (standard conv weight gradient via XLA)
    _, vjp = jax.vjp(lambda ww: _conv_ref(x, ww, dilation), w)
    (dw,) = vjp(g)
    return dx, dw


dilated_conv_nhwc.defvjp(_fwd, _bwd)
