"""Building blocks of the CQTDiff+ backbone (flax.linen, NHWC/TPU layout).

Faithful functional re-implementations of the reference blocks
(networks/cqtdiff+.py:20-580) with TPU-first layout choices:

  * activations are (B, F, T, C) — channels-last for TPU convolutions
    (the reference uses NCHW; checkpoint conversion transposes kernels),
  * module/parameter naming mirrors the torch module tree
    ("downs.0.2.H.3.weight" -> params["downs_0_2"]["H_3"]["kernel"]) so the
    PyTorch checkpoint converter (babe_tpu/utils/torch_ckpt.py) is mechanical,
  * the non-trainable RFF buffers live in the "buffers" variable collection.

Init parity: EDM-style kaiming_uniform scaled by init_weight
(networks/cqtdiff+.py:20-25, init/init_zero at :599-600).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from babe_tpu.ops.conv_kernels import (
    _gelu_exact,
    _round128,
    conv1x1_convworld,
    conv2d_same,
    conv_xla,
    fused_stage_active,
    fused_stage_int8,
    fused_stage_padded,
    int8_fused_minc,
)


def _pin_spec(field_spec: str = "auto"):
    """Resolve the layout-pin spec to (mode, minor_to_major) — mode in
    {'off', 'bwd', 'fwd'}.  The BABE_LAYOUT_PIN env var, when set, wins;
    otherwise ``field_spec`` (the ResnetBlock.layout_pin module field) is
    used — training builds the net with layout_pin='off' because the pin
    is tuned for the guided sampler's input-cotangent graph and measured
    +47% on the weight-gradient train step (324 -> 478 ms/step, batch 1).

    'auto' resolves to backward-only pinning on single-device TPU
    and off elsewhere (layout constraints need a concrete single-device
    context; virtual CPU meshes don't benefit).  'fwd' / an explicit digit
    string like '3021' pins the forward intermediates too (costs ~1.6 % on
    the forward-only sampler, so not the default); 'off' disables."""
    import os as _os

    spec = _os.environ.get("BABE_LAYOUT_PIN", "") or (field_spec or "auto")
    if spec in ("", "off", "0"):
        return "off", None, None
    mode, maxc = "fwd", None
    if spec in ("auto", "bwd") or spec.startswith("bwd"):
        import jax as _jax

        if _jax.default_backend() in ("cpu", "gpu") or _jax.device_count() != 1:
            return "off", None, None
        if spec in ("auto", "bwd"):
            # cotangent pin only at C>=96 levels: the C=64 transposed convs
            # run faster in XLA's own layout choice (measured 282 -> 279
            # ms/NFE on the guided vjp step, tools/time_nfe.py)
            return "bwd", (3, 0, 2, 1), -96
        else:
            # 'bwd[DDDD][>=N]' — pin cotangents to layout DDDD, only at
            # levels with at least N channels when >=N given (the C=64
            # transposed convs prefer XLA's own choice)
            import re as _re

            m = _re.fullmatch(r"bwd(\d{4})?(?:>=(\d+))?", spec)
            if m is None:
                raise ValueError(f"bad BABE_LAYOUT_PIN spec: {spec!r}")
            maxc = -int(m.group(2)) if m.group(2) else None  # negative = min-C
            return "bwd", tuple(int(c) for c in (m.group(1) or "3021")), maxc
    elif spec.startswith("fwd"):
        # 'fwd[DDDD][<=N]' — pin forward intermediates to minor-to-major
        # layout DDDD (default 3021), only at levels with at most N channels
        # when <=N given (the relayout copies concentrate at C=64)
        import re as _re

        m = _re.fullmatch(r"fwd(\d{4})?(?:<=(\d+))?", spec)
        if m is None:
            raise ValueError(f"bad BABE_LAYOUT_PIN spec: {spec!r}")
        maxc = int(m.group(2)) if m.group(2) else None
        spec = m.group(1) or "3021"
    return mode, tuple(int(c) for c in spec), maxc


def _constrain(x, minor_to_major):
    from jax.experimental.layout import Layout, with_layout_constraint

    return with_layout_constraint(x, Layout(tuple(reversed(minor_to_major))))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _cotangent_pin(x, minor_to_major):
    return x


def _cp_fwd(x, minor_to_major):
    return x, None


def _cp_bwd(minor_to_major, _res, g):
    return (_constrain(g, minor_to_major),)


_cotangent_pin.defvjp(_cp_fwd, _cp_bwd)


def _layout_pin(x, field_spec: str = "auto"):
    """Pin an intermediate (or, default, just its backward cotangent) to the
    conv-friendly {3,0,2,1} physical layout — minor->major C,B,T,F, the
    layout XLA assigns to the FAST in-situ conv levels.  Left alone, other
    levels get {3,1,2,0}/{1,3,2,0}/{2,3,1,0} and the guided sampler's
    backward pays ~27 ms/NFE of relayout copies (measured: 354 -> 314
    ms/NFE with full pinning).  See _pin_spec for the BABE_LAYOUT_PIN knob."""
    if x.ndim != 4:
        return x
    mode, mm, maxc = _pin_spec(field_spec)
    if mode == "off":
        return x
    if mode == "bwd":
        if maxc is not None and maxc < 0 and x.shape[-1] < -maxc:
            return x  # below the bwd>=N channel threshold: leave unpinned
        return _cotangent_pin(x, mm)
    if maxc is not None and x.shape[-1] > maxc:
        return _cotangent_pin(x, mm)  # still pin the backward at big-C levels
    return _constrain(x, mm)


def _layout_pin_carrier(x, field_spec: str = "auto"):
    """Forward-pin the dilation loop's residual carrier x (fwd mode only).

    At the big-T C<=64 levels the init/pyramid blocks are matmul-world 1x1s
    whose dot layout ({2,3,1,0}, T-minor) anchors the residual chain; every
    stage's (x0 + h*scale) mix of {2,3,1,0} (carrier) and {3,0,2,1} (conv
    output) then resolves to {2,3,1,0}, and every (5,3) conv pays a ~0.4 ms
    relayout copy on its input AND output ([8,64,1280,64]-class shapes,
    tools/noncov_budget.py).  Pinning the carrier itself moves the whole
    chain into the conv layout world: one copy per block instead of two per
    dilation stage."""
    if x.ndim != 4:
        return x
    mode, mm, maxc = _pin_spec(field_spec)
    if mode != "fwd" or (maxc is not None and x.shape[-1] > maxc):
        return x
    return _constrain(x, mm)


def _stage_remat() -> bool:
    """BABE_STAGE_REMAT=1: rematerialize the dilation-stage producer chain
    in the backward.  The guided sampler's vjp otherwise saves the pre-gelu
    tensor (the _gelu_* custom vjps' residual) — one full bf16 write (fwd)
    + read (bwd) per dilation stage.  With remat the backward recomputes it
    as x * a from the block carrier x (a residual the GN backward reads
    anyway) and the folded (B,C) factor a: the added compute is one
    multiply fused into the existing gelu'-chain pass, the saved traffic
    is 4 bytes/element/stage."""
    return os.environ.get("BABE_STAGE_REMAT", "0") == "1"


def _gelu_affine(x, a32, int8_out: bool):
    """gelu(x * a[:, None, None, :]) under jax.checkpoint (see
    _stage_remat).  a32: (B, C) fp32 folded GN-normalize x sigma-affine
    factor gamma_n/(std+eps) * (gamma+1)."""
    from babe_tpu.ops.conv_kernels import _gelu_for_int8

    def f(xx, aa):
        v = xx * aa[:, None, None, :].astype(xx.dtype)
        return _gelu_for_int8(v) if int8_out else _gelu_exact(v)

    return jax.checkpoint(f)(x, a32)


def gelu_exact(x):
    """Exact-erf gelu; in bf16 compute uses the degree-10 Chebyshev erf
    polynomial (|err| <= ~9e-6, well below bf16 resolution — see _ERF_C in
    ops/conv_kernels.py) which is pure VPU polynomial work vs ~50 ops for
    XLA's erf lowering."""
    if x.dtype == jnp.bfloat16:
        return _gelu_exact(x)
    return nn.gelu(x, approximate=False)

SQRT2 = math.sqrt(2.0)
# residual scalings multiply by the precomputed reciprocal: a per-element
# divide lowers to reciprocal+newton on the VPU and dominated the guided
# sampler's backward elementwise chains
INV_SQRT2 = 1.0 / math.sqrt(2.0)


def kaiming_uniform(scale: float) -> Callable:
    """weight_init('kaiming_uniform') * scale (networks/cqtdiff+.py:23)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -1.0, 1.0) * bound * scale

    return init


INIT_W = math.sqrt(1.0 / 3.0)  # 'init' in the reference (:599)
INIT_ZERO = 1e-7  # 'init_zero' (:600)


class Linear(nn.Module):
    """torch-compatible Linear with EDM init (networks/cqtdiff+.py:27-40).
    Params are fp32; compute follows the input dtype (the reference casts
    weights to x.dtype the same way, networks/cqtdiff+.py:37)."""

    features: int
    use_bias: bool = True
    init_weight: float = INIT_W

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", kaiming_uniform(self.init_weight),
                       (x.shape[-1], self.features))
        y = x @ k.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(x.dtype)
        return y


class _Conv2dParams(nn.Module):
    """Parameter holder + dispatch for Conv2d.  The param tree matches
    flax.linen.Conv exactly ("kernel" HWIO + optional "bias") so the PyTorch
    checkpoint converter (babe_tpu/utils/torch_ckpt.py) is unaffected; the
    compute goes through babe_tpu.ops.conv_kernels (Pallas implicit-GEMM for
    the hot (5,3) dilated convs on TPU, matmul for 1x1, lax.conv otherwise)."""

    features: int
    kernel: tuple[int, int]
    dilation: tuple[int, int]
    use_bias: bool
    init_weight: float
    in_features: int | None = None  # for kernel-only access (x=None)
    impl: str = "auto"  # 'conv' pins 1x1s to the conv layout world

    @nn.compact
    def __call__(self, x, scale_hint=None):
        kf, kt = self.kernel
        cin = self.in_features if x is None else x.shape[-1]
        k = self.param("kernel", kaiming_uniform(self.init_weight),
                       (kf, kt, cin, self.features))
        if x is None:
            return k
        import os as _os

        from babe_tpu.ops.conv_kernels import _int8_active

        impl = _os.environ.get("BABE_PROJ_IMPL", "") or self.impl
        if _int8_active(cin, self.features, is_1x1=self.kernel == (1, 1)):
            # BABE_PRECISION=int8: every eligible conv (incl. the conv-world
            # 1x1s) goes through the quantized MXU path — the layout-world
            # reasoning below is a bf16 trade-off that doesn't apply to the
            # int8 tensors
            y = conv2d_same(x, k.astype(x.dtype), self.dilation,
                            scale_hint=scale_hint)
        elif impl == "conv":
            # lax.conv even for 1x1: keeps this op in the convolution
            # layout world ({3,0,2,1} on TPU), avoiding the two layout-
            # conversion copies a matmul-world round trip costs when the
            # neighbours are (5,3) convs.  Opt-in BABE_PROJ_BWD=dot swaps in
            # a matmul backward (conv1x1_convworld) — measured NEUTRAL
            # end-to-end on the guided vjp step (the slow 1x1s live in the
            # jvp portion of that program, not the transpose), so the
            # default stays XLA's standard conv backward.
            pin1x1 = _os.environ.get("BABE_1X1_PIN", "")
            if pin1x1 and self.kernel == (1, 1) and jax.default_backend() == "tpu":
                mm = tuple(int(c) for c in pin1x1)
                x = _constrain(x, mm)
            if (self.kernel == (1, 1)
                    and _os.environ.get("BABE_PROJ_BWD", "conv") == "dot"):
                y = conv1x1_convworld(x, k.astype(x.dtype))
            else:
                y = conv_xla(x, k.astype(x.dtype), self.dilation)
            if pin1x1 and self.kernel == (1, 1) and jax.default_backend() == "tpu":
                y = _constrain(y, mm)
        else:
            y = conv2d_same(x, k.astype(x.dtype), self.dilation)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        # no-op outside jax.checkpoint; under remat_policy="save_convs"
        # (models/cqtdiff.py) this marks conv/matmul outputs as saveable so
        # the backward recomputes only elementwise chains
        return checkpoint_name(y, "conv_out")


class Conv2d(nn.Module):
    """2-D conv on (B, F, T, C); kernel (kf, kt), dilation along F
    (networks/cqtdiff+.py:66-88). 'SAME' padding, odd kernels only."""

    features: int
    kernel: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    use_bias: bool = False
    init_weight: float = INIT_W

    in_features: int | None = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, scale_hint=None):
        """x=None returns the HWIO kernel parameter (requires in_features) —
        used by the fused ResnetBlock path to feed the Pallas stage kernel
        without changing the parameter tree.  scale_hint: optional (B,)
        fp32 amax upper bound for the int8 path (conv_int8_hinted)."""
        return _Conv2dParams(
            self.features, self.kernel, self.dilation, self.use_bias,
            self.init_weight, in_features=self.in_features, impl=self.impl,
            name="conv",
        )(x, scale_hint)


class Conv1d(nn.Module):
    """1-D conv on (B, T, C) (networks/cqtdiff+.py:42-65)."""

    features: int
    kernel: int = 1
    dilation: int = 1
    use_bias: bool = False
    init_weight: float = INIT_W

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=kaiming_uniform(self.init_weight),
            bias_init=nn.initializers.zeros,
            dtype=x.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        return conv(x)


# GroupNorm defaults shared by BiasFreeGroupNorm AND the paths that call
# _gn_forward directly (the int8 bound-hint branch, the fused Pallas chain)
# so the bound-mode GN can never silently diverge from the module's
# (ADVICE r4: literal 8/1e-7 duplication).
GN_GROUPS = 8
GN_EPS = 1e-7

# Safety inflation on the analytic int8 amax bound: the bound is derived in
# fp32 but the activation is produced with a bf16-rounded folded GN scale,
# and the degree-6 gelu polynomial can overshoot |v| by ~7e-4 — together up
# to ~1% above the fp32 bound.  1.02x keeps the hint a true upper bound
# (strict spy test in tests/test_conv_kernels.py) at the cost of a 2%
# coarser quantization step — far inside the LSD gate's noise floor.
BOUND_SAFETY = 1.02


def _gn_moments(x, g: int, eps: float):
    """Group statistics of BiasFreeGroupNorm without the normalize pass.

    TPU-lane-friendly: reducing a (B,F,T,g,C/g) reshape wastes up to 16x
    of the 128-wide vector lanes (minor dim C/g as small as 8).  Instead
    reduce over (F,T) per CHANNEL — fully lane-aligned — then pool the
    tiny (B,C) result per group.  One fused read of x for both moments.
    Returns (m, std), each (B, g) fp32."""
    B, F, T, C = x.shape
    cg = C // g
    n = F * T * cg
    x32 = x.astype(jnp.float32)
    s1 = jnp.mean(x32, axis=(1, 2))  # (B, C)
    s2 = jnp.mean(x32 * x32, axis=(1, 2))
    m = s1.reshape(B, g, cg).mean(-1)
    sq = s2.reshape(B, g, cg).mean(-1)
    # unbiased (torch x.std()) variance via E[x^2] - E[x]^2
    var = (sq - m * m) * (n / (n - 1.0))
    std = jnp.sqrt(jnp.maximum(var, 0.0))  # (B, g)
    return m, std


def _gn_forward(x, gamma, g: int, eps: float):
    B, F, T, C = x.shape
    cg = C // g
    m, std = _gn_moments(x, g, eps)
    denom = jnp.repeat(std + eps, cg, axis=-1).astype(x.dtype)  # (B, C)
    # gamma/denom folded into ONE per-(B,C) factor and applied as a
    # multiply: a full-tensor divide costs several VPU ops/element on TPU
    # (the normalize sat inside the hot quantize/gelu loop fusions —
    # tools/trace_nfe.py round 8), the (B,C)-sized reciprocal is free.
    scale = (gamma[None, :].astype(jnp.float32)
             / (jnp.repeat(std + eps, cg, axis=-1))).astype(x.dtype)
    y = x * scale[:, None, None, :]
    return y, (m, std, denom)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gn_apply(x, gamma, g: int, eps: float):
    """Bias-free group norm with a hand-written analytic backward
    (opt-in via BABE_GN_BWD=custom; see the dispatch note in
    BiasFreeGroupNorm.__call__).

    Hypothesis tested: XLA's autodiff of the group statistics emits
    reduce-fusions preferring the {2,3,1,0} (T-minor) layout at C=64 while
    the neighbouring transposed convs run in {3,0,2,1}, causing ~16 ms/NFE
    of relayout copies in the guided sampler's vjp program.  Outcome: the
    analytic lane-aligned backward did NOT remove those copies (neutral on
    the sampler, 279 ms/NFE) — the layout split is driven by the conv
    emitters, not the GN reduces.  Kept as a measured A/B knob; grad parity
    vs autodiff pinned in tests/test_model_parity.py::test_gn_custom_vjp."""
    return _gn_forward(x, gamma, g, eps)[0]


def _gn_fwd(x, gamma, g, eps):
    y, (m, std, denom) = _gn_forward(x, gamma, g, eps)
    return y, (x, gamma, m, std, denom)


def _gn_bwd(g_, eps, res, gr):
    x, gamma, m, std, denom = res
    B, F, T, C = x.shape
    cg = C // g_
    n = F * T * cg
    x32 = x.astype(jnp.float32)
    gr32 = gr.astype(jnp.float32)
    inv_d = (1.0 / denom.astype(jnp.float32))  # (B, C)
    gam32 = gamma.astype(jnp.float32)
    # S_k = sum_{e in group k} g*gamma*x  (per-channel lane reduce, then pool)
    gx = jnp.sum(gr32 * x32, axis=(1, 2))  # (B, C)
    S = (gx * gam32[None, :]).reshape(B, g_, cg).sum(-1)  # (B, g)
    # d std / dx_e = (x_e - m_k) / ((n-1) std_k)   (0 where var clamped to 0)
    std_safe = jnp.where(std > 0.0, std, 1.0)
    coef = jnp.where(
        std > 0.0,
        S * (1.0 / (std_safe + eps)) ** 2 / ((n - 1.0) * std_safe),
        0.0,
    )  # (B, g) — S_k / D_k^2 / ((n-1) std_k)
    coef_c = jnp.repeat(coef, cg, axis=-1)  # (B, C)
    m_c = jnp.repeat(m, cg, axis=-1)  # (B, C)
    dx = (
        gr32 * (gam32[None, :] * inv_d)[:, None, None, :]
        - coef_c[:, None, None, :] * (x32 - m_c[:, None, None, :])
    ).astype(x.dtype)
    # dgamma: per-channel reduce (DCE'd in the sampler vjp where params
    # are closed over; needed for training)
    dgamma = jnp.einsum("bc,bc->c", gx, inv_d)
    return dx, dgamma.astype(gamma.dtype)


_gn_apply.defvjp(_gn_fwd, _gn_bwd)


class BiasFreeGroupNorm(nn.Module):
    """Std-only group norm: x / (std + eps) * gamma, no mean subtraction of x
    but a *centered*, unbiased std — exactly torch's x.std()
    (networks/cqtdiff+.py:137-163). Input (B, F, T, C), groups over channels."""

    num_features: int
    num_groups: int = GN_GROUPS
    eps: float = GN_EPS

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.num_features,))
        if x is None:
            return gamma  # param-only access for the fused Pallas path
        import os as _os

        # BABE_GN_BWD=custom swaps in the analytic backward (_gn_apply).
        # Measured: neutral on the guided sampler vjp (279 ms/NFE either
        # way) and 2.5% slower on the remat-full train step (960 -> 984
        # ms/step, tools/bench_train.py min-of-chunks) — XLA's autodiff
        # composes better with jax.checkpoint recompute, so it stays default.
        if _os.environ.get("BABE_GN_BWD", "") == "custom":
            return _gn_apply(x, gamma, self.num_groups, self.eps)
        return _gn_forward(x, gamma, self.num_groups, self.eps)[0]


class RFF_MLP_Block(nn.Module):
    """Noise-level embedding: fixed random Fourier features + 3-layer relu MLP
    (networks/cqtdiff+.py:167-211). RFF_freq is a frozen buffer."""

    emb_dim: int = 256
    rff_dim: int = 32

    @nn.compact
    def __call__(self, sigma):
        rff = self.variable(
            "buffers", "RFF_freq",
            lambda: 16.0 * jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (1, self.rff_dim)),
        ).value
        table = 2.0 * jnp.pi * sigma * rff
        x = jnp.concatenate([jnp.sin(table), jnp.cos(table)], axis=1)
        x = nn.relu(Linear(128, name="MLP_0")(x))
        x = nn.relu(Linear(256, name="MLP_1")(x))
        x = nn.relu(Linear(self.emb_dim, name="MLP_2")(x))
        return x


class AddFreqEncodingRFF(nn.Module):
    """Fixed RFF positional channels over the frequency axis, concatenated
    (networks/cqtdiff+.py:213-263). Input (B, F, T, C) -> (B, F, T, C + 2N)."""

    f_dim: int
    N: int = 32

    @nn.compact
    def __call__(self, x):
        def build():
            key = self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0)
            freqs = 16.0 * jax.random.normal(key, (1, self.N, 1))
            n = jnp.arange(self.f_dim)[None, None, :]
            table = 2.0 * jnp.pi * n * freqs
            return jnp.concatenate([jnp.sin(table), jnp.cos(table)], axis=1)[0]  # [2N, F]

        emb = self.variable("buffers", "embeddings", build).value  # [2N, F]
        B, F, T, C = x.shape
        enc = jnp.broadcast_to(emb.T[None, :, None, :], (B, F, T, 2 * self.N))
        return jnp.concatenate([x, enc.astype(x.dtype)], axis=-1)


def _relative_position_bucket(rel_pos, num_buckets: int, max_distance: int):
    """T5 bucketing (networks/cqtdiff+.py:274-298)."""
    num_buckets //= 2
    ret = (rel_pos >= 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """(networks/cqtdiff+.py:266-312)"""

    num_buckets: int
    max_distance: int
    num_heads: int

    @nn.compact
    def __call__(self, num_queries: int, num_keys: int):
        emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (self.num_buckets, self.num_heads),
        )
        i, j = num_queries, num_keys
        q_pos = jnp.arange(j - i, j)
        k_pos = jnp.arange(j)
        rel_pos = k_pos[None, :] - q_pos[:, None]
        bucket = _relative_position_bucket(rel_pos, self.num_buckets, self.max_distance)
        bias = emb[bucket]  # [i, j, heads]
        return jnp.transpose(bias, (2, 0, 1))[None]  # [1, h, i, j]


class TimeAttentionBlock(nn.Module):
    """Per-head time attention with frequency-flattened features
    (networks/cqtdiff+.py:314-380). Input (B, F, T, C)."""

    attention_dict: Any
    Fdim: int

    @nn.compact
    def __call__(self, x):
        ad = self.attention_dict
        heads = int(ad["num_heads"])
        N = heads * self.Fdim
        B, F, T, C = x.shape
        h = Conv2d(heads, (1, 1), name="proj_in")(x)  # [B, F, T, heads]
        # "b h f t -> b (h f) t" with channels-last: [B, T, heads*F]
        hf = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, heads * F)
        v = hf.reshape(B, T, heads, F).transpose(0, 2, 1, 3)  # [B, h, T, F]
        qk = Conv1d(2 * N, 1, use_bias=bool(ad.get("bias_qkv", False)), name="qk")(hf)
        qk = qk.reshape(B, T, heads, 2 * self.Fdim).transpose(0, 2, 1, 3)
        q, k = jnp.split(qk, 2, axis=-1)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        if ad.get("use_rel_pos", True):
            sim = sim + RelativePositionBias(
                num_buckets=int(ad["rel_pos_num_buckets"]),
                max_distance=int(ad["rel_pos_max_distance"]),
                num_heads=heads,
                name="rel_pos",
            )(T, T)
        sim = sim * (self.Fdim**-0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)  # [B, h, T, F]
        out = out.transpose(0, 3, 2, 1)  # [B, F, T, heads]
        return Conv2d(C, (1, 1), name="proj_out")(out)


class ResnetBlock(nn.Module):
    """Sigma-conditioned dilated-conv residual block
    (networks/cqtdiff+.py:382-493)."""

    dim: int
    dim_out: int
    use_norm: bool = True
    num_dils: int = 6
    kernel_size: tuple[int, int] = (5, 3)
    emb_dim: int = 256
    proj_place: str = "before"  # 'after' for decoder out-blocks
    attention_dict: Any = None
    Fdim: int = 128
    # layout-pin spec for the dilated-conv chain ('auto'/'off'/'bwd'/'fwd');
    # BABE_LAYOUT_PIN env overrides.  See _pin_spec.
    layout_pin: str = "auto"

    @nn.compact
    def __call__(self, x_in, sigma_emb):
        N = self.dim_out if self.proj_place == "before" else self.dim

        # 1x1 projections that sit between (5,3) convs stay in the conv
        # layout world; in pure-matmul blocks (kernel 1x1) they lower to dots
        proj_impl = "conv" if self.kernel_size != (1, 1) else "auto"

        # NOTE (measured, do not "optimize"): splitting proj_in/res_conv
        # across the decoder's [up, skip] concat operands
        # (conv1x1(concat(a,b)) == conv1x1(a)+conv1x1(b)) made the sampler
        # SLOWER (fwd 114->118, vjp 279->284 ms/NFE): XLA already virtualizes
        # the concat into its consumers, and the split halves the 1x1s'
        # contraction depth (worse MXU fill).
        x = x_in
        if self.dim != N:
            x = Conv2d(N, (1, 1), impl=proj_impl, name="proj_in")(x)

        if self.attention_dict is not None:
            i_x = x
            gamma = Linear(N, name="affine2")(sigma_emb)
            scale = Linear(N, init_weight=INIT_ZERO, name="gate2")(sigma_emb)
            h = BiasFreeGroupNorm(N, 8, name="norm2")(x)
            h = h * (gamma[:, None, None, :] + 1.0)
            h = TimeAttentionBlock(self.attention_dict, self.Fdim, name="attn_block")(h)
            x = (i_x + h * scale[:, None, None, :]) * INV_SQRT2

        _i8f_minc = int8_fused_minc()
        if (self.kernel_size == (5, 3) and self.use_norm
                and self.num_dils > 0 and _i8f_minc is not None
                and N >= _i8f_minc):
            x = self._fused_dil_chain_int8(x, sigma_emb, N)
        elif (self.kernel_size == (5, 3) and self.use_norm
                and self.num_dils > 0 and fused_stage_active()):
            x = self._fused_dil_chain(x, sigma_emb, N)
        else:
            if self.kernel_size != (1, 1):
                x = _layout_pin_carrier(x, self.layout_pin)
            from babe_tpu.ops.conv_kernels import (_int8_active,
                                                   _int8_scale_mode)
            # BABE_INT8_SCALE=bound: derive the int8 activation scale
            # analytically from the GroupNorm statistics INSTEAD of a
            # dynamic amax over the conv input.  |gelu(v)| <= |v| and the
            # conv input is gelu(GN(x) * (gamma+1)), so per item
            #   max|h| <= max_c amax_c(x)/denom_c * |gamma_n_c*(gamma_c+1)|
            # where amax_c is the per-channel amax of the carrier — a reduce
            # that fuses into the SAME read as the GN moments.  The scale is
            # then known before h exists, the quantize becomes pure
            # elementwise, and the whole producer chain fuses into the int8
            # write: no bf16 materialization of h, no separate amax pass
            # (the two passes that made C=96 a wash under dynamic amax,
            # PROFILE.md round 6).
            use_hint = (self.use_norm and self.kernel_size != (1, 1)
                        and _int8_active(N, N)
                        and _int8_scale_mode() == "bound")
            use_remat = (_stage_remat() and self.use_norm
                         and self.kernel_size != (1, 1))
            for i in range(self.num_dils):
                x0 = x
                h = x
                hint = None
                gamma = Linear(N, name=f"affine_{i}")(sigma_emb)
                scale = Linear(N, init_weight=INIT_ZERO,
                               name=f"gate_{i}")(sigma_emb)
                int8_out = self.kernel_size != (1, 1) and _int8_active(N, N)
                if use_remat:
                    # fold GN-normalize and sigma-affine into ONE (B,C)
                    # factor and checkpoint gelu(x*a): the pre-gelu tensor
                    # is recomputed in the backward, not saved (see
                    # _stage_remat).  The hint simplifies to
                    # BOUND_SAFETY * max_c amax_c(x)*|a_c| — same bound.
                    gn = BiasFreeGroupNorm(N, name=f"norm_{i}")
                    gamma_n = gn(None)
                    _m, std_ = _gn_moments(x, gn.num_groups, gn.eps)
                    denom32 = jnp.repeat(std_ + gn.eps, N // gn.num_groups,
                                         axis=-1)  # (B, C)
                    a32 = (gamma_n[None, :] / denom32) * (
                        gamma.astype(jnp.float32) + 1.0)
                    if use_hint:
                        amax_c = jnp.max(jnp.abs(x.astype(jnp.float32)),
                                         axis=(1, 2))  # (B, C)
                        hint = BOUND_SAFETY * jnp.max(
                            amax_c * jnp.abs(a32), axis=-1)  # (B,)
                    h = _gelu_affine(x, a32, int8_out)
                else:
                    if use_hint:
                        gn = BiasFreeGroupNorm(N, name=f"norm_{i}")
                        gamma_n = gn(None)
                        h, (_m, std_, _denom) = _gn_forward(
                            h, gamma_n, gn.num_groups, gn.eps)
                        amax_c = jnp.max(jnp.abs(x.astype(jnp.float32)),
                                         axis=(1, 2))  # (B, C)
                        denom32 = jnp.repeat(std_ + gn.eps,
                                             N // gn.num_groups, axis=-1)
                    elif self.use_norm:
                        h = BiasFreeGroupNorm(N, name=f"norm_{i}")(h)
                    h = h * (gamma[:, None, None, :] + 1.0)
                    if int8_out:
                        # output feeds an int8 quantize: the degree-6 erf's
                        # error sits 5.9x under the quantization half-step
                        # (see _gelu_for_int8) and the fused GN-affine-gelu-
                        # quantize chain is VPU-bound
                        from babe_tpu.ops.conv_kernels import _gelu_for_int8
                        h = _gelu_for_int8(h)
                    else:
                        h = gelu_exact(h)
                    if use_hint:
                        a_abs = jnp.abs(
                            gamma_n[None, :]
                            * (gamma.astype(jnp.float32) + 1.0)) / denom32
                        hint = BOUND_SAFETY * jnp.max(amax_c * a_abs,
                                                      axis=-1)  # (B,)
                if self.kernel_size != (1, 1):
                    # keep the gelu/affine chain OUT of the conv fusion: the
                    # TPU conv emitter re-evaluates fused producers once per
                    # kernel tap (15x for (5,3)), which measured 2-5x slower
                    # than a clean conv (tools/conv_budget.py).  When the
                    # conv runs int8 the quantize step inside conv_int8 has
                    # its own barrier, so the bf16 h need not materialize:
                    # letting the gelu chain fuse into the amax/quantize
                    # passes saves one full write+read of h per stage
                    if not _int8_active(N, N):
                        h = jax.lax.optimization_barrier(h)
                    h = _layout_pin(h, self.layout_pin)
                h = Conv2d(
                    N, self.kernel_size, dilation=(2**i, 1), name=f"H_{i}"
                )(h, scale_hint=hint)
                if self.kernel_size != (1, 1):
                    h = _layout_pin(h, self.layout_pin)
                x = (x0 + h * scale[:, None, None, :]) * INV_SQRT2
                if self.kernel_size != (1, 1):
                    x = _layout_pin_carrier(x, self.layout_pin)

        if self.proj_place == "after" and N != self.dim_out:
            x = Conv2d(self.dim_out, (1, 1), name="proj_out")(x)

        res = x_in
        if self.dim != self.dim_out:
            res = Conv2d(self.dim_out, (1, 1), impl=proj_impl,
                         name="res_conv")(x_in)
        return (x + res) * INV_SQRT2

    def _fused_dil_chain(self, x, sigma_emb, N):
        """Dilation stack via the fused Pallas stage kernel (one pass per
        dilation: GN-normalize + sigma-affine + gelu + dilated conv +
        gated residual, with the next stage's GN moments emitted by the
        kernel).  Parameter tree identical to the unfused loop."""
        B, F, T, C = x.shape
        g = GN_GROUPS
        cg = N // g
        n = F * T * cg
        Cp = _round128(N)
        T8 = -(-T // 8) * 8
        dt = x.dtype

        def denom_from(s1, s2):
            # same unbiased torch-x.std() math as BiasFreeGroupNorm
            m = (s1[:, :N] / (F * T)).reshape(B, g, cg).mean(-1)
            sq = (s2[:, :N] / (F * T)).reshape(B, g, cg).mean(-1)
            var = (sq - m * m) * (n / (n - 1.0))
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            return jnp.repeat(std + GN_EPS, cg, axis=-1)  # (B, N)

        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=(1, 2))
        s2 = jnp.sum(x32 * x32, axis=(1, 2))

        # uniform zero margins sized for the chain's max dilation; stages
        # ping-pong between two buffers (the Pallas output aliases the
        # scratch operand), so the margins are zeroed exactly once here
        dm = 2 ** (self.num_dils - 1)
        xp = jnp.pad(x, ((0, 0), (2 * dm, 2 * dm), (8, 8 + (T8 - T)),
                         (0, Cp - N)))
        scratch = jnp.zeros_like(xp)
        for i in range(self.num_dils):
            d = 2 ** i
            gamma_n = BiasFreeGroupNorm(N, g, name=f"norm_{i}")(None)
            gamma = Linear(N, name=f"affine_{i}")(sigma_emb)
            scale = Linear(N, init_weight=INIT_ZERO,
                           name=f"gate_{i}")(sigma_emb)
            denom = denom_from(s1, s2)
            a_vec = (gamma_n[None, :] * (gamma.astype(jnp.float32) + 1.0)
                     / denom)
            s_vec = scale.astype(jnp.float32)
            pad = Cp - N
            a_vec = jnp.pad(a_vec, ((0, 0), (0, pad)))
            s_vec = jnp.pad(s_vec, ((0, 0), (0, pad)))
            k = Conv2d(N, (5, 3), dilation=(d, 1), in_features=N,
                       name=f"H_{i}")(None)  # (5,3,N,N)
            w4 = jnp.pad(k.astype(dt),
                         ((0, 0), (0, 0), (0, pad), (0, pad)))
            yp, mom = fused_stage_padded(
                xp, scratch, w4, a_vec, s_vec, (dm, d, F, T, N, Cp))
            xp, scratch = yp, xp
            s1, s2 = mom[0], mom[1]

        return xp[:, 2 * dm:2 * dm + F, 8:8 + T, :N]

    def _fused_dil_chain_int8(self, x, sigma_emb, N):
        """Dilation stack via the int8 fused Pallas stage: one VMEM pass per
        stage for GN-normalize + sigma-affine + gelu + int8 quantize +
        int8 dilated conv + requant + gated residual, with the next stage's
        GN moments AND per-channel amax (the analytic bound's input) emitted
        by the kernel — zero extra passes over the activations anywhere in
        the chain.  Parameter tree identical to the unfused loop; scales
        follow the BABE_INT8_SCALE=bound scheme (conv_int8_hinted)."""
        B, F, T, C = x.shape
        g = GN_GROUPS
        cg = N // g
        n = F * T * cg
        Cp = _round128(N)
        T8 = -(-T // 8) * 8
        dt = x.dtype

        def denom_from(s1, s2):
            m = (s1[:, :N] / (F * T)).reshape(B, g, cg).mean(-1)
            sq = (s2[:, :N] / (F * T)).reshape(B, g, cg).mean(-1)
            var = (sq - m * m) * (n / (n - 1.0))
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            return jnp.repeat(std + GN_EPS, cg, axis=-1)  # (B, N)

        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=(1, 2))
        s2 = jnp.sum(x32 * x32, axis=(1, 2))
        amax_c = jnp.max(jnp.abs(x32), axis=(1, 2))  # (B, N)

        dm = 2 ** (self.num_dils - 1)
        xp = jnp.pad(x, ((0, 0), (2 * dm, 2 * dm), (8, 8 + (T8 - T)),
                         (0, Cp - N)))
        scratch = jnp.zeros_like(xp)
        pad = Cp - N
        for i in range(self.num_dils):
            d = 2 ** i
            gamma_n = BiasFreeGroupNorm(N, g, name=f"norm_{i}")(None)
            gamma = Linear(N, name=f"affine_{i}")(sigma_emb)
            scale = Linear(N, init_weight=INIT_ZERO,
                           name=f"gate_{i}")(sigma_emb)
            denom = denom_from(s1, s2)
            a_vec = (gamma_n[None, :] * (gamma.astype(jnp.float32) + 1.0)
                     / denom)  # (B, N) f32
            # |gelu(v)| <= |v|: per-item bound on the conv input, known
            # before the activation exists (same derivation as the unfused
            # bound mode; BOUND_SAFETY covers bf16/poly rounding)
            bound = BOUND_SAFETY * jnp.max(amax_c * jnp.abs(a_vec), axis=-1)
            s_vec = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, pad)))
            a_pad = jnp.pad(a_vec, ((0, 0), (0, pad)))
            k = Conv2d(N, (5, 3), dilation=(d, 1), in_features=N,
                       name=f"H_{i}")(None)  # (5,3,N,N) fp32
            w4 = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, pad)))
            yp, mom3 = fused_stage_int8(
                xp, scratch, w4, a_pad, s_vec, bound, (dm, d, F, T, N, Cp))
            xp, scratch = yp, xp
            s1, s2, amax_c = mom3[0], mom3[1], mom3[2][:, :N]

        return xp[:, 2 * dm:2 * dm + F, 8:8 + T, :N].astype(dt)


_RESAMPLE_KERNELS = {
    "linear": np.array([1 / 8, 3 / 8, 3 / 8, 1 / 8], np.float32),
    "cubic": np.array(
        [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
         0.43359375, 0.11328125, -0.03515625, -0.01171875], np.float32),
    "lanczos3": np.array(
        [0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
         -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
         0.44638532400131226, 0.13550527393817902, -0.066637322306633,
         -0.03399861603975296, 0.015056144446134567, 0.003689131001010537],
        np.float32),
}


def resample_time(x: jnp.ndarray, up: bool, kernel: str = "cubic") -> jnp.ndarray:
    """Anti-aliased x2 time resampling with reflect padding
    (networks/cqtdiff+.py:522-580, UpDownResample mode 'T').

    Input (B, F, T, C); filters every (b, f, c) row along T — realized as a
    depthwise (1, 8) conv in the native NHWC layout (no transposes).
    Down: reflect-pad 3, correlate k=8 stride 2  -> T/2.
    Up:   reflect-pad 2, zero-stuff (lhs_dilation 2), convolve -> 2T.
    """
    B, F, T, C = x.shape
    w = jnp.asarray(_RESAMPLE_KERNELS[kernel], dtype=x.dtype)
    if up:
        w = w[::-1]
    rhs = jnp.broadcast_to(w.reshape(1, -1, 1, 1), (1, w.shape[0], 1, C))
    pad_t = 3 if not up else 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad_t, pad_t), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, rhs,
        window_strides=(1, 2) if not up else (1, 1),
        padding=[(0, 0), (0, 0)],
        lhs_dilation=(1, 1) if not up else (1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
