"""Correctness of the implicit-GEMM Pallas conv (interpret mode on CPU) and
the 1x1 matmul conv, against lax.conv_general_dilated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from babe_tpu.ops import conv_kernels as ck


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ck, "_INTERPRET", True)
    monkeypatch.setattr(ck, "_BACKEND", "pallas")


def test_conv1x1_matches(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 24, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 16, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ck.conv1x1(x, w)), np.asarray(ck.conv_xla(x, w)),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d", [1, 2, 8])
def test_conv5x3_matches(rng, d):
    B, F, T, C, N = 2, 32, 40, 16, 8
    x = jnp.asarray(rng.standard_normal((B, F, T, C)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((5, 3, C, N)).astype(np.float32))
    out = ck.conv5x3_dilated(x, w, d)
    ref = ck.conv_xla(x, w, (d, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv5x3_unaligned_T(rng):
    """T=20 (not a multiple of 8) exercises the pad-to-T8 path."""
    B, F, T, C, N = 1, 16, 20, 8, 8
    x = jnp.asarray(rng.standard_normal((B, F, T, C)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((5, 3, C, N)).astype(np.float32))
    out = ck.conv5x3_dilated(x, w, 4)
    ref = ck.conv_xla(x, w, (4, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv5x3_grads_match(rng):
    B, F, T, C, N = 1, 16, 24, 8, 8
    x = jnp.asarray(rng.standard_normal((B, F, T, C)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((5, 3, C, N)).astype(np.float32))

    gp = jax.grad(lambda a, b: jnp.sum(ck.conv5x3_dilated(a, b, 2) ** 2),
                  argnums=(0, 1))(x, w)
    gr = jax.grad(lambda a, b: jnp.sum(ck.conv_xla(a, b, (2, 1)) ** 2),
                  argnums=(0, 1))(x, w)
    for p, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


def test_plan_covers_flagship_shapes():
    """Every (5,3) conv shape in the flagship 5 s bench config must tile."""
    shapes = [
        (8, 64, 1280, 64, 64, 1), (8, 64, 1280, 64, 64, 2),
        (8, 128, 640, 96, 96, 4), (8, 192, 320, 96, 96, 8),
        (8, 256, 160, 128, 128, 8), (8, 320, 80, 128, 128, 16),
        (8, 384, 40, 256, 256, 32), (8, 448, 20, 256, 256, 64),
    ]
    for B, F, T, C, N, d in shapes:
        plan = ck._plan(B, F, T, ck._round128(C), ck._round128(N), d)
        assert plan is not None, (B, F, T, C, N, d)
        BF, BT, per_slab, T8 = plan
        assert F % BF == 0 and T8 % BT == 0 and T8 >= T


def _mk_block(num_dils=3, N=16):
    from babe_tpu.models.blocks import ResnetBlock
    return ResnetBlock(N, N, True, num_dils=num_dils, emb_dim=32, Fdim=32)


@pytest.mark.parametrize("T", [40, 20])
def test_fused_resnet_chain_parity(rng, monkeypatch, T):
    """Fused Pallas dilation chain (interpret) == plain XLA ResnetBlock."""
    import babe_tpu.ops.conv_kernels as ck
    import jax

    B, F, N = 2, 32, 16
    x = jnp.asarray(rng.standard_normal((B, F, T, N)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))
    blk = _mk_block()

    monkeypatch.setattr(ck, "_BACKEND", "xla")
    p = blk.init(jax.random.PRNGKey(0), x, emb)
    ref = blk.apply(p, x, emb)

    monkeypatch.setattr(ck, "_BACKEND", "pallas")
    monkeypatch.setattr(ck, "_INTERPRET", True)
    out = blk.apply(p, x, emb)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["kt3", "kf5"])
def test_fused_stage_matches_ref(rng, monkeypatch, variant):
    import babe_tpu.ops.conv_kernels as ck

    monkeypatch.setenv("BABE_FUSED_VARIANT", variant)
    B, F, T, C, Cp, dm, d = 2, 16, 24, 8, 128, 4, 2
    T8 = 24
    xnp = rng.standard_normal(
        (B, F + 4 * dm, T8 + 16, Cp)).astype(np.float32)
    # layout contract: margins, fake T cols and channel lanes [C:Cp) are
    # all zero (established at chain entry, preserved by aliasing)
    xnp[..., C:] = 0.0
    xnp[:, :2 * dm] = 0.0
    xnp[:, 2 * dm + F:] = 0.0
    xnp[:, :, :8] = 0.0
    xnp[:, :, 8 + T:] = 0.0
    xp = jnp.asarray(xnp)
    prev = jnp.zeros_like(xp)
    w = 0.1 * rng.standard_normal((5, 3, Cp, Cp)).astype(np.float32)
    w[:, :, C:, :] = 0.0
    w[:, :, :, C:] = 0.0
    w4 = jnp.asarray(w)
    a = jnp.asarray(rng.standard_normal((B, Cp)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((B, Cp)).astype(np.float32))
    static = (dm, d, F, T, C, Cp)

    ref_y, ref_m = ck._dil_stage_ref(xp, prev, w4, a, s, static)

    old_b, old_i = ck._BACKEND, ck._INTERPRET
    ck._BACKEND, ck._INTERPRET = "pallas", True
    try:
        y, m = ck.fused_stage_padded(xp, prev, w4, a, s, static)
    finally:
        ck._BACKEND, ck._INTERPRET = old_b, old_i

    ry = np.asarray(y[:, 2 * dm:2 * dm + F, 8:8 + T, :C])
    rr = np.asarray(ref_y[:, 2 * dm:2 * dm + F, 8:8 + T, :C])
    np.testing.assert_allclose(ry, rr, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m),
                               rtol=1e-3, atol=1e-3)


def test_fused_chain_grads(rng, monkeypatch):
    """custom_vjp backward (XLA re-derivation) produces finite grads that
    match the unfused chain."""
    import babe_tpu.ops.conv_kernels as ck
    import jax

    B, F, T, N = 1, 32, 16, 16
    x = jnp.asarray(rng.standard_normal((B, F, T, N)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))
    blk = _mk_block(num_dils=2)

    monkeypatch.setattr(ck, "_BACKEND", "xla")
    p = blk.init(jax.random.PRNGKey(0), x, emb)
    gref = jax.grad(lambda xx: jnp.sum(blk.apply(p, xx, emb) ** 2))(x)

    monkeypatch.setattr(ck, "_BACKEND", "pallas")
    monkeypatch.setattr(ck, "_INTERPRET", True)
    gfus = jax.grad(lambda xx: jnp.sum(blk.apply(p, xx, emb) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gfus), np.asarray(gref),
                               rtol=1e-3, atol=1e-3)


def test_gelu_exact_accuracy():
    """The polynomial erf gelu must stay well below bf16 resolution against
    XLA's native exact gelu, in value and gradient (guards coefficient
    regressions)."""
    import jax

    x = jnp.asarray(np.linspace(-8, 8, 4001, dtype=np.float32))
    ref = jax.nn.gelu(x, approximate=False)
    out = ck._gelu_exact(x)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-4
    g_ref = jax.vmap(jax.grad(lambda t: jax.nn.gelu(t, approximate=False)))(x)
    # the custom vjp's direct analytic-derivative polynomial (erf poly + one
    # exp, ~30 VPU ops vs ~140 for the autodiffed chain) must track the true
    # gelu' to ~1e-5 — well below bf16 cotangent resolution
    g_out = jax.vmap(jax.grad(ck._gelu_exact))(x)
    assert float(jnp.max(jnp.abs(g_out - g_ref))) < 5e-5


# ------------------------------------------------------ int8 quantized path


def test_conv_int8_close_and_exact_backward(rng):
    """BABE_PRECISION=int8 conv: forward within per-channel-int8 error of
    the exact conv; backward is the EXACT full-precision conv transpose
    (straight-through — guided-sampling gradients keep full precision)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((5, 3, 96, 96)).astype(np.float32))
    y8 = jax.jit(lambda x, w: ck.conv_int8(x, w, (2, 1)))(x, w)
    yb = ck.conv_xla(x, w, (2, 1))
    rel = float(jnp.linalg.norm(y8 - yb) / jnp.linalg.norm(yb))
    assert rel < 0.03, rel
    g = jnp.asarray(rng.standard_normal(y8.shape).astype(np.float32))
    _, p8 = jax.vjp(lambda x, w: ck.conv_int8(x, w, (2, 1)), x, w)
    _, pb = jax.vjp(lambda x, w: ck.conv_xla(x, w, (2, 1)), x, w)
    (dx8, dw8), (dxb, dwb) = p8(g), pb(g)
    # dx: exact conv transpose in w (straight-through on both quantizations)
    np.testing.assert_allclose(np.asarray(dx8), np.asarray(dxb),
                               rtol=1e-4, atol=1e-4)
    # dw = g (x) dequant(q): the TRUE weight gradient of the quantized
    # forward (residuals hold the int8 activation, not x — see
    # _int8_bwd_from_q); within quantization error of the at-x transpose
    relw = float(jnp.linalg.norm(dw8 - dwb) / jnp.linalg.norm(dwb))
    assert relw < 0.03, relw


def test_conv_int8_bwd_quantized_dx(rng, monkeypatch):
    """BABE_INT8_BWD=1: the input cotangent comes from the int8 MXU path
    (within quantization error of the exact conv transpose — the flip/swap
    'SAME' correlation identity must hold exactly for the dilated case);
    the weight cotangent stays exact."""
    monkeypatch.setenv("BABE_INT8_BWD", "1")
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((5, 3, 96, 96)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    _, p8 = jax.vjp(lambda x, w: ck.conv_int8(x, w, (2, 1)), x, w)
    _, pb = jax.vjp(lambda x, w: ck.conv_xla(x, w, (2, 1)), x, w)
    (dx8, dw8), (dxb, dwb) = p8(g), pb(g)
    rel = float(jnp.linalg.norm(dx8 - dxb) / jnp.linalg.norm(dxb))
    assert 1e-6 < rel < 0.03, rel  # quantized (not exact), but close
    relw = float(jnp.linalg.norm(dw8 - dwb) / jnp.linalg.norm(dwb))
    assert relw < 0.03, relw  # dw from the saved int8 activation


def test_conv_int8_hinted_close_and_straight_through(rng):
    """conv_int8_hinted: a per-item analytic amax BOUND (>= the true amax,
    here deliberately 1.5x loose) replaces the dynamic amax — forward stays
    within per-channel-int8 error of the exact conv, backward is the exact
    straight-through transpose, and the bound itself gets a zero cotangent."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((5, 3, 96, 96)).astype(np.float32))
    bound = jnp.max(jnp.abs(x), axis=(1, 2, 3)) * 1.5
    y8 = jax.jit(lambda x, w, b: ck.conv_int8_hinted(x, w, b, (2, 1)))(
        x, w, bound)
    yb = ck.conv_xla(x, w, (2, 1))
    rel = float(jnp.linalg.norm(y8 - yb) / jnp.linalg.norm(yb))
    assert rel < 0.04, rel
    g = jnp.asarray(rng.standard_normal(y8.shape).astype(np.float32))
    _, p8 = jax.vjp(lambda x, w, b: ck.conv_int8_hinted(x, w, b, (2, 1)),
                    x, w, bound)
    _, pb = jax.vjp(lambda x, w: ck.conv_xla(x, w, (2, 1)), x, w)
    dx8, dw8, db8 = p8(g)
    dxb, dwb = pb(g)
    np.testing.assert_allclose(np.asarray(dx8), np.asarray(dxb),
                               rtol=1e-4, atol=1e-4)
    relw = float(jnp.linalg.norm(dw8 - dwb) / jnp.linalg.norm(dwb))
    assert relw < 0.05, relw  # dw from the saved int8 activation
    assert float(jnp.max(jnp.abs(db8))) == 0.0


def test_resnet_block_int8_bound_scale(rng, monkeypatch):
    """BABE_INT8_SCALE=bound: the ResnetBlock derives the int8 activation
    scale from the GN statistics (amax_c(x)/denom_c * |gamma_n*(gamma+1)|,
    valid since |gelu(v)| <= |v|) — output must stay as close to bf16 as
    the dynamic-amax mode (the bound is an upper bound: coarser step, never
    clipping)."""
    from babe_tpu.models.blocks import ResnetBlock

    monkeypatch.setattr(ck, "_BACKEND", "xla")
    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "16")
    blk = ResnetBlock(dim=32, dim_out=32, num_dils=3)
    x = jnp.asarray((0.5 * rng.standard_normal((2, 16, 24, 32)))
                    .astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x, emb)
    # open the AdaLN-zero gates so the dilated convs contribute
    v = jax.tree_util.tree_map_with_path(
        lambda p, a: a + 0.05 if any("gate" in str(k) for k in p) else a, v)
    monkeypatch.setenv("BABE_INT8_SCALE", "amax")
    y_amax = blk.apply(v, x, emb)
    monkeypatch.setenv("BABE_INT8_SCALE", "bound")
    y_bound = blk.apply(v, x, emb)
    monkeypatch.setenv("BABE_PRECISION", "bf16")
    y_ref = blk.apply(v, x, emb)

    def rel(a, b):
        return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))

    assert rel(y_bound, y_ref) < 1.5 * max(rel(y_amax, y_ref), 1e-3), (
        rel(y_bound, y_ref), rel(y_amax, y_ref))
    # bound mode took a different numeric path than amax mode
    assert not np.array_equal(np.asarray(y_bound), np.asarray(y_amax))


def test_resnet_block_bound_hint_is_upper_bound(rng, monkeypatch):
    """The analytic hint the ResnetBlock passes to conv_int8_hinted must be
    a TRUE per-item upper bound on max|conv input| — the no-clipping
    guarantee the whole bound-mode derivation rests on (and the broadcast
    across (B,C)/(B,g) shapes it is easiest to silently break)."""
    from babe_tpu.models.blocks import ResnetBlock

    recorded = []
    orig = ck.conv_int8_hinted

    def spy(x, w, bound, dilation=(1, 1)):
        recorded.append((x, bound))
        return orig(x, w, bound, dilation)

    monkeypatch.setattr(ck, "_BACKEND", "xla")
    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "16")
    monkeypatch.setenv("BABE_INT8_SCALE", "bound")
    monkeypatch.setattr(ck, "conv_int8_hinted", spy)

    blk = ResnetBlock(dim=32, dim_out=32, num_dils=3)
    # large-amplitude input + opened gates: exercise real dynamic range
    x = jnp.asarray((3.0 * rng.standard_normal((2, 16, 24, 32)))
                    .astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x, emb)
    v = jax.tree_util.tree_map_with_path(
        lambda p, a: a + 0.3 if any("gate" in str(k) or "affine" in str(k)
                                    for k in p) else a, v)
    recorded.clear()  # init() above also ran the forward
    blk.apply(v, x, emb)
    assert len(recorded) == 3, len(recorded)  # one hinted conv per dilation
    for h, bound in recorded:
        amax = np.asarray(jnp.max(jnp.abs(h.astype(jnp.float32)),
                                  axis=(1, 2, 3)))
        b = np.asarray(bound)
        # STRICT upper bound per item: the 1.02x BOUND_SAFETY inflation
        # (models/blocks.py) covers the bf16-rounded folded GN scale and the
        # degree-6 gelu poly overshoot, so no slack is needed here
        assert (b >= amax).all(), (b, amax)


def test_dot1x1_int8_close(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((1, 1, 96, 128)).astype(np.float32))
    z8 = jax.jit(ck.dot1x1_int8)(x, w)
    zb = ck.conv1x1(x, w)
    rel = float(jnp.linalg.norm(z8 - zb) / jnp.linalg.norm(zb))
    assert rel < 0.03, rel


def test_int8_dispatch_gates(rng, monkeypatch):
    """conv2d_same routes through the quantized path only under
    BABE_PRECISION=int8 and only at levels >= BABE_INT8_MINC channels."""
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 96)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((5, 3, 96, 96)).astype(np.float32))
    monkeypatch.setattr(ck, "_BACKEND", "xla")
    exact = np.asarray(ck.conv2d_same(x, w, (1, 1)))
    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "96")
    q = np.asarray(ck.conv2d_same(x, w, (1, 1)))
    assert not np.array_equal(exact, q)  # quantized path taken
    np.testing.assert_allclose(q, exact, rtol=0.1, atol=0.15)
    monkeypatch.setenv("BABE_INT8_MINC", "128")
    gated = np.asarray(ck.conv2d_same(x, w, (1, 1)))
    np.testing.assert_array_equal(gated, exact)  # below min-C: exact path


def test_int8_model_forward_runs(monkeypatch):
    """The tiny CQTDiff+ forward runs under BABE_PRECISION=int8 (with a
    min-C low enough to engage on the tiny channel counts) and stays close
    to the full-precision forward."""
    from babe_tpu.config import default_config
    from babe_tpu.models.cqtdiff import CQTDiffPlus

    monkeypatch.setattr(ck, "_BACKEND", "xla")
    args = default_config([
        "exp.audio_len=4096", "network.Ns=[16,16,32]",
        "network.num_dils=[1,1,2]", "network.emb_dim=32",
        "network.attention_layers=[0,0,0,0]", "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8", "exp.use_bf16=false",
    ])
    model = CQTDiffPlus.from_config(args)
    v = model.init(jax.random.PRNGKey(0), batch=1)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 4096)).astype(np.float32) * 0.1)
    sig = jnp.full((1, 1), -1.0, jnp.float32)
    ref = np.asarray(jax.jit(model.apply)(v, x, sig))
    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "16")
    q = np.asarray(jax.jit(model.apply)(v, x, sig))
    assert np.isfinite(q).all()
    rel = np.linalg.norm(q - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.15, rel


def test_exact_backward_context_overrides_env(rng, monkeypatch):
    """conv_kernels.exact_backward() must force the exact dx even when
    BABE_INT8_BWD=1 is set process-globally (the trainer relies on this
    to keep training gradients exact after an int8 BABE.load())."""
    monkeypatch.setenv("BABE_INT8_BWD", "1")
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 128)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((5, 3, 128, 128))
                    .astype(np.float32))
    g = jnp.ones((2, 8, 16, 128), jnp.float32)

    def dx_of_conv_int8():
        _, pull = jax.vjp(lambda x_: ck.conv_int8(x_, w, (1, 1)), x)
        return np.asarray(pull(g)[0])

    dx_exact = np.asarray(
        jax.vjp(lambda x_: ck.conv_xla(x_, w, (1, 1)), x)[1](g)[0])
    dx_env = dx_of_conv_int8()  # quantized dx (env var active)
    with ck.exact_backward():
        dx_ctx = dx_of_conv_int8()  # context wins over the env var
    np.testing.assert_array_equal(dx_ctx, dx_exact)
    assert not np.array_equal(dx_env, dx_exact)


# ------------------------------------------------- int8 fused Pallas stage


def _int8_stage_operands(rng, B=2, F=16, T=24, C=8, Cp=128, dm=4, d=2):
    T8 = -(-T // 8) * 8
    xnp = rng.standard_normal((B, F + 4 * dm, T8 + 16, Cp)).astype(np.float32)
    xnp[..., C:] = 0.0
    xnp[:, :2 * dm] = 0.0
    xnp[:, 2 * dm + F:] = 0.0
    xnp[:, :, :8] = 0.0
    xnp[:, :, 8 + T:] = 0.0
    w = 0.1 * rng.standard_normal((5, 3, Cp, Cp)).astype(np.float32)
    w[:, :, C:, :] = 0.0
    w[:, :, :, C:] = 0.0
    a = rng.standard_normal((B, Cp)).astype(np.float32)
    a[:, C:] = 0.0
    s = rng.standard_normal((B, Cp)).astype(np.float32)
    # a true upper bound on max|gelu(x*a)| per item
    h = np.abs(xnp[:, 2 * dm:2 * dm + F, 8:8 + T, :]
               * a[:, None, None, :]).max(axis=(1, 2, 3))
    bound = (1.05 * h + 1e-6).astype(np.float32)
    return (jnp.asarray(xnp), jnp.zeros((B, F + 4 * dm, T8 + 16, Cp),
                                        jnp.float32),
            jnp.asarray(w), jnp.asarray(a), jnp.asarray(s),
            jnp.asarray(bound), (dm, d, F, T, C, Cp))


@pytest.mark.parametrize("T,d", [(24, 2), (20, 1)])
def test_fused_int8_stage_matches_ref(rng, T, d):
    """int8 fused Pallas stage (interpret) == its XLA quantized reference
    (same scales, same degree-6 gelu, same int8 rounding)."""
    xp, prev, w4, a, s, bound, static = _int8_stage_operands(
        rng, T=T, d=d)
    dm, d_, F, T_, C, Cp = static
    B = xp.shape[0]
    # rebuild (qw, ivb, post) exactly the way _fused_stage_int8_impl does
    qw, sw = ck._quant_weight_per_cout(w4)
    bnd = jnp.maximum(bound, 1e-20)
    ivb = jnp.broadcast_to((127.0 / bnd)[:, None], (B, Cp))
    post = ((bnd / 127.0)[:, None] * sw[None, :] * s
            * jnp.float32(ck.SQRT2_INV))
    ref_y, ref_m = ck._dil_stage_int8_ref(xp, prev, qw, a, ivb, post, static)
    y, m = ck.fused_stage_int8(xp, prev, w4, a, s, bound, static)
    ry = np.asarray(y[:, 2 * dm:2 * dm + F, 8:8 + T_, :C])
    rr = np.asarray(ref_y[:, 2 * dm:2 * dm + F, 8:8 + T_, :C])
    np.testing.assert_allclose(ry, rr, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m)[:, :, :C],
                               np.asarray(ref_m)[:, :, :C],
                               rtol=1e-3, atol=1e-3)


def test_fused_int8_stage_close_to_exact(rng):
    """The int8 fused stage output stays within quantization error of the
    EXACT bf16-math stage (_dil_stage_ref) — guards scale plumbing."""
    xp, prev, w4, a, s, bound, static = _int8_stage_operands(rng)
    dm, d, F, T, C, Cp = static
    y_exact, m_exact = ck._dil_stage_ref(xp, prev, w4, a, s, static)
    y, m = ck.fused_stage_int8(xp, prev, w4, a, s, bound, static)
    ry = np.asarray(y[:, 2 * dm:2 * dm + F, 8:8 + T, :C])
    rr = np.asarray(y_exact[:, 2 * dm:2 * dm + F, 8:8 + T, :C])
    rel = np.linalg.norm(ry - rr) / np.linalg.norm(rr)
    assert rel < 0.05, rel
    np.testing.assert_allclose(np.asarray(m)[:2, :, :C],
                               np.asarray(m_exact)[:, :, :C],
                               rtol=0.1, atol=0.05)
    # the amax row must be the exact per-channel amax of the stage output
    amax = np.abs(ry).max(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(m)[2, :, :C], amax,
                               rtol=1e-5, atol=1e-6)


def test_fused_int8_chain_matches_unfused_int8(rng, monkeypatch):
    """ResnetBlock routed through the int8 fused chain (BABE_INT8_FUSED,
    interpret) == the unfused BABE_INT8_SCALE=bound path (XLA): same
    quantization scheme, same analytic bounds, same gelu polynomial."""
    from babe_tpu.models.blocks import ResnetBlock

    B, F, T, N = 2, 32, 24, 16
    x = jnp.asarray(rng.standard_normal((B, F, T, N)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))
    blk = ResnetBlock(N, N, True, num_dils=3, emb_dim=32, Fdim=32)

    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "8")
    monkeypatch.setenv("BABE_INT8_SCALE", "bound")
    monkeypatch.setattr(ck, "_BACKEND", "xla")
    p = blk.init(jax.random.PRNGKey(0), x, emb)
    # open the gates so the dilated convs actually contribute
    p = jax.tree_util.tree_map_with_path(
        lambda pth, a_: a_ + 0.2 if any("gate" in str(k) or "affine" in str(k)
                                        for k in pth) else a_, p)
    ref = blk.apply(p, x, emb)

    monkeypatch.setenv("BABE_INT8_FUSED", "8")
    out = blk.apply(p, x, emb)
    assert out.shape == ref.shape
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_fused_int8_chain_grads_straight_through(rng, monkeypatch):
    """The int8 fused chain's backward is the straight-through EXACT
    gradient: it must match the unfused int8 path's gradient (which uses
    the same straight-through exact conv transpose)."""
    from babe_tpu.models.blocks import ResnetBlock

    B, F, T, N = 1, 32, 16, 16
    x = jnp.asarray(rng.standard_normal((B, F, T, N)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))
    blk = ResnetBlock(N, N, True, num_dils=2, emb_dim=32, Fdim=32)

    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "8")
    monkeypatch.setenv("BABE_INT8_SCALE", "bound")
    monkeypatch.setattr(ck, "_BACKEND", "xla")
    p = blk.init(jax.random.PRNGKey(0), x, emb)
    p = jax.tree_util.tree_map_with_path(
        lambda pth, a_: a_ + 0.2 if any("gate" in str(k) or "affine" in str(k)
                                        for k in pth) else a_, p)
    g_ref = jax.grad(lambda xx: jnp.sum(blk.apply(p, xx, emb) ** 2))(x)

    monkeypatch.setenv("BABE_INT8_FUSED", "8")
    g_fus = jax.grad(lambda xx: jnp.sum(blk.apply(p, xx, emb) ** 2))(x)
    # both are exact-formula cotangents evaluated at (slightly different)
    # quantized-forward activations; they agree to quantization error
    rel = float(jnp.linalg.norm(g_fus - g_ref) / jnp.linalg.norm(g_ref))
    assert rel < 0.05, rel
