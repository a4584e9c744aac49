"""Golden parity: flax CQTDiff+ with converted weights vs the torch reference.

Instantiates the reference Unet_CQT_oct_with_attention (random torch init),
converts its state_dict through babe_tpu.utils.torch_ckpt, and checks the full
forward (CQT -> U-Net -> CQT^-1) matches on identical inputs.  This validates
both the checkpoint converter (for the published HF weights) and every
architectural detail of the re-implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from babe_tpu.config import make_config
from babe_tpu.models.cqtdiff import CQTDiffPlus
from babe_tpu.utils.torch_ckpt import convert_state_dict, fill_variables

from torch_ref import build_reference_model

FS = 22050
LEN = 4096


def make_args(attention: bool):
    n_oct = 3
    return make_config(
        {
            "exp": {"sample_rate": FS, "audio_len": LEN},
            "network": {
                "use_fencoding": False,
                "use_norm": True,
                "emb_dim": 32,
                "Ns": [8, 8, 16],
                "Ss": [2, 2, 2],
                "num_dils": [1, 1, 2],
                "cqt": {"window": "kaiser", "beta": 1, "num_octs": n_oct,
                        "bins_per_oct": 8},
                "bottleneck_type": "res_dil_convs",
                "num_bottleneck_layers": 1,
                "attention_layers": [0, 1, 1, 1] if attention else [0, 0, 0, 0],
                "attention_dict": {
                    "num_heads": 2,
                    "attn_dropout": 0.0,
                    "bias_qkv": False,
                    "N": 0,
                    "rel_pos_num_buckets": 8,
                    "rel_pos_max_distance": 16,
                    "use_rel_pos": True,
                    "Nproj": 4,
                },
            },
        }
    )


@pytest.mark.parametrize("attention", [False, True])
def test_forward_parity(attention, rng):
    args = make_args(attention)
    ref = build_reference_model(args)
    ref.eval()

    model = CQTDiffPlus.from_config(args)
    template = model.init(jax.random.PRNGKey(0), batch=2)
    converted = convert_state_dict(ref.state_dict())
    variables = fill_variables(template, converted, strict=True)

    x = rng.standard_normal((2, LEN)).astype(np.float32) * 0.1
    cnoise = np.array([[-0.5], [0.25]], dtype=np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    y_jax = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(cnoise)))

    assert y_jax.shape == y_ref.shape
    denom = np.abs(y_ref).max() + 1e-12
    rel = np.abs(y_jax - y_ref).max() / denom
    assert rel < 5e-4, f"forward mismatch: max rel err {rel}"


def test_param_count_matches():
    args = make_args(False)
    ref = build_reference_model(args)
    n_ref = sum(p.numel() for p in ref.parameters() if p.requires_grad)
    model = CQTDiffPlus.from_config(args)
    v = model.init(jax.random.PRNGKey(0))
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n_jax == n_ref


def test_hpf_dc_parity(rng):
    args = make_args(False)
    ref = build_reference_model(args)
    model = CQTDiffPlus.from_config(args)
    x = rng.standard_normal((1, LEN)).astype(np.float32)
    a = ref.CQTransform.apply_hpf_DC(torch.from_numpy(x)).numpy()
    b = np.asarray(model.apply_hpf_DC(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_denoiser_matches_unfused(rng):
    """hpf(cskip*x + cout*net(cin*x)) == fused spectrum-sharing path."""
    from babe_tpu.diffusion.edm import EDM, EDMParams

    args = make_args(False)
    model = CQTDiffPlus.from_config(args)
    v = model.init(jax.random.PRNGKey(0), batch=2)
    edm = EDM(EDMParams(sigma_data=0.1, sigma_min=1e-4, sigma_max=1.0, ro=8))
    x = jnp.asarray(rng.standard_normal((2, LEN)).astype(np.float32) * 0.1)
    sigma = jnp.asarray([[0.3], [0.05]])

    ref = model.apply_hpf_DC(
        edm.denoiser(x, lambda xx, cn: model.apply(v, xx, cn), sigma)
    )
    fused = model.fused_denoiser(v, edm)(x, sigma)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_forward_parity_compat_frame(rng):
    """Full forward parity through the checkpoint-compatible CQT frame
    (mode="oct_pow2") — the exact transform published .pt weights expect."""
    import torch_ref

    args = make_args(False)
    args.network.cqt["mode"] = "oct_pow2"
    old = torch_ref.STUB_FRAME_MODE
    torch_ref.STUB_FRAME_MODE = "oct_pow2"
    try:
        ref = build_reference_model(args)
    finally:
        torch_ref.STUB_FRAME_MODE = old
    ref.eval()

    model = CQTDiffPlus.from_config(args)
    assert model.cqt.mode == "oct_pow2"
    template = model.init(jax.random.PRNGKey(0), batch=2)
    converted = convert_state_dict(ref.state_dict())
    variables = fill_variables(template, converted, strict=True)

    x = rng.standard_normal((2, LEN)).astype(np.float32) * 0.1
    cnoise = np.array([[-0.5], [0.25]], dtype=np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    y_jax = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(cnoise)))
    denom = np.abs(y_ref).max() + 1e-12
    rel = np.abs(y_jax - y_ref).max() / denom
    assert rel < 5e-4, f"compat-frame forward mismatch: max rel err {rel}"


def test_gn_custom_vjp(rng):
    """The opt-in analytic GroupNorm backward (BABE_GN_BWD=custom,
    blocks._gn_apply) matches jax autodiff of the default path for both
    dx and dgamma, including the var<=0 clamp edge case."""
    from babe_tpu.models.blocks import _gn_apply, _gn_forward

    g, eps = 8, 1e-7
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 16)).astype(np.float32))
    gamma = jnp.asarray(
        (0.5 + rng.standard_normal(16) * 0.2).astype(np.float32))
    gr = jnp.asarray(rng.standard_normal((2, 4, 6, 16)).astype(np.float32))

    f_custom = lambda xx, gg: jnp.sum(_gn_apply(xx, gg, g, eps) * gr)
    f_auto = lambda xx, gg: jnp.sum(_gn_forward(xx, gg, g, eps)[0] * gr)
    dx_c, dg_c = jax.grad(f_custom, argnums=(0, 1))(x, gamma)
    dx_a, dg_a = jax.grad(f_auto, argnums=(0, 1))(x, gamma)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_c), np.asarray(dg_a),
                               rtol=1e-4, atol=1e-5)

    # constant input -> var == 0 -> clamped std; both paths must be finite
    x0 = jnp.ones((1, 2, 2, 16), jnp.float32)
    dx0 = jax.grad(lambda xx: jnp.sum(_gn_apply(xx, gamma, g, eps)))(x0)
    assert np.all(np.isfinite(np.asarray(dx0)))


@pytest.mark.parametrize("precision,scale", [("bf16", "dynamic"),
                                             ("int8", "dynamic"),
                                             ("int8", "bound")])
def test_stage_remat_equivalence(rng, monkeypatch, precision, scale):
    """BABE_STAGE_REMAT=1 (fold GN-scale x sigma-affine into one (B,C)
    factor, jax.checkpoint the gelu(x*a) producer so the guided vjp
    recomputes the pre-gelu tensor instead of saving it) must match the
    default path: forward and input cotangent exactly in fp32, param
    grads to fp reassociation tolerance."""
    from babe_tpu.models.blocks import ResnetBlock

    monkeypatch.setenv("BABE_PRECISION", precision)
    monkeypatch.setenv("BABE_INT8_SCALE", scale)
    monkeypatch.setenv("BABE_INT8_MINC", "16")
    blk = ResnetBlock(dim=16, dim_out=16, num_dils=2, emb_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 8, 24, 16)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    gr = jnp.asarray(rng.standard_normal((2, 8, 24, 16)).astype(np.float32))

    def run(remat):
        monkeypatch.setenv("BABE_STAGE_REMAT", "1" if remat else "0")
        v = blk.init(jax.random.PRNGKey(2), x, emb)
        y, pull = jax.vjp(lambda xx: blk.apply(v, xx, emb), x)
        (dx,) = pull(gr)
        gp = jax.grad(
            lambda p: jnp.sum(blk.apply({"params": p}, x, emb) ** 2)
        )(v["params"])
        return np.asarray(y), np.asarray(dx), gp

    y0, dx0, gp0 = run(False)
    y1, dx1, gp1 = run(True)
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-6, atol=1e-6)
    for k0, k1 in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                                   rtol=1e-3, atol=1e-3)
