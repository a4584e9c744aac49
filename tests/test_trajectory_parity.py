"""Golden full-trajectory parity: our jitted Heun scan vs the REFERENCE
torch sampler (testing/edm_sampler.py) running the reference network with
the same converted weights and the same initial noise.

SURVEY.md §4 test level 2 explicitly calls for "one full sampler trajectory
with fixed noise".  With Schurn=0 the reverse process is deterministic given
x0 (reference predict: t_hat=t[i], x_hat=x when gamma==0), so no RNG
alignment across frameworks is needed; x0 is injected on both sides
(reference: monkeypatched diff_params.sample_prior; ours: x_init).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from babe_tpu.diffusion.edm import EDM, EDMParams  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: E402
from babe_tpu.sampling.heun import Sampler, SamplerConfig  # noqa: E402
from babe_tpu.utils.torch_ckpt import convert_state_dict, fill_variables  # noqa: E402

from test_model_parity import make_args  # noqa: E402
from torch_ref import build_reference_model  # noqa: E402

FS, LEN, T = 22050, 4096, 5
REF = "/root/reference"


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _ref_args(xi: float):
    return _ns(
        exp=_ns(audio_len=LEN, sample_rate=FS),
        tester=_ns(
            T=T, order=2, filter_out_cqt_DC_Nyq=True,
            diff_params=_ns(same_as_training=True),
            posterior_sampling=_ns(xi=xi, data_consistency=False),
        ),
    )


@pytest.fixture(scope="module")
def models():
    """(reference torch model, our model, our variables, ref EDM, our EDM)."""
    import importlib.util

    args = make_args(False)
    ref_model = build_reference_model(args)
    ref_model.eval()
    ours = CQTDiffPlus.from_config(args)
    template = ours.init(jax.random.PRNGKey(0), batch=1)
    variables = fill_variables(
        template, convert_state_dict(ref_model.state_dict()), strict=True
    )

    if REF not in sys.path:
        sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_edm", f"{REF}/diff_params/edm.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dp_args = _ns(diff_params=_ns(
        sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
        P_mean=-1.2, P_std=1.2, ro=8.0, ro_train=10.0,
        Schurn=0.0, Stmin=0.0, Stmax=50.0, Snoise=1.0,
        aweighting=_ns(use_aweighting=False),
    ), exp=_ns(sample_rate=FS))
    ref_edm = mod.EDM(dp_args)
    our_edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                            ro=8.0, ro_train=10.0, Schurn=0.0,
                            Stmin=0.0, Stmax=50.0, Snoise=1.0))
    return ref_model, ours, variables, ref_edm, our_edm


def _ref_sampler(ref_model, ref_edm, xi):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sampler_mod", f"{REF}/testing/edm_sampler.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Sampler(ref_model, ref_edm, _ref_args(xi))


def _our_sampler(ours, variables, our_edm, xi):
    cfg = SamplerConfig(
        T=T, order=2, xi=xi, audio_len=LEN, filter_out_cqt_DC_Nyq=True,
        norm_fn=lambda y, d: jnp.sum(
            jnp.linalg.norm((y - d).reshape(y.shape[0], -1), axis=-1)
        ),
    )
    den = lambda x, sig: our_edm.denoiser(
        x, lambda xx, cn: ours.apply(variables, xx, cn), sig
    )
    return Sampler(den, our_edm, cfg, hpf=ours.apply_hpf_DC)


def test_unconditional_trajectory_parity(models):
    ref_model, ours, variables, ref_edm, our_edm = models
    rng = np.random.default_rng(0)
    sigma_max = 1.0
    x0 = (rng.standard_normal((1, LEN)) * sigma_max).astype(np.float32)

    ref_edm.sample_prior = lambda shape, s: torch.from_numpy(x0)
    ref_s = _ref_sampler(ref_model, ref_edm, xi=0.0)
    with torch.no_grad():
        x_ref = ref_s.predict_unconditional((1, LEN), "cpu").numpy()

    our_s = _our_sampler(ours, variables, our_edm, xi=0.0)
    x_our = np.asarray(
        jax.jit(
            lambda k, xi_: our_s.predict_unconditional(k, (1, LEN), x_init=xi_)
        )(jax.random.PRNGKey(0), jnp.asarray(x0))
    )
    denom = np.abs(x_ref).max() + 1e-12
    rel = np.abs(x_our - x_ref).max() / denom
    assert rel < 2e-3, f"trajectory diverged: max rel {rel}"


def test_guided_inpainting_trajectory_parity(models):
    """Full guided trajectory: reconstruction-guidance gradients via
    torch.autograd (reference :55-93) vs jax.value_and_grad."""
    ref_model, ours, variables, ref_edm, our_edm = models
    rng = np.random.default_rng(1)
    x0 = (rng.standard_normal((1, LEN))).astype(np.float32)
    clean = (rng.standard_normal((1, LEN)) * 0.05).astype(np.float32)
    mask = np.ones((1, LEN), np.float32)
    mask[:, 1000:1400] = 0.0
    y = clean * mask

    ref_edm.sample_prior = lambda shape, s: torch.from_numpy(x0)
    ref_s = _ref_sampler(ref_model, ref_edm, xi=0.25)
    tmask = torch.from_numpy(mask)
    x_ref = ref_s.predict_conditional(
        torch.from_numpy(y), lambda z: z * tmask
    ).numpy()

    our_s = _our_sampler(ours, variables, our_edm, xi=0.25)
    jmask = jnp.asarray(mask)
    x_our = np.asarray(
        jax.jit(
            lambda k, yy, xi_: our_s.predict_conditional(
                k, yy, lambda z: z * jmask, x_init=xi_
            )
        )(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(x0))
    )
    denom = np.abs(x_ref).max() + 1e-12
    rel = np.abs(x_our - x_ref).max() / denom
    assert rel < 5e-3, f"guided trajectory diverged: max rel {rel}"
