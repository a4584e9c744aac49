"""Golden parity: flax MultiStage denoiser vs the reference torch module.

networks/denoiser.py only depends on torch, so the reference imports directly;
random torch init -> converted weights -> identical forward outputs.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from babe_tpu.config import make_config
from babe_tpu.models.denoiser import MultiStageDenoiser
from babe_tpu.utils.torch_ckpt import convert_state_dict, fill_variables

REF = "/root/reference/networks/denoiser.py"
F_DIM = 65  # small frequency dim for speed (torch model is f_dim-agnostic
# except the fencoding table)


def load_ref_module():
    spec = importlib.util.spec_from_file_location("ref_denoiser", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_unet_args(num_stages=2):
    return make_config(
        {
            "depth": 3,
            "num_tfc": 2,
            "num_stages": num_stages,
            "use_fencoding": True,
            "use_SAM": True,
            "f_dim": F_DIM,
            "use_csff": False,
            "use_cam": False,
            "use_fam": False,
            "use_tdf": False,
            "use_alttdfs": False,
            "activation": "elu",
        }
    )


@pytest.mark.parametrize("num_stages", [1, 2])
def test_denoiser_forward_parity(num_stages, rng):
    mod = load_ref_module()
    torch.manual_seed(0)
    ref = mod.MultiStage_denoise(make_unet_args(num_stages)).eval()

    model = MultiStageDenoiser(depth=3, num_tfc=2, num_stages=num_stages,
                               use_fencoding=True, use_SAM=True, f_dim=F_DIM)
    T = 40
    template = jax.jit(
        lambda k: model.net.init({"params": k},
                                 jnp.zeros((1, T, F_DIM, 2)))
    )(jax.random.PRNGKey(0))
    converted = convert_state_dict(ref.state_dict())
    variables = fill_variables(template, converted, strict=True)

    x = rng.standard_normal((1, T, F_DIM, 2)).astype(np.float32) * 0.3
    # torch layout: (B, 2, T, F)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_t = ref(xt)
    out_j = model.net.apply(variables, jnp.asarray(x))
    if num_stages > 1:
        out_t, out_t1 = out_t
        out_j, out_j1 = out_j
        a1 = out_t1.numpy().transpose(0, 2, 3, 1)
        b1 = np.asarray(out_j1)
        np.testing.assert_allclose(a1, b1, atol=2e-4)
    a = out_t.numpy().transpose(0, 2, 3, 1)
    b = np.asarray(out_j)
    denom = np.abs(a).max() + 1e-9
    assert np.abs(a - b).max() / denom < 1e-3


def test_chunked_ola_runs(rng):
    model = MultiStageDenoiser(depth=3, num_tfc=2, num_stages=2,
                               use_fencoding=True, use_SAM=True, f_dim=513,
                               fs=8000, segment_seconds=1.0)
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 20000)).astype(np.float32) * 0.1)
    y = model.apply_chunked_ola(v, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
