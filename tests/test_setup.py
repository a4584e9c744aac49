"""Factory layer + registry alias tests (API parity with utils/setup.py)."""

import jax
import numpy as np
import pytest

from babe_tpu import setup as S
from babe_tpu.config import default_config
from babe_tpu.registry import get_obj_by_name


def tiny_args(tmp):
    return default_config([
        f"model_dir={tmp}",
        "exp.audio_len=4096",
        "network.Ns=[8,8,16]",
        "network.num_dils=[1,1,2]",
        "network.emb_dim=32",
        "network.attention_layers=[0,0,0,0]",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
    ])


def test_reference_callable_aliases():
    """Configs written for the reference resolve to our implementations."""
    from babe_tpu.models.cqtdiff import CQTDiffPlus
    from babe_tpu.diffusion.edm import EDM
    from babe_tpu.testers.tester import Tester

    assert get_obj_by_name("networks.cqtdiff+.Unet_CQT_oct_with_attention") is CQTDiffPlus
    assert get_obj_by_name("diff_params.edm.EDM") is EDM
    assert get_obj_by_name("testing.blind_bwe_tester.BlindTester") is Tester
    # stale path in reference configs also resolves (SURVEY §2.11)
    assert get_obj_by_name("testing.blind_bwe.blind_bwe_tester.BlindTester") is Tester


def test_factories(tmp_path):
    args = tiny_args(str(tmp_path))
    net = S.setup_network(args)
    dp = S.setup_diff_parameters(args, cqt_hpf=net.apply_hpf_DC)
    opt = S.setup_optimizer(args)
    tester = S.setup_tester(args, net, dp)
    assert tester is not None
    v = net.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    y = net.apply(v, jnp.zeros((1, 4096)), jnp.zeros((1, 1)))
    assert y.shape == (1, 4096)


def test_setup_trainer(tmp_path):
    args = tiny_args(str(tmp_path))
    args.exp["batch"] = 2
    args.exp["resume"] = False
    net = S.setup_network(args)
    dp = S.setup_diff_parameters(args, cqt_hpf=net.apply_hpf_DC)

    def dset():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal((2, 4096)).astype(np.float32) * 0.1

    tr = S.setup_trainer(args, dset(), net, dp)
    m = tr.train_step()
    assert np.isfinite(float(m["loss"]))


def test_legacy_checkpoint_format_cascade():
    """All reference checkpoint layouts resolve to weights
    (utils/training_utils.py:223-403 cascade)."""
    import numpy as np

    from babe_tpu.utils.torch_ckpt import extract_network_state

    w = {"downs.0.0.res_conv.weight": np.zeros((4, 2, 1, 1), np.float32)}
    assert extract_network_state({"ema": w}) == w
    assert extract_network_state({"network": w}) == w
    assert extract_network_state({"state_dict": w}) == w
    assert extract_network_state({"ema_model": w}) == w
    assert extract_network_state(w) == w  # raw dict
    pref = {f"diffusion_ema.{k}": v for k, v in w.items()}
    out = extract_network_state({"state_dict": pref})
    assert set(out) == set(w)
    prefer_net = extract_network_state({"ema": w, "network": {"x.weight": np.ones(1)}},
                                       prefer="network")
    assert "x.weight" in prefer_net
