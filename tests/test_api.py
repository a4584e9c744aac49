"""High-level API (babe_tpu/api.py): load -> generate / enhance / estimate.

Covers: self-configuration from the checkpoint's saved args, unconditional
generation (including at a non-default clip length, which rebuilds the CQT
frame), blind and informed enhancement of short clips, the long-input AR
chunk path, and filter estimation.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import pytest

from babe_tpu.api import BABE
from babe_tpu.config import default_config
from babe_tpu.models.cqtdiff import CQTDiffPlus
from test_e2e import tiny_overrides

FS = 22050
LEN = 4096

API_OVERRIDES = [
    "tester.T=4",
    "tester.blind_bwe.optimization.max_iter=4",
    "tester.blind_bwe.initial_conditions.fc=[300]",
    "tester.blind_bwe.initial_conditions.A=[-20]",
    "tester.blind_bwe.NFFT=512",
    "tester.complete_recording.overlap=0.02",
]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("api"))
    args = default_config(tiny_overrides(tmp, "[blind_bwe]"))
    model = CQTDiffPlus.from_config(args)
    v = model.init(jax.random.PRNGKey(0), batch=1)
    path = os.path.join(tmp, "tiny.ckpt")
    payload = {
        "it": 7,
        "params": jax.tree.map(np.asarray, v["params"]),
        "buffers": jax.tree.map(np.asarray, v.get("buffers", {})),
        "ema": jax.tree.map(np.asarray, v["params"]),
        "args": args.to_dict(),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


@pytest.fixture(scope="module")
def model(ckpt):
    # no network overrides: the tiny architecture must be adopted from the
    # checkpoint's saved args
    return BABE.load(ckpt, overrides=API_OVERRIDES)


def test_load_adopts_saved_config(model):
    assert int(model.args.exp.audio_len) == LEN
    assert list(model.args.network.Ns) == [8, 8, 16]
    assert model._tester.it == 7


def test_load_adopts_saved_diff_params(ckpt, tmp_path):
    """A checkpoint trained with a non-flagship sigma_data (e.g. the
    chorales 0.15) must drive the tester's EDM preconditioning, not the
    tester yaml's hardcoded 0.063 (VERDICT r3 #4)."""
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    payload["args"]["diff_params"]["sigma_data"] = 0.15
    payload["args"]["diff_params"]["sigma_min"] = 1e-4
    path = str(tmp_path / "chorales_like.ckpt")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    m = BABE.load(path, overrides=API_OVERRIDES)
    # training-group EDM adopted wholesale
    assert float(m.args.diff_params.sigma_data) == 0.15
    assert float(m.args.diff_params.sigma_min) == 1e-4
    # tester-side EDM preconditioning uses the trained sigma_data
    assert float(m._tester.edm.p.sigma_data) == 0.15
    # explicit user overrides still win over adopted values
    m2 = BABE.load(path, overrides=API_OVERRIDES
                   + ["tester.diff_params.sigma_data=0.05"])
    assert float(m2._tester.edm.p.sigma_data) == 0.05


def test_load_corrupt_checkpoint_raises(tmp_path):
    """A corrupt .ckpt must raise an actionable error, not silently fall
    back to the flagship default config (VERDICT r3 weak #6)."""
    bad = str(tmp_path / "corrupt.ckpt")
    with open(bad, "wb") as f:
        f.write(b"not a pickle at all")
    with pytest.raises(ValueError, match="not a readable"):
        BABE.load(bad)
    with pytest.raises(FileNotFoundError):
        BABE.load(str(tmp_path / "missing.ckpt"))


def test_tester_cache_is_bounded(model):
    """The per-audio-len tester cache is LRU-bounded; the native-length
    tester is pinned (VERDICT r3 #8)."""
    native = int(model.args.exp.audio_len)
    for L in (native + 256, native + 512, native + 768, native + 1024):
        model._tester_at(L)
    assert len(model._testers) <= model._testers_maxsize
    assert native in model._testers  # pinned
    # most-recently-used survives, oldest non-native evicted
    assert native + 1024 in model._testers
    assert native + 256 not in model._testers


def test_generate_default_and_custom_length(model):
    out = model.generate(n=2, seed=0)
    assert out.shape == (2, LEN)
    assert np.isfinite(out).all() and float(np.abs(out).max()) > 0
    # custom length: rebuilds the CQT frame, reuses the weights; n=8 is
    # divisible by the test mesh's 8 virtual devices, so this also takes
    # the sharded-generation branch (out_shardings over the eval mesh)
    out2 = model.generate(seconds=2 * LEN / FS, n=8, seed=0)
    assert out2.shape == (8, 2 * LEN)
    assert np.isfinite(out2).all()


def test_enhance_blind_short(model):
    rng = np.random.default_rng(0)
    t = np.arange(3000) / FS
    x = (0.05 * np.sin(2 * np.pi * 440 * t)).astype(np.float32) \
        + 0.01 * rng.standard_normal(3000).astype(np.float32)
    out, info = model.enhance(x, FS, seed=1)
    assert out.shape == (1, 3000)
    assert np.isfinite(out).all()
    assert info["fs"] == FS
    assert info["fc"].shape == (1,) and info["A"].shape == (1,)
    assert 20.0 < float(info["fc"][0]) < FS / 2


def test_enhance_informed_and_estimate(model):
    rng = np.random.default_rng(1)
    x = 0.05 * rng.standard_normal(LEN).astype(np.float32)
    out, info = model.enhance(x, FS, filter=(800.0, -30.0), seed=2)
    assert out.shape == (1, LEN)
    assert np.isfinite(out).all()
    assert float(info["fc"][0]) == 800.0 and float(info["A"][0]) == -30.0

    fc, A = model.estimate_filter(x, FS, seed=3)
    assert fc.shape == (1,) and A.shape == (1,)


def test_enhance_long_ar_path(model):
    rng = np.random.default_rng(2)
    L = 10000  # > audio_len: exercises the AR chunk loop
    x = 0.05 * rng.standard_normal(L).astype(np.float32)
    out, info = model.enhance(x, FS, filter=(600.0, -25.0), seed=4)
    assert out.shape == (1, L)
    assert np.isfinite(out).all()


def test_enhance_with_denoiser_chain(ckpt, tmp_path):
    """denoise=True routes through the STFT denoiser before BWE
    (reference denoise_and_bwe_tester.py:248-413 chain, via the API)."""
    from babe_tpu.models.denoiser import MultiStageDenoiser

    den = MultiStageDenoiser(depth=2, num_tfc=2, num_stages=2,
                             use_fencoding=True, use_SAM=True, f_dim=65,
                             fs=FS, stft_win_size=128, stft_hop_size=32,
                             segment_seconds=0.2)
    dv = den.init(jax.random.PRNGKey(1))
    dpath = str(tmp_path / "den.ckpt")
    with open(dpath, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, dv["params"])}, f)
    m = BABE.load(ckpt, overrides=API_OVERRIDES + [
        "tester.denoiser.depth=2", "tester.denoiser.num_tfc=2",
        "tester.denoiser.num_stages=2", "tester.denoiser.f_dim=65",
        "tester.denoiser.stft_win_size=128", "tester.denoiser.stft_hop_size=32",
        "tester.denoiser.segment_size=0.2",
        f"tester.denoiser.sample_rate_denoiser={FS}",
    ], denoiser_checkpoint=dpath)
    rng = np.random.default_rng(4)
    x = 0.05 * rng.standard_normal(3000).astype(np.float32)
    out, info = m.enhance(x, FS, filter=(700.0, -25.0), denoise=True, seed=6)
    assert out.shape == (1, 3000)
    assert np.isfinite(out).all()


def test_denoise_without_denoiser_raises(model):
    x = np.zeros(1000, np.float32)
    with pytest.raises(ValueError):
        model.enhance(x, FS, denoise=True)


def test_enhance_resamples_input(model):
    rng = np.random.default_rng(3)
    x = 0.05 * rng.standard_normal(2000).astype(np.float32)
    out, info = model.enhance(x, 44100, filter=(500.0, -20.0), seed=5)
    # 44.1k input is resampled to the model's 22.05k
    assert out.shape[-1] == 1000
    assert info["fs"] == FS


def test_load_precision_int8(ckpt, monkeypatch):
    """precision='int8' engages the quantized conv path (env-based, read by
    the dispatch at trace time) and enhance() still runs end to end; an
    unknown precision raises before any env mutation."""
    monkeypatch.delenv("BABE_PRECISION", raising=False)
    monkeypatch.delenv("BABE_INT8_BWD", raising=False)
    with pytest.raises(ValueError):
        BABE.load(ckpt, overrides=API_OVERRIDES, precision="fp4")
    assert "BABE_PRECISION" not in os.environ
    # engage at the tiny channel counts too
    monkeypatch.setenv("BABE_INT8_MINC", "16")
    m = BABE.load(ckpt, overrides=API_OVERRIDES, precision="int8")
    assert os.environ["BABE_PRECISION"] == "int8"
    assert os.environ["BABE_INT8_BWD"] == "1"
    # default None leaves the env untouched; explicit bf16 resets it
    BABE.load(ckpt, overrides=API_OVERRIDES)
    assert os.environ["BABE_PRECISION"] == "int8"
    BABE.load(ckpt, overrides=API_OVERRIDES, precision="bf16")
    assert os.environ["BABE_PRECISION"] == "bf16"
    assert "BABE_INT8_BWD" not in os.environ
    os.environ["BABE_PRECISION"] = "int8"
    os.environ["BABE_INT8_BWD"] = "1"
    rng = np.random.default_rng(0)
    x = 0.05 * rng.standard_normal(LEN).astype(np.float32)
    out, info = m.enhance(x, FS, seed=0)
    assert out.shape[-1] == LEN and np.isfinite(out).all()
    assert np.isfinite(info["fc"]).all()
