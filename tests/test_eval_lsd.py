"""tools/eval_lsd.py — the checkpoint-north-star evaluator (VERDICT r2 #3a):
generate blind-BWE reconstructions through the formal tester path and report
LSD / high-band LSD plus deltas against a reference-output directory."""

import json
import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    from babe_tpu.data.wavio import write_wav

    d = tmp_path_factory.mktemp("orig")
    rng = np.random.default_rng(0)
    t = np.arange(22050) / 22050.0
    for i in range(2):
        sig = 0.05 * np.sin(2 * np.pi * (300 + 200 * i) * t)
        sig += 0.01 * rng.standard_normal(t.shape[0])
        write_wav(str(d / f"s{i}.wav"), sig.astype(np.float32), 22050)
    return str(d)


def test_eval_lsd_generate_and_delta(audio_dir, tmp_path):
    import eval_lsd

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    tester = eval_lsd.build_tester(1000, audio_dir, out_dir, ckpt=None,
                                   tiny=True, extra=[])
    tester.formal_test_bwe(blind=True)
    tester.close()
    res = eval_lsd.evaluate(audio_dir, out_dir, None, 1000, tester.fs)
    assert res["summary"]["n_items"] == 2
    assert np.isfinite(res["summary"]["lsd_ours_mean"])
    assert np.isfinite(res["summary"]["lsd_hb_ours_mean"])

    # self-as-reference: deltas must be exactly 0 and the north-star passes
    ref_dir = str(tmp_path / "ref")
    shutil.copytree(out_dir, ref_dir)
    res2 = eval_lsd.evaluate(audio_dir, out_dir, ref_dir, 1000, tester.fs)
    assert res2["summary"]["lsd_delta_mean"] == 0.0
    assert res2["summary"]["north_star_pass"] is True
    json.dumps(res2)  # report must be serializable
