"""End-to-end capability proof with TRAINED weights: train a tiny CQTDiff+
on synthetic harmonic audio through the real CLI, then run zero-shot blind
BWE on lowpassed test signals and verify the reconstruction beats the
degraded input on (high-band) LSD.

This closes the loop the unit/parity tests can't: every per-component test
uses random weights; this drives data -> train.py -> checkpoint -> test.py
blind_bwe -> metrics.jsonl with a model that has actually learned the
distribution, proving the framework trains AND that the BABE sampler
(reference: testing/blind_bwe_sampler.py:619-769) extends bandwidth
zero-shot on it.

CPU-friendly (tiny model, audio_len 8192, ~10-25 min total).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/capability_e2e.py \
            [--its 1500] [--workdir /tmp/babe_cap]
Prints one JSON line with the LSD numbers; exit 0 iff high-band LSD improved
on every test item.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

FS = 22050
SEG = 8192
# published sigma_data (conf/diff_params/edm.yaml) — generate at matching RMS
SIGMA_DATA = 0.063

TINY = [
    "exp.audio_len=%d" % SEG,
    "exp.resample_factor=1",
    "exp.use_bf16=false",
    "network.Ns=[16,16,32]",
    "network.num_dils=[1,2,2]",
    "network.emb_dim=64",
    "network.attention_layers=[0,0,0,0]",
    "network.cqt.num_octs=3",
    "network.cqt.bins_per_oct=16",
]


def sawtooth(f0: float, n: int, rng: np.ndarray) -> np.ndarray:
    """Band-limited sawtooth: harmonics to Nyquist with 1/k rolloff —
    guaranteed energy in every octave, so BWE has structure to recover."""
    t = np.arange(n) / FS
    x = np.zeros(n)
    k = 1
    while k * f0 < FS / 2 - 50:
        x += np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
        k += 1
    x = x / np.std(x) * SIGMA_DATA
    return x.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--its", type=int, default=1500)
    ap.add_argument("--workdir", default="/tmp/babe_cap")
    ap.add_argument("--T", type=int, default=15, help="sampler steps")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from babe_tpu.data.wavio import write_wav

    wd = args.workdir
    train_dir, test_dir, exp_dir = (os.path.join(wd, d) for d in
                                    ("train", "test", "exp"))
    for d in (train_dir, test_dir, exp_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    # narrow f0 family so the tiny model can overfit the distribution
    f0s = [110.0, 146.8, 220.0]
    for i in range(12):
        write_wav(os.path.join(train_dir, f"t{i}.wav"),
                  sawtooth(f0s[i % len(f0s)], 2 * FS, rng), FS)
    for i, f0 in enumerate(f0s[:2]):
        write_wav(os.path.join(test_dir, f"probe{i}.wav"),
                  sawtooth(f0, 2 * FS, rng), FS)

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    py = sys.executable

    print(f"[capability_e2e] training {args.its} its ...", flush=True)
    subprocess.run(
        [py, "train.py", f"model_dir={exp_dir}", "dset=musicnet",
         f"dset.path={train_dir}", "exp.batch=4", f"exp.total_its={args.its}",
         # demo-scale LR schedule: the published lr 2e-4 / rampup 10k its
         # would leave a 1.5k-it run at ~15% LR the whole time
         "exp.lr=1e-3", "exp.lr_rampup_it=100",
         *TINY, "logging.log_interval=200", "logging.save_interval=100000",
         "tester.do_test=false"],
        cwd=repo, env=env, check=True)

    ckpt = os.path.join(exp_dir, f"22k_8s-{args.its}.ckpt")
    assert os.path.exists(ckpt), f"missing final checkpoint {ckpt}"

    print("[capability_e2e] blind BWE on lowpassed probes ...", flush=True)
    # MetricsLogger appends; rotate any pre-existing metrics.jsonl so the
    # pass/fail gate below only ever judges records from THIS run (a reused
    # --workdir would otherwise mix in stale entries).
    metrics_path = os.path.join(exp_dir, "outputs", "metrics.jsonl")
    if os.path.exists(metrics_path):
        os.replace(metrics_path, metrics_path + ".prev")
    subprocess.run(
        [py, "test.py", "tester=blind_bwe", f"model_dir={exp_dir}",
         f"tester.checkpoint={ckpt}", "dset=musicnet",
         f"dset.test.path={test_dir}", "dset.test.num_samples=2",
         *TINY, f"tester.T={args.T}",
         # degrade at 1 kHz — well inside the 3-octave band
         "tester.blind_bwe.test_filter.fc=[1000]",
         "tester.blind_bwe.test_filter.A=[-40]",
         "tester.blind_bwe.optimization.max_iter=20",
         "tester.blind_bwe.initial_conditions.fc=[500]",
         "tester.blind_bwe.initial_conditions.A=[-20]",
         "tester.blind_bwe.NFFT=1024",
         "tester.blind_bwe.sigma_norm=None"],
        cwd=repo, env=env, check=True)

    recs = [json.loads(l) for l in open(os.path.join(exp_dir, "outputs", "metrics.jsonl"))]
    recs = [r for r in recs if r.get("mode") == "blind_bwe"]
    assert recs, "no blind_bwe metrics logged"
    out = {
        "items": len(recs),
        "lsd_high_band_degraded": [round(r["lsd_high_band_degraded"], 3) for r in recs],
        "lsd_high_band_reconstructed": [round(r["lsd_high_band"], 3) for r in recs],
        "lsd_degraded": [round(r["lsd_degraded"], 3) for r in recs],
        "lsd_reconstructed": [round(r["lsd"], 3) for r in recs],
        "improved_all": all(r["lsd_high_band"] < r["lsd_high_band_degraded"]
                            for r in recs),
    }
    print(json.dumps(out))
    sys.exit(0 if out["improved_all"] else 1)


if __name__ == "__main__":
    main()
