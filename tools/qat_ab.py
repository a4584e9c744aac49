"""QAT A/B: does quantization-aware training actually help int8 serving?

The claim under test (VERDICT r4 weak #7): ``BABE_PRECISION=int8`` during
training (quantized forward, exact straight-through backward) should
pre-adapt a model that will be SERVED on the int8 inference path.  This
tool provides the evidence either way:

  1. reuse (or train) the bf16 tiny checkpoint from tools/capability_e2e.py
     (``<workdir>/exp``),
  2. train an identically-configured, identically-seeded QAT twin under
     BABE_PRECISION=int8 (``<workdir>/exp_qat``),
  3. serve BOTH checkpoints on the int8 blind-BWE path (and the bf16 path
     as reference) over the capability probes,
  4. report per-item LSD / high-band LSD for the four (train x serve)
     combinations.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/qat_ab.py \
            [--workdir /tmp/babe_cap] [--its 1500] [--T 15]
Prints one JSON line; exit 0 always (this is a measurement, not a gate —
the conclusion goes to PROFILE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capability_e2e import TINY  # noqa: E402


def _train(repo, py, env, exp_dir, train_dir, its):
    subprocess.run(
        [py, "train.py", f"model_dir={exp_dir}", "dset=musicnet",
         f"dset.path={train_dir}", "exp.batch=4", f"exp.total_its={its}",
         "exp.lr=1e-3", "exp.lr_rampup_it=100",
         *TINY, "logging.log_interval=200", "logging.save_interval=100000",
         "tester.do_test=false"],
        cwd=repo, env=env, check=True)
    return os.path.join(exp_dir, f"22k_8s-{its}.ckpt")


def _serve(repo, py, env, workdir, tag, ckpt, test_dir, T):
    mdir = os.path.join(workdir, f"qat_{tag}")
    os.makedirs(mdir, exist_ok=True)
    metrics_path = os.path.join(mdir, "outputs", "metrics.jsonl")
    if os.path.exists(metrics_path):
        os.replace(metrics_path, metrics_path + ".prev")
    subprocess.run(
        [py, "test.py", "tester=blind_bwe", f"model_dir={mdir}",
         f"tester.checkpoint={ckpt}", "dset=musicnet",
         f"dset.test.path={test_dir}", "dset.test.num_samples=2",
         *TINY, f"tester.T={T}", "exp.seed=11",
         "tester.blind_bwe.test_filter.fc=[1000]",
         "tester.blind_bwe.test_filter.A=[-40]",
         "tester.blind_bwe.optimization.max_iter=20",
         "tester.blind_bwe.initial_conditions.fc=[500]",
         "tester.blind_bwe.initial_conditions.A=[-20]",
         "tester.blind_bwe.NFFT=1024",
         "tester.blind_bwe.sigma_norm=None"],
        cwd=repo, env=env, check=True)
    recs = [json.loads(l) for l in open(metrics_path)
            if json.loads(l).get("mode") == "blind_bwe"]
    return {
        "lsd": [round(r["lsd"], 4) for r in recs],
        "lsd_high_band": [round(r["lsd_high_band"], 4) for r in recs],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/babe_cap")
    ap.add_argument("--its", type=int, default=1500)
    ap.add_argument("--T", type=int, default=15)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py = sys.executable
    wd = args.workdir
    train_dir, test_dir = os.path.join(wd, "train"), os.path.join(wd, "test")
    base_env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")

    bf16_ckpt = os.path.join(wd, "exp", f"22k_8s-{args.its}.ckpt")
    if not os.path.exists(bf16_ckpt):
        assert os.path.isdir(train_dir), (
            f"no {train_dir}; run tools/capability_e2e.py --workdir {wd} "
            f"first (it also generates the probe data)")
        print("[qat_ab] training bf16 baseline ...", flush=True)
        bf16_ckpt = _train(repo, py, base_env, os.path.join(wd, "exp"),
                           train_dir, args.its)

    qat_ckpt = os.path.join(wd, "exp_qat", f"22k_8s-{args.its}.ckpt")
    if not os.path.exists(qat_ckpt):
        print("[qat_ab] training QAT twin (BABE_PRECISION=int8) ...",
              flush=True)
        qat_env = dict(base_env, BABE_PRECISION="int8", BABE_INT8_MINC="16",
                       BABE_INT8_SCALE="bound")
        qat_ckpt = _train(repo, py, qat_env, os.path.join(wd, "exp_qat"),
                          train_dir, args.its)

    int8_env = dict(base_env, BABE_PRECISION="int8", BABE_INT8_MINC="16",
                    BABE_INT8_SCALE="bound")
    bf16_env = dict(base_env, BABE_PRECISION="bf16")
    out = {
        "its": args.its, "T": args.T,
        "bf16train_int8serve": _serve(repo, py, int8_env, wd,
                                      "bf16train_int8serve", bf16_ckpt,
                                      test_dir, args.T),
        "qattrain_int8serve": _serve(repo, py, int8_env, wd,
                                     "qattrain_int8serve", qat_ckpt,
                                     test_dir, args.T),
        "bf16train_bf16serve": _serve(repo, py, bf16_env, wd,
                                      "bf16train_bf16serve", bf16_ckpt,
                                      test_dir, args.T),
        "qattrain_bf16serve": _serve(repo, py, bf16_env, wd,
                                     "qattrain_bf16serve", qat_ckpt,
                                     test_dir, args.T),
    }
    # the decision number: does QAT serve better than bf16-train under int8?
    d = (sum(out["qattrain_int8serve"]["lsd_high_band"])
         - sum(out["bf16train_int8serve"]["lsd_high_band"])) / 2.0
    out["qat_minus_bf16train_int8serve_hb_lsd_db"] = round(d, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
