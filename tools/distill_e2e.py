"""End-to-end progressive-distillation proof with TRAINED weights.

Drives the full PD pipeline through the real CLIs (the reference defines the
PD loss and sampler in diff_params/edm_PD.py:220-314 but never wires a
teacher into its trainer — this framework completes that path):

  1. train a tiny CQTDiff+ *teacher* on synthetic harmonic audio (train.py,
     diff_params=edm),
  2. distill a *student* initialised from the teacher with the PD
     double-step objective (train.py, diff_params=edm_PD,
     diff_params.PD.teacher_checkpoint=<teacher>),
  3. sample with the distilled student at HALF the ODE steps (PD_sample,
     stage 0 -> boundaries_T/2 steps) and check it tracks the teacher's
     full boundaries_T-step ODE reference.

Gates (both must hold; printed as one JSON line, exit 0 iff pass):
  * loss_gate: the PD objective on held-out batches drops by >= 2x from
    the undistilled (= teacher-initialised) student to the distilled one —
    distillation demonstrably learned the teacher's double-step map.
  * tracking_gate: mean MSE(student@T/2, teacher@T) < 0.1 * sigma_data^2
    (10 % of signal power) over eval keys — the distilled few-step sampler
    lands on the teacher's trajectory endpoint.

Why the gate is absolute rather than "student@T/2 beats teacher@T/2": on
this deliberately-overfittable toy the teacher's ODE is nearly step-count
invariant (measured teacher half-vs-full MSE: 9.0e-6 at T=4, 2.0e-5 at
T=8, 1.5e-5 at T=16 — there is no discretization error for distillation
to remove), while the student necessarily carries nonzero fitting error
(measured 1.3e-4 at T=8, ~3 % of signal power).  A teacher-relative
sampler win requires a distribution hard enough that coarse ODE steps
actually degrade — i.e. a real training run, out of scope for a CPU
smoke.  The loss gate IS teacher-relative and is the training objective.

CPU-friendly (tiny model, audio_len 8192, ~20-40 min total).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/distill_e2e.py \
            [--teacher_its 1500] [--distill_its 1000] [--boundaries_T 8] \
            [--workdir /tmp/babe_pd]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

FS = 22050
SEG = 8192

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capability_e2e import SIGMA_DATA, TINY, sawtooth  # noqa: E402


def _zero_arrays(tree):
    import jax

    return jax.tree.map(
        lambda x: np.zeros_like(x) if hasattr(x, "shape") else x, tree
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_its", type=int, default=1500)
    ap.add_argument("--distill_its", type=int, default=1000)
    ap.add_argument("--boundaries_T", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/babe_pd")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from babe_tpu.data.wavio import write_wav

    wd = args.workdir
    train_dir = os.path.join(wd, "train")
    teacher_dir = os.path.join(wd, "teacher")
    # the student is specific to the boundary schedule it distills against
    student_dir = os.path.join(wd, f"student_T{args.boundaries_T}")
    for d in (train_dir, teacher_dir, student_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    f0s = [110.0, 146.8, 220.0]
    for i in range(12):
        write_wav(os.path.join(train_dir, f"t{i}.wav"),
                  sawtooth(f0s[i % len(f0s)], 2 * FS, rng), FS)

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    py = sys.executable
    common = [
        "dset=musicnet", f"dset.path={train_dir}", "exp.batch=4",
        "exp.lr=1e-3", "exp.lr_rampup_it=100", *TINY,
        "logging.log_interval=200", "logging.save_interval=100000",
        "tester.do_test=false",
    ]

    teacher_ckpt = os.path.join(teacher_dir, f"22k_8s-{args.teacher_its}.ckpt")
    if not os.path.exists(teacher_ckpt):
        # fresh run: a cached checkpoint from a DIFFERENT --teacher_its would
        # otherwise be resumed past total_its and saved under the old name
        for stale in os.listdir(teacher_dir):
            os.remove(os.path.join(teacher_dir, stale))
        print(f"[distill_e2e] training teacher {args.teacher_its} its ...",
              flush=True)
        subprocess.run(
            [py, "train.py", f"model_dir={teacher_dir}",
             f"exp.total_its={args.teacher_its}", *common],
            cwd=repo, env=env, check=True)
    assert os.path.exists(teacher_ckpt), f"missing teacher {teacher_ckpt}"

    # student init = teacher EMA weights, fresh optimizer, it=0 (the
    # trainer's resume glob picks this up; PD convention: student starts
    # from the teacher)
    with open(teacher_ckpt, "rb") as f:
        tpay = pickle.load(f)
    student_init = {
        "it": 0,
        "params": tpay["ema"],
        "buffers": tpay["buffers"],
        "opt_state": _zero_arrays(tpay["opt_state"]),
        "ema": tpay["ema"],
        "args": tpay.get("args", {}),
    }
    init_path = os.path.join(student_dir, "22k_8s-0.ckpt")
    with open(init_path, "wb") as f:
        pickle.dump(student_init, f)

    student_ckpt = os.path.join(student_dir, f"22k_8s-{args.distill_its}.ckpt")
    if not os.path.exists(student_ckpt):
        # the resume glob takes the LARGEST iteration: drop any cached
        # student from a different --distill_its so distillation restarts
        # from the teacher-initialised -0 checkpoint
        for stale in os.listdir(student_dir):
            if stale != os.path.basename(init_path):
                os.remove(os.path.join(student_dir, stale))
        print(f"[distill_e2e] distilling student {args.distill_its} its ...",
              flush=True)
        subprocess.run(
            [py, "train.py", f"model_dir={student_dir}",
             f"exp.total_its={args.distill_its}", "exp.resume=true",
             "diff_params=edm_PD",
             f"diff_params.PD.teacher_checkpoint={teacher_ckpt}",
             f"diff_params.PD.boundaries.T={args.boundaries_T}",
             "diff_params.PD.stage=0", *common],
            cwd=repo, env=env, check=True)
    assert os.path.exists(student_ckpt), f"missing student {student_ckpt}"

    # ---------------------------------------------------------------- eval
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from babe_tpu.config import default_config
    from babe_tpu.diffusion.edm_pd import EDMPD
    from babe_tpu.models.cqtdiff import CQTDiffPlus

    cfg = default_config([f"model_dir={wd}", "diff_params=edm_PD",
                          f"diff_params.PD.boundaries.T={args.boundaries_T}",
                          *TINY])
    model = CQTDiffPlus.from_config(cfg)
    edm = EDMPD.from_config(cfg, cqt_hpf=model.apply_hpf_DC)

    def load_net(path):
        with open(path, "rb") as f:
            pay = pickle.load(f)
        variables = {
            "params": jax.tree.map(jnp.asarray, pay["ema"]),
            "buffers": jax.tree.map(jnp.asarray, pay["buffers"]),
        }
        return lambda x, cn: model.apply(variables, x, cn)

    teacher_net = load_net(teacher_ckpt)
    student_net = load_net(student_ckpt)

    # gate 1: PD objective on held-out batches, distilled vs undistilled
    # (undistilled student == teacher weights, by construction of the init)
    eval_rng = np.random.default_rng(7)
    batch = jnp.asarray(np.stack([
        sawtooth(f0s[i % len(f0s)], SEG, eval_rng) for i in range(4)
    ]))
    loss_fn = jax.jit(lambda net_p, key: jnp.mean(
        edm.loss_fn_PD(key, net_p, teacher_net, batch, 0)[0]),
        static_argnums=0)
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    loss_before = float(np.mean([loss_fn(teacher_net, k) for k in keys]))
    loss_after = float(np.mean([loss_fn(student_net, k) for k in keys]))
    pd_loss_ratio = loss_before / max(loss_after, 1e-12)

    # gate 2: distilled T/2-step sampler lands on the teacher's full-T-step
    # ODE endpoint (absolute tracking; see module docstring for why a
    # teacher-relative comparison is uninformative on this toy)
    full = jax.jit(lambda k: edm.PD_sample(k, 2, SEG, teacher_net, stage=-1))
    t_half = jax.jit(lambda k: edm.PD_sample(k, 2, SEG, teacher_net, stage=0))
    s_half = jax.jit(lambda k: edm.PD_sample(k, 2, SEG, student_net, stage=0))
    mse_t, mse_s = [], []
    for i in range(3):
        k = jax.random.PRNGKey(200 + i)
        ref = full(k)
        mse_t.append(float(jnp.mean((t_half(k) - ref) ** 2)))
        mse_s.append(float(jnp.mean((s_half(k) - ref) ** 2)))
    mse_teacher_half = float(np.mean(mse_t))
    mse_student_half = float(np.mean(mse_s))
    tracking_budget = 0.1 * SIGMA_DATA**2  # 10 % of signal power

    out = {
        "pd_loss_before": round(loss_before, 6),
        "pd_loss_after": round(loss_after, 6),
        "pd_loss_ratio": round(pd_loss_ratio, 2),
        "mse_teacher_halfsteps_vs_full": round(mse_teacher_half, 8),
        "mse_student_halfsteps_vs_full": round(mse_student_half, 8),
        "tracking_budget": round(tracking_budget, 8),
        "loss_gate": pd_loss_ratio >= 2.0,
        "tracking_gate": mse_student_half < tracking_budget,
    }
    print(json.dumps(out))
    sys.exit(0 if (out["loss_gate"] and out["tracking_gate"]) else 1)


if __name__ == "__main__":
    main()
