"""Quality gate for the int8 conv path (BABE_PRECISION=int8).

The bar (VERDICT r3 next-#1): the quantized path must be measured against
the LSD target, not bitwise parity — (a) blind-BWE LSD delta vs the bf16
path < 0.05 dB on the formal protocol, (b) golden trajectory divergence
reported, (c) tools/capability_e2e.py still passing (run that separately).

Two modes:

* ``--mode traj`` (default): same-seed 35-step unconditional sampling at the
  flagship config, bf16 vs int8, identical keys — reports the waveform
  relative divergence and the LSD between the two outputs.  Runs on the
  real TPU (or CPU with --tiny).  CAUTION: at plain random init the
  AdaLN-zero gates (INIT_ZERO in blocks.py) suppress every block's
  contribution, so bf16 and int8 are bitwise-identical and the measurement
  is vacuous — pass ``--ckpt`` to load trained weights (pickle .ckpt, uses
  the EMA params) or ``--degate S`` to open all zero-init gate kernels with
  N(0, S^2) values so quantization error actually propagates at flagship
  scale.

* ``--mode lsd --workdir /tmp/babe_cap``: reuses tools/capability_e2e.py's
  TRAINED tiny checkpoint and probe set; runs the blind-BWE tester twice
  (bf16 then int8 with a min-C that engages on the tiny channel counts) and
  reports per-item LSD / high-band-LSD deltas int8-minus-bf16.  Gate:
  |mean delta| < 0.05 dB.

Prints one JSON line; exit 0 iff the gate passes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _degate(variables, sigma: float):
    """Replace every zero-init gate kernel with N(0, sigma^2) values so each
    block contributes to the output (INIT_ZERO gates make random-init models
    vacuously quantization-insensitive)."""
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    key = jax.random.PRNGKey(123)
    out = []
    for path, leaf in flat:
        names = [getattr(p, "key", "") for p in path]
        if any(str(n).startswith("gate") for n in names) and leaf.ndim == 2:
            key, sub = jax.random.split(key)
            leaf = sigma * jax.random.normal(sub, leaf.shape, jnp.float32)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def run_traj(tiny: bool, ckpt: str | None = None,
             degate: float = 0.0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from babe_tpu.config import default_config
    from babe_tpu.diffusion.edm import EDM, EDMParams
    from babe_tpu.models.cqtdiff import CQTDiffPlus

    if tiny:
        overrides = [
            "exp.audio_len=8192", "network.Ns=[16,16,32]",
            "network.num_dils=[1,2,2]", "network.emb_dim=64",
            "network.attention_layers=[0,0,0,0]", "network.cqt.num_octs=3",
            "network.cqt.bins_per_oct=16", "exp.use_bf16=false",
        ]
        audio_len, batch, T = 8192, 2, 8
    else:
        overrides = []
        audio_len, batch, T = 110250, 4, 35
    args = default_config(overrides)
    args.exp["audio_len"] = audio_len
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    if ckpt:
        import pickle

        payload = pickle.load(open(ckpt, "rb"))
        params = payload.get("ema") or payload["params"]
        variables = dict(variables, params=jax.tree.map(jnp.asarray, params))
    elif degate > 0.0:
        variables = _degate(variables, degate)
    edm = EDM(EDMParams(sigma_data=0.063, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=13, Schurn=20))
    from babe_tpu.sampling.heun import Sampler, SamplerConfig

    cfg = SamplerConfig(T=T, order=2, xi=0.0, audio_len=audio_len,
                        filter_out_cqt_DC_Nyq=True)
    key = jax.random.PRNGKey(7)

    outs = {}
    for prec in ("bf16", "int8"):
        os.environ["BABE_PRECISION"] = prec
        if tiny:
            os.environ["BABE_INT8_MINC"] = "16"
        sampler = Sampler(model.fused_denoiser(variables, edm), edm, cfg,
                          hpf=None)
        run = jax.jit(lambda k: sampler.predict_unconditional(
            k, (batch, audio_len)))
        outs[prec] = np.asarray(run(key), np.float32)
    os.environ["BABE_PRECISION"] = "bf16"

    a, b = outs["bf16"], outs["int8"]
    rel = float(np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-12))
    from babe_tpu.utils.metrics import lsd as lsd_fn

    lsd_between = float(np.mean(np.asarray(lsd_fn(jnp.asarray(a),
                                                  jnp.asarray(b)))))
    return {"mode": "traj", "tiny": tiny, "T": T, "batch": batch,
            "weights": ("ckpt" if ckpt else
                        f"degate={degate}" if degate else "random-init"),
            "waveform_rel_divergence": round(rel, 6),
            "lsd_between_paths_db": round(lsd_between, 4)}


def run_lsd(workdir: str, T: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp_dir = os.path.join(workdir, "exp")
    test_dir = os.path.join(workdir, "test")
    ckpts = sorted(
        (f for f in os.listdir(exp_dir) if f.endswith(".ckpt")),
        key=lambda f: int(f.split("-")[-1].split(".")[0]))
    assert ckpts, f"no trained checkpoint under {exp_dir} — run " \
                  f"tools/capability_e2e.py --workdir {workdir} first"
    ckpt = os.path.join(exp_dir, ckpts[-1])

    TINY = [
        "exp.audio_len=8192", "exp.resample_factor=1", "exp.use_bf16=false",
        "network.Ns=[16,16,32]", "network.num_dils=[1,2,2]",
        "network.emb_dim=64", "network.attention_layers=[0,0,0,0]",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=16",
    ]
    results = {}
    for prec in ("bf16", "int8"):
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   BABE_PRECISION=prec, BABE_INT8_MINC="16")
        mdir = os.path.join(workdir, f"q_{prec}")
        os.makedirs(mdir, exist_ok=True)
        metrics_path = os.path.join(mdir, "outputs", "metrics.jsonl")
        if os.path.exists(metrics_path):
            os.replace(metrics_path, metrics_path + ".prev")
        subprocess.run(
            [sys.executable, "test.py", "tester=blind_bwe",
             f"model_dir={mdir}", f"tester.checkpoint={ckpt}",
             "dset=musicnet", f"dset.test.path={test_dir}",
             "dset.test.num_samples=2", *TINY, f"tester.T={T}",
             "exp.seed=11",
             "tester.blind_bwe.test_filter.fc=[1000]",
             "tester.blind_bwe.test_filter.A=[-40]",
             "tester.blind_bwe.optimization.max_iter=20",
             "tester.blind_bwe.initial_conditions.fc=[500]",
             "tester.blind_bwe.initial_conditions.A=[-20]",
             "tester.blind_bwe.NFFT=1024",
             "tester.blind_bwe.sigma_norm=None"],
            cwd=repo, env=env, check=True)
        recs = [json.loads(l) for l in open(metrics_path)]
        results[prec] = [r for r in recs if r.get("mode") == "blind_bwe"]

    import numpy as np

    d_lsd = [i8["lsd"] - bf["lsd"]
             for bf, i8 in zip(results["bf16"], results["int8"])]
    d_hb = [i8["lsd_high_band"] - bf["lsd_high_band"]
            for bf, i8 in zip(results["bf16"], results["int8"])]
    out = {
        "mode": "lsd", "items": len(d_lsd), "T": T,
        "lsd_bf16": [round(r["lsd"], 4) for r in results["bf16"]],
        "lsd_int8": [round(r["lsd"], 4) for r in results["int8"]],
        "lsd_delta_mean": round(float(np.mean(d_lsd)), 4),
        "lsd_hb_delta_mean": round(float(np.mean(d_hb)), 4),
        "gate_pass": bool(abs(np.mean(d_lsd)) < 0.05),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["traj", "lsd"], default="traj")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--workdir", default="/tmp/babe_cap")
    ap.add_argument("--T", type=int, default=15)
    ap.add_argument("--ckpt", default=None,
                    help="trained pickle .ckpt for traj mode (EMA params)")
    ap.add_argument("--degate", type=float, default=0.0,
                    help="open INIT_ZERO gates with N(0, s^2) for traj mode")
    args = ap.parse_args()
    if args.mode == "traj":
        if args.tiny:
            os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
            os.environ.setdefault("JAX_PLATFORMS", "cpu")
        out = run_traj(args.tiny, ckpt=args.ckpt, degate=args.degate)
        print(json.dumps(out))
        sys.exit(0)
    out = run_lsd(args.workdir, args.T)
    print(json.dumps(out))
    sys.exit(0 if out["gate_pass"] else 1)


if __name__ == "__main__":
    main()
