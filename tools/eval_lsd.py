#!/usr/bin/env python
"""One-command LSD evaluation for the checkpoint north-star.

BASELINE.md's quality target is "match the PyTorch reference LSD within
0.1 dB on MAESTRO blind BWE" (evaluation config 3: zero-shot blind BWE at
1 kHz / 3 kHz cutoffs, the reference's `formal_test_bwe` protocol —
/root/reference/conf/tester/blind_bwe_formal_{1000,3000}.yaml, degradation
firwin order 500).  The reference computed LSD outside its repo; this tool
closes that gap:

  1. (generate) run our blind-BWE formal test over a directory of original
     wavs — the exact tester path (`Tester.formal_test_bwe(blind=True)`,
     OLA chunking, idempotent restart) — writing reconstructions to
     --out_dir, and
  2. (evaluate) for every item, compute LSD and high-band LSD (above the
     cutoff) of our reconstruction against the original, and — when
     --ref_dir points at a directory of reference-produced reconstructions
     of the same files — the per-item and mean LSD DELTAS ours-minus-
     reference.  |mean delta| <= 0.1 dB is the north-star.

Usage (real checkpoint, TPU or CPU):
  python tools/eval_lsd.py --audio_dir /path/originals --fc 1000 \
      --ckpt MAESTRO_22k_8s-850000.pt --out_dir /tmp/eval1000 \
      [--ref_dir /path/reference_outputs]

  --ckpt accepts a local .ckpt/.pt or a published name (HF auto-download
  via test.py's resolver when egress exists).  .pt checkpoints
  automatically select the checkpoint-compatible CQT frame
  (network=cqtdiff+_ckpt).

Smoke mode (--tiny, no checkpoint, CPU): random-init tiny model, short
segments — validates the whole pipeline end-to-end in ~2 min; the LSD
numbers are meaningless then (stated loudly).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_NET = [
    "network.Ns=[8,8,16]", "network.num_dils=[1,1,2]", "network.emb_dim=32",
    "network.attention_layers=[0,0,0,0]", "network.cqt.num_octs=3",
    "network.cqt.bins_per_oct=8", "exp.use_bf16=false",
]


def build_tester(fc: int, audio_dir: str, out_dir: str, ckpt: str | None,
                 tiny: bool, extra: list[str]):
    from babe_tpu.config import default_config
    from babe_tpu.registry import get_obj_by_name

    overrides = [
        f"tester=blind_bwe_formal_{fc}",
        f"tester.formal_test.path={audio_dir}",
        f"tester.formal_test.folder={out_dir}",
        f"model_dir={out_dir}",
    ]
    if ckpt is not None and ckpt.endswith(".pt"):
        # published torch weights were trained with the cqt_nsgt_pytorch
        # frame -> use the compat frame (reference: networks/cqtdiff+.py:620)
        overrides.append("network=cqtdiff+_ckpt")
    if tiny:
        overrides += TINY_NET + [
            "exp.audio_len=4096", "tester.T=4",
            "tester.blind_bwe.optimization.max_iter=4",
            "tester.blind_bwe.initial_conditions.fc=[300]",
            "tester.blind_bwe.initial_conditions.A=[-20]",
            "tester.blind_bwe.NFFT=512", "tester.formal_test.OLA=256",
        ]
    overrides += extra
    args = default_config(overrides)
    model_cls = get_obj_by_name(args.network.callable)
    model = model_cls.from_config(args)
    dp_cls = get_obj_by_name(
        args.diff_params.get("callable", "babe_tpu.diffusion.edm.EDM"))
    diff_params = dp_cls.from_config(args, cqt_hpf=model.apply_hpf_DC)
    tester_cls = get_obj_by_name(args.tester.callable)
    tester = tester_cls(args, model, diff_params, test_set=None)
    if ckpt is not None:
        from test import _resolve_checkpoint

        args.tester["checkpoint"] = ckpt
        tester.load_checkpoint(_resolve_checkpoint(args))
    else:
        import jax

        print("WARNING: no --ckpt given — random-init weights, the LSD "
              "numbers below are MEANINGLESS (pipeline smoke only)")
        tester.variables = tester.model.init(jax.random.PRNGKey(0), batch=1)
    return tester


def evaluate(audio_dir: str, out_dir: str, ref_dir: str | None, fc: int,
             fs: int) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from babe_tpu.data.wavio import read_wav, to_mono
    from babe_tpu.ops.resample import resample
    from babe_tpu.utils.metrics import lsd, lsd_high_band

    def load(path, n=None):
        d, f = read_wav(path)
        d = np.atleast_2d(to_mono(d)).astype(np.float32)
        if f != fs:
            d = np.asarray(resample(jnp.asarray(d), int(f), fs))
        return d[0] if n is None else d[0, :n]

    rows = []
    for opath in sorted(glob.glob(os.path.join(audio_dir, "*.wav"))):
        name = os.path.basename(opath)
        ours_path = os.path.join(out_dir, name)
        if not os.path.exists(ours_path):
            print(f"SKIP {name}: no generated output at {ours_path}")
            continue
        orig, ours = load(opath), load(ours_path)
        n = min(orig.shape[-1], ours.shape[-1])
        orig_j, ours_j = jnp.asarray(orig[:n][None]), jnp.asarray(ours[:n][None])
        row = {
            "item": name,
            "lsd_ours": float(lsd(orig_j, ours_j)[0]),
            "lsd_hb_ours": float(lsd_high_band(orig_j, ours_j, fs, fc)[0]),
        }
        if ref_dir is not None:
            rpath = os.path.join(ref_dir, name)
            if os.path.exists(rpath):
                ref = load(rpath, n)
                ref_j = jnp.asarray(ref[None])
                row["lsd_ref"] = float(lsd(orig_j[..., :ref.shape[-1]],
                                           ref_j)[0])
                row["lsd_hb_ref"] = float(
                    lsd_high_band(orig_j[..., :ref.shape[-1]], ref_j, fs, fc)[0])
                row["lsd_delta"] = row["lsd_ours"] - row["lsd_ref"]
                row["lsd_hb_delta"] = row["lsd_hb_ours"] - row["lsd_hb_ref"]
            else:
                print(f"note: no reference output for {name} in {ref_dir}")
        rows.append(row)
        print("  " + json.dumps(row))

    if not rows:
        raise SystemExit(f"no evaluable items (originals: {audio_dir}, "
                         f"outputs: {out_dir})")
    summary = {
        "fc": fc, "n_items": len(rows),
        "lsd_ours_mean": float(np.mean([r["lsd_ours"] for r in rows])),
        "lsd_hb_ours_mean": float(np.mean([r["lsd_hb_ours"] for r in rows])),
    }
    deltas = [r["lsd_delta"] for r in rows if "lsd_delta" in r]
    if deltas:
        summary["lsd_delta_mean"] = float(np.mean(deltas))
        summary["lsd_hb_delta_mean"] = float(
            np.mean([r["lsd_hb_delta"] for r in rows if "lsd_hb_delta" in r]))
        summary["north_star_pass"] = bool(abs(summary["lsd_delta_mean"]) <= 0.1)
    return {"summary": summary, "items": rows}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--audio_dir", required=True,
                    help="directory of original (full-band) wavs")
    ap.add_argument("--out_dir", required=True,
                    help="where our reconstructions are written/read")
    ap.add_argument("--ref_dir", default=None,
                    help="directory of reference-produced reconstructions "
                         "(same filenames); enables the delta report")
    ap.add_argument("--ckpt", default=None,
                    help=".ckpt/.pt path or published name "
                         "(e.g. MAESTRO_22k_8s-850000.pt)")
    ap.add_argument("--fc", type=int, nargs="+", default=[1000, 3000])
    ap.add_argument("--fs", type=int, default=22050,
                    help="evaluation sample rate for --skip_generate runs "
                         "(must match the rate the wavs were generated at; "
                         "ignored otherwise — the tester's fs is used)")
    ap.add_argument("--skip_generate", action="store_true",
                    help="only run the metric pass on existing out_dir")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model, CPU smoke of the pipeline")
    ap.add_argument("--override", nargs="*", default=[],
                    help="extra config dotted overrides")
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    results = {}
    for fc in args.fc:
        out_dir = (args.out_dir if len(args.fc) == 1
                   else os.path.join(args.out_dir, str(fc)))
        os.makedirs(out_dir, exist_ok=True)
        if not args.skip_generate:
            tester = build_tester(fc, args.audio_dir, out_dir, args.ckpt,
                                  args.tiny, args.override)
            tester.formal_test_bwe(blind=True)
            tester.close()
            fs = tester.fs
        else:
            fs = args.fs
        print(f"== fc={fc} ==")
        results[fc] = evaluate(args.audio_dir, out_dir, args.ref_dir, fc, fs)
        print("SUMMARY " + json.dumps(results[fc]["summary"]))

    report = os.path.join(args.out_dir, "lsd_report.json")
    with open(report, "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f, indent=1)
    print(f"report written to {report}")


if __name__ == "__main__":
    main()
