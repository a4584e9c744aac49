#!/usr/bin/env python
"""Inference entry point (reference: test.py:12-74).

Usage:
    python test.py tester=blind_bwe tester.checkpoint=<ckpt> \
        network=cqtdiff+ exp=maestro22k_8s dset=maestro_allyears

Checkpoints: local .ckpt (ours) or .pt (reference torch format, converted on
load).  If the checkpoint is missing and looks like a published BABE name it is
fetched from HuggingFace 'Eloimoliner/babe' (reference: test.py:48-56) — in a
zero-egress environment the download is skipped with a clear message.
"""

from __future__ import annotations

import os
import sys

HF_BASE = "https://huggingface.co/Eloimoliner/babe/resolve/main/"


def _resolve_checkpoint(args) -> str:
    ckpt = str(args.tester.checkpoint)
    if os.path.exists(ckpt):
        return ckpt
    cand = os.path.join(str(args.model_dir), ckpt)
    if os.path.exists(cand):
        return cand
    # attempt HF download (reference: test.py:48-56)
    url = HF_BASE + os.path.basename(ckpt)
    target = cand
    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    try:
        import urllib.request

        print(f"downloading {url}")
        urllib.request.urlretrieve(url, target)
        return target
    except Exception as e:
        raise FileNotFoundError(
            f"checkpoint {ckpt!r} not found locally and download failed ({e}); "
            f"place the file under {args.model_dir}"
        ) from e


def _main(args):

    from babe_tpu.registry import get_obj_by_name

    dirname = str(args.model_dir)
    os.makedirs(dirname, exist_ok=True)

    # `exp.remat: true` in the exp configs is a *training*-memory knob
    # (checkpoint each ResnetBlock in the backward); at inference it would
    # make every guided vjp recompute all block internals per NFE.  Force it
    # off unless explicitly overridden on the CLI (mirrors the layout_pin
    # default in train.py:33-34).
    if not any(ov.startswith("exp.remat=") for ov in sys.argv[1:]):
        args.exp["remat"] = False
    model_cls = get_obj_by_name(args.network.callable)
    model = model_cls.from_config(args)
    dp_cls = get_obj_by_name(args.diff_params.get("callable",
                                                  "babe_tpu.diffusion.edm.EDM"))
    diff_params = dp_cls.from_config(args, cqt_hpf=model.apply_hpf_DC)

    test_set = None
    if args.get_path("dset.test.callable", None):
        from babe_tpu.data.datasets import setup_dataset_test

        try:
            test_set = setup_dataset_test(args)
        except (FileNotFoundError, AssertionError) as e:
            # modes operating on real recordings / directories don't need the
            # dataset test split; those that do will report it missing
            print(f"warning: test set unavailable ({e}); continuing without it")

    denoiser = None
    if args.get_path("tester.complete_recording.use_denoiser", False):
        from babe_tpu.models.denoiser import setup_denoiser

        denoiser = setup_denoiser(args)

    tester_cls = get_obj_by_name(args.tester.callable)
    tester = tester_cls(args, model, diff_params, test_set=test_set,
                        denoiser=denoiser)
    if not bool(args.tester.get("do_test", True)):
        print("tester.do_test is False, nothing to do")
        return
    ckpt = _resolve_checkpoint(args)
    tester.load_checkpoint(ckpt)
    tester.dodajob()


def main():
    from babe_tpu.config import default_config

    args = default_config(sys.argv[1:])
    _main(args)


if __name__ == "__main__":
    main()
