#!/usr/bin/env python
"""Training entry point (reference: train.py:13-66, Hydra-style CLI).

Usage:
    python train.py dset=maestro_allyears network=cqtdiff+ exp=maestro22k_8s \
        diff_params=edm logging=base_logging exp.batch=4 model_dir=experiments/run1
"""

from __future__ import annotations

import os
import sys


def _main(args):
    import jax

    from babe_tpu.data.datasets import setup_dataset
    from babe_tpu.models.cqtdiff import CQTDiffPlus  # noqa: F401 (registry)
    from babe_tpu.parallel.mesh import mesh_for_batch
    from babe_tpu.registry import get_obj_by_name
    from babe_tpu.training.trainer import Trainer

    dirname = str(args.model_dir)
    os.makedirs(dirname, exist_ok=True)
    args.exp["model_dir"] = dirname

    dset = setup_dataset(args)
    model_cls = get_obj_by_name(args.network.callable)
    # the guided-sampler cotangent layout pin costs the weight-gradient
    # train step ~47% — default it off for training (explicit
    # network.layout_pin / BABE_LAYOUT_PIN still win; blocks._pin_spec)
    if "layout_pin" not in args.network:
        args.network["layout_pin"] = "off"
    model = model_cls.from_config(args)
    # resolve the diff-params family from config (EDM / EDMEps / EDMPD —
    # reference wires it through dnnlib the same way, utils/setup.py:47-51)
    dp_cls = get_obj_by_name(args.diff_params.get("callable",
                                                  "babe_tpu.diffusion.edm.EDM"))
    diff_params = dp_cls.from_config(args, cqt_hpf=model.apply_hpf_DC)

    # progressive distillation: load frozen teacher weights when configured
    # (drives EDMPD.loss_fn_PD through the trainer's teacher plumbing)
    teacher = None
    teacher_ckpt = args.get_path("diff_params.PD.teacher_checkpoint", None)
    if teacher_ckpt not in (None, "None", ""):
        import pickle

        import jax.numpy as jnp

        with open(str(teacher_ckpt), "rb") as f:
            payload = pickle.load(f)
        teacher = {
            "params": jax.tree.map(jnp.asarray,
                                   payload.get("ema", payload["params"])),
            "buffers": jax.tree.map(jnp.asarray, payload.get("buffers", {})),
        }
        print(f"loaded PD teacher from {teacher_ckpt}")

    tester = None
    if args.get_path("tester.do_test", False):
        from babe_tpu.data.datasets import setup_dataset_test
        from babe_tpu.testers.tester import Tester

        test_set = None
        if args.get_path("dset.test.callable", None):
            test_set = setup_dataset_test(args)
        tester = Tester(args, model, diff_params, test_set=test_set)

    n_batch = int(args.exp.batch)
    # hard error (never a silent 1-device fallback) when the batch cannot
    # be sharded over the visible devices — see mesh_for_batch
    mesh = mesh_for_batch(n_batch)
    print(f"training on {mesh.devices.size} device(s), batch {n_batch}")
    trainer = Trainer(args, dset, model, diff_params, tester=tester, mesh=mesh,
                      teacher=teacher)
    print(f"total params: {trainer.total_params/1e6:.2f} M")
    total_its = args.exp.get("total_its", None)  # None = run forever (reference)
    trainer.training_loop(max_its=None if total_its in (None, "None") else int(total_its))
    if bool(args.get_path("logging.save_model", True)):
        print("saved final checkpoint:", trainer.save_checkpoint())


def main():
    from babe_tpu.config import default_config

    args = default_config(sys.argv[1:])
    _main(args)


if __name__ == "__main__":
    main()
