"""Factory layer — API parity with the reference's utils/setup.py:10-96.

Each factory resolves the configured callable through the registry (which also
maps the reference's module paths onto this framework) and returns the built
component.
"""

from __future__ import annotations

from babe_tpu.registry import get_obj_by_name


def setup_dataset(args):
    """(reference: utils/setup.py:10-34)"""
    from babe_tpu.data.datasets import setup_dataset as _f

    return _f(args)


def setup_dataset_test(args):
    """(reference: utils/setup.py:36-45)"""
    from babe_tpu.data.datasets import setup_dataset_test as _f

    return _f(args)


def setup_diff_parameters(args, cqt_hpf=None):
    """(reference: utils/setup.py:47-51)"""
    cls = get_obj_by_name(args.diff_params.callable)
    return cls.from_config(args, cqt_hpf=cqt_hpf)


def setup_network(args, compute_dtype=None):
    """(reference: utils/setup.py:53-59)"""
    cls = get_obj_by_name(args.network.callable)
    return cls.from_config(args, compute_dtype=compute_dtype)


def setup_denoiser(args):
    """(reference: utils/setup.py:61-68)"""
    from babe_tpu.models.denoiser import setup_denoiser as _f

    return _f(args)


def setup_optimizer(args):
    """Adam only, like the reference (utils/setup.py:70-73)."""
    from babe_tpu.training.trainer import make_optimizer

    assert str(args.exp.get_path("optimizer.type", "adam")) == "adam", \
        "only adam implemented (reference parity)"
    return make_optimizer(args.exp)


def setup_tester(args, model, diff_params, test_set=None, denoiser=None):
    """(reference: utils/setup.py:75-86)"""
    cls = get_obj_by_name(args.tester.callable)
    return cls(args, model, diff_params, test_set=test_set, denoiser=denoiser)


def setup_trainer(args, dset, model, diff_params, tester=None, mesh=None):
    """(reference: utils/setup.py:88-96)"""
    cls = get_obj_by_name(args.exp.get("trainer_callable",
                                       "babe_tpu.training.trainer.Trainer"))
    return cls(args, dset, model, diff_params, tester=tester, mesh=mesh)
