"""Progressive distillation: one drivable PD training step through the
trainer's teacher plumbing (reference diff_params/edm_PD.py:220-314 defines
the loss but the reference trainer never wires a teacher — this framework
completes the path)."""

import numpy as np
import jax
import jax.numpy as jnp

from babe_tpu.diffusion.edm_pd import EDMPD
from babe_tpu.models.cqtdiff import CQTDiffPlus
from babe_tpu.parallel.mesh import make_mesh
from babe_tpu.training.trainer import Trainer

from tests.test_training import make_args, LEN


def _with_pd(args):
    args.diff_params["PD"] = {"boundaries": {"T": 8}, "stage": 0}
    return args


def test_pd_distillation_step(tmp_path):
    args = _with_pd(make_args(tmp_path, batch=2))
    model = CQTDiffPlus.from_config(args)
    edm = EDMPD.from_config(args, cqt_hpf=model.apply_hpf_DC)

    teacher = model.init(jax.random.PRNGKey(7), batch=1)

    rng = np.random.default_rng(0)

    def dset():
        while True:
            yield rng.standard_normal((2, LEN)).astype(np.float32) * 0.1

    trainer = Trainer(args, dset(), model, edm, mesh=make_mesh(1),
                      teacher=teacher)
    p0 = jax.tree.leaves(trainer.state.params)[0].copy()
    for _ in range(3):  # lr ramp-up starts at 0 — step 1 has zero update
        m = trainer.train_step()
        assert np.isfinite(float(m["loss"]))
    p1 = jax.tree.leaves(trainer.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_pd_loss_dc_correction(tmp_path):
    """The DC-corrected PD error differs from the uncorrected one (the stub
    replaced in round 2) and stays finite."""
    args = _with_pd(make_args(tmp_path, batch=2))
    model = CQTDiffPlus.from_config(args)
    edm_dc = EDMPD.from_config(args, cqt_hpf=model.apply_hpf_DC)
    edm_plain = EDMPD.from_config(args, cqt_hpf=None)

    v = model.init(jax.random.PRNGKey(0), batch=1)
    net = lambda x, cn: model.apply(v, x, cn)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, LEN)), jnp.float32
    ) * 0.1
    key = jax.random.PRNGKey(3)
    e_dc, s_dc = edm_dc.loss_fn_PD(key, net, net, x, stage=0)
    e_pl, s_pl = edm_plain.loss_fn_PD(key, net, net, x, stage=0)
    assert np.allclose(np.asarray(s_dc), np.asarray(s_pl))
    assert np.isfinite(float(e_dc.mean())) and np.isfinite(float(e_pl.mean()))
    assert not np.allclose(np.asarray(e_dc), np.asarray(e_pl))


def test_pd_sample_runs():
    """Distilled few-step sampler produces finite audio."""
    from tests.test_training import make_args as _ma
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        args = _with_pd(_ma(td, batch=1))
        model = CQTDiffPlus.from_config(args)
        edm = EDMPD.from_config(args, cqt_hpf=None)
        v = model.init(jax.random.PRNGKey(0), batch=1)
        net = lambda x, cn: model.apply(v, x, cn)
        out = edm.PD_sample(jax.random.PRNGKey(1), 1, LEN, net, stage=0)
        assert out.shape == (1, LEN)
        assert bool(jnp.all(jnp.isfinite(out)))
