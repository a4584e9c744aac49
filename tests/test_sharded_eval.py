"""Sharded evaluation: test-item / OLA-chunk batches partitioned across the
8-device CPU mesh (SURVEY.md §2.10 inference mapping; conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from babe_tpu.diffusion.edm import EDM, EDMParams
from babe_tpu.models.cqtdiff import CQTDiffPlus
from babe_tpu.parallel.mesh import batch_sharding, make_mesh
from babe_tpu.sampling.blind import BlindConfig, BlindSampler
from babe_tpu.sampling.heun import SamplerConfig

LEN = 4096
N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs the 8-device CPU mesh")
    model = CQTDiffPlus(
        num_octs=3, bins_per_oct=8, fs=22050.0, audio_len=LEN,
        emb_dim=32, Ns=(8, 8, 16), num_dils=(1, 1, 2),
        attention_layers=(0, 0, 0, 0),
    )
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    edm = EDM(EDMParams(sigma_data=0.2, sigma_min=1e-4, sigma_max=1.0,
                        ro=8, ro_train=8, Schurn=5))
    cfg = SamplerConfig(T=3, order=2, xi=0.25, audio_len=LEN,
                        filter_out_cqt_DC_Nyq=True,
                        norm_fn=lambda y, d: jnp.sum((y - d) ** 2))
    sampler = BlindSampler(model.fused_denoiser(variables, edm), edm, cfg,
                           BlindConfig(), hpf=None)
    return make_mesh(N_DEV), sampler


def test_predict_bwe_partitions_across_mesh(setup):
    """predict_bwe with a batch-sharded observation runs partitioned: the
    output stays distributed over all 8 devices and is finite."""
    mesh, sampler = setup
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((N_DEV, LEN)), jnp.float32) * 0.1
    y = jax.device_put(y, batch_sharding(mesh))
    filt = jnp.asarray([[1000.0], [-20.0]], jnp.float32)
    run = jax.jit(lambda k, yy: sampler.predict_bwe(k, yy, filt, "fc_A"))
    out = run(jax.random.PRNGKey(1), y)
    assert out.shape == (N_DEV, LEN)
    assert len(out.sharding.device_set) == N_DEV
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unconditional_out_sharding(setup):
    """Unconditional generation data-parallel via out_shardings."""
    mesh, sampler = setup
    run = jax.jit(
        lambda k: sampler.predict_unconditional(k, (N_DEV, LEN)),
        out_shardings=batch_sharding(mesh),
    )
    out = run(jax.random.PRNGKey(2))
    assert len(out.sharding.device_set) == N_DEV
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sharded_matches_single_device(setup):
    """Partitioning must not change the math: same key, same result
    (up to float reassociation) as the unsharded run."""
    mesh, sampler = setup
    rng = np.random.default_rng(3)
    y_host = jnp.asarray(rng.standard_normal((N_DEV, LEN)), jnp.float32) * 0.1
    filt = jnp.asarray([[1000.0], [-20.0]], jnp.float32)
    fn = lambda k, yy: sampler.predict_bwe(k, yy, filt, "fc_A")
    out_single = jax.jit(fn)(jax.random.PRNGKey(4), y_host)
    out_shard = jax.jit(fn)(
        jax.random.PRNGKey(4), jax.device_put(y_host, batch_sharding(mesh))
    )
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_shard), rtol=2e-2, atol=2e-4
    )


def test_int8_sharded_bwe(setup, monkeypatch):
    """BABE_PRECISION=int8 under the 8-device mesh: the per-ITEM dynamic
    activation scales reduce over non-batch axes only, so the quantized
    convs partition cleanly along the batch sharding (no cross-device
    collectives forced by the amax) and the guided sampler stays finite."""
    mesh, sampler = setup
    monkeypatch.setenv("BABE_PRECISION", "int8")
    monkeypatch.setenv("BABE_INT8_MINC", "8")
    monkeypatch.setenv("BABE_INT8_BWD", "1")
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal((N_DEV, LEN)), jnp.float32) * 0.1
    y = jax.device_put(y, batch_sharding(mesh))
    filt = jnp.asarray([[1000.0], [-20.0]], jnp.float32)
    run = jax.jit(lambda k, yy: sampler.predict_bwe(k, yy, filt, "fc_A"))
    out = run(jax.random.PRNGKey(2), y)
    assert out.shape == (N_DEV, LEN)
    assert len(out.sharding.device_set) == N_DEV
    assert bool(jnp.all(jnp.isfinite(out)))
