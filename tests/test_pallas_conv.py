"""Pallas dilated-conv kernel: interpret-mode correctness vs lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from babe_tpu.ops.pallas_conv import dilated_conv_nhwc, _conv_ref


@pytest.mark.parametrize("df", [1, 2, 4])
def test_pallas_conv_matches_xla(df, rng):
    B, F, T, C, N = 2, 16, 64, 8, 8
    x = jnp.asarray(rng.standard_normal((B, F, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 3, C, N)).astype(np.float32) * 0.1)
    out = dilated_conv_nhwc(x, w, (df, 1), True)
    ref = _conv_ref(x, w, (df, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_conv_grads(rng):
    B, F, T, C, N = 1, 8, 32, 8, 8
    x = jnp.asarray(rng.standard_normal((B, F, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 3, C, N)).astype(np.float32) * 0.1)

    def loss_pallas(x, w):
        return jnp.sum(dilated_conv_nhwc(x, w, (2, 1), True) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_conv_ref(x, w, (2, 1)) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)
