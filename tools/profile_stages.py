"""Stage-level timing of CQTDiffPlusNet: encoder / bottleneck / decoder split.

Subclasses the net with an early-exit `stop` flag (trace-time static); apply
uses the full parameter tree (flax tolerates unused params).  Each staged
forward is folded into an audio->audio function so the scan-amortized harness
can carry it.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/babe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

import flax.linen as nn  # noqa: E402

from __graft_entry__ import _flagship_args  # noqa: E402
from babe_tpu.models.cqtdiff import CQTDiffPlus, CQTDiffPlusNet  # noqa: E402
from babe_tpu.models.blocks import (  # noqa: E402
    SQRT2, AddFreqEncodingRFF, Conv2d, ResnetBlock, RFF_MLP_Block,
    resample_time,
)

B, L = 8, 110250


class StagedNet(CQTDiffPlusNet):
    stop: str = "full"  # 'emb' | 'enc' | 'enc_nopyr' | 'mid' | 'dec_noheads' | 'full'

    @nn.compact
    def __call__(self, coeffs, sigma):
        n, bpo = self.num_octs, self.bins_per_oct
        sigma_emb = RFF_MLP_Block(emb_dim=self.emb_dim, name="embedding")(sigma)
        sigma_emb = sigma_emb.astype(self.compute_dtype)
        if self.stop == "emb":
            return jnp.sum(sigma_emb)

        def as_real(c):
            return jnp.stack([c.real, c.imag], axis=-1).astype(self.compute_dtype)

        use_pyr = self.stop != "enc_nopyr"
        hs = []
        X = None
        pyr = None
        for i in range(n):
            C = as_real(coeffs[n - 1 - i])
            dim_in = self.Ns[i - 1] if i > 0 else self.Ns[i]
            dim_out = self.Ns[i]
            C2 = ResnetBlock(C.shape[-1], dim_in, self.use_norm, num_dils=1,
                             kernel_size=(1, 1), emb_dim=self.emb_dim,
                             name=f"downs_{i}_0")(C, sigma_emb)
            if i == 0:
                X = C2
                pyr = resample_time(C, up=False) if use_pyr else None
            elif i < n - 1:
                if use_pyr:
                    pyr = jnp.concatenate(
                        [resample_time(C, up=False), resample_time(pyr, up=False)], 1
                    )
                X = jnp.concatenate([C2, X], axis=1)
            else:
                if use_pyr:
                    pyr = jnp.concatenate([C, pyr], axis=1)
                X = jnp.concatenate([C2, X], axis=1)
            X = ResnetBlock(dim_in, dim_out, self.use_norm,
                            num_dils=self.num_dils[i], emb_dim=self.emb_dim,
                            Fdim=(i + 1) * bpo, name=f"downs_{i}_2")(X, sigma_emb)
            hs.append(X)
            if i < n - 1:
                X = resample_time(X, up=False)
            if use_pyr:
                pyr_proj = Conv2d(dim_out, (5, 3), name=f"downs_{i}_1")(pyr)
                X = (X + pyr_proj) / SQRT2

        if self.stop in ("enc", "enc_nopyr"):
            return jnp.sum(X.astype(jnp.float32))

        Xout = None
        for b in range(self.num_bottleneck_layers):
            X = ResnetBlock(self.Ns[-1], self.Ns[-1], self.use_norm,
                            num_dils=self.num_dils[-1], emb_dim=self.emb_dim,
                            Fdim=n * bpo, name=f"middle_{b}_1")(X, sigma_emb)
            Xout = ResnetBlock(self.Ns[-1], 2, self.use_norm, num_dils=1,
                               kernel_size=(1, 1), proj_place="after",
                               emb_dim=self.emb_dim, name=f"middle_{b}_0")(X, sigma_emb)
        if self.stop == "mid":
            return jnp.sum(X.astype(jnp.float32)) + jnp.sum(Xout.astype(jnp.float32))

        heads = self.stop != "dec_noheads"
        outs_sum = jnp.zeros((), jnp.float32)
        for pidx in range(n):
            j = n - 1 - pidx
            dim_in = self.Ns[0] * 2 if j == 0 else self.Ns[j] * 2
            dim_out = self.Ns[0] if j == 0 else self.Ns[j - 1]
            skip = hs.pop()
            X = jnp.concatenate([X, skip], axis=-1)
            X = ResnetBlock(dim_in, dim_out, self.use_norm,
                            num_dils=self.num_dils[j], emb_dim=self.emb_dim,
                            Fdim=(j + 1) * bpo, name=f"ups_{pidx}_1")(X, sigma_emb)
            if heads:
                out_head = ResnetBlock(dim_out, 2, self.use_norm, num_dils=1,
                                       kernel_size=(1, 1), proj_place="after",
                                       emb_dim=self.emb_dim,
                                       name=f"ups_{pidx}_0")(X, sigma_emb)
                Xout = (Xout + out_head) / SQRT2
                Out, Xout = Xout[:, :bpo], Xout[:, bpo:]
                outs_sum = outs_sum + jnp.sum(jnp.abs(Out).astype(jnp.float32))
            X = X[:, bpo:, :, :]
            if 0 < j:
                X = resample_time(X, up=True)
                if heads:
                    Xout = resample_time(Xout, up=True)
        return outs_sum + jnp.sum(X.astype(jnp.float32))


def timeit(jf, *a, n=4):
    np.asarray(jf(*a))
    w = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jf(*a))
        w.append(time.time() - t0)
    return min(w) * 1000


def main():
    FLOOR = timeit(jax.jit(lambda x: jnp.sum(x * 2)), jnp.zeros((8,)), n=8)
    args = _flagship_args(audio_len=L)
    model = CQTDiffPlus.from_config(args)
    variables = model.init(jax.random.PRNGKey(0), batch=1)
    cqt = model.cqt
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L), jnp.float32)
    cnoise = jnp.full((B, 1), -0.5)

    base = model.net
    for stop in ("emb", "enc_nopyr", "enc", "mid", "dec_noheads", "full"):
        net = StagedNet(
            num_octs=base.num_octs, bins_per_oct=base.bins_per_oct,
            emb_dim=base.emb_dim, Ns=base.Ns, num_dils=base.num_dils,
            use_norm=base.use_norm, use_fencoding=base.use_fencoding,
            attention_layers=base.attention_layers,
            attention_dict=base.attention_dict,
            num_bottleneck_layers=base.num_bottleneck_layers,
            compute_dtype=base.compute_dtype, stop=stop,
        )

        def staged(xx, net=net):
            coeffs = cqt.fwd(xx)
            s = net.apply(variables, coeffs, cnoise)
            return xx + 1e-30 * s

        def looped(xx):
            def body(c, _):
                return staged(c), None
            out, _ = jax.lax.scan(body, xx, None, length=8)
            return jnp.sum(out[:, :64])

        ms = (timeit(jax.jit(looped), x) - FLOOR) / 8
        print(f"stage {stop:12s}: {ms:8.2f} ms", flush=True)
    print(f"floor {FLOOR:.1f} ms")


if __name__ == "__main__":
    main()
