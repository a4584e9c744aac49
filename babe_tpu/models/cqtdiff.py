"""CQTDiff+ — the octave-banded CQT diffusion U-Net, TPU-native.

Re-implementation of the reference backbone ``Unet_CQT_oct_with_attention``
(networks/cqtdiff+.py:583-845) on top of the JAX NSGT-CQT (babe_tpu/ops/cqt.py):

  raw audio (B,T) --CQT--> per-octave complex coeffs --[encoder: per-octave
  init blocks, freq-dilated ResNet blocks, x2 time downsampling, auxiliary
  "pyramid" path of raw-CQT downsamples]--> bottleneck --[decoder with
  per-octave output heads accumulated into the output coefficient pytree]--
  --CQT^-1--> raw audio (B,T).

Layout is channels-last (B, F, T, C); the CQT octave list is a static pytree
(tuple) ordered lowest octave first, consumed highest-first exactly like the
reference (networks/cqtdiff+.py:743-753 consumes X_list[-1-i], writes
X_list_out[i] at :826-830).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from babe_tpu.models.blocks import (
    INV_SQRT2,
    AddFreqEncodingRFF,
    Conv2d,
    ResnetBlock as _ResnetBlock,
    RFF_MLP_Block,
    resample_time,
)

# jax.checkpoint-wrapped blocks for memory-bound training (see `remat` field).
# "full" stores only block boundaries; "save_convs" additionally saves every
# conv/matmul output inside the block (tagged "conv_out" in blocks.Conv2d) so
# the backward recomputes only the cheap elementwise chains, not the
# MXU-bound convolutions — more memory, faster step.
_ResnetBlockRemat = nn.remat(_ResnetBlock)
_ResnetBlockRematSaveConvs = nn.remat(
    _ResnetBlock,
    policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
)
from babe_tpu.ops.cqt import CQT, get_cqt


class CQTDiffPlusNet(nn.Module):
    """The flax module operating on CQT coefficient pytrees.

    ``__call__(coeffs, sigma_emb_input)`` where coeffs is the tuple from
    CQT.fwd (lowest octave first) and the second argument is cnoise [B, 1].
    Returns the output coefficient tuple (same shapes).
    """

    num_octs: int = 7
    bins_per_oct: int = 64
    emb_dim: int = 256
    Ns: Sequence[int] = (64, 96, 96, 128, 128, 256, 256)
    num_dils: Sequence[int] = (2, 3, 4, 5, 6, 7, 7)
    use_norm: bool = True
    use_fencoding: bool = False
    attention_layers: Sequence[int] = (0, 0, 0, 0, 0, 0, 0, 0)
    attention_dict: Any = None
    num_bottleneck_layers: int = 1
    compute_dtype: Any = jnp.float32
    # rematerialize each ResnetBlock in the backward pass (jax.checkpoint).
    # Training at the published config (batch 4, 184184 samples) needs
    # ~24 GB of stored activations on a 16 GB v5e without it; with
    # block-level remat only block boundaries are stored and the blocks'
    # internals are recomputed during the backward.  Off by default
    # (sampling doesn't need it; guided sampling fits without it).
    remat: bool = False
    # "full" (recompute everything inside the block) or "save_convs"
    # (save conv/matmul outputs, recompute only elementwise chains).
    remat_policy: str = "full"
    # layout-pin spec forwarded to the ResnetBlocks ('auto'/'off'/...);
    # training entry points build with 'off' — the guided-sampler cotangent
    # pin costs the weight-gradient train step ~47% (blocks._pin_spec).
    layout_pin: str = "auto"

    @nn.compact
    def __call__(self, coeffs, sigma):
        n = self.num_octs
        bpo = self.bins_per_oct
        assert len(coeffs) == n
        sigma_emb = RFF_MLP_Block(emb_dim=self.emb_dim, name="embedding")(sigma)
        sigma_emb = sigma_emb.astype(self.compute_dtype)
        if not self.remat:
            ResnetBlock = _ResnetBlock
        elif self.remat_policy == "save_convs":
            ResnetBlock = _ResnetBlockRematSaveConvs
        else:
            ResnetBlock = _ResnetBlockRemat
        ResnetBlock = functools.partial(ResnetBlock, layout_pin=self.layout_pin)

        def as_real(c):
            # complex [B, F, M] -> (B, F, M, 2) channels-last
            return jnp.stack([c.real, c.imag], axis=-1).astype(self.compute_dtype)

        def attn(i):
            if self.attention_layers[i]:
                return dict(self.attention_dict)
            return None

        hs = []
        X = None
        pyr = None
        for i in range(n):
            C = as_real(coeffs[n - 1 - i])  # highest octave first
            if self.use_fencoding:
                C2 = AddFreqEncodingRFF(bpo, 32, name=f"freq_encodings_{i}")(C)
            else:
                C2 = C
            dim_in = self.Ns[i - 1] if i > 0 else self.Ns[i]
            dim_out = self.Ns[i]
            C2 = ResnetBlock(
                C2.shape[-1], dim_in, self.use_norm, num_dils=1,
                kernel_size=(1, 1), emb_dim=self.emb_dim,
                name=f"downs_{i}_0",
            )(C2, sigma_emb)

            if i == 0:
                X = C2
                pyr = resample_time(C, up=False)
            elif i < n - 1:
                pyr = jnp.concatenate(
                    [resample_time(C, up=False), resample_time(pyr, up=False)], axis=1
                )
                X = jnp.concatenate([C2, X], axis=1)
            else:
                pyr = jnp.concatenate([C, pyr], axis=1)
                X = jnp.concatenate([C2, X], axis=1)

            X = ResnetBlock(
                dim_in, dim_out, self.use_norm, num_dils=self.num_dils[i],
                emb_dim=self.emb_dim, attention_dict=attn(i),
                Fdim=(i + 1) * bpo, name=f"downs_{i}_2",
            )(X, sigma_emb)
            hs.append(X)

            if i < n - 1:
                X = resample_time(X, up=False)
            pyr_proj = Conv2d(dim_out, (5, 3), name=f"downs_{i}_1")(pyr)
            X = (X + pyr_proj) * INV_SQRT2

        Xout = None
        for b in range(self.num_bottleneck_layers):
            X = ResnetBlock(
                self.Ns[-1], self.Ns[-1], self.use_norm,
                num_dils=self.num_dils[-1], emb_dim=self.emb_dim,
                attention_dict=attn(n) if len(self.attention_layers) > n else None,
                Fdim=n * bpo, name=f"middle_{b}_1",
            )(X, sigma_emb)
            Xout = ResnetBlock(
                self.Ns[-1], 2, self.use_norm, num_dils=1, kernel_size=(1, 1),
                proj_place="after", emb_dim=self.emb_dim, name=f"middle_{b}_0",
            )(X, sigma_emb)

        outs = [None] * n
        for pidx in range(n):  # ups list position; j = octave level
            j = n - 1 - pidx
            if j == 0:
                dim_in, dim_out = self.Ns[0] * 2, self.Ns[0]
            else:
                dim_in, dim_out = self.Ns[j] * 2, self.Ns[j - 1]
            skip = hs.pop()
            X = jnp.concatenate([X, skip], axis=-1)
            X = ResnetBlock(
                dim_in, dim_out, self.use_norm, num_dils=self.num_dils[j],
                emb_dim=self.emb_dim, attention_dict=attn(j),
                Fdim=(j + 1) * bpo, name=f"ups_{pidx}_1",
            )(X, sigma_emb)
            out_head = ResnetBlock(
                dim_out, 2, self.use_norm, num_dils=1, kernel_size=(1, 1),
                proj_place="after", emb_dim=self.emb_dim, name=f"ups_{pidx}_0",
            )(X, sigma_emb)
            Xout = (Xout + out_head) * INV_SQRT2

            X = X[:, bpo:, :, :]
            Out, Xout = Xout[:, :bpo, :, :], Xout[:, bpo:, :, :]
            Outf = Out.astype(jnp.float32)
            outs[pidx] = Outf[..., 0] + 1j * Outf[..., 1]

            if 0 < j:
                X = resample_time(X, up=True)
                Xout = resample_time(Xout, up=True)

        return tuple(outs)


class CQTDiffPlus:
    """User-facing model wrapper: raw-audio in/out with the CQT fused around
    the flax network (reference forward: networks/cqtdiff+.py:730-845).

    Usage:
        model = CQTDiffPlus.from_config(cfg)
        params = model.init(jax.random.PRNGKey(0))
        x_hat = model.apply(params, x, cnoise)     # x [B,T], cnoise [B,1]
    """

    def __init__(self, num_octs=7, bins_per_oct=64, fs=22050.0, audio_len=184184,
                 window="kaiser", beta=1.0, emb_dim=256,
                 Ns=(64, 96, 96, 128, 128, 256, 256),
                 num_dils=(2, 3, 4, 5, 6, 7, 7), use_norm=True,
                 use_fencoding=False,
                 attention_layers=(0, 0, 0, 0, 0, 0, 0, 0),
                 attention_dict=None, num_bottleneck_layers=1,
                 compute_dtype=jnp.float32, cqt_mode="native", remat=False,
                 remat_policy="full", layout_pin="auto"):
        self.cqt: CQT = get_cqt(num_octs, bins_per_oct, float(fs), int(audio_len),
                                window=window, beta=float(beta), mode=cqt_mode)
        self.audio_len = int(audio_len)
        self.net = CQTDiffPlusNet(
            num_octs=num_octs, bins_per_oct=bins_per_oct, emb_dim=emb_dim,
            Ns=tuple(Ns), num_dils=tuple(num_dils), use_norm=use_norm,
            use_fencoding=use_fencoding,
            attention_layers=tuple(attention_layers),
            attention_dict=attention_dict,
            num_bottleneck_layers=num_bottleneck_layers,
            compute_dtype=compute_dtype,
            remat=bool(remat),
            remat_policy=str(remat_policy),
            layout_pin=str(layout_pin),
        )

    @classmethod
    def from_config(cls, args, compute_dtype=None) -> "CQTDiffPlus":
        net = args.network
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if args.exp.get("use_bf16", False) else jnp.float32
            )
        win = net.cqt.get("window", "kaiser")
        return cls(
            num_octs=int(net.cqt.num_octs), bins_per_oct=int(net.cqt.bins_per_oct),
            fs=float(args.exp.sample_rate), audio_len=int(args.exp.audio_len),
            window=win, beta=float(net.cqt.get("beta", 1.0)),
            emb_dim=int(net.emb_dim), Ns=tuple(net.Ns),
            num_dils=tuple(net.num_dils), use_norm=bool(net.use_norm),
            use_fencoding=bool(net.use_fencoding),
            attention_layers=tuple(net.attention_layers),
            attention_dict=net.get("attention_dict"),
            num_bottleneck_layers=int(net.get("num_bottleneck_layers", 1)),
            compute_dtype=compute_dtype,
            cqt_mode=net.cqt.get("mode", "native"),
            remat=bool(args.exp.get("remat", False)),
            remat_policy=str(args.exp.get("remat_policy", "full")),
            layout_pin=str(net.get("layout_pin", "auto")),
        )

    def init(self, key, batch: int = 1):
        # one jitted program: avoids per-op dispatch overhead (crippling on
        # remote-tunneled TPU backends) during initialization
        def _init(key):
            x = jnp.zeros((batch, self.audio_len), jnp.float32)
            coeffs = self.cqt.fwd(x)
            sigma = jnp.zeros((batch, 1), jnp.float32)
            return self.net.init({"params": key}, coeffs, sigma)

        return jax.jit(_init)(key)

    def apply(self, variables, x: jnp.ndarray, cnoise: jnp.ndarray) -> jnp.ndarray:
        """Full forward: CQT -> U-Net -> CQT^-1 -> crop (reference :730-845)."""
        T = x.shape[-1]
        coeffs = self.cqt.fwd(x)
        outs = self.net.apply(variables, coeffs, cnoise)
        y = self.cqt.bwd(outs, length=T)
        return y

    def bound(self, variables):
        """Returns net(x, cnoise) closure for samplers/diffusion."""
        return lambda x, cnoise: self.apply(variables, x, cnoise)

    def apply_hpf_DC(self, x):
        return self.cqt.apply_hpf_DC(x)

    def fused_denoiser(self, variables, edm):
        """EDM denoiser with CQT/hpf FFT sharing.

        Computes hpf_DC(cskip*x + cout*net(cin*x, cnoise)) — exactly the
        sampler's denoise step when filter_out_cqt_DC_Nyq is on
        (testing/edm_sampler.py:59-62) — with a single rfft/irfft pair:
        the analysis spectrum is reused for the skip term and the hpf mask
        multiplies the synthesis spectrum before the one inverse FFT
        (saves 2 of 4 length-Ls FFTs per network evaluation, and their vjps).
        CQT linearity lets cin scale the coefficients directly.
        """
        cqt = self.cqt
        mask = jnp.asarray(cqt._mask)

        def denoiser(x, sigma):
            sigma = jnp.asarray(sigma)
            if sigma.ndim == 0:
                sigma = sigma[None, None]
            elif sigma.ndim == 1:
                sigma = sigma[:, None]
            T = x.shape[-1]
            cskip, cout = edm.cskip(sigma), edm.cout(sigma)
            cin, cnoise = edm.cin(sigma), edm.cnoise(sigma)
            X = cqt.spectrum(x)  # [B, nbins] complex
            coeffs = tuple(
                c * cin[..., None].astype(jnp.complex64)
                for c in cqt.fwd_spectrum(X)
            )
            outs = self.net.apply(variables, coeffs, cnoise)
            Y = cqt.bwd_spectrum(outs)
            D = (cskip.astype(jnp.complex64) * X + cout.astype(jnp.complex64) * Y)
            return jnp.fft.irfft(D * mask, n=cqt.Ls, axis=-1)[..., :T]

        return denoiser
