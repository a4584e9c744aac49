"""MultiStage STFT denoiser for historical-recording pre-cleaning.

TPU-native re-implementation of the reference's two-stage DenseNet U-Net over
complex STFTs (networks/denoiser.py:18-449), used by the denoise -> blind-BWE
chain (testing/denoise_and_bwe_tester.py:109-165).  Layout is channels-last
(B, T, F, C); module naming mirrors the torch tree for checkpoint conversion
(see babe_tpu/utils/torch_ckpt.py: ConvTranspose kernels use flax's
``transpose_kernel=True`` convention).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from babe_tpu.ops.stft import hamming_window, stft, istft


def _reflect_conv(x, features, ksize, name, strides=(1, 1), pad=None):
    """Conv with reflect padding (torch padding_mode='reflect'),
    built as manual pad + VALID conv."""
    kh, kw = ksize
    if pad is None:  # 'same'
        pad = ((kh - 1) // 2, kh - 1 - (kh - 1) // 2,
               (kw - 1) // 2, kw - 1 - (kw - 1) // 2)
    ph0, ph1, pw0, pw1 = pad
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)), mode="reflect")
    return nn.Conv(features, kernel_size=ksize, strides=strides,
                   padding="VALID", name=name)(xp)


class DenseBlock(nn.Module):
    """(networks/denoiser.py:18-58)"""

    num_layers: int
    N0: int
    N: int
    ksize: tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x):
        x_ = nn.elu(_reflect_conv(x, self.N, self.ksize, name="H_0_0"))
        for i in range(1, self.num_layers):
            x = jnp.concatenate([x_, x], axis=-1)
            x_ = nn.elu(_reflect_conv(x, self.N, self.ksize, name=f"H_{i}_0"))
        return x_


class IBlock(nn.Module):
    """DenseBlock + residual 1x1 projection (networks/denoiser.py:323-345)."""

    N0: int
    N: int
    num_tfc: int

    @nn.compact
    def __call__(self, x):
        h = DenseBlock(self.num_tfc, self.N0, self.N, name="tfc")(x)
        res = _reflect_conv(x, self.N, (1, 1), name="conv2d_res")
        return h + res


class EBlock(nn.Module):
    """(networks/denoiser.py:348-372)"""

    N0: int
    N01: int
    N: int
    S: tuple[int, int]
    num_tfc: int

    @nn.compact
    def __call__(self, x):
        x = IBlock(self.N0, self.N01, self.num_tfc, name="i_block")(x)
        ks = (self.S[0] + 2, self.S[1] + 2)
        # torch: padding=(2,2) reflect, stride S
        x_down = nn.elu(_reflect_conv(x, self.N, ks, name="conv2d_2_0",
                                      strides=self.S, pad=(2, 2, 2, 2)))
        return x_down, x


def _crop_center(big, target_shape):
    """(networks/denoiser.py:418-449 CropAdd/CropConcat cropping)"""
    dh = (big.shape[1] - target_shape[1]) // 2
    dw = (big.shape[2] - target_shape[2]) // 2
    return big[:, dh : dh + target_shape[1], dw : dw + target_shape[2], :]


class DBlock(nn.Module):
    """(networks/denoiser.py:375-415)"""

    N0: int
    N: int
    S: tuple[int, int]
    num_tfc: int

    @nn.compact
    def __call__(self, x, bridge):
        ks = (self.S[0] + 2, self.S[1] + 2)
        up = nn.elu(
            nn.ConvTranspose(self.N, kernel_size=ks, strides=self.S,
                             padding="VALID", transpose_kernel=True,
                             name="tconv_1_0")(x)
        )
        x2 = jnp.repeat(jnp.repeat(x, self.S[0], axis=1), self.S[1], axis=2)
        x2 = _reflect_conv(x2, self.N, (1, 1), name="projection")
        h = _crop_center(up, x2.shape) + x2
        hb = jnp.concatenate([_crop_center(h, bridge.shape), bridge], axis=-1)
        return IBlock(2 * self.N, self.N, self.num_tfc, name="i_block")(hb)


class Encoder(nn.Module):
    """(networks/denoiser.py:194-230)"""

    N0: int
    Ns: Sequence[int]
    Ss: Sequence[tuple[int, int]]
    depth: int
    num_tfc: int

    @nn.compact
    def __call__(self, x):
        skips = []
        for i in range(self.depth):
            Nin = self.N0 if i == 0 else self.Ns[i]
            x, skip = EBlock(Nin, self.Ns[i], self.Ns[i + 1], tuple(self.Ss[i]),
                             self.num_tfc, name=f"eblocks_{i}")(x)
            skips.append(skip)
        x = IBlock(self.Ns[self.depth], self.Ns[self.depth], self.num_tfc,
                   name="i_block")(x)
        return x, skips


class Decoder(nn.Module):
    """(networks/denoiser.py:172-192)"""

    Ns: Sequence[int]
    Ss: Sequence[tuple[int, int]]
    depth: int
    num_tfc: int

    @nn.compact
    def __call__(self, x, skips):
        for i in range(self.depth, 0, -1):
            x = DBlock(self.Ns[i], self.Ns[i - 1], tuple(self.Ss[i - 1]),
                       self.num_tfc, name=f"dblocks_{i-1}")(x, skips[i - 1])
        return x


class SAM(nn.Module):
    """Supervised attention module (networks/denoiser.py:83-131)."""

    n_feat: int

    @nn.compact
    def __call__(self, feats, input_spec):
        x1 = _reflect_conv(feats, self.n_feat, (3, 3), name="conv1")
        x = _reflect_conv(feats, 2, (3, 3), name="conv2")
        pred = x + input_spec
        M = jax.nn.sigmoid(_reflect_conv(pred, self.n_feat, (3, 3), name="conv3"))
        return x1 * M + feats, pred


class MultiStageDenoiseNet(nn.Module):
    """(networks/denoiser.py:232-321). Input (B, T, F, 2) complex-as-channels."""

    depth: int = 6
    num_tfc: int = 3
    num_stages: int = 2
    use_fencoding: bool = True
    use_SAM: bool = True
    f_dim: int = 513

    @nn.compact
    def __call__(self, x):
        Ns = [64, 64, 64, 128, 128, 256, 512]
        Ss = [(2, 2)] * 6
        if self.use_fencoding:
            # 10 cosine positional channels over frequency (networks/denoiser.py:134-169)
            def build():
                n = np.arange(self.f_dim) / (self.f_dim - 1)
                emb = np.stack(
                    [np.cos((2**k) * np.pi * n) for k in range(10)], axis=-1
                )  # [F, 10]
                return jnp.asarray(emb, dtype=jnp.float32)

            femb = self.param("freq_encoding_fembeddings", lambda key: build())
            B, T, F, C = x.shape
            enc = jnp.broadcast_to(femb[None, None], (B, T, F, 10)).astype(x.dtype)
            xw = jnp.concatenate([x, enc], axis=-1)
        else:
            xw = x

        h = nn.elu(_reflect_conv(xw, Ns[0], (7, 7), name="conv2d_1_0"))
        h, skips = Encoder(Ns[0], Ns, Ss, self.depth, self.num_tfc,
                           name="encoder_s1")(h)
        feats1 = Decoder(Ns, Ss, self.depth, self.num_tfc, name="decoder_s1")(h, skips)

        if self.num_stages > 1:
            Fout, pred1 = SAM(Ns[0], name="sam_1")(feats1, x)
            h2 = nn.elu(_reflect_conv(xw, Ns[0], (7, 7), name="conv2d_2_0"))
            h2 = jnp.concatenate([h2, Fout if self.use_SAM else feats1], axis=-1)
            h2, skips2 = Encoder(2 * Ns[0], Ns, Ss, self.depth, self.num_tfc,
                                 name="encoder_s2")(h2)
            feats2 = Decoder(Ns, Ss, self.depth, self.num_tfc,
                             name="decoder_s2")(h2, skips2)
            pred2 = _reflect_conv(feats2, 2, (3, 3), name="finalblock_conv2")
            return pred2, pred1
        return _reflect_conv(feats1, 2, (3, 3), name="finalblock_conv2")


class MultiStageDenoiser:
    """User-facing wrapper with STFT framing + chunked OLA application
    (testing/denoise_and_bwe_tester.py:109-165)."""

    def __init__(self, depth=6, num_tfc=3, num_stages=2, use_fencoding=True,
                 use_SAM=True, f_dim=513, fs=22050, stft_win_size=1024,
                 stft_hop_size=256, segment_seconds=5.0):
        self.net = MultiStageDenoiseNet(
            depth=depth, num_tfc=num_tfc, num_stages=num_stages,
            use_fencoding=use_fencoding, use_SAM=use_SAM, f_dim=f_dim,
        )
        self.num_stages = num_stages
        self.fs = int(fs)
        self.win = int(stft_win_size)
        self.hop = int(stft_hop_size)
        self.segment = int(self.fs * segment_seconds)

    @classmethod
    def from_config(cls, dcfg) -> "MultiStageDenoiser":
        return cls(
            depth=int(dcfg.get("depth", 6)),
            num_tfc=int(dcfg.get("num_tfc", 3)),
            num_stages=int(dcfg.get("num_stages", 2)),
            use_fencoding=bool(dcfg.get("use_fencoding", True)),
            use_SAM=bool(dcfg.get("use_SAM", True)),
            f_dim=int(dcfg.get("f_dim", 513)),
            fs=int(dcfg.get("sample_rate_denoiser", 22050)),
            stft_win_size=int(dcfg.get("stft_win_size", 1024)),
            stft_hop_size=int(dcfg.get("stft_hop_size", 256)),
            segment_seconds=float(dcfg.get("segment_size", 5.0)),
        )

    def init(self, key, T: int = 32):
        x = jnp.zeros((1, T, self.net.f_dim, 2), jnp.float32)
        return jax.jit(lambda k: self.net.init({"params": k}, x))(key)

    def apply_model(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Denoise one time segment: STFT -> net -> iSTFT
        (reference apply_denoiser_model, denoise_and_bwe_tester.py:145-165)."""
        w = hamming_window(self.win)
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.win)]
        xp = jnp.pad(x, pad)
        X = stft(xp, self.win, self.hop, w)  # [B, F, Tf] complex
        Xr = jnp.stack([X.real, X.imag], axis=-1)  # [B, F, Tf, 2]
        Xr = jnp.swapaxes(Xr, 1, 2)  # [B, Tf, F, 2]
        out = self.net.apply(variables, Xr)
        if self.num_stages > 1:
            out = out[0]
        out = jnp.swapaxes(out, 1, 2)
        Y = out[..., 0] + 1j * out[..., 1]
        y = istft(Y, self.win, self.hop, w)
        return y[..., : x.shape[-1]]

    def apply_chunked_ola(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Hamming-crossfaded OLA over segments
        (reference apply_denoiser, denoise_and_bwe_tester.py:109-141)."""
        seg = self.segment
        ov = 1024
        w = hamming_window(2 * ov)
        wl, wr = jnp.asarray(w[:ov]), jnp.asarray(w[ov:])
        L = x.shape[-1]
        run = jax.jit(lambda s: self.apply_model(variables, s))
        out = jnp.zeros_like(x)
        pointer = 0
        first = True
        while True:
            if pointer + seg < L:
                chunk = run(x[:, pointer : pointer + seg])
                if first:
                    chunk = jnp.concatenate(
                        [chunk[:, : seg - ov], chunk[:, seg - ov :] * wr], axis=-1
                    )
                else:
                    chunk = jnp.concatenate(
                        [chunk[:, :ov] * wl, chunk[:, ov : seg - ov],
                         chunk[:, seg - ov :] * wr], axis=-1,
                    )
                out = out.at[:, pointer : pointer + seg].add(chunk)
                pointer += seg - ov
                first = False
            else:
                tail = x[:, pointer:]
                n = tail.shape[-1]
                chunk = run(jnp.pad(tail, ((0, 0), (0, seg - n))))
                if not first:
                    chunk = jnp.concatenate(
                        [chunk[:, :ov] * wl, chunk[:, ov:]], axis=-1
                    )
                out = out.at[:, pointer:].add(chunk[:, :n])
                return out


def setup_denoiser(args):
    """Build + load the denoiser for the chain (reference utils/setup.py:61-68,
    denoise_and_bwe_tester.py:78-80). Returns (model, variables) or None."""
    dcfg = args.tester.denoiser
    model = MultiStageDenoiser.from_config(dcfg)
    path = str(dcfg.get("checkpoint_path", dcfg.get("checkpoint", "")))
    import os

    variables = model.init(jax.random.PRNGKey(0))
    if path and os.path.exists(path):
        from babe_tpu.utils.torch_ckpt import fill_variables, load_torch_checkpoint

        if path.endswith(".pt"):
            converted = load_torch_checkpoint(path, prefer="network")
            variables = fill_variables(variables, converted, strict=False)
        else:
            import pickle

            with open(path, "rb") as f:
                payload = pickle.load(f)
            variables = {"params": jax.tree.map(jnp.asarray, payload["params"])}
    else:
        print(f"warning: denoiser checkpoint {path!r} not found; using random init")
    return model, variables
