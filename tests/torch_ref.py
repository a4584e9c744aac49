"""Harness to instantiate the *reference* PyTorch model for golden parity tests.

The reference network (networks/cqtdiff+.py) imports the external
``cqt_nsgt_pytorch`` package (not available here) and ``torchaudio`` (unused in
the forward path), so we inject stubs: the CQT stub wraps *our* NSGT frame plans
(babe_tpu/ops/cqt.py) with torch.fft, making the torch and JAX models share the
exact same transform — the parity test then isolates the network math.

SURVEY.md §4 explicitly calls for "golden-value parity tests against the PyTorch
reference"; importing the read-only reference at test time is that.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import torch

from babe_tpu.ops.cqt import CQT

REFERENCE_NET = "/root/reference/networks/cqtdiff+.py"

# frame construction used by the stub when the reference model builds it
# (set to "oct_pow2" to run model parity through the checkpoint-compatible
# frame — tests/test_model_parity.py::test_forward_parity_compat_frame)
STUB_FRAME_MODE = "native"


class TorchCQTStub:
    """torch re-execution of our NSGT plans (list API of cqt_nsgt_pytorch)."""

    def __init__(self, num_octs, bins_per_oct, mode="oct", window=("kaiser", 1),
                 fs=22050, audio_len=44100, dtype=torch.float32, device="cpu",
                 frame_mode=None):
        if frame_mode is None:
            frame_mode = STUB_FRAME_MODE
        assert mode == "oct"
        win, beta = window if isinstance(window, tuple) else (window, 1.0)
        self.cqt = CQT(num_octs, bins_per_oct, float(fs), int(audio_len),
                       window=win, beta=float(beta), mode=frame_mode)

    def fwd(self, x: torch.Tensor):
        # x: [B, 1, T] -> list (lowest octave first) of [B, 1, bpo, M] complex
        x = x.squeeze(1)
        T = x.shape[-1]
        if T < self.cqt.Ls:
            x = torch.nn.functional.pad(x, (0, self.cqt.Ls - T))
        X = torch.fft.rfft(x.float(), dim=-1)
        outs = []
        for p in self.cqt._plans:
            sl = X[:, torch.from_numpy(p.idx.astype(np.int64))]
            if p.conj is not None:  # compat mode: beyond-Nyquist mirror reads
                sl = torch.where(torch.from_numpy(p.conj), sl.conj(), sl)
            sl = sl * torch.from_numpy(p.w_ana)
            outs.append(torch.fft.ifft(sl, dim=-1).unsqueeze(1))
        return outs

    def bwd(self, coeffs):
        B = coeffs[0].shape[0]
        Y = torch.zeros((B, self.cqt.Ls // 2 + 1), dtype=torch.complex64)
        for p, c in zip(self.cqt._plans, coeffs):
            sl = torch.fft.fft(c.squeeze(1), dim=-1) * torch.from_numpy(p.w_syn)
            flat = sl.reshape(B, -1)
            if p.conj is not None:
                flat = torch.where(
                    torch.from_numpy(p.conj.reshape(-1)), flat.conj(), flat
                )
                # self-mirrored bins (0 / Nyquist) get value + conj(value)
                lfull = np.where(p.conj.reshape(-1),
                                 self.cqt.Ls - p.idx.reshape(-1),
                                 p.idx.reshape(-1))
                selfm = (lfull % self.cqt.Ls == 0) | (lfull == self.cqt.Ls // 2)
                used = (p.w_syn.reshape(-1) != 0) | (p.w_ana.reshape(-1) != 0)
                sm = torch.from_numpy(selfm & used)
                Y.index_add_(
                    1,
                    torch.from_numpy(p.idx.reshape(-1)[selfm & used].astype(np.int64)),
                    flat[:, sm].conj(),
                )
            Y.index_add_(
                1, torch.from_numpy(p.idx.reshape(-1).astype(np.int64)),
                flat,
            )
        x = torch.fft.irfft(Y, n=self.cqt.Ls, dim=-1)
        return x.unsqueeze(1)

    def apply_hpf_DC(self, x: torch.Tensor):
        T = x.shape[-1]
        xp = torch.nn.functional.pad(x, (0, self.cqt.Ls - T)) if T < self.cqt.Ls else x
        X = torch.fft.rfft(xp.float(), dim=-1) * torch.from_numpy(self.cqt._mask)
        return torch.fft.irfft(X, n=self.cqt.Ls, dim=-1)[..., :T]


def load_reference_module():
    if "cqt_nsgt_pytorch" not in sys.modules:
        stub = types.ModuleType("cqt_nsgt_pytorch")
        stub.CQT_nsgt = TorchCQTStub
        sys.modules["cqt_nsgt_pytorch"] = stub
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio"] = ta
    spec = importlib.util.spec_from_file_location("ref_cqtdiffplus", REFERENCE_NET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_reference_model(args):
    mod = load_reference_module()
    torch.manual_seed(0)
    return mod.Unet_CQT_oct_with_attention(args, device="cpu")
