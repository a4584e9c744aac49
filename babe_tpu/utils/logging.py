"""Observability: audio/spectrogram/metric logging.

Capability-equivalent of the reference's utils/logging.py (723 LoC of
plotly/wandb logging).  This environment has no wandb/plotly; the local
backends are: WAV files, matplotlib spectrogram PNGs, numpy trajectory dumps,
and JSONL metric streams.  If wandb is importable it is used transparently.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

from babe_tpu.data.wavio import write_wav

try:  # optional
    import wandb as _wandb
except Exception:  # pragma: no cover
    _wandb = None


def write_audio_file(x, fs: int, name: str, path: str) -> str:
    """(reference: utils/logging.py write_audio_file)"""
    os.makedirs(path, exist_ok=True)
    x = np.asarray(x)
    if x.ndim == 2 and x.shape[0] > 1:
        # concatenate batch items like the reference's multi-sample logging
        x = x.reshape(-1)
    elif x.ndim == 2:
        x = x[0]
    if not name.endswith(".wav"):
        name = name + ".wav"
    return write_wav(os.path.join(path, name), x, fs)


def plot_spectrogram(x, stft_cfg: Any, out_path: str) -> str | None:
    """STFT spectrogram PNG (reference: utils/logging.py
    plot_spectrogram_from_raw_audio, plotly -> matplotlib)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import scipy.signal as ss

    x = np.asarray(x)
    if x.ndim == 2:
        x = x[0]
    win = int(stft_cfg.get("win_size", 1024)) if hasattr(stft_cfg, "get") else 1024
    hop = int(stft_cfg.get("hop_size", 256)) if hasattr(stft_cfg, "get") else 256
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    f, t, S = ss.stft(x, nperseg=win, noverlap=win - hop)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(
        20 * np.log10(np.abs(S) + 1e-8), origin="lower", aspect="auto",
        extent=[t[0], t[-1], f[0], f[-1]], cmap="magma", vmin=-100, vmax=0,
    )
    ax.set_xlabel("frame")
    ax.set_ylabel("freq bin")
    fig.savefig(out_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return out_path


def save_trajectory(path: str, name: str, **arrays) -> str:
    """Reverse-process diagnostic capture ('rid' data: denoised/score/filters,
    reference utils/logging.py diffusion_spec_animation + blind_bwe_utils
    animation_filter — stored as npz for offline plotting)."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, name + ".npz")
    np.savez_compressed(out, **{k: np.asarray(v) for k, v in arrays.items()})
    return out


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover
        return None


def plot_loss_by_sigma(means, stds, bins, out_path: str) -> str | None:
    """Loss vs noise-level plot (reference: utils/logging.py plot_loss_by_sigma)."""
    plt = _mpl()
    if plt is None:
        return None
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    means = np.asarray(means, dtype=float)
    stds = np.asarray(stds, dtype=float)
    ax.errorbar(np.asarray(bins, dtype=float), means, yerr=stds, marker="o")
    ax.set_xscale("log")
    ax.set_xlabel("sigma")
    ax.set_ylabel("loss")
    fig.savefig(out_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_filter_response(params_list, freqs, out_path: str, labels=None) -> str | None:
    """Estimated-vs-reference filter magnitude plot
    (reference: utils/blind_bwe_utils.py:298-305 plot_filter)."""
    plt = _mpl()
    if plt is None:
        return None
    from babe_tpu.ops.filters import design_filter
    import jax.numpy as jnp

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    for i, p in enumerate(params_list):
        H = np.asarray(design_filter(jnp.asarray(p[0]), jnp.asarray(p[1]),
                                     jnp.asarray(freqs)))
        label = labels[i] if labels else f"filter {i}"
        ax.plot(freqs[1:], 20 * np.log10(H[1:] + 1e-8), label=label)
    ax.set_xscale("log")
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("magnitude (dB)")
    ax.legend()
    fig.savefig(out_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return out_path


def diffusion_spec_animation(dens, t, out_path: str, fs: int = 22050,
                             win: int = 1024, hop: int = 256,
                             max_frames: int = 12) -> str | None:
    """Animated GIF of the reverse process's denoised-estimate spectrograms
    (reference: utils/logging.py diffusion_spec_animation, plotly HTML ->
    GIF here). dens: [steps, B, T] trajectory; t: schedule."""
    plt = _mpl()
    if plt is None:
        return None
    try:
        import imageio.v2 as imageio
    except Exception:  # pragma: no cover
        return None
    import scipy.signal as ss

    dens = np.asarray(dens)
    steps = dens.shape[0]
    idx = np.linspace(0, steps - 1, min(steps, max_frames)).astype(int)
    frames = []
    for i in idx:
        f, tt, S = ss.stft(dens[i, 0], fs=fs, nperseg=win, noverlap=win - hop)
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.imshow(20 * np.log10(np.abs(S) + 1e-8), origin="lower", aspect="auto",
                  cmap="magma", vmin=-100, vmax=0)
        ax.set_title(f"step {i}  sigma={float(np.asarray(t)[i]):.4f}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf)
        plt.close(fig)
    imageio.mimsave(out_path, frames, duration=0.4)
    return out_path


class MetricsLogger:
    """JSONL metrics stream + optional wandb mirror."""

    def __init__(self, path: str, use_wandb: bool = False, config: dict | None = None,
                 project: str = "babe-tpu"):
        os.makedirs(path, exist_ok=True)
        self.file = open(os.path.join(path, "metrics.jsonl"), "a")
        self.run = None
        if use_wandb and _wandb is not None:
            self.run = _wandb.init(project=project, config=config or {})

    def log(self, data: dict, step: int | None = None):
        rec = dict(data)
        rec["_ts"] = time.time()
        if step is not None:
            rec["_step"] = step
        self.file.write(json.dumps(rec, default=float) + "\n")
        self.file.flush()
        if self.run is not None:
            self.run.log(data, step=step)

    def close(self):
        self.file.close()  # idempotent (file.close() is a no-op when closed)
        if self.run is not None:
            self.run.finish()
            self.run = None
