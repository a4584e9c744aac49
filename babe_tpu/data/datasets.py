"""Datasets: infinite training streams and map-style test sets.

Re-implementations of the reference data layer (datasets/, SURVEY.md §2.6)
without torch DataLoader: streams are plain generators batched by
:class:`Batcher` with background-thread prefetch; the hot path uses the C++
native loader (``native/wavloader.cpp`` thread pool via ctypes, wired in by
default in :func:`setup_dataset` below with a pure-Python fallback — the
reference's equivalent native layer is torch's DataLoader worker pool,
utils/setup.py:10-45).

Behavior parity:
  * infinite iteration, random file, 8 random crops per opened file
    (datasets/maestro_dataset.py:59-100, datasets/audiofolder.py:30-97),
  * MAESTRO CSV metadata with year filter + split
    (datasets/maestro_dataset.py:44-54; csv parsed with stdlib, pandas-free),
  * overfit mode: a single 50 s excerpt looped (datasets/maestro_dataset.py:132-138),
  * test sets return (audio, fs, filename) tuples
    (datasets/maestro_dataset_test.py:30-74, datasets/audiofolder_test.py:30-75),
  * CocoChorales stem mixtures with prob_solo/duo/trio/quartet
    (datasets/cocochorales.py:82-160).
"""

from __future__ import annotations

import csv
import glob
import os
import queue
import random
import threading
from typing import Iterator

import numpy as np

from babe_tpu.data.wavio import read_wav, to_mono


def _eight_random_crops(data: np.ndarray, seg_len: int, rng: random.Random,
                        overfit: bool):
    if len(data) <= seg_len:
        return
    for _ in range(8):
        idx = 0 if overfit else rng.randint(0, len(data) - seg_len - 1)
        yield data[idx : idx + seg_len].astype(np.float32)


class AudioFolderDataset:
    """Infinite stream over a flat folder of *.wav (reference: datasets/audiofolder.py)."""

    def __init__(self, dset_args, fs=44100, seg_len=131072, overfit=False, seed=42):
        self.rng = random.Random(seed)
        self.files = sorted(glob.glob(os.path.join(str(dset_args.path), "*.wav")))
        assert self.files, "error in dataloading: empty or nonexistent folder"
        self.seg_len = int(seg_len)
        self.fs = fs
        self.overfit = overfit
        if overfit:
            data, sr = read_wav(self.files[0])
            data = to_mono(data)
            self.overfit_sample = data[10 * sr : 60 * sr]

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            if self.overfit:
                data = self.overfit_sample
            else:
                data, _ = read_wav(self.rng.choice(self.files))
                data = to_mono(data)
            yield from _eight_random_crops(data, self.seg_len, self.rng, self.overfit)


class MaestroDataset:
    """MAESTRO v3 training stream at a fixed fs
    (reference: datasets/maestro_dataset.py MaestroDataset)."""

    yields_fs = False

    def __init__(self, dset_args, fs=44100, seg_len=131072, overfit=False, seed=42):
        self.rng = random.Random(seed)
        path = str(dset_args.path)
        years = set(int(y) for y in dset_args.years)
        self.files = _maestro_filelist(path, years, "train")
        self.seg_len = int(seg_len)
        self.overfit = overfit
        if overfit:
            data, sr = read_wav(self.files[0])
            data = to_mono(data)
            self.overfit_sample = data[10 * sr : 60 * sr]

    def __iter__(self):
        while True:
            if self.overfit:
                data = self.overfit_sample
            else:
                data, _ = read_wav(self.rng.choice(self.files))
                data = to_mono(data)
            yield from _eight_random_crops(data, self.seg_len, self.rng, self.overfit)


class MaestroDatasetFs(MaestroDataset):
    """Variant yielding (segment, native_fs); resampled later on device
    (reference: datasets/maestro_dataset.py MaestroDataset_fs; the load_len
    config covers the pre-resample length)."""

    yields_fs = True

    def __init__(self, dset_args, overfit=False, seed=42):
        super().__init__(dset_args, seg_len=int(dset_args.load_len),
                         overfit=overfit, seed=seed)

    def __iter__(self):
        while True:
            file = self.files[0] if self.overfit else self.rng.choice(self.files)
            data, sr = read_wav(file)
            data = to_mono(data)
            for seg in _eight_random_crops(data, self.seg_len, self.rng, self.overfit):
                yield seg, sr


def _maestro_filelist(path: str, years: set[int], split: str) -> list[str]:
    meta = os.path.join(path, "maestro-v3.0.0.csv")
    out = []
    with open(meta) as f:
        for row in csv.DictReader(f):
            if int(row["year"]) in years and row["split"] == split:
                out.append(os.path.join(path, row["audio_filename"]))
    assert out, f"no MAESTRO files for years={years} split={split}"
    return out


class MaestroDatasetTestChunks:
    """First num_samples test-split files, fixed crop starting at 10 s
    (reference: datasets/maestro_dataset_test.py:30-74)."""

    def __init__(self, dset_args, num_samples=4, seed=42):
        path = str(dset_args.path)
        years = set(int(y) for y in dset_args.years)
        files = _maestro_filelist(path, years, "test")
        self.seg_len = int(dset_args.load_len)
        self.items = []
        for file in files[:num_samples]:
            data, sr = read_wav(file)
            data = to_mono(data)
            self.items.append(
                (data[10 * sr : 10 * sr + self.seg_len], sr, os.path.basename(file))
            )

    def __getitem__(self, idx):
        return self.items[idx]

    def __len__(self):
        return len(self.items)


class AudioFolderDatasetTest:
    """Map-style folder test set; random crop or tile-to-length
    (reference: datasets/audiofolder_test.py:30-75)."""

    def __init__(self, dset_args, fs=44100, seg_len=131072, num_samples=4, seed=42):
        rng = np.random.default_rng(seed)
        path = str(dset_args.test.path)
        files = sorted(glob.glob(os.path.join(path, "*.wav")))
        assert files, "error in dataloading: empty or nonexistent folder"
        stereo = bool(dset_args.test.get("stereo", False))
        self.items = []
        for file in files[:num_samples]:
            data, sr = read_wav(file)
            data = data.T if data.ndim == 2 else data
            if data.shape[-1] >= seg_len:
                idx = int(rng.integers(0, data.shape[-1] - seg_len))
                data = data[..., idx : idx + seg_len]
            else:
                reps = seg_len // data.shape[-1] + 1
                data = np.tile(data, reps)[..., :seg_len]
            if not stereo and data.ndim > 1:
                data = data.mean(axis=0)
            self.items.append((data.astype(np.float32), sr, os.path.basename(file)))

    def __getitem__(self, idx):
        return self.items[idx]

    def __len__(self):
        return len(self.items)


class CocoChoralesDataset:
    """Random 1-4 stem mixtures from per-track stem folders
    (reference: datasets/cocochorales.py:30-175)."""

    def __init__(self, dset_args, fs=44100, seg_len=131072, overfit=False, seed=42):
        assert not overfit, "overfit mode not supported for stem mixtures"
        self.rng = random.Random(seed)
        self.dirs = sorted(glob.glob(os.path.join(str(dset_args.path), "*/")))
        assert self.dirs, "error in dataloading: empty or nonexistent folder"
        self.seg_len = int(seg_len)
        self.p_quartet = float(dset_args.get("prob_quartet", 0.25))
        self.p_trio = float(dset_args.get("prob_trio", 0.25))
        self.p_duo = float(dset_args.get("prob_duo", 0.25))

    def _num_stems(self) -> int:
        r = self.rng.random()
        if r < self.p_quartet:
            return 4
        if r < self.p_quartet + self.p_trio:
            return 3
        if r < self.p_quartet + self.p_trio + self.p_duo:
            return 2
        return 1

    def __iter__(self):
        while True:
            d = self.rng.choice(self.dirs)
            stems = sorted(glob.glob(os.path.join(d, "*.wav")))
            if not stems:
                continue
            n = min(self._num_stems(), len(stems))
            chosen = self.rng.sample(stems, n)
            audio = [to_mono(read_wav(s)[0]) for s in chosen]
            L = min(len(a) for a in audio)
            if L <= self.seg_len:
                continue
            for _ in range(8):
                idx = self.rng.randint(0, L - self.seg_len - 1)
                seg = sum(a[idx : idx + self.seg_len] for a in audio)
                yield seg.astype(np.float32)


class Batcher:
    """Batch an infinite sample stream with background prefetch.

    Replaces torch DataLoader(num_workers, prefetch_factor=20)
    (reference: utils/setup.py:10-34). Yields [B, T] float32 (or
    ([B, T], fs[B]) when the dataset yields (segment, fs) pairs).
    """

    def __init__(self, dataset, batch_size: int, prefetch: int = 8):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        it = iter(self.dataset)
        try:
            while not self._stop.is_set():
                items = [next(it) for _ in range(self.batch_size)]
                if isinstance(items[0], tuple):
                    segs = np.stack([a for a, _ in items])
                    fs = np.asarray([f for _, f in items])
                    self.q.put((segs, fs))
                else:
                    self.q.put(np.stack(items))
        except StopIteration:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop.set()


def setup_dataset(args):
    """Factory mirroring utils/setup.py:10-34.

    Uses the native C++ loader (babe_tpu/native) for file-list datasets
    (folder / MAESTRO) unless ``dset.native_loader: false``; stem-mixing and
    overfit modes stay on the Python path.
    """
    from babe_tpu.registry import get_obj_by_name

    dcfg = args.dset
    cls = get_obj_by_name(dcfg.callable)
    overfit = bool(args.get_path("dset.overfit", False))
    yields_fs = getattr(cls, "yields_fs", False) or cls is MaestroDatasetFs
    if yields_fs:
        ds = cls(dcfg, overfit=overfit)
    else:
        ds = cls(dcfg, fs=int(args.exp.sample_rate) * int(args.exp.get("resample_factor", 1)),
                 seg_len=int(args.exp.audio_len) * int(args.exp.get("resample_factor", 1)),
                 overfit=overfit)

    # effective loader batch covers gradient-accumulation rounds
    # (reference: training/trainer.py:387-398 draws one batch per round)
    loader_batch = int(args.exp.batch) * int(args.exp.get("num_accumulation_rounds", 1))
    use_native = bool(dcfg.get("native_loader", True)) and not overfit
    files = getattr(ds, "files", None)
    if use_native and files:
        try:
            from babe_tpu.native import NativeLoader

            return NativeLoader(
                list(files), seg_len=int(ds.seg_len), batch=loader_batch,
                n_threads=int(dcfg.get("loader_threads", 4)),
                seed=int(args.exp.get("seed", 42)), yield_fs=yields_fs,
            )
        except (RuntimeError, OSError) as e:
            print(f"native loader unavailable ({e}); falling back to Python IO")
    return Batcher(ds, loader_batch)


def setup_dataset_test(args):
    """Factory mirroring utils/setup.py:36-45."""
    from babe_tpu.registry import get_obj_by_name

    dcfg = args.dset
    cls = get_obj_by_name(dcfg.test.callable)
    num = int(args.get_path("dset.test.num_samples", 4))
    if cls is MaestroDatasetTestChunks:
        return cls(dcfg, num_samples=num)
    return cls(dcfg, fs=int(args.exp.sample_rate),
               seg_len=int(args.exp.audio_len), num_samples=num)
