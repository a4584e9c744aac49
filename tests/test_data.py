"""Data layer tests with synthetic WAV fixtures."""

import csv
import os

import numpy as np
import pytest

from babe_tpu.config import make_config
from babe_tpu.data import datasets as D
from babe_tpu.data.wavio import read_wav, write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i in range(3):
        write_wav(str(d / f"track{i}.wav"), rng.standard_normal(44100) * 0.1, 44100)
    return d


def test_wavio_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 22050)
    y, fs = read_wav(p)
    assert fs == 22050
    np.testing.assert_allclose(x, y, atol=1e-4)


def test_audiofolder_stream(wav_dir):
    cfg = make_config({"path": str(wav_dir)})
    ds = D.AudioFolderDataset(cfg, fs=44100, seg_len=4096)
    it = iter(ds)
    segs = [next(it) for _ in range(10)]
    assert all(s.shape == (4096,) and s.dtype == np.float32 for s in segs)


def test_batcher(wav_dir):
    cfg = make_config({"path": str(wav_dir)})
    ds = D.AudioFolderDataset(cfg, fs=44100, seg_len=4096)
    b = D.Batcher(ds, 4)
    batch = next(b)
    assert batch.shape == (4, 4096)
    b.close()


def test_maestro_csv(tmp_path, rng):
    root = tmp_path / "maestro"
    os.makedirs(root / "2017")
    rows = []
    for i, (year, split) in enumerate([(2017, "train"), (2017, "train"), (2017, "test")]):
        rel = f"2017/f{i}.wav"
        write_wav(str(root / rel), rng.standard_normal(44100 * 3) * 0.1, 44100)
        rows.append({"year": year, "split": split, "audio_filename": rel})
    with open(root / "maestro-v3.0.0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["year", "split", "audio_filename"])
        w.writeheader()
        w.writerows(rows)

    cfg = make_config({"path": str(root), "years": [2017], "load_len": 8192})
    ds = D.MaestroDatasetFs(cfg)
    seg, fs = next(iter(ds))
    assert seg.shape == (8192,)
    assert fs == 44100

    test_ds = D.MaestroDatasetTestChunks(cfg, num_samples=1)
    audio, fs, name = test_ds[0]
    assert fs == 44100 and name == "f2.wav"


def test_cocochorales_mixture(tmp_path, rng):
    for track in range(2):
        d = tmp_path / f"track{track}"
        os.makedirs(d)
        for s in range(4):
            write_wav(str(d / f"stem{s}.wav"), rng.standard_normal(30000) * 0.05, 16000)
    cfg = make_config({"path": str(tmp_path), "prob_quartet": 1.0,
                       "prob_trio": 0.0, "prob_duo": 0.0})
    ds = D.CocoChoralesDataset(cfg, fs=16000, seg_len=4096)
    seg = next(iter(ds))
    assert seg.shape == (4096,)
