"""Native C++ wav loader: parity with the Python IO path + streaming."""

import numpy as np
import pytest

from babe_tpu.data.wavio import read_wav, write_wav

native = pytest.importorskip("babe_tpu.native")


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("nat")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        x = (rng.standard_normal(30000) * 0.1).astype(np.float32)
        p = str(d / f"t{i}.wav")
        write_wav(p, x, 22050)
        paths.append(p)
    # also a float32 wav
    pf = str(d / "f32.wav")
    write_wav(pf, (rng.standard_normal(5000) * 0.1).astype(np.float32), 16000,
              subtype="FLOAT")
    paths.append(pf)
    return paths


def test_native_read_matches_python(wavs):
    if native.get_lib() is None:
        pytest.skip("toolchain unavailable")
    for p in wavs:
        ref, fs_ref = read_wav(p)
        out = native.read_wav_native(p)
        assert out is not None, f"native parse failed for {p}"
        audio, fs = out
        assert fs == fs_ref
        np.testing.assert_allclose(audio, ref, atol=1e-6)


def test_native_loader_stream(wavs):
    if native.get_lib() is None:
        pytest.skip("toolchain unavailable")
    loader = native.NativeLoader(wavs[:3], seg_len=4096, batch=4, n_threads=2,
                                 yield_fs=True)
    for _ in range(5):
        batch, fs = next(loader)
        assert batch.shape == (4, 4096)
        assert batch.dtype == np.float32
        assert np.abs(batch).max() > 0  # real data, not zeros
        assert set(fs.tolist()) <= {22050}
    loader.close()


def test_native_loader_throughput(wavs):
    """The native loader should sustain far more than training needs."""
    if native.get_lib() is None:
        pytest.skip("toolchain unavailable")
    import time

    loader = native.NativeLoader(wavs[:3], seg_len=8192, batch=8, n_threads=4)
    next(loader)  # warm
    t0 = time.time()
    n = 20
    for _ in range(n):
        next(loader)
    dt = time.time() - t0
    loader.close()
    batches_per_s = n / dt
    assert batches_per_s > 5, f"native loader too slow: {batches_per_s}/s"
