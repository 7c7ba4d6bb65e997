"""Native data-path library tests: parity of wav decode and batched
chunk packing against the pure-Python path (native/misonet_native.cpp)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from misonet_tpu.data import native
from misonet_tpu.data.wavio import read_wav, write_wav
from misonet_tpu.ops.chunk import train_chunks

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def built():
    if not (ROOT / "native" / "libmisonet_native.so").exists():
        subprocess.run(["make", "-C", str(ROOT / "native")], check=True)
    assert native.available()


def _make_wav(path, rng, n=5000, ch=6):
    x = (rng.standard_normal((n, ch)) * 0.1).astype(np.float32)
    write_wav(path, x, 8000)
    return x


def test_wav_info_and_read_parity(tmp_path):
    rng = np.random.default_rng(0)
    x = _make_wav(tmp_path / "a.wav", rng)
    frames, ch, rate = native.wav_info(tmp_path / "a.wav")
    assert (frames, ch, rate) == (5000, 6, 8000)
    nat, sr = native.read_wav_native(tmp_path / "a.wav")
    ref, _ = read_wav(tmp_path / "a.wav")
    np.testing.assert_array_equal(nat, ref)
    assert sr == 8000


def test_mono_wav(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    write_wav(tmp_path / "m.wav", x, 8000)
    nat, _ = native.read_wav_native(tmp_path / "m.wav")
    ref, _ = read_wav(tmp_path / "m.wav")
    assert nat.ndim == 1
    np.testing.assert_array_equal(nat, ref)


def test_pack_shards_matches_python_chunker(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    expected = []
    for i, n in enumerate([5000, 2100, 2000, 1999]):
        p = tmp_path / f"u{i}.wav"
        _make_wav(p, rng, n=n, ch=3)
        paths.append(p)
        data, _ = read_wav(p)
        expected.extend(train_chunks(data, 2000, 1000))
    packed = native.pack_shards(paths, chunk=2000, least=1000, channels=3)
    ref = np.stack(expected) if expected else packed
    assert packed.shape == ref.shape
    np.testing.assert_array_equal(packed, ref)


def test_pack_shards_threaded_determinism(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(12):
        p = tmp_path / f"t{i}.wav"
        _make_wav(p, rng, n=4321, ch=2)
        paths.append(p)
    a = native.pack_shards(paths, 2000, 1000, 2, num_threads=1)
    b = native.pack_shards(paths, 2000, 1000, 2, num_threads=8)
    np.testing.assert_array_equal(a, b)


def test_native_corpus_extraction_matches_python(tmp_path):
    """extract_corpus's native batch path (pack_shards across roles) must
    write byte-identical npz shards to the per-utterance python path."""
    from misonet_tpu.data.extraction import ExtractionSpec, extract_corpus

    rng = np.random.default_rng(4)
    specs = []
    for i, n in enumerate([5000, 2100, 1999]):
        mix = tmp_path / f"u{i}.wav"
        _make_wav(mix, rng, n=n, ch=6)
        srcs = []
        for s in range(2):
            p = tmp_path / f"u{i}_{s}.wav"
            _make_wav(p, rng, n=n, ch=6)
            srcs.append(str(p))
        noise = tmp_path / f"u{i}_noise.wav"
        _make_wav(noise, rng, n=n, ch=6)
        specs.append(
            ExtractionSpec(
                f"u{i}", str(mix), tuple(srcs), (("noise", str(noise)),)
            )
        )

    out_nat = tmp_path / "nat"
    out_py = tmp_path / "py"
    n_nat = extract_corpus(specs, out_nat, 2000, 1000, use_native=True)
    n_py = extract_corpus(specs, out_py, 2000, 1000, use_native=False)
    assert n_nat == n_py > 0

    nat_files = sorted(p.name for p in out_nat.glob("*.npz"))
    py_files = sorted(p.name for p in out_py.glob("*.npz"))
    assert nat_files == py_files
    for name in nat_files:
        a = np.load(out_nat / name)
        b = np.load(out_py / name)
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{name}:{k}")
