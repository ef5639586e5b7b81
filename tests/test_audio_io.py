"""Audio IO tests: WAV codec round-trip, native FLAC decoder vs fixtures."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from tests.flac_fixture import encode_flac
from titanet_tpu.data.audio_io import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((1, 8000)) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 16000)
    y, sr = read_wav(path)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)


def test_wav_stereo(tmp_path):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal((2, 4000)) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "s.wav")
    write_wav(path, x, 8000)
    y, sr = read_wav(path)
    assert sr == 8000 and y.shape == (2, 4000)
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)


needs_compiler = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ compiler"
)


@pytest.fixture(scope="module")
def native_lib():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native"), "-s"], check=True)
    from titanet_tpu.data import native

    return native


def _pcm(seed, channels=1, n=10000, amp=12000):
    rng = np.random.default_rng(seed)
    # band-limited-ish signal: cumulative sum of small steps, clipped
    steps = rng.integers(-400, 400, (channels, n))
    x = np.cumsum(steps, axis=1)
    x = np.clip(x, -amp, amp)
    return x.astype(np.int64)


@needs_compiler
@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "lpc"])
def test_flac_decode_modes(tmp_path, native_lib, mode):
    if mode == "constant":
        pcm = np.full((1, 5000), -123, np.int64)
    else:
        pcm = _pcm(seed=hash(mode) % 2**31)
    blob = encode_flac(pcm, sample_rate=16000, mode=mode, block_size=1024)
    path = str(tmp_path / f"{mode}.flac")
    with open(path, "wb") as f:
        f.write(blob)
    wav, sr = native_lib.read_flac(path)
    assert sr == 16000
    assert wav.shape == (1, pcm.shape[1])
    expected = pcm.astype(np.float32) / 32768.0
    np.testing.assert_allclose(wav, expected, atol=1e-7)


@needs_compiler
@pytest.mark.parametrize("stereo_mode", ["independent", "left_side"])
def test_flac_decode_stereo(tmp_path, native_lib, stereo_mode):
    pcm = _pcm(seed=7, channels=2)
    blob = encode_flac(pcm, sample_rate=48000, mode="fixed1",
                       stereo_mode=stereo_mode, block_size=2048)
    path = str(tmp_path / "st.flac")
    with open(path, "wb") as f:
        f.write(blob)
    wav, sr = native_lib.read_flac(path)
    assert sr == 48000 and wav.shape == (2, pcm.shape[1])
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0, atol=1e-7)


@needs_compiler
def test_flac_via_read_audio(tmp_path, native_lib):
    from titanet_tpu.data.audio_io import read_audio

    pcm = _pcm(seed=3)
    path = str(tmp_path / "x.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, mode="fixed2"))
    wav, sr = read_audio(path)
    assert sr == 16000 and wav.shape[1] == pcm.shape[1]


@needs_compiler
def test_flac_corrupt_input_fails_cleanly(tmp_path, native_lib):
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(b"fLaC" + b"\x00" * 100)
    with pytest.raises(ValueError):
        native_lib.read_flac(path)


@needs_compiler
def test_flac_wasted_bits(tmp_path, native_lib):
    pcm = (_pcm(seed=11) >> 2) << 2  # low 2 bits zero
    blob = encode_flac(pcm, mode="verbatim", wasted=2)
    path = str(tmp_path / "w.flac")
    open(path, "wb").write(blob)
    wav, sr = native_lib.read_flac(path)
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0, atol=1e-7)


@needs_compiler
def test_flac_many_frames_utf8_numbers(tmp_path, native_lib):
    """>128 frames exercises 2-byte UTF-8 frame numbers in frame headers."""
    pcm = _pcm(seed=12, n=150 * 256)
    blob = encode_flac(pcm, mode="fixed1", block_size=256)
    path = str(tmp_path / "many.flac")
    open(path, "wb").write(blob)
    wav, sr = native_lib.read_flac(path)
    assert wav.shape == (1, 150 * 256)
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0, atol=1e-7)


@needs_compiler
def test_flac_fuzz_mutations_do_not_crash(tmp_path, native_lib):
    """Randomly corrupted streams must fail cleanly (or decode), never
    crash the process. The decoder guards all reads and loop bounds."""
    rng = np.random.default_rng(99)
    pcm = _pcm(seed=13, n=4000)
    blob = bytearray(encode_flac(pcm, mode="fixed2", block_size=512))
    ok, failed = 0, 0
    for trial in range(60):
        mutated = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            pos = rng.integers(4, len(mutated))  # keep the magic intact
            mutated[pos] = rng.integers(0, 256)
        path = str(tmp_path / f"fuzz{trial}.flac")
        open(path, "wb").write(bytes(mutated))
        try:
            native_lib.read_flac(path)  # values may be garbage; no crash
            ok += 1
        except ValueError:
            failed += 1
    assert ok + failed == 60  # process survived every mutation
