"""examples/serve.py HTTP handler: embed/enroll/verify/identify routes
driven end-to-end over a real local HTTP server (stub embedder — the
device path is covered by extractor/embedder tests)."""

import json
import os
import sys
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


class _StubEmbedder:
    """Deterministic waveform -> unit embedding (spectral-ish features so
    different tones land on different embeddings)."""

    def embed(self, waveforms):
        out = []
        for w in waveforms:
            spec = np.abs(np.fft.rfft(np.asarray(w)[:8000], 256))[:32]
            out.append(spec / max(np.linalg.norm(spec), 1e-9))
        return np.stack(out)


def _wav_bytes(tmp_path, freq, name):
    from titanet_tpu.data.audio_io import write_wav

    t = np.arange(16000) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    path = str(tmp_path / name)
    write_wav(path, wav[None], 16000)
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture()
def server(tmp_path):
    from serve import make_handler
    from titanet_tpu.train.enroll import SpeakerRegistry

    registry = SpeakerRegistry(threshold=0.5)
    reg_path = str(tmp_path / "registry.json")
    httpd = HTTPServer(
        ("127.0.0.1", 0),
        make_handler(_StubEmbedder(), registry, registry_path=reg_path),
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}", reg_path
    httpd.shutdown()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_embed_enroll_verify_identify(server, tmp_path):
    base, reg_path = server
    ada = _wav_bytes(tmp_path, 220.0, "ada.wav")
    ada2 = _wav_bytes(tmp_path, 230.0, "ada2.wav")  # near ada
    bob = _wav_bytes(tmp_path, 1200.0, "bob.wav")  # in the kept FFT band

    status, out = _post(base + "/embed", ada)
    assert status == 200 and out["dim"] == 32

    status, out = _post(base + "/enroll?name=ada", ada)
    assert status == 200 and out["speakers"] == ["ada"]
    _post(base + "/enroll?name=bob", bob)

    status, out = _post(base + "/verify?name=ada", ada2)
    assert status == 200 and out["accept"] is True

    status, out = _post(base + "/verify?name=bob", ada2)
    assert status == 200 and out["accept"] is False

    status, out = _post(base + "/identify", bob)
    assert status == 200 and out["candidates"][0]["speaker"] == "bob"

    # registry persisted after enrolls
    from titanet_tpu.train.enroll import SpeakerRegistry

    assert SpeakerRegistry.load(reg_path).speakers == ["ada", "bob"]


def test_malformed_input_is_400_not_crash(server):
    base, _ = server
    status, out = _post(base + "/embed", b"this is not a wav file")
    assert status == 400 and "error" in out
    status, out = _post(base + "/verify?name=ghost", b"nope")
    assert status == 400
