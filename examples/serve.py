"""Minimal speaker service: embed / enroll / verify / identify over HTTP.

Production-serving demo on top of :class:`titanet_tpu.train.extractor
.SpeakerEmbedder` (bucketed batching, warmup-precompiled executables) and
:class:`titanet_tpu.train.enroll.SpeakerRegistry` (profiles, open-set
decisions, optional calibrated-LLR thresholds). stdlib-only server; for
real deployments put the same embedder behind your serving stack or use
the AOT export (titanet_tpu.utils.export).

    python examples/serve.py [--port 8077] [--checkpoint-dir ...] &
    curl -s --data-binary @utt.wav http://127.0.0.1:8077/embed | head -c 200
    curl -s --data-binary @utt.wav 'http://127.0.0.1:8077/enroll?name=ada'
    curl -s --data-binary @utt2.wav 'http://127.0.0.1:8077/verify?name=ada'
    curl -s --data-binary @utt2.wav http://127.0.0.1:8077/identify
"""

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_embedder(args):
    import jax
    import jax.numpy as jnp

    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from titanet_tpu.train.extractor import SpeakerEmbedder

    # --fast-frontend: the fully-fused Pallas wav->mel kernel at serving
    # precision — the measured-fastest frontend on TPU (BENCHMARKS.md);
    # keep the default (torchaudio-parity) frontend for bit-level parity.
    cfg = (
        FrontendConfig.from_ms(precision="default", use_pallas_fused=True)
        if args.fast_frontend
        else FrontendConfig.from_ms()
    )
    if args.model_size.startswith("ecapa"):
        from titanet_tpu.models import get_ecapa

        channels = int(args.model_size[len("ecapa"):] or 512)
        model = get_ecapa(channels=channels)
        if args.quantized:
            raise SystemExit("--quantized is TitaNet-only (int8 PTQ tree)")
    elif args.model_size == "xvector":
        from titanet_tpu.models import get_xvector

        model = get_xvector()
        if args.quantized:
            raise SystemExit("--quantized is TitaNet-only (int8 PTQ tree)")
    elif args.model_size == "resnet":
        from titanet_tpu.models import get_resnet

        model = get_resnet()
        if args.quantized:
            raise SystemExit("--quantized is TitaNet-only (int8 PTQ tree)")
    elif args.model_size == "conformer":
        from titanet_tpu.models import get_conformer

        model = get_conformer()
        if args.quantized:
            raise SystemExit("--quantized is TitaNet-only (int8 PTQ tree)")
    else:
        model = get_titanet(model_size=args.model_size)
    mel0, _ = log_mel_spectrogram(jnp.zeros((1, 16000)), cfg)
    variables = jax.jit(model.init)(jax.random.key(0), mel0)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if args.checkpoint_dir:
        from titanet_tpu.losses.heads import build_head
        from titanet_tpu.train import checkpoint as ckpt
        from titanet_tpu.train import create_train_state, make_optimizer

        abstract = create_train_state(
            jax.random.key(0), model,
            build_head("ce", model.embedding_size, args.n_classes),
            make_optimizer(), mel0, args.n_classes, ema=args.ema,
        )
        state, epoch = ckpt.restore_latest(args.checkpoint_dir, abstract)
        if state is None:
            raise FileNotFoundError(args.checkpoint_dir)
        # --ema: serve the EMA weights from an EMA-trained checkpoint
        # (training.ema_decay > 0) — the deployable model
        src = state.ema_params if args.ema else state.params
        params, stats = src["backbone"], state.batch_stats
        print(f"serving checkpoint epoch {epoch}" + (" (EMA weights)" if args.ema else ""))
    emb = SpeakerEmbedder(
        model, params, stats, frontend=cfg,
        buckets=[16000, 32000, 48000, 96000], batch_size=args.batch_size,
        quantized=args.quantized,  # int8: 4x weight compression (slower
        #                            than bf16 on v5e — BENCHMARKS.md)
    )
    emb.warmup()
    return emb


def make_handler(embedder, registry=None, sample_rate=16000,
                 registry_path=None):
    from urllib.parse import parse_qs, urlparse

    from titanet_tpu.data.audio_io import read_wav

    class Handler(BaseHTTPRequestHandler):
        def _embed_body(self):
            import tempfile

            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                f.write(body)
                f.flush()
                wav, sr = read_wav(f.name)
            if sr != sample_rate:
                from titanet_tpu.data.loader import _resample_host

                wav = _resample_host(wav[0], sr, sample_rate)[None]
            return embedder.embed([wav[0]])[0]

        def _reply(self, code, obj):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            url = urlparse(self.path)
            route = url.path
            qs = parse_qs(url.query)
            if route not in ("/embed", "/enroll", "/verify", "/identify"):
                self.send_error(404)
                return
            try:
                vec = self._embed_body()
                if route == "/embed":
                    self._reply(200, {"embedding": vec.tolist(),
                                      "dim": len(vec)})
                    return
                if registry is None:
                    raise ValueError("no registry on this server")
                if route == "/enroll":
                    name = qs["name"][0]
                    registry.enroll(name, vec)
                    if registry_path:
                        registry.save(registry_path)
                    self._reply(200, {"enrolled": name,
                                      "speakers": registry.speakers})
                elif route == "/verify":
                    name = qs["name"][0]
                    accept, score = registry.verify(name, vec)
                    self._reply(200, {"speaker": name, "accept": accept,
                                      "score": score})
                else:  # /identify
                    top = registry.identify(vec, top_k=3)[0]
                    self._reply(200, {"candidates": [
                        {"speaker": s, "score": sc} for s, sc in top
                    ]})
            except Exception as e:  # malformed input -> 400, never crash
                self._reply(400, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8077)
    parser.add_argument("--model-size", default="s",
                        help="s|m|l (TitaNet), ecapa512|ecapa1024, xvector, "
                             "resnet, or conformer")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--n-classes", type=int, default=251)
    parser.add_argument("--fast-frontend", action="store_true",
                        help="fused Pallas frontend at serving precision")
    parser.add_argument("--quantized", action="store_true",
                        help="int8 encoder (4x weight compression)")
    parser.add_argument("--ema", action="store_true",
                        help="serve EMA weights from an EMA-trained "
                             "checkpoint (training.ema_decay > 0)")
    parser.add_argument("--registry", default=None,
                        help="JSON path for the speaker registry "
                             "(loaded if present, saved after each enroll)")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="accept threshold (raw cosine; an LLR floor "
                             "when the loaded registry carries calibration)")
    args = parser.parse_args()
    embedder = build_embedder(args)
    from titanet_tpu.train.enroll import SpeakerRegistry

    if args.registry and os.path.exists(args.registry):
        registry = SpeakerRegistry.load(args.registry)
    else:
        registry = SpeakerRegistry(threshold=args.threshold)
    server = HTTPServer(
        ("127.0.0.1", args.port),
        make_handler(embedder, registry, registry_path=args.registry),
    )
    print(f"speaker service on http://127.0.0.1:{args.port}"
          f"/{{embed,enroll,verify,identify}}")
    server.serve_forever()


if __name__ == "__main__":
    main()
