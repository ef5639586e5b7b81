"""Minimal embedding service: HTTP POST WAV bytes -> JSON embedding.

Production-serving demo on top of :class:`titanet_tpu.train.extractor
.SpeakerEmbedder` (bucketed batching, warmup-precompiled executables).
stdlib-only server; for real deployments put the same embedder behind your
serving stack or use the AOT export (titanet_tpu.utils.export).

    python examples/serve.py [--port 8077] [--checkpoint-dir ...] &
    curl -s --data-binary @utt.wav http://127.0.0.1:8077/embed | head -c 200
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


def make_handler(embedder, sample_rate=16000):
    from titanet_tpu.data.audio_io import read_wav

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/embed":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                import tempfile

                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(body)
                    f.flush()
                    wav, sr = read_wav(f.name)
                if sr != sample_rate:
                    from titanet_tpu.data.loader import _resample_host

                    wav = _resample_host(wav[0], sr, sample_rate)[None]
                vec = embedder.embed([wav[0]])[0]
                payload = json.dumps(
                    {"embedding": vec.tolist(), "dim": len(vec)}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # malformed input -> 400, never crash
                msg = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

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
    args = parser.parse_args()
    embedder = build_embedder(args)
    server = HTTPServer(("127.0.0.1", args.port), make_handler(embedder))
    print(f"embedding service on http://127.0.0.1:{args.port}/embed")
    server.serve_forever()


if __name__ == "__main__":
    main()
