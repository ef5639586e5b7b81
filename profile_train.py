"""Trace-based train-step profiler: op-category budget for one train step.

Captures a jax.profiler trace of N chained train steps on the real TPU
(relay-safe: state threading makes the chain unhoistable), parses the
Trace-Events JSON (no TensorBoard needed), and prints:

- total device time per `hlo_category` (averaged per step),
- the top-K most expensive HLO ops with their categories.

Usage:
  python profile_train.py [--steps 8] [--batch 128] [--top 25]
  python profile_train.py --infer          # profile embed_step instead

The per-step table this produces is the working artifact behind the
"train-step budget" paragraph in BENCHMARKS.md.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile


def build_step(batch, seconds, n_classes, dtype, infer=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import get_titanet
    from titanet_tpu.ops.augment import AugmentConfig
    from titanet_tpu.ops.frontend import FrontendConfig
    from titanet_tpu.train import (
        create_train_state,
        embed_step,
        make_optimizer,
        train_step,
    )

    jax.config.update("jax_default_prng_impl", "rbg")
    n_samples = int(seconds * 16000)
    frontend = FrontendConfig.from_ms()
    model = get_titanet(model_size="s", n_mega_blocks=17, dtype=jnp.dtype(dtype))
    head = build_head("ce", 192, n_classes)
    opt = make_optimizer(start_lr=1e-3)
    state = create_train_state(
        jax.random.key(0), model, head, opt, jnp.zeros((2, 301, 80)), n_classes
    )
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n_samples)) * 0.1, jnp.float32)
    # uniform-length fast path (lengths=None), matching the training loop's
    # packed-bucket batches and bench_train.py
    lengths = None
    spk = jnp.asarray(rng.integers(0, n_classes, batch), jnp.int32)

    if infer:
        params, stats = state.params["backbone"], state.batch_stats

        def step(carry):
            # data-dependence via carry so chained calls can't be hoisted
            emb = embed_step(
                params, stats, wav + carry, lengths, model=model, frontend=frontend
            )
            return emb[0, 0].astype(jnp.float32)

        return step, jnp.zeros(())

    kw = dict(
        model=model,
        head=head,
        optimizer=opt,
        frontend=frontend,
        augment=AugmentConfig(probability=0.5),
    )

    def step(state):
        state, m = train_step(state, wav, lengths, spk, **kw)
        return state

    return step, state


def parse_trace(logdir, n_steps):
    """Sum device-op durations by hlo_category from the Trace-Events dump."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace found under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device pids: process names containing "TPU" / "/device:"
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_cat = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur = e.get("dur", 0)  # us
        by_cat[cat] += dur
        name = args.get("long_name") or e.get("name", "?")
        by_op[e.get("name", "?")] += dur
        op_cat[e.get("name", "?")] = (cat, name[:140])
    return by_cat, by_op, op_cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--classes", type=int, default=251)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--infer", action="store_true")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax

    from titanet_tpu.utils.profiling import trace as capture

    step, carry = build_step(
        args.batch, args.seconds, args.classes, args.dtype, infer=args.infer
    )
    carry = step(carry)  # compile + warm
    jax.block_until_ready(carry)

    logdir = args.logdir or tempfile.mkdtemp(prefix="titanet_trace_")
    with capture(logdir):
        for _ in range(args.steps):
            carry = step(carry)
        jax.block_until_ready(carry)

    by_cat, by_op, op_cat = parse_trace(logdir, args.steps)
    total = sum(by_cat.values())
    print(f"\n== per-step device time by hlo_category "
          f"({args.steps} steps, B={args.batch}) ==")
    for cat, us in by_cat.most_common():
        print(f"  {cat:<28} {us / args.steps / 1e3:8.3f} ms  "
              f"({100.0 * us / total:5.1f}%)")
    print(f"  {'TOTAL':<28} {total / args.steps / 1e3:8.3f} ms")
    print(f"\n== top {args.top} ops ==")
    for name, us in by_op.most_common(args.top):
        cat, long_name = op_cat[name]
        print(f"  {us / args.steps / 1e3:8.3f} ms  [{cat}] {name}")
        print(f"            {long_name}")
    print(f"\ntrace: {logdir}")


if __name__ == "__main__":
    main()
