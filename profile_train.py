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
    import os

    bench_model = os.environ.get("TITANET_BENCH_MODEL", "")
    if bench_model == "ecapa":
        from titanet_tpu.models import get_ecapa

        model = get_ecapa(channels=512, dtype=jnp.dtype(dtype))
    elif bench_model == "xvector":
        from titanet_tpu.models import get_xvector

        model = get_xvector(dtype=jnp.dtype(dtype))
    elif bench_model == "resnet":
        from titanet_tpu.models import get_resnet

        model = get_resnet(dtype=jnp.dtype(dtype))
    elif bench_model == "conformer":
        from titanet_tpu.models import get_conformer

        model = get_conformer(dtype=jnp.dtype(dtype))
    else:
        model = get_titanet(
            model_size="s", n_mega_blocks=17, dtype=jnp.dtype(dtype),
            scan_blocks=os.environ.get("TITANET_BENCH_SCAN", "") == "1",
        )
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


def parse_hlo_components(hlo_text):
    """Map each top-level HLO instruction name -> list of component labels.

    Components come from the ``op_name`` metadata XLA carries per
    instruction (flax module paths, e.g.
    ``jit(f)/transpose(jvp(TitaNet))/encoder/mega_block_3/sub_block_0/...``).
    Fusions attribute to every instruction inside their fused computation
    (proportional split downstream). ``transpose(`` in the path marks the
    backward pass.
    """
    import re

    # computation name -> list of op_name metadata inside it
    comp_ops = collections.defaultdict(list)
    # top-level instruction name -> (called computation | own metadata)
    calls = {}
    own_meta = {}
    current = "entry"
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{$", s)
        if s.endswith("{") and ("fused_computation" in s or s.startswith("ENTRY")
                                or re.match(r"%?[\w.\-]+ \(", s)):
            name = s.split()[0].lstrip("%").split("(")[0].rstrip()
            current = "entry" if s.startswith("ENTRY") else name
        mm = re.match(r"(?:ROOT )?%?([\w.\-]+) = .*", s)
        if not mm:
            continue
        inst = mm.group(1)
        meta = re.search(r'op_name="([^"]+)"', s)
        if meta:
            comp_ops[current].append(meta.group(1))
            own_meta[(current, inst)] = meta.group(1)
        c = re.search(r"calls=%?([\w.\-]+)", s)
        if c:
            calls[(current, inst)] = c.group(1)
    return comp_ops, calls, own_meta


def component_of(op_name):
    """(component, direction) from an op_name metadata path."""
    import re

    # parameter-staging instructions carry the pytree path, e.g.
    # v['params']['encoder']['mega_block_0'][...] — the MSA prefetch copies
    keys = re.findall(r"\[\\?'([^'\\\]]+)\\?'\]", op_name)
    if keys:
        tree = [k for k in keys if k not in ("params", "batch_stats")]
        return "param-copy " + "/".join(tree[:2]), "-"
    parts = op_name.split("/")
    last_wrap = -1
    for i, p in enumerate(parts):
        if "(" in p:
            last_wrap = i
    direction = "bwd" if any("transpose(" in p for p in parts) else "fwd"
    tail = parts[last_wrap + 1:]
    if not tail:
        return "other", direction
    # trim module class wrapper (TitaNet) if present, keep 2 path segments
    if tail and tail[0] in ("TitaNet", "_MegaBlockScanBody"):
        tail = tail[1:]
    comp = "/".join(tail[:2]) if tail else "other"
    return comp or "other", direction


def attribute_trace(by_op, hlo_text):
    """Proportionally attribute per-op device time to model components."""
    comp_ops, calls, own_meta = parse_hlo_components(hlo_text)
    budget = collections.Counter()
    unmatched = 0.0
    for inst, dur in by_op.items():
        key = ("entry", inst)
        metas = []
        if key in calls and calls[key] in comp_ops:
            metas = comp_ops[calls[key]]
        elif key in own_meta:
            metas = [own_meta[key]]
        else:
            # search any computation defining this instruction
            hits = [m for (c, i), m in own_meta.items() if i == inst]
            metas = hits
        if not metas:
            unmatched += dur
            budget[("<unmatched>", "-")] += dur
            continue
        share = dur / len(metas)
        for m in metas:
            budget[component_of(m)] += share
    return budget, unmatched


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
    ap.add_argument(
        "--attr", action="store_true",
        help="per-component attribution: join trace op durations to the "
        "compiled HLO's op_name metadata (approximate — fusion time is "
        "split evenly across the fused instructions' components)",
    )
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax

    from titanet_tpu.utils.profiling import trace as capture

    step, carry = build_step(
        args.batch, args.seconds, args.classes, args.dtype, infer=args.infer
    )
    hlo_text = None
    if args.attr:
        # one outer jit so the executable we run IS the text we parse
        step = jax.jit(step, donate_argnums=() if args.infer else 0)
        hlo_text = step.lower(carry).compile().as_text()
    carry = step(carry)  # compile + warm
    jax.block_until_ready(carry)

    logdir = args.logdir or tempfile.mkdtemp(prefix="titanet_trace_")
    with capture(logdir):
        for _ in range(args.steps):
            carry = step(carry)
        jax.block_until_ready(carry)

    by_cat, by_op, op_cat = parse_trace(logdir, args.steps)
    if args.attr:
        budget, unmatched = attribute_trace(by_op, hlo_text)
        total_attr = sum(budget.values())
        print(f"\n== per-component device time (approximate; unmatched "
              f"{100.0 * unmatched / max(total_attr, 1):.1f}%) ==")
        for (comp, direction), us in budget.most_common(30):
            print(f"  {comp:<36} {direction:<4} "
                  f"{us / args.steps / 1e3:8.3f} ms "
                  f"({100.0 * us / total_attr:5.1f}%)")
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
