"""Re-score finished EER-bench checkpoints at minDCF p_target=0.1.

MEASURED NULL RESULT (kept as the probe that established it): at
smoke-scale quality (EER ~0.24-0.29) minDCF saturates for ANY strict
p_target — bench3_arc_seed42 re-scored at p_target=0.1 gives 0.9489 vs
0.9490 at p_target=0.01. This is arithmetic, not trial support (the r3
protocol has ~11.4k target trials): at p=0.1 the normalized DCF is
``Pmiss + 9*Pfa``, which at EER~0.29 bottoms out near 0.95 wherever the
threshold sits; only far-better (real-corpus-scale) models give minDCF
room to move. EER is the discriminative metric on this benchmark (CE vs
Arc separate at 9.7 sigma, RESULTS.md).

    python docs/eer_bench/rescore_mindcf.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT_ROOT = os.path.join(REPO, "checkpoints", "eer_bench")


def main():
    sys.path.insert(0, OUT_DIR)
    from run_eer_bench import RUNS  # noqa: E402 (same dir)
    from titanet_tpu.cli import evaluate_checkpoint
    from titanet_tpu.config import load_config
    out = {}
    for name, overrides in RUNS:
        ckpt_dir = os.path.join(CKPT_ROOT, name)
        if not os.path.isdir(ckpt_dir):
            print(f"[skip] {name}: no checkpoint")
            continue
        overrides = dict(overrides)
        overrides["training.run_name"] = name
        overrides["test.mindcf_p_target"] = 0.1
        cfg = load_config(
            os.path.join(REPO, "configs", "bench5_hard_synth_eer.yml"), overrides
        )
        metrics = evaluate_checkpoint(cfg, ckpt_dir)
        out[name] = {
            "eer": metrics.get("test/eer"),
            "mindcf_p0.1": metrics.get("test/mindcf"),
        }
        print(name, out[name])
        with open(os.path.join(OUT_DIR, "mindcf_p01.json"), "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
