"""Training/eval engine: state, steps, metrics, checkpointing, loop."""

from titanet_tpu.train.metrics import (  # noqa: F401
    all_pairs_scores_labels,
    compute_eer,
    compute_mindcf,
    cosine_scores,
    cross_cosine_scores,
    get_test_metrics,
    get_train_val_metrics,
    metrics_from_class_counts,
    snorm_scores,
)
from titanet_tpu.train.trials import (  # noqa: F401
    embed_trial_files,
    evaluate_trials,
    parse_trial_list,
    trial_scores,
)
from titanet_tpu.train.state import (  # noqa: F401
    MetricsAcc,
    TrainState,
    accumulate_metrics,
    create_train_state,
    ema_eval_state,
    embed_step,
    embed_step_quantized,
    eval_step,
    infer_xla_options,
    init_metrics_acc,
    make_optimizer,
    train_step,
    train_xla_options,
)
