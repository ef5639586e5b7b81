"""Metric-learning losses / classification heads.

Rebuild of the reference loss zoo (``/root/reference/src/losses.py``). Heads
are standalone flax modules with their OWN param tree — unlike the reference,
which hid classifier weights inside loss objects attached to the model so
they were silently dropped from checkpoints (src/models.py:318-339,
src/learn.py:188-195). Here backbone and head params are separate, both
checkpointed, and the embedding path never depends on the head.

Every head returns ``(normalized_embeddings, predictions, loss)`` matching
the reference contract (src/losses.py:44,132,261).
"""

from titanet_tpu.losses.heads import (  # noqa: F401
    LOSSES,
    AngularMarginHead,
    ArcFaceHead,
    CEHead,
    CosFaceHead,
    GE2EHead,
    SphereFaceHead,
    head_param_count,
)
