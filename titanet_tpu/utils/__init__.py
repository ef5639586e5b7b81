"""Utilities: seeding, repro checks, logging, viz, torch interop."""

from titanet_tpu.utils.logging import (  # noqa: F401
    ConsoleLogger,
    JsonlLogger,
    StepTimer,
    WandbLogger,
)


def set_seed(seed: int):
    """Global seeding (reference set_seed, src/utils.py:281-291). JAX
    randomness is explicit-key based; this covers numpy/python used by the
    host data pipeline and returns the root JAX key."""
    import os
    import random

    import jax
    import numpy as np

    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def chart_dependencies(model, variables, n_mels: int = 80, seed: int = 0):
    """Backprop-based batch-independence check (reference chart_dependencies,
    src/utils.py:451-468, Karpathy recipe): asserts one batch element's
    output has zero gradient w.r.t. every other element's input."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    batch_size = int(rng.integers(2, 10))
    time_steps = int(rng.integers(10, 100))
    x = jnp.asarray(rng.standard_normal((batch_size, time_steps, n_mels)), jnp.float32)
    target = int(rng.integers(0, batch_size))  # reference had an off-by-one here

    def single(inputs):
        return model.apply(variables, inputs, train=False)[target].sum()

    g = np.asarray(jax.jit(jax.grad(single))(x))
    others = np.delete(g, target, axis=0)
    assert (others == 0).all() and np.abs(g[target]).max() > 0, (
        f"Only index {target} should have non-zero gradients"
    )
    return True
