"""Utilities: seeding, repro checks, logging, viz, torch interop."""

from titanet_tpu.utils.logging import (  # noqa: F401
    ConsoleLogger,
    JsonlLogger,
    StepTimer,
    TensorBoardLogger,
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


def enable_compilation_cache(cache_dir: str) -> None:
    """Persistent on-disk XLA compilation cache.

    New capability vs the reference (it had no compile step at all): TPU
    executables compile in ~5-60 s each, so a resumed or re-launched run
    (checkpoint restore, eval-only invocation, hyperparameter retry with
    an identical model) pays that again for every jitted step function.
    With the cache enabled, identical (HLO, compile options, backend)
    lowerings are served from ``cache_dir`` across processes.

    Safe to call more than once; creates ``cache_dir`` if missing.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every executable, however fast the compile was, and regardless
    # of the (host-dependent) compile-time heuristics
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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
