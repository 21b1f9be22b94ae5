"""Misc utilities: seeding, file checks, env info.

Mirrors reference ``medmm/utils/tools.py`` (``set_random_seed:116``,
``check_isfile:64``, ``verify_str_arg``, env dump) in JAX terms.
"""

from __future__ import annotations

import os
import os.path as osp
import random
import warnings
from typing import Any, Iterable

import numpy as np


def set_random_seed(seed: int) -> "np.random.Generator":
    """Seed python/numpy and return a numpy Generator for the host pipeline.

    JAX-side randomness is handled by explicit ``jax.random`` keys derived
    from this seed in the trainer.
    """
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def check_isfile(fpath: str) -> bool:
    isfile = osp.isfile(fpath)
    if not isfile:
        warnings.warn(f'No file found at "{fpath}"')
    return isfile


def verify_str_arg(value: Any, arg: str, valid_values: Iterable[Any]) -> Any:
    valid = [str(v) for v in valid_values]
    if str(value) not in valid:
        raise ValueError(f"Invalid {arg}: {value!r}. Valid values are {valid}.")
    return str(value)


def tolist_if_not(x: Any) -> list:
    if not isinstance(x, list):
        x = [x]
    return x


def collect_env_info() -> str:
    import jax
    import platform

    lines = [
        f"python: {platform.python_version()}",
        f"jax: {jax.__version__}",
        f"jax backend: {jax.default_backend()}",
        f"devices: {jax.devices()}",
        f"device count: {jax.device_count()}",
        f"XLA_FLAGS: {os.environ.get('XLA_FLAGS', '')}",
    ]
    try:
        import flax
        import optax

        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except Exception:
        pass
    return "\n".join(lines)


def count_num_param(params) -> int:
    """Total number of scalars in a pytree of arrays."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
