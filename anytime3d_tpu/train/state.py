"""Train state: params + Adam optimizer state + step counter.

Unlike the reference (per-submodel Keras save_weights; optimizer moments and
step counter lost on resume, SURVEY.md §5 checkpointing), the full state is
one pytree, checkpointed atomically by ``anytime3d_tpu.train.checkpoint``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def create_train_state(
    model,
    sample_input,
    key: jax.Array,
    learning_rate: float = 1e-4,
    extra_init_kwargs: dict | None = None,
) -> TrainState:
    """Initialize params with a sample input and build an Adam optimizer
    (reference default lr 1e-4, e.g. train_pascal.py:70). Uses the model's
    ``initialize`` method when present so every submodule gets params."""
    method = getattr(model, "initialize", None)
    params = model.init(
        {"params": key, "dropout": key},
        sample_input,
        method=method,
        **(extra_init_kwargs or {}),
    )["params"]
    tx = optax.adam(learning_rate)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def grads_finite_flag(grads) -> jnp.ndarray:
    """1.0 iff every gradient leaf is finite (sum-of-squares test in f32).

    Emitted by every train step as ``metrics['grads_finite']`` so the trainer
    can refuse to checkpoint a state whose UPDATE was poisoned even when the
    forward loss was still finite (bf16 backward-only overflow)."""
    sq = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    return jnp.isfinite(sq).astype(jnp.float32)


def l2_penalty(params, weight: float = 5e-4) -> jax.Array:
    """Kernel L2 regularization, matching keras l2(l=5e-4) on conv/dense
    kernels (weight * sum w²). Norm scales/biases are exempt."""

    def leaf_l2(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            return jnp.sum(jnp.square(leaf))
        return jnp.zeros((), leaf.dtype)

    leaves = jax.tree_util.tree_map_with_path(leaf_l2, params)
    return weight * jax.tree_util.tree_reduce(jnp.add, leaves, jnp.zeros(()))
