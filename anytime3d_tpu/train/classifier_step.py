"""Classifier pretraining step (backbone pretrainer).

Reference semantics: src/module/classifier.py:37-59 — softmax CE with L2,
top-1/top-5 metrics; distributed via MirroredStrategy (here: the same mesh
batch sharding as every other step).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from anytime3d_tpu.models.classifier import Classifier
from anytime3d_tpu.ops import softmax_cross_entropy, topk_accuracy
from anytime3d_tpu.train.state import TrainState, l2_penalty
from anytime3d_tpu.train.step import apply_gradients_if_finite


@dataclasses.dataclass(frozen=True)
class ClassifierLossConfig:
    l2_weight: float = 5e-4
    label_smoothing: float = 0.0


def classifier_losses(model: Classifier, cfg: ClassifierLossConfig, params, batch):
    logits = model.apply({"params": params}, batch["images"]).astype(jnp.float32)
    onehot = batch["labels"]
    if cfg.label_smoothing > 0:
        k = onehot.shape[-1]
        onehot = onehot * (1.0 - cfg.label_smoothing) + cfg.label_smoothing / k
    ce = jnp.mean(softmax_cross_entropy(logits, onehot))
    total = ce + l2_penalty(params, cfg.l2_weight)
    metrics = {
        "loss_ce": ce,
        "loss_total": total,
        "top1": topk_accuracy(logits, batch["labels"], k=1),
        "top5": topk_accuracy(logits, batch["labels"], k=min(5, logits.shape[-1])),
    }
    return total, metrics


def make_classifier_train_step(
    model: Classifier, cfg: ClassifierLossConfig = ClassifierLossConfig(), donate=True
):
    def step(state: TrainState, batch, key=None):
        def loss_fn(params):
            return classifier_losses(model, cfg, params, batch)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return apply_gradients_if_finite(state, grads, metrics)

    return jax.jit(step, donate_argnums=(0,) if donate else ())
