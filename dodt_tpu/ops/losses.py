"""Loss functions (pure JAX), parity with reference avod/core/losses.py."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                       weight: jnp.ndarray) -> jnp.ndarray:
    """Per-row smooth L1 summed over the code axis, scaled by weight.

    pred/target: (N, D); weight: (N,). Returns (N,).
    Reference losses.WeightedSmoothL1Loss:127.
    """
    diff = pred - target
    abs_diff = jnp.abs(diff)
    elem = jnp.where(abs_diff < 1.0, 0.5 * jnp.square(abs_diff),
                     abs_diff - 0.5)
    return jnp.sum(elem, axis=-1) * weight


def weighted_softmax(logits: jnp.ndarray, onehot: jnp.ndarray,
                     weight) -> jnp.ndarray:
    """Sum of softmax cross-entropy over rows x scalar weight.
    Reference losses.WeightedSoftmaxLoss:157."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    return jnp.sum(ce) * weight


def weighted_sigmoid(logits: jnp.ndarray, targets: jnp.ndarray,
                     weights: jnp.ndarray) -> jnp.ndarray:
    """Sum of sigmoid cross-entropy * weights.
    Reference losses.WeightedSigmoidClassificationLoss:96."""
    ce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(ce * weights)


def weighted_l2_localization(pred: jnp.ndarray, target: jnp.ndarray,
                             weight: jnp.ndarray) -> jnp.ndarray:
    """0.5 * || w * (pred - target) ||^2 summed.
    Reference losses.WeightedL2LocalizationLoss:70."""
    weighted_diff = (pred - target) * weight[..., None]
    return jnp.sum(0.5 * jnp.square(weighted_diff))


def label_smoothing_onehot(labels: jnp.ndarray, num_classes: int,
                           epsilon: float = 0.001) -> jnp.ndarray:
    """One-hot with label smoothing as used by the reference models
    (rpn_model/avod_model apply (1 - eps) * onehot + eps / K)."""
    onehot = jax.nn.one_hot(labels, num_classes)
    return onehot * (1.0 - epsilon) + epsilon / num_classes
