"""Full-graph training loop (new capability — the reference is forward-only
in released code; SURVEY.md §7.6).

Functional train-step factory over any of the framework's forward models,
with optax optimizers, optional mixed precision, and simple checkpointing
(weights as .npz — the reference has no model checkpointing at all, its only
persistence being the binary graph cache, SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None


def make_train_step(
    forward: Callable,
    optimizer,
    loss: str = "softmax_xent",
):
    """Build a jitted (params, opt_state, inputs..., labels, mask) -> step.

    ``forward(params, *inputs)`` must return [n, num_classes] logits.
    ``mask``: optional bool[n] of labeled nodes (full-graph semi-supervised
    training masks only part of the vertices)."""

    def loss_fn(params, inputs, labels, mask):
        logits = forward(params, *inputs)
        if loss == "softmax_xent":
            per_node = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
        else:
            raise ValueError(loss)
        if mask is not None:
            per_node = jnp.where(mask, per_node, 0.0)
            return per_node.sum() / jnp.maximum(mask.sum(), 1)
        return per_node.mean()

    @jax.jit
    def train_step(params, opt_state, inputs, labels, mask=None):
        lval, grads = jax.value_and_grad(loss_fn)(
            params, inputs, labels, mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return lval, params, opt_state

    return train_step


@jax.jit
def accuracy(logits, labels, mask=None):
    hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if mask is not None:
        hit = jnp.where(mask, hit, 0.0)
        return hit.sum() / jnp.maximum(mask.sum(), 1)
    return hit.mean()


# ------------------------------------------------------------- checkpointing
def save_checkpoint(path: str, params, step: int = 0) -> None:
    """Flatten a params pytree to an .npz checkpoint."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __step__=np.int64(step),
        __treedef__=np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8
        ),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, params_like):
    """Restore a checkpoint into the structure of ``params_like``.
    Returns (params, step)."""
    z = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(params_like)
    leaves = [
        jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves_like))
    ]
    for got, like in zip(leaves, leaves_like):
        assert got.shape == jnp.shape(like), (
            f"checkpoint shape {got.shape} != model {jnp.shape(like)}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves), int(z["__step__"])
