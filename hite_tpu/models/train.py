"""Sharded training for the neural classifiers.

The reference trains NeuralTE with Keras `MirroredStrategy`
(`CNN_Model.py:104-122`) and HybridLTR with a PyTorch loop; here one optax
train step is jitted over a (dp, tp) mesh: batches sharded over 'dp',
wide dense/conv output channels sharded over 'tp' (column parallelism),
with XLA inserting the all-reduces.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from hite_tpu.parallel.mesh import param_sharding, replicated


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def create_state(model, rng, sample_inputs: Tuple, lr: float = 1e-3):
    """Init (params, opt_state, tx) for a flax linen model."""
    params = model.init(rng, *sample_inputs)
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    return params, opt_state, tx


def make_train_step(model, tx) -> Callable:
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss).

    batch: dict with 'inputs' (tuple of arrays, leading batch axis) and
    'labels' (int32 [B]).
    """

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            logits = model.apply(p, *batch["inputs"], rngs={"dropout": jax.random.key(0)})
            return cross_entropy(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_train(
    mesh: Mesh, model, tx, params, opt_state
) -> Tuple[Callable, Any, Any]:
    """jit the train step with mesh shardings; returns
    (jitted_step, sharded_params, sharded_opt_state)."""
    p_shard = param_sharding(mesh, params)
    # optimizer moments mirror their parameter shardings; scalars replicate
    o_shard = _opt_sharding(opt_state, params, p_shard, mesh)

    step = make_train_step(model, tx)
    jitted = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, None),
        out_shardings=(p_shard, o_shard, replicated(mesh)),
    )
    sharded_params = jax.device_put(params, p_shard)
    sharded_opt = jax.device_put(opt_state, o_shard)
    return jitted, sharded_params, sharded_opt


def _opt_sharding(opt_state, params, p_shard, mesh):
    """Shard optimizer moments like their parameters (same pytree leaves)."""
    flat_params, _ = jax.tree.flatten(params)
    flat_shards, _ = jax.tree.flatten(p_shard)
    shape_to_shard = {}
    for leaf, sh in zip(flat_params, flat_shards):
        shape_to_shard.setdefault((leaf.shape, leaf.dtype), sh)

    def rule(leaf):
        if hasattr(leaf, "shape"):
            sh = shape_to_shard.get((leaf.shape, leaf.dtype))
            if sh is not None:
                return sh
        return replicated(mesh)

    return jax.tree.map(rule, opt_state)
