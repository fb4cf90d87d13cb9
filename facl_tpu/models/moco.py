"""MoCo scaffold — functional JAX re-design of cn3d_model_conbag.py:429-570.

The torch class keeps a momentum ("key") encoder and a ring-buffer negative
queue as module state; in JAX these become explicit pytrees threaded through
pure functions, so the whole MoCo step stays jit-able. The contrastive body
(momentum update, queue logits, dequeue/enqueue) implements the *canonical*
semantics of the commented-out torch forward (cn3d_model_conbag.py:517-552);
the shipped forward had been reduced to query-encode only (:554-555), which
``encode_query`` reproduces.

Cross-replica note: the torch version gathers keys across GPUs before
enqueueing (``concat_all_gather``, :559-570, dead code). Under GSPMD jit the
queue is replicated and ``keys`` is the global batch, so the gather is
implicit.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class MoCoState(NamedTuple):
    key_params: Any       # EMA copy of the query encoder params
    queue: Array          # (K, D) negative keys (row-major ring buffer)
    queue_ptr: Array      # () int32


def init_moco_state(query_params: Any, dim: int = 512, queue_len: int = 9600,
                    rng: Array | None = None) -> MoCoState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (queue_len, dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return MoCoState(
        key_params=jax.tree_util.tree_map(jnp.array, query_params),
        queue=q,
        queue_ptr=jnp.zeros((), jnp.int32),
    )


def momentum_update(query_params: Any, key_params: Any,
                    m: float = 0.9) -> Any:
    """key <- m * key + (1-m) * query (cn3d_model_conbag.py:464-470)."""
    return jax.tree_util.tree_map(
        lambda k, q: k * m + q * (1.0 - m), key_params, query_params)


def enqueue(state: MoCoState, keys: Array) -> MoCoState:
    """Ring-buffer dequeue/enqueue (cn3d_model_conbag.py:472-486). Assumes
    queue_len % batch == 0, as the reference asserts."""
    batch = keys.shape[0]
    queue = jax.lax.dynamic_update_slice(
        state.queue, keys, (state.queue_ptr, jnp.zeros((), jnp.int32)))
    ptr = (state.queue_ptr + batch) % state.queue.shape[0]
    return state._replace(queue=queue, queue_ptr=ptr)


def moco_logits(q: Array, k: Array, queue: Array,
                temperature: float = 1.0) -> Tuple[Array, Array]:
    """InfoNCE logits [pos | queue negatives] with label 0
    (cn3d_model_conbag.py:536-547)."""
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)            # (B, 1)
    l_neg = q @ queue.T                                      # (B, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    labels = jnp.zeros((q.shape[0],), jnp.int32)
    return logits, labels


def moco_step(apply_fn, query_params, state: MoCoState,
              query_inputs, key_inputs, m: float = 0.9,
              temperature: float = 1.0):
    """One full MoCo forward: encode query/key, momentum-update, build
    logits against the queue, enqueue the new keys.

    ``apply_fn(params, *inputs) -> (B, D) embedding``.
    Returns (logits, labels, new_state).
    """
    q = apply_fn(query_params, *query_inputs)
    new_key_params = momentum_update(query_params, state.key_params, m)
    k = jax.lax.stop_gradient(apply_fn(new_key_params, *key_inputs))
    logits, labels = moco_logits(q, k, state.queue, temperature)
    new_state = enqueue(state._replace(key_params=new_key_params), k)
    return logits, labels, new_state
