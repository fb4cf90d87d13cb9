"""Farthest point sampling.

The reference carries four identical NumPy copies of iterative max-min FPS
(generate_data/generate_NTU.py:299-318, training_code/cn3D_data_set.py:675-694,
training_code/cn3d_data_load.py:301-320) — an O(N*S) sequential loop. Here it
exists exactly once, as a ``lax.fori_loop`` whose body is fully vectorized
(one distance update + argmax per iteration), batched with ``vmap``.

Note the *active* training path never calls FPS (crops are uniform random
512-point subsets — cn3D_data_set.py:287-319), so FPS is off the hot path;
it exists for the legacy/aux paths (``fps_sample_data``) and as a public op.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("sample_num",))
def farthest_point_sampling(key: Array, xyz: Array, sample_num: int) -> Array:
    """FPS indices for a single cloud.

    Args:
      key: PRNG key for the random first pick (the reference seeds with
        np.random.randint — generate_NTU.py:303).
      xyz: (N, 3) coordinates.
      sample_num: S — number of samples.

    Returns:
      (S,) int32 indices into the cloud.
    """
    N = xyz.shape[0]
    first = jax.random.randint(key, (), 0, N)

    def dist_to(i):
        d = xyz - xyz[i]
        return jnp.sum(d * d, axis=-1)

    def body(s, carry):
        min_dist, idx = carry
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        idx = idx.at[s].set(nxt)
        min_dist = jnp.minimum(min_dist, dist_to(nxt))
        return min_dist, idx

    idx0 = jnp.zeros((sample_num,), jnp.int32).at[0].set(first.astype(jnp.int32))
    min_dist0 = dist_to(first)
    _, idx = jax.lax.fori_loop(1, sample_num, body, (min_dist0, idx0))
    return idx


@partial(jax.jit, static_argnames=("sample_num",))
def fps_batched(key: Array, xyz: Array, sample_num: int) -> Array:
    """(B, N, 3) -> (B, S) FPS indices, one independent key per cloud."""
    keys = jax.random.split(key, xyz.shape[0])
    return jax.vmap(farthest_point_sampling, in_axes=(0, 0, None))(
        keys, xyz, sample_num)


@partial(jax.jit, static_argnames=("sample_num",))
def fps_reorder(key: Array, points: Array, sample_num: int) -> Array:
    """Move S FPS-chosen points to the front, keep the rest in order after —
    the reference's ``fps_sample_data`` contract (cn3D_data_set.py:665-672),
    which downstream grouping relies on (centroids = first S rows).

    points: (B, N, C) -> (B, N, C) reordered.
    """
    B, N, _ = points.shape
    idx = fps_batched(key, points[..., :3], sample_num)      # (B, S)
    # Mark chosen, then stable-argsort "not chosen" so the chosen block (by
    # its original FPS order) lands first and the remainder keeps order.
    chosen = jnp.zeros((B, N), jnp.int32)
    chosen = jax.vmap(lambda c, i: c.at[i].set(1))(chosen, idx)
    # Order within the chosen block must follow FPS pick order:
    rank = jnp.full((B, N), N, jnp.int32)
    rank = jax.vmap(lambda r, i: r.at[i].set(jnp.arange(sample_num)))(rank, idx)
    # Unchosen points ranked after, by original position.
    pos = jnp.broadcast_to(jnp.arange(N), (B, N))
    order_key = jnp.where(chosen == 1, rank, N + pos)
    perm = jnp.argsort(order_key, axis=-1)
    return jnp.take_along_axis(points, perm[..., None], axis=1)
