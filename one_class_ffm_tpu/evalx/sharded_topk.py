"""Item-axis-sharded full-catalog scoring and global top-K merge.

The closest analog to sequence/context parallelism for this model
(SURVEY.md §5 long-context): during evaluation/serving the catalog axis n is
sharded over the ``data`` mesh axis, every device scores its item shard for
the same user chunk, takes a local ``lax.top_k``, and the global top-K is the
top-K of the all-gathered per-shard candidates — payload K·n_dev per user
instead of n.

Tie-breaking matches the reference's first-max-wins destructive argmax
(reference ffm.cpp:1033-1037): local top_k prefers lower local index, the
gather concatenates shards in axis order, and the final top_k prefers earlier
positions — so equal scores resolve to the lowest global item id.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def sharded_topk(
    z_parts_fn,
    mesh: Mesh,
    k: int,
    axis: str = "data",
):
    """Build a shard_map'd function: per-device score + local top-K + merge.

    ``z_parts_fn(local_inputs...) -> (chunk, n_local) scores`` is evaluated
    per shard; returns global (vals, ids) of shape (chunk, k).
    """

    def impl(*local_inputs):
        z_local = z_parts_fn(*local_inputs)  # (chunk, n_local)
        n_local = z_local.shape[1]
        vals, idx = jax.lax.top_k(z_local, min(k, n_local))
        shard = jax.lax.axis_index(axis)
        gidx = idx + shard * n_local
        # gather candidates from every shard: (chunk, n_dev * k)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        fvals, pos = jax.lax.top_k(all_vals, k)
        fidx = jnp.take_along_axis(all_idx, pos, axis=1)
        return fvals, fidx

    return impl


def topk_over_sharded_catalog(
    Pva_c: Dict[int, Array],
    Q: Dict[int, Array],
    bt: Array,
    cross_blocks,
    mesh: Mesh,
    k: int,
    axis: str = "data",
):
    """Global top-K for a replicated user chunk against an item-sharded
    catalog: z = bt + sum_c Pva_c Q_c^T computed per item shard."""
    from jax.sharding import NamedSharding

    item_spec = P(axis, None)
    f12s = sorted(Q)

    def score_local(bt_l, *q_locals):
        z = jnp.broadcast_to(
            bt_l[None, :], (next(iter(Pva_c.values())).shape[0], bt_l.shape[0])
        )
        for f12, q in zip(f12s, q_locals):
            z = z + Pva_c[f12] @ q.T
        return z

    fn = jax.jit(
        jax.shard_map(
            sharded_topk(score_local, mesh, k, axis),
            mesh=mesh,
            in_specs=(P(axis),) + tuple(item_spec for _ in f12s),
            out_specs=(P(), P()),
            # outputs are replicated by construction (all_gather + local
            # top_k), which the static checker can't infer
            check_vma=False,
        )
    )
    return fn(bt, *[Q[f] for f in f12s])
