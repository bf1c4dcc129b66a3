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


def make_sharded_topk_fn(
    f12s,
    mesh: Mesh,
    k: int,
    axis: str = "data",
    catalog: int = 0,
):
    """Compile-once builder for chunked serving/predict over an item-sharded
    catalog.  Returns ``fn(Pva_c, cold_c, Q, bt, popular) -> (vals, ids)``:
    z = bt + sum_c Pva_c Q_c^T per item shard, cold users replaced by the
    popularity prior, items >= ``catalog`` masked out (0 = no mask), then
    local top-K + all_gather merge (reference first-max tie-breaking)."""
    f12s = sorted(f12s)

    def impl(Pva_c, cold_c, bt_l, pop_l, *q_locals):
        chunk = next(iter(Pva_c.values())).shape[0]
        n_local = bt_l.shape[0]
        z = jnp.broadcast_to(bt_l[None, :], (chunk, n_local))
        for f12, q in zip(f12s, q_locals):
            z = z + Pva_c[f12] @ q.T
        z = jnp.where(cold_c[:, None], pop_l[None, :], z)
        shard = jax.lax.axis_index(axis)
        gid = shard * n_local + jnp.arange(n_local, dtype=jnp.int32)
        if catalog:
            neg = jnp.asarray(jnp.finfo(z.dtype).min, z.dtype)
            z = jnp.where((gid < catalog)[None, :], z, neg)
        vals, idx = jax.lax.top_k(z, min(k, n_local))
        gidx = gid[idx]
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        fvals, pos = jax.lax.top_k(all_vals, k)
        fidx = jnp.take_along_axis(all_idx, pos, axis=1)
        return fvals, fidx

    sharded = jax.jit(
        jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis))
            + tuple(P(axis, None) for _ in f12s),
            out_specs=(P(), P()),
            # outputs are replicated by construction (all_gather + local
            # top_k), which the static checker can't infer
            check_vma=False,
        )
    )

    def fn(Pva_c, cold_c, Q, bt, popular):
        return sharded(
            {f: Pva_c[f] for f in f12s}, cold_c, bt, popular,
            *[Q[f] for f in f12s],
        )

    return fn


def topk_over_sharded_catalog(
    Pva_c: Dict[int, Array],
    Q: Dict[int, Array],
    bt: Array,
    cross_blocks,
    mesh: Mesh,
    k: int,
    axis: str = "data",
):
    """One-shot global top-K for a replicated user chunk against an
    item-sharded catalog (no cold/catalog handling — see
    ``make_sharded_topk_fn`` for the full serving path)."""
    chunk = next(iter(Pva_c.values())).shape[0]
    cold = jnp.zeros(chunk, bool)
    pop = jnp.zeros_like(bt)
    fn = make_sharded_topk_fn(sorted(Q), mesh, k, axis)
    return fn(Pva_c, cold, Q, bt, pop)
