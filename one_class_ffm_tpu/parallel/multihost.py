"""Multi-host (multi-process) array construction for the solver.

In multi-process SPMD each process only addresses its own devices, so
globally-sharded arrays must be assembled with
``jax.make_array_from_process_local_data`` instead of ``device_put``.
Every process calls ``make_global_data``/``make_global_state`` with the SAME
full host arrays (cheap at the host layer — data loading is deterministic);
the helper hands each process its addressable rows.

Pairs with ``distributed.init_distributed`` and the same mesh/spec layout as
``mesh.shard_data`` (rows + COO on ``data``, small tables replicated).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global(arr, mesh: Mesh, spec: P):
    """Build a global array from the full host value (every process passes
    the same full array; the helper extracts this process's shard rows)."""
    sh = NamedSharding(mesh, spec)
    arr = np.asarray(arr)
    return jax.make_array_from_process_local_data(sh, arr, arr.shape)


def make_global_data(data_host: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """The multi-host analog of mesh.shard_data (same placement rules)."""
    row = P(axis)
    rep = P()
    out = dict(data_host)
    for key in ("xu_idx", "xu_val", "xv_idx", "xv_val"):
        out[key] = tuple(make_global(a, mesh, row) for a in data_host[key])
    for key in ("pos_u", "pos_v", "pos_w", "cnt_u", "cnt_v"):
        out[key] = make_global(data_host[key], mesh, row)
    for key in ("reg_u", "reg_v", "colsq_u", "colsq_v"):
        if key in data_host:
            out[key] = tuple(
                None if a is None else make_global(a, mesh, rep)
                for a in data_host[key])
    # the fused table kernels' transposed (p, rows) copies: rows trailing
    rowT = P(None, axis)
    for key in ("xt_u", "xt_v"):
        if key in data_host:
            out[key] = tuple(
                None if pair is None
                else tuple(make_global(a, mesh, rowT) for a in pair)
                for pair in data_host[key])
    # shard-aligned blocked layout (leading dim = blocks, nested in shards)
    for key in ("blk_u_take", "blk_u_src", "blk_u_own", "blk_u_w",
                "blk_u_srcg", "blk_u_from_v", "blk_u_inv",
                "blk_v_take", "blk_v_src", "blk_v_own", "blk_v_w",
                "blk_v_from_u", "blk_v_inv"):
        if key in data_host:
            out[key] = make_global(data_host[key], mesh, row)
    return out


def make_global_state(
    state_host: Dict[str, Any],
    mesh: Mesh,
    axis: str = "data",
    model_min_rows: int = 0,
    model_axis: str = "model",
):
    """The multi-host analog of mesh.shard_state.

    ``model_min_rows`` > 0 row-shards block tables with at least that many
    rows over ``model_axis`` — when that axis spans processes this is the
    web-scale layout (BASELINE.json configs[4]): embedding tables too large
    for one host live row-sharded across hosts, and XLA inserts the
    all-gather/reduce-scatter pair over DCN for lookups and updates."""
    row = P(axis)
    rep = P()
    big = P(model_axis, None)
    msize = int(mesh.shape.get(model_axis, 1)) if model_min_rows else 1

    def table_spec(t) -> P:
        t = np.asarray(t)
        if (
            model_min_rows
            and model_axis in mesh.axis_names
            and t.shape[0] >= model_min_rows
        ):
            if t.shape[0] % msize != 0:
                raise ValueError(
                    f"table rows {t.shape[0]} not divisible by {model_axis} "
                    f"axis size {msize}; use d_multiple={msize}"
                )
            return big
        return rep

    out = dict(state_host)
    out["params"] = {
        f12: {k: make_global(v, mesh, table_spec(v)) for k, v in blk.items()}
        for f12, blk in state_host["params"].items()
    }
    for key in ("P", "Q"):
        out[key] = {
            f12: make_global(v, mesh, row) for f12, v in state_host[key].items()
        }
    for key in ("a", "b", "yt", "yt_u", "yt_v"):
        if key in state_host:
            out[key] = make_global(state_host[key], mesh, row)
    return out
