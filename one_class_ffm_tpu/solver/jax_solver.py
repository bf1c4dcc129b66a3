"""TPU-native alternating Gauss-Newton solver for one-class FFM.

This is the JAX re-design of the reference solver core (ImpProblem,
reference ffm.cpp:314-870).  Same math, different architecture:

  * the C++ stores residuals inside mutable label nodes and updates them in
    place (ffm.cpp:388-403, 405-465); here the residual vector ``yt`` over the
    flat COO positive stream is *carried functionally* through the epoch and
    updated with pure array ops.  (Under OCFFM_BLK_YT the carry lives in the
    blocked SLOT orders — ``yt_u``/``yt_v`` — so the hot passes touch it
    only elementwise/sequentially; same floats, permuted positions.)
  * OpenMP parallel-for over rows (ffm.cpp:328,572,...) becomes batched
    matmul / segment_sum primitives that XLA maps onto the MXU and that GSPMD
    can shard over a device mesh (rows on the ``data`` axis).
  * the two adjacency copies (U->V and V->U, transY ffm.cpp:259-294) are
    replaced by a single COO stream segment-summed by either endpoint.
  * per-block conjugate gradient (ffm.cpp:744-813) is a ``lax.while_loop``
    with the reference's exact stopping rule (||r||^2 <= 0.09 ||g||^2, cap 20).

The omega-weighted full m x n negative term is never materialized: per-row
sums use ``n (a_i - r) + sum(b) + sa_i`` and k x k Grams Q_c^T Q1 exactly as
the reference does (cache_sasb ffm.cpp:514-535, gd_cross ffm.cpp:658-670).

Everything in this file is functionally pure and jittable end-to-end; one
epoch is one XLA computation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import PaddedFields, PaddedLabels
from ..models.blocks import BlockInfo, BlockLayout
from .params import HyperParams

Array = jax.Array


# ---------------------------------------------------------------------------
# Device-side problem container
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ProblemMeta:
    """Static (hashable) problem description closed over by jitted fns."""

    layout: BlockLayout
    hp: HyperParams
    m: int  # padded user rows
    n: int  # padded item rows
    m_true: int
    n_true: int
    nnz: int  # padded positive count
    dtype: Any = jnp.float32
    d_multiple: int = 1  # block-table row dims rounded up to this multiple
    # per-field "strict identity encoding" flags (p=1, val=1, idx[i]=i,
    # D == rows): project == zero-padded table, scatter == masked slice —
    # no random access at all.  Detected from the data in make_device_data.
    ident_u: Tuple[bool, ...] = ()
    ident_v: Tuple[bool, ...] = ()
    # > 0: the COO stream has a block-aligned layout in data
    # (blk_u_*/blk_v_*) and that side's cross positive passes run as
    # per-block one-hot MXU matmuls instead of segment scatter-adds
    # (ops.pos_hv_blocked / pos_scatter_blocked).  Value = rows per block.
    blocked_bm_u: int = 0
    blocked_bm_v: int = 0
    # > 1: the stream is SHARD-ALIGNED over this many data-mesh shards
    # (pad_labels shard_rows=...) and the u-side blocked layout carries
    # shard-LOCAL src indices — the blocked positive passes then run under
    # shard_map, each device streaming only its own slice (the solver must
    # be constructed with the mesh).  The v-side layout is built too (slot
    # arrays shard on the blocks dim; its global src is assembly-time
    # only): with BOTH layouts the slot-order residual carry engages and
    # the full kt/fused kernel stack runs shard-locally per side.
    blocked_shards: int = 1

    def pad_d(self, d: int) -> int:
        """Padded table row dim.  Pad rows are never indexed by any feature,
        are zero at init and receive zero gradient/Hv contributions, so they
        stay exactly zero — the same invariant as row padding.  This is what
        makes model-axis (tensor-parallel) row-sharding of tables possible
        for arbitrary field dims (mesh-size divisibility by construction)."""
        mult = max(1, self.d_multiple)
        return -(-d // mult) * mult


def make_device_data(
    u: PaddedFields,
    v: PaddedFields,
    y: PaddedLabels,
    layout: BlockLayout,
    hp: HyperParams,
    dtype=jnp.float32,
    d_multiple: int = 1,
    blocked_bm: int = 0,
    blocked_shards: int = 1,
) -> Tuple[ProblemMeta, Dict[str, Any]]:
    """Assemble the device array dict + static meta from host padded views.

    ``data`` layout (all jnp arrays):
      xu_idx/xu_val: per user field (m, p_f)
      xv_idx/xv_val: per item field (n, p_f)
      pos_u/pos_v:   (nnz,) COO positive endpoints (ghost rows for pads)
      pos_w:         (nnz,) 1.0 real / 0.0 pad mask
      cnt_u/cnt_v:   per-row positive counts |Omega+_i|
      reg_u/reg_v:   per field (D_f,) lambda row weights (freq or ones)

    ``d_multiple`` > 1 rounds every block table's row dim (and its reg
    vector) up to that multiple so tables divide a ``model`` mesh axis.

    ``blocked_bm`` > 0 additionally builds block-aligned views of the
    positive stream for BOTH segment sides (blk_u_*/blk_v_* arrays; see
    ops.make_blocked_layout) where they apply (row count divisible, skew
    within budget).

    ``blocked_shards`` S > 1: the labels were built SHARD-ALIGNED
    (pad_labels shard_rows = u.m/S) and the u-side blocked layout is
    emitted with shard-local src, so its positive passes run under
    shard_map on an S-way data mesh (construct FFMSolver with mesh=...).
    The v side keeps the plain COO ops (an item's positives span user
    shards, so no local layout exists for it).
    """
    def ident_flags(pf: PaddedFields) -> Tuple[bool, ...]:
        """Strict identity-encoded fields: row i's single feature is
        (idx=i, val=1) and the field dim equals the true row count.  For
        such fields X is the identity (plus zero pad rows), so X W == W
        and X^T Z == Z[:D] — the random gather/scatter pair disappears.
        True for the id field of every MF-style dataset and the synthetic
        benchmark's id fields."""
        out = []
        for fi in range(pf.f):
            idx, val, D = pf.idx[fi], pf.val[fi], pf.Ds[fi]
            mt = pf.m_true
            ok = (
                idx.shape[1] == 1
                and D == mt
                and bool(np.all(idx[:mt, 0] == np.arange(mt)))
                and bool(np.all(val[:mt, 0] == 1))
                and bool(np.all(val[mt:, 0] == 0))
            )
            out.append(ok)
        return tuple(out)

    blk = blk_v = None
    if blocked_bm:
        import os as _os0

        from ..ops.sparse_ops import make_blocked_layout

        # OCFFM_BLK_PAD_RATIO: skew guard for the blocked layouts — a
        # power-user/popular-item block sets MAXC for everyone, and the
        # blocked passes stream n_blocks*MAXC slots vs the plain ops' nnz.
        # The k-major kernels made padded slots 4x cheaper to stream, so
        # head-heavy catalogs may profit from a larger budget (A/B knob).
        ratio = float(_os0.environ.get("OCFFM_BLK_PAD_RATIO", 2.0))
        pads = np.asarray(y.w) == 0  # zero-weight entries occupy no slots
        # OCFFM_HEAD_CHUNK: chunk width of the two-tier skew layout's head
        # tier (0 disables the split — skewed sides then reject outright as
        # in round 3).  Since round 5 the head tier composes with the data
        # mesh too: head slots are chunk-dim arrays consumed at jit level
        # (outside the shard_map tail passes) — GSPMD partitions the small
        # head ops, whose outputs are per-head-row (NH bounded by the
        # layout's 1/8-of-rows cap) or (D, k) table terms it all-reduces.
        head_chunk = int(_os0.environ.get("OCFFM_HEAD_CHUNK", 512))
        # pad the chunk count so the chunk dim shards evenly on the mesh
        import math as _math0

        nch_mult = 8 * blocked_shards // _math0.gcd(8, blocked_shards)
        if blocked_shards > 1:
            blk = make_blocked_layout(
                y.u, y.v, u.m, blocked_bm, max_pad_ratio=ratio,
                shard_rows=u.m // blocked_shards, drop=pads,
                head_chunk=head_chunk, nch_multiple=nch_mult)
            # v side under the mesh: the layout's slot arrays shard on the
            # leading blocks dim (item rows ride the same data axis) and
            # the SHARDED kernel stack consumes only slot-order data (the
            # residual carry makes coefficients elementwise) — so the
            # global src is assembly-time only and needs no shard locality.
            # blocked_bm must divide rows-per-shard (and shards must divide
            # v.m evenly) so blocks nest inside shards; the combined check
            # catches v.m not divisible by the shard count, which floor
            # division would let through (ADVICE r4).
            blk_v = None
            if (blk is not None
                    and v.m % (blocked_shards * blocked_bm) == 0):
                blk_v = make_blocked_layout(y.v, y.u, v.m, blocked_bm,
                                            max_pad_ratio=ratio, drop=pads,
                                            head_chunk=head_chunk,
                                            nch_multiple=nch_mult)
        else:
            blk = make_blocked_layout(y.u, y.v, u.m, blocked_bm,
                                      max_pad_ratio=ratio, drop=pads,
                                      head_chunk=head_chunk)
            blk_v = make_blocked_layout(y.v, y.u, v.m, blocked_bm,
                                        max_pad_ratio=ratio, drop=pads,
                                        head_chunk=head_chunk)

    meta = ProblemMeta(
        layout=layout,
        hp=hp,
        m=u.m,
        n=v.m,
        m_true=u.m_true,
        n_true=v.m_true,
        nnz=y.nnz,
        dtype=dtype,
        d_multiple=d_multiple,
        ident_u=ident_flags(u),
        ident_v=ident_flags(v),
        blocked_bm_u=blocked_bm if blk is not None else 0,
        blocked_bm_v=blocked_bm if blk_v is not None else 0,
        blocked_shards=blocked_shards if blk is not None else 1,
    )

    def regs(pf: PaddedFields):
        # pad value 1.0: pad table rows are exactly zero so any finite reg
        # weight contributes zero; 1.0 avoids 0-weight special cases
        def padded(arr):
            a = jnp.asarray(arr, dtype)
            dp = meta.pad_d(a.shape[0])
            return jnp.pad(a, (0, dp - a.shape[0]), constant_values=1.0)

        if hp.freq:
            return tuple(padded(fr) for fr in pf.freq)
        return tuple(jnp.ones(meta.pad_d(d), dtype) for d in pf.Ds)

    data = dict(
        xu_idx=tuple(jnp.asarray(a) for a in u.idx),
        xu_val=tuple(jnp.asarray(a, dtype) for a in u.val),
        xv_idx=tuple(jnp.asarray(a) for a in v.idx),
        xv_val=tuple(jnp.asarray(a, dtype) for a in v.val),
        pos_u=jnp.asarray(y.u),
        pos_v=jnp.asarray(y.v),
        pos_w=jnp.asarray(y.w, dtype),
        cnt_u=jnp.asarray(y.count_u, dtype),
        cnt_v=jnp.asarray(y.count_v, dtype),
        reg_u=None,
        reg_v=None,
    )
    data["reg_u"] = regs(u)
    data["reg_v"] = regs(v)

    import os as _os
    fused_cap = int(_os.environ.get("OCFFM_FUSED_TBL_D", 4096))

    def _fused_field(fi: int, pf: PaddedFields, idents) -> bool:
        """Field eligibility for the fused table kernels — the same filter
        the xt transposed copies use: non-identity, D under the cap, and a
        blocked layout to fuse into."""
        return (bool(blocked_bm) and not idents[fi]
                and meta.pad_d(pf.Ds[fi]) <= fused_cap)

    def colsq(pf: PaddedFields, idents):
        # per-feature sum of squared values ((X^2)^T 1), static — the fused
        # table kernels' Jacobi-diag omega term (solver._side_colsq).  Pad
        # slots carry val == 0 and pad table rows are never indexed.
        # Only built for fused-eligible fields (ADVICE r3: a 2M-row identity
        # field would pin a rows-sized HBM buffer that is never read).
        out = []
        for fi in range(pf.f):
            if not _fused_field(fi, pf, idents):
                out.append(None)
                continue
            a = np.zeros(meta.pad_d(pf.Ds[fi]), np.float64)
            np.add.at(a, np.asarray(pf.idx[fi]).ravel(),
                      np.asarray(pf.val[fi], np.float64).ravel() ** 2)
            out.append(jnp.asarray(a, dtype))
        return tuple(out)

    data["colsq_u"] = colsq(u, meta.ident_u)
    data["colsq_v"] = colsq(v, meta.ident_v)

    def xt(pf: PaddedFields, idents):
        # TRANSPOSED (p, rows) copies of the fields eligible for the fused
        # table kernels (Mosaic needs slot rows, not slot columns — see
        # ops._xoh_block).  Only non-identity small-D fields qualify, so
        # the extra HBM is a few (p, rows) scalars.
        out = []
        for fi in range(pf.f):
            if _fused_field(fi, pf, idents):
                out.append((
                    jnp.asarray(np.ascontiguousarray(pf.idx[fi].T)),
                    jnp.asarray(np.ascontiguousarray(pf.val[fi].T), dtype),
                ))
            else:
                out.append(None)
        return tuple(out)

    data["xt_u"] = xt(u, meta.ident_u)
    data["xt_v"] = xt(v, meta.ident_v)
    def upload_blk(pre: str, b: dict, src_abs_key: bool):
        data[pre + "take"] = jnp.asarray(b["take"])
        data[pre + "src"] = jnp.asarray(b["src"])
        data[pre + "own"] = jnp.asarray(b["own"])
        # pre-permuted pad-mask weights: pos_w is static, so the per-CG-
        # iteration random scalar gather w[src] is paid once, here.
        # Masked to exactly 0 at structural pad slots (own == BM) — every
        # consumer's pad contributions already die via the all-zero one-hot
        # row, and the mask makes the array double as the slot-order pad
        # mask for the residual carry (OCFFM_BLK_YT).
        # (src_abs: the shard-local layout's src is slice-relative)
        data[pre + "w"] = jnp.asarray(
            y.w[b.get("src_abs", b["src"])]
            * (b["own"] < b["block_rows"]), dtype)
        data[pre + "inv"] = jnp.asarray(b["inv"])
        if src_abs_key and "src_abs" in b:
            # GLOBAL stream positions of the u slots (src is shard-local):
            # consumed by refresh_caches (stream yt -> slot carry) and the
            # cross-order maps; never read inside the hot passes.
            data[pre + "srcg"] = jnp.asarray(b["src_abs"])
        if "hd_row" in b:
            # two-tier head tier (skewed side): chunked slots of the power
            # rows' entries (see ops.make_blocked_layout head_chunk)
            data[pre + "hd_take"] = jnp.asarray(b["hd_take"])
            data[pre + "hd_src"] = jnp.asarray(b["hd_src"])
            data[pre + "hd_row"] = jnp.asarray(b["hd_row"])
            data[pre + "hd_loc"] = jnp.asarray(b["hd_loc"])
            data[pre + "hd_w"] = jnp.asarray(
                y.w[b["hd_src"]] * b["hd_valid"], dtype)

    if blk is not None:
        upload_blk("blk_u_", blk, True)
    if blk_v is not None:
        upload_blk("blk_v_", blk_v, False)

    def xh(pf: PaddedFields, idents, b) -> tuple:
        # head rows' per-field data, UNtransposed (NH, p) — the fused table
        # kernels' head adjustments project/scatter through these tiny
        # arrays (ops.head_project / head_tbl_scatter).  Same eligibility
        # filter as the xt copies.
        if b is None or "hd_rows" not in b:
            return (None,) * pf.f
        rows = b["hd_rows"]
        out = []
        for fi in range(pf.f):
            if _fused_field(fi, pf, idents):
                out.append((jnp.asarray(pf.idx[fi][rows]),
                            jnp.asarray(pf.val[fi][rows], dtype)))
            else:
                out.append(None)
        return tuple(out)

    data["xh_u"] = xh(u, meta.ident_u, blk)
    data["xh_v"] = xh(v, meta.ident_v, blk_v)
    import os as _os
    if (blk is not None and blk_v is not None
            and _os.environ.get("OCFFM_BLK_YT", "auto").lower()
            not in ("0", "off", "false")):
        # cross-order slot maps for the slot-order residual carry
        # (OCFFM_BLK_YT): for each slot of one side's layout, the FLAT slot
        # index of the same stream entry in the OTHER side's layout.  Static
        # — lets a gap computed flat in the solving side's order propagate
        # to the other side's carried residual with ONE scalar gather
        # (pad slots land anywhere; the blk_*_w mask kills them).  Skipped
        # when the carry is env-disabled (the solver gate keys on presence).
        # (inv maps are keyed by GLOBAL stream position, so the u side
        # indexes with src_abs when its src is shard-local.  Two-tier
        # sides: inv maps into the CONCATENATED flat slot space — tail
        # slots first, head slots after — and each tier of the receiving
        # side gets its own map.)
        data["blk_u_from_v"] = jnp.asarray(
            blk_v["inv"][blk.get("src_abs", blk["src"])])
        data["blk_v_from_u"] = jnp.asarray(blk["inv"][blk_v["src"]])
        if "hd_row" in blk:
            data["blk_u_hd_from_v"] = jnp.asarray(blk_v["inv"][blk["hd_src"]])
        if "hd_row" in blk_v:
            data["blk_v_hd_from_u"] = jnp.asarray(blk["inv"][blk_v["hd_src"]])
    return meta, data


# ---------------------------------------------------------------------------
# Sparse kernels: projection and scatter (the UTx / X^T z analogs)
# ---------------------------------------------------------------------------


# The gather-FMA / scatter-add pair at the heart of everything (reference
# UTx/UTX ffm.cpp:314-331 and the X^T z scatters).  Implementations live in
# ops.sparse_ops (XLA baselines + a Pallas one-hot projection kernel that
# dispatches automatically on TPU); re-exported here for callers.
# pos_dot / pos_scatter are the COO positive-pass reductions with bounded
# (chunk, k) intermediates — a full (nnz, k) gather OOMs at scale.
from ..ops.sparse_ops import (  # noqa: E402
    expand_rows_blocked,
    gather_blocked_rows,
    gather_blocked_rows_t,
    grad_cross_tbl_kt_pallas,
    grad_cross_tbl_pallas,
    grad_self_tbl_kt_pallas,
    grad_self_tbl_pallas,
    head_chunk_sums,
    head_hv,
    head_pq,
    head_project,
    head_scatter,
    head_seg_sum,
    head_tbl_scatter,
    hv_self_tbl_kt_pallas,
    hv_self_tbl_pallas,
    pos_dot,
    pos_gap_blocked,
    pos_gap_kt_pallas,
    pos_hv,
    pos_hv_blocked,
    pos_hv_blocked_pallas,
    pos_hv_kt_pallas,
    pos_hv_tbl_kt_pallas,
    pos_hv_tbl_pallas,
    pos_scatter,
    pos_scatter_kt_pallas,
    seg_sum_blocked,
    pos_scatter_blocked,
    pos_scatter_pair,
    project,
    scatter,
)


# Per-row Gram cache for the cross-block CG positive pass: a measured
# NEGATIVE result, not used by the solver (see docs/PERF.md and
# scripts/gram_micro.py).  The idea — build M_i = (1-w) sum w_t Q[o_t]Q[o_t]^T
# once per solve so each CG iteration's positive term becomes a per-row k x k
# matvec with zero gathers — is exact, but on a v5e: the cache build costs
# ~7 pair-passes (110 ms vs 15.8 ms at bench shapes), and BOTH matvec
# lowerings are hostile to this TPU stack (the (n,k)x(n,k,k) batched-dot
# einsum did not finish compiling in 30 min; the flat unrolled-slice form
# compiled but measured epoch-level losses: 157k vs 201k ex/s).  The
# per-iteration COO pair stays; the `pos_gram` op remains for reproduction.


def seg_sum(data: Array, ids: Array, num: int) -> Array:
    return jax.ops.segment_sum(data, ids, num_segments=num)


def _phys_bytes(shape, dtype) -> int:
    """Approximate PHYSICAL device bytes of an array: the last dim pads to
    128 lanes and the second-to-last to the dtype sublane tile — what HBM
    budgeting must count (a (p, rows) array with p=1 occupies 8x its logical
    bytes; every (rows, k<128) array 128/k x)."""
    isz = jnp.dtype(dtype).itemsize
    sub = max(8, 32 // isz)
    dims = list(shape) or [1]
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) > 1:
        dims[-2] = -(-dims[-2] // sub) * sub
    out = isz
    for d in dims:
        out *= d
    return out


def _kt_sublanes(k: int, dtype) -> int:
    """Physical sublane count of a k-on-sublanes (kt) buffer: k rounded up
    to the dtype's sublane tile (8 rows x 4 bytes: 8 for f32/f64, 16 for
    bf16).  The kt HBM byte estimates must use this, not max(8, k)."""
    sub = max(8, 32 // jnp.dtype(dtype).itemsize)
    return -(-k // sub) * sub


def _kt_stream_bytes(nb: int, minor: int, k: int, dtype) -> int:
    """Physical bytes of a k-major pre-gathered stream (nb, k, minor):
    k pads to the sublane tile AND the minor dim (MAXC / head chunk) pads
    to 128 lanes — for MAXC far from a 128 multiple the lane padding
    dominates (~1.9x at MAXC=136), so the OOM cap must count it
    (ADVICE r4)."""
    minor_pad = -(-minor // 128) * 128
    return (nb * _kt_sublanes(k, dtype) * minor_pad
            * jnp.dtype(dtype).itemsize)


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------


class FFMSolver:
    """Functional solver bound to one problem instance.

    Usage:
        solver = FFMSolver(meta, data)
        state = solver.init(jax.random.key(0))
        state = solver.epoch(state)          # jitted end-to-end
    """

    def __init__(self, meta: ProblemMeta, data: Dict[str, Any],
                 mesh=None, data_axis: str = "data"):
        self.meta = meta
        self.data = data
        self.mesh = mesh
        self.data_axis = data_axis
        if meta.blocked_shards > 1 and mesh is None:
            raise ValueError(
                "blocked_shards > 1 (shard-aligned blocked layout) requires "
                "constructing FFMSolver with mesh=")
        self.blocks: List[BlockInfo] = meta.layout.all_blocks()
        # "auto" (round 5): PLAIN CG — the reference's exact solver
        # (ffm.cpp:744-813).  Jacobi-PCG was the default through round 4
        # (fewer iterations, toy-tier metric parity 36/36), but the
        # sweep-scale tier exposed it changing the REACHABLE 100-epoch
        # state under the reference's capped (20), loose-eps (0.09)
        # solves: -7.7% p@5 one-sided at the KKBox k=64 cell and -51%
        # p@5 at the k=16 fm-fm--ns cell (ploss LOWER — the diag
        # preconditioner down-weights shared high-curvature features, so
        # the model memorizes per-id scores and ranks worse), both
        # reproduced at f64 (not precision) and both ELIMINATED exactly
        # by plain CG (docs/PARITY.md, k64 diagnosis).  Throughput cost
        # at the shipped bf16+blocked stack is small (plain CG measured
        # 333.4k vs 337.3k jacobi at the headline, round 2) because CG
        # iterations beyond the first are nearly free (PERF.md
        # cap-sweep).  "jacobi" remains an explicit opt-in.
        self.cg_precond = meta.hp.cg_precond
        if self.cg_precond == "auto":
            self.cg_precond = "none"
        # Per-solve pre-gather of the blocked stream's B rows
        # (ops.gather_blocked_rows): B is constant across a solve, so the
        # random gather is paid once and the grad + every CG iteration
        # stream the result sequentially.  Random-gather cost scales with
        # the SOURCE TABLE's row count (~8 ms/M rows from a 20k-row table
        # vs ~34 ms from 1M rows — HBM reads are tile-granular and small
        # tables stay hot), so auto keys on B's rows: u-side solves gather
        # from the item cache (n rows), v-side from the user cache (m).
        # Measured (docs/PERF.md): +73% at 1M x 500k, -4% at 200k x 20k.
        # Also gated by the materialized stream's HBM footprint.
        import os as _os
        mode = _os.environ.get("OCFFM_BLK_PREGATHER", "auto").lower()
        # default 400MB: every measured-win config fits (headline 83+66MB,
        # 1M x 500k 352+320MB, k=128 headline 332MB) while 2M x 200k
        # (685MB/side, which OOM'd the 16GB chip next to its 2M-row f32 CG
        # vectors and caches) falls back to the round-2 no-pregather path.
        # The epoch program can hold several solves' streams live at once,
        # so the cap is per-stream deliberately conservative.
        cap_env = _os.environ.get("OCFFM_BLK_PREGATHER_MB")
        cap = (int(cap_env) if cap_env is not None else 400) << 20
        # total-HBM awareness, computed STATICALLY from the problem shapes
        # so identical configs always take identical code paths (ADVICE r3:
        # the old memory_stats() free-bytes sample made the decision depend
        # on transient allocation order).  HBM size comes from the backend
        # when it reports one, else OCFFM_HBM_GB (default 16, a v5e chip;
        # the axon tunnel reports no memory stats at all).  The materialized
        # stream must leave room for the problem arrays, the state (tables +
        # caches, ~2x for the per-solve update transients under donation),
        # and the biggest table's f32 CG vector set.  An EXPLICIT
        # OCFFM_BLK_PREGATHER_MB wins outright (measurement override).
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:
            on_tpu = False
        try:
            ms = jax.devices()[0].memory_stats() or {}
            total_hbm = int(ms.get("bytes_limit", 0))
        except Exception:
            total_hbm = 0
        if not total_hbm and (on_tpu or "OCFFM_HBM_GB" in _os.environ):
            # explicit OCFFM_HBM_GB engages the static budget on CPU too
            # (how the budget arithmetic is unit-tested)
            total_hbm = int(
                float(_os.environ.get("OCFFM_HBM_GB", 16)) * (1 << 30))
        budget = None
        if total_hbm > 0 and cap_env is None:
            k_pad = -(-meta.hp.k // 128) * 128
            isz_ = jnp.dtype(meta.dtype).itemsize
            state_b = 0
            max_d = 1
            trans_b = 0  # largest single solve's table+cache replacement
            for bi in self.blocks:
                rows1 = meta.m if bi.f1 < meta.layout.fu else meta.n
                rows2 = meta.m if bi.f2 < meta.layout.fu else meta.n
                state_b += (meta.pad_d(bi.d1) + meta.pad_d(bi.d2)
                            + rows1 + rows2) * k_pad * isz_
                max_d = max(max_d, meta.pad_d(bi.d1), meta.pad_d(bi.d2))
                trans_b = max(
                    trans_b,
                    (meta.pad_d(bi.d1) + rows1) * k_pad * isz_,
                    (meta.pad_d(bi.d2) + rows2) * k_pad * isz_)
            state_b += 2 * meta.nnz * isz_
            data_b = sum(
                _phys_bytes(a.shape, a.dtype) for a in jax.tree.leaves(data))
            # S/R/V/G/Hv at the f32 CG floor; the carried S/R/V pack their
            # minor dim when OCFFM_CG_PACK engages (the hv-facing V/Hv
            # transients stay lane-padded)
            pmode_cg = _os.environ.get("OCFFM_CG_PACK", "auto").lower()
            p_cg = (128 // meta.hp.k
                    if meta.hp.k < 128 and 128 % meta.hp.k == 0 else 1)
            if pmode_cg in ("0", "off", "false") or (
                    pmode_cg == "auto" and max_d < (1 << 20)):
                p_cg = 1
            cg_b = (2 * k_pad + 3 * (k_pad // p_cg)) * max_d * 4
            # the input state is DONATED: a solve's update transients are
            # bounded by the one block being replaced (table + its cache),
            # not a full second copy of the state — the old 2x-state model
            # zeroed the cap at 1M x 500k and cost 4x throughput there
            budget = total_hbm - data_b - state_b - trans_b - cg_b
            cap = min(cap, max(0, budget) // 2)
        self.pregather_cap = cap
        self._gate_log = _os.environ.get(
            "OCFFM_DEBUG_GATES", "0").lower() in ("1", "on", "true")
        if self._gate_log:
            print(f"[ocffm gates] pregather_cap={cap >> 20}MB "
                  f"(hbm={total_hbm >> 20}MB, budget="
                  f"{'n/a' if budget is None else budget >> 20}MB)")
        # default 0 since the fused-table kernels landed: pregather + fused
        # + the slot-order carry it unlocks measured 459.1k vs 365.2k ex/s
        # at the headline (the round-2 -4% for pregather alone is obsolete);
        # the HBM cap still bounds it (2M x 200k would OOM on a ~3GB stream)
        min_rows = int(_os.environ.get(
            "OCFFM_BLK_PREGATHER_MIN_ROWS", 0))
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:
            on_tpu = False
        # k-major blocked kernels (OCFFM_KT, default "auto"): the solve's
        # pre-gathered stream is stored TRANSPOSED, (n_blocks, k, MAXC), and
        # the stream passes run k-major Pallas kernels — 4x less HBM
        # streaming AND 4x less MXU work at k=32 than the row-major forms
        # (k < 128 pads every (rows, k) buffer and every matmul output to
        # 128 lanes).  Decided PER SIDE at init: the side's blocked layout
        # must exist and the kernels' per-block VMEM (one-hot + k-major
        # rows x2 + phig) must fit.
        kmode = _os.environ.get("OCFFM_KT", "auto").lower()
        self.kt_interpret = kmode == "interpret"
        self.kt = kmode not in ("0", "off", "false") and (
            on_tpu or kmode in ("1", "on", "true", "interpret"))
        kt_vmem = int(_os.environ.get("OCFFM_FUSED_TBL_VMEM_MB", 13)) << 20

        def kt_side_ok(side_bm: int, own_key: str) -> bool:
            # under a mesh the kt kernels run only via the shard-aligned
            # layout (blocked_shards > 1): each side's stream passes are
            # shard_map-local; a plain mesh keeps the GSPMD COO ops.
            if (not self.kt or not side_bm or own_key not in data
                    or (mesh is not None and meta.blocked_shards == 1)):
                return False
            if not self.kt_interpret and meta.dtype not in (
                    jnp.float32, jnp.bfloat16):
                return False
            isz = jnp.dtype(meta.dtype).itemsize
            maxc = data[own_key].shape[1]
            est = (side_bm * maxc * isz
                   + 3 * maxc * max(8, meta.hp.k) * isz + (1 << 20))
            return est <= kt_vmem

        self.kt_u = kt_side_ok(meta.blocked_bm_u, "blk_u_own")
        self.kt_v = kt_side_ok(meta.blocked_bm_v, "blk_v_own")

        # OCFFM_BLK_PREGATHER_SIDE: restrict the per-solve stream
        # materialization to one segment side ("u"/"v"; default both) —
        # halves the LIVE stream footprint at configs where the state +
        # CG vectors leave room for only one side's stream (2M x 200k:
        # both sides forced at cap 700MB OOM'd the 16GB chip)
        side_env = _os.environ.get("OCFFM_BLK_PREGATHER_SIDE", "").lower()

        def pregather_ok(side_bm: int, take_key: str, b_rows: int,
                         kt_side: bool) -> bool:
            if not side_bm or take_key not in data or mode in (
                    "0", "off", "false"):
                return False
            if side_env in ("u", "v") and not take_key.startswith(
                    f"blk_{side_env}_"):
                return False
            if mesh is not None and meta.blocked_shards == 1:
                # mesh runs keep the plain GSPMD-shardable ops (the
                # shard-aligned blocked path forces its own pregather)
                return False
            if mode in ("1", "on", "true"):
                return True
            nb, maxc = data[take_key].shape
            # the k-major stream carries little lane padding — ~4x more
            # configs fit the HBM cap when that side runs the kt kernels.
            # k rides SUBLANES there, so pad to the dtype's sublane tile
            # (8 f32 / 16 bf16) — a bf16 k<=16 stream physically occupies
            # 2x the naive estimate (ADVICE r3).
            if kt_side:
                nbytes = _kt_stream_bytes(nb, maxc, meta.hp.k, meta.dtype)
            else:
                lanes = -(-meta.hp.k // 128) * 128
                nbytes = nb * maxc * lanes * jnp.dtype(meta.dtype).itemsize
            # the head tier's k-major stream is gathered alongside —
            # count it against the same cap
            hd_key = take_key.replace("take", "hd_take")
            if hd_key in data:
                nch, chunk = data[hd_key].shape
                nbytes += _kt_stream_bytes(nch, chunk, meta.hp.k,
                                           meta.dtype)
            return b_rows >= min_rows and nbytes <= cap

        self.pregather_u = pregather_ok(
            meta.blocked_bm_u, "blk_u_take", meta.n, self.kt_u)
        self.pregather_v = pregather_ok(
            meta.blocked_bm_v, "blk_v_take", meta.m, self.kt_v)
        # Mosaic kernel for the per-CG-iteration blocked positive pass
        # (ops.pos_hv_blocked_pallas): needs the pre-gathered stream and the
        # pre-permuted weights.  Measured (docs/PERF.md): ~neutral vs the
        # fused XLA blocked path when both stream pre-gathered rows (+1.6%
        # at 1M x 500k), but forcing pregather at small configs loses to
        # gather-inside XLA (356k vs 368k at the bench headline) — so
        # "auto" RIDES the pregather auto-decision instead of forcing it:
        # the kernel runs exactly where the solve already streams a
        # pre-gathered stream ("1" forces both on for A/B).
        pmode = _os.environ.get("OCFFM_PALLAS_HV", "auto").lower()
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:
            on_tpu = False
        if meta.blocked_shards > 1:
            # the shard_map-local blocked ops have no access to the (row-
            # sharded) B table — the pre-gathered stream is mandatory
            self.pregather_u = True
        force = pmode in ("1", "on", "true")
        pallas_want = force or (pmode == "auto" and on_tpu)

        def pallas_ok(side_bm: int, pre: str, pregathered: bool) -> bool:
            if not pallas_want or not side_bm or pre + "w" not in data:
                return False
            if not force and not pregathered:
                return False
            nb, maxc = data[pre + "take"].shape
            lanes = -(-meta.hp.k // 128) * 128
            isz = jnp.dtype(meta.dtype).itemsize
            nbytes = nb * maxc * lanes * isz
            # per-grid-step scoped VMEM: the in-kernel (MAXC, BM) one-hot
            # plus the double-buffered lane-padded rows block — a
            # skew-heavy MAXC (e.g. ~20k at f32, where the kt gate already
            # rejected and this kernel was the fallback) otherwise crashes
            # with a Mosaic stack OOM (round 5, f32 sweep-scale run)
            est = (side_bm * maxc * isz + 2 * maxc * lanes * isz
                   + (1 << 20))
            return nbytes <= cap and est <= kt_vmem

        self.pallas_hv_u = pallas_ok(meta.blocked_bm_u, "blk_u_",
                                     self.pregather_u)
        self.pallas_hv_v = pallas_ok(meta.blocked_bm_v, "blk_v_",
                                     self.pregather_v)
        self.pregather_u = self.pregather_u or self.pallas_hv_u
        self.pregather_v = self.pregather_v or self.pallas_hv_v
        # Fused table-space kernels (OCFFM_FUSED_TBL, default "auto"): for a
        # non-identity SMALL-D field, the per-CG-iteration X projection /
        # X^T scatter pair folds into the blocked pass itself
        # (ops.pos_hv_tbl_pallas / hv_self_tbl_pallas) — the (rows, k)
        # phi/zp intermediates never touch HBM and no random table access
        # remains.  "auto": on TPU wherever the shapes allow (the cross form
        # additionally rides the pregather decision — it consumes the
        # pre-gathered stream); "1" forces pregather on too (A/B at configs
        # where pregather alone loses); "interpret" runs the kernels in
        # Pallas interpret mode (CPU correctness tests).
        fmode = _os.environ.get("OCFFM_FUSED_TBL", "auto").lower()
        self.fused_interpret = fmode == "interpret"
        self.fused_forced = fmode in ("1", "on", "true", "interpret")
        self.fused_tbl = fmode not in ("0", "off", "false") and (
            on_tpu or self.fused_forced)
        self.fused_tbl_d = int(_os.environ.get("OCFFM_FUSED_TBL_D", 4096))
        # auto engages wherever the shapes allow: measured +26% at the
        # 200k x 20k headline (459.1k vs 365.2k ex/s, fused + per-solve
        # pregather) and +16% at 1M x 500k — the kernels flipped the old
        # "pregather loses at small configs" tradeoff, so there is no
        # min-rows gate by default (env knob kept for A/Bs)
        self.fused_min_rows = int(_os.environ.get(
            "OCFFM_FUSED_TBL_MIN_ROWS", 0))
        # per-grid-step VMEM estimate cap: a skew-heavy blocked layout can
        # put MAXC in the tens of thousands and a (BM, MAXC) one-hot plus
        # double-buffered (MAXC, k) rows block past the 16MB scoped limit
        # (measured OOM at headline v-side MAXC=13064)
        # 13MB: the headline v side (MAXC=13064) estimates 10.2MB kt and
        # measured 591.9k vs 587.2k with it engaged; the row-major
        # MAXC=13k grad (real 23.6MB scoped, the measured OOM) still
        # estimates ~19MB and stays rejected
        self.fused_vmem = int(_os.environ.get(
            "OCFFM_FUSED_TBL_VMEM_MB", 13)) << 20
        # per-kind A/B knob: comma set of hv_self,grad_self,hv_cross,
        # grad_cross (default all four)
        kinds = _os.environ.get(
            "OCFFM_FUSED_TBL_OPS", "hv_self,grad_self,hv_cross,grad_cross")
        self.fused_kinds = frozenset(
            s.strip() for s in kinds.split(",") if s.strip())
        if fmode in ("1", "on", "true"):
            if meta.blocked_bm_u and "blk_u_take" in data:
                self.pregather_u = True
            if meta.blocked_bm_v and "blk_v_take" in data:
                self.pregather_v = True
        # Blocked residual gap (ops.pos_gap_blocked): with the solve's
        # pre-gathered stream in hand, the update pass's two per-stream
        # random row gathers (the plain pos_dot "gaps" form) collapse to
        # sequential streaming + one-hot MXU matmuls + an (nnz,) scalar
        # permute.  Rides the pregather decision; the shard-aligned mesh
        # path keeps plain pos_dot (its rows_pre/flat-gap arrays are
        # block-sharded and the inv permute would cross shards).
        gmode = _os.environ.get("OCFFM_BLK_GAP", "auto").lower()
        gap_want = gmode not in ("0", "off", "false")
        # Slot-order residual carry (OCFFM_BLK_YT, default "auto"): carry yt
        # in BOTH sides' blocked slot orders instead of stream order.  The
        # gradient coefficient c = pos_coeff(yt) * w then never needs the
        # per-solve (nnz,) random scalar gather c[src] — it is elementwise on
        # the carried array — and the gap pass skips its inverse permute on
        # the solving side (only the propagation to the OTHER side's order
        # pays one static scalar gather).  Values are bit-identical to the
        # stream carry: the same floats live at permuted positions.
        # Requires every solve to run fully blocked: both layouts present,
        # pre-gather on both sides, the blocked gap.
        ymode = _os.environ.get("OCFFM_BLK_YT", "auto").lower()
        yt_want = ymode not in ("0", "off", "false")
        if meta.blocked_shards > 1:
            # Under the mesh the round-3 stack is all-or-nothing: the
            # shard_map-local kernels consume SLOT-ORDER coefficients, so
            # they require the carry (a stream-order c[src] gather with the
            # v side's global src would cross shards inside the pass).
            # With the carry: u and v passes run shard-locally (kt/fused
            # where the per-side gates allow, row-major blocked otherwise),
            # the gap lands flat in the solving side's slot sharding, and
            # only the cross-order propagation + the per-solve B-row
            # all-gather touch the interconnect.
            self.blk_yt = bool(yt_want and gap_want
                               and meta.blocked_bm_u and meta.blocked_bm_v
                               and "blk_u_from_v" in data
                               and self.pregather_v)
            self.blk_gap = self.blk_yt
            if not self.blk_yt:
                # round-2 sharded fallback: u-side row-major blocked under
                # shard_map (stream-order c, shard-local src), v side plain
                # GSPMD COO ops
                self.kt_u = self.kt_v = False
                self.pregather_v = False
                self.pallas_hv_v = False
        else:
            self.blk_gap = gap_want
            self.blk_yt = (yt_want and self.blk_gap
                           and self.pregather_u and self.pregather_v
                           and "blk_u_from_v" in data)
        # which sides' blocked layouts are CONSUMED at runtime (under the
        # sharded fallback the v layout exists in data but must not be
        # used: its blocked passes would gather B rows inside a fori_loop
        # through GSPMD)
        self.blk_u_on = bool(meta.blocked_bm_u)
        self.blk_v_on = bool(meta.blocked_bm_v) and (
            meta.blocked_shards == 1 or self.blk_yt)
        # two-tier head tiers (skew split, single-shard only): whenever a
        # side's TAIL blocked arrays are consumed, its head contributions
        # must be added too — the tail layout was built with the head
        # entries dropped (ops.make_blocked_layout head_chunk)
        self.hd_u = "blk_u_hd_row" in data
        self.hd_v = "blk_v_hd_row" in data
        if self._gate_log and (self.hd_u or self.hd_v):
            for side, on in (("u", self.hd_u), ("v", self.hd_v)):
                if on:
                    t = data[f"blk_{side}_hd_take"]
                    print(f"[ocffm gates] head tier {side}: "
                          f"{t.shape[0]} chunks x {t.shape[1]} "
                          f"(tail maxc {data['blk_' + side + '_own'].shape[1]})")
        # residual array to sync/inspect on (bench, profiling scripts)
        self.yt_key = "yt_u" if self.blk_yt else "yt"
        # donate the carried state: P/Q/a/b/yt buffers are dead after the
        # epoch returns their successors (no-op on backends without donation)
        self._epoch = jax.jit(self._epoch_entry, donate_argnums=(0,))
        self._objective = jax.jit(self._objective_entry)
        self._refresh = jax.jit(self._refresh_entry)

    # -- field array accessors ------------------------------------------------

    def _side_arrays(self, b: BlockInfo, first: bool):
        """(idx, val, reg, rows) for the block's f1 (first) or f2 side."""
        fg = b.f1 if first else b.f2
        fl = b.fi if first else b.fj
        d = self.data
        if fg < self.meta.layout.fu:
            return d["xu_idx"][fl], d["xu_val"][fl], d["reg_u"][fl], self.meta.m
        return d["xv_idx"][fl], d["xv_val"][fl], d["reg_v"][fl], self.meta.n

    def _side_colsq(self, b: BlockInfo, first: bool):
        """Static per-feature sum of squared values, (pad_d(D_f),) — the
        (X^2)^T of a constant row is colsq x that row (the Jacobi diag's
        omega term in the fused table path)."""
        fg = b.f1 if first else b.f2
        fl = b.fi if first else b.fj
        if fg < self.meta.layout.fu:
            return self.data["colsq_u"][fl]
        return self.data["colsq_v"][fl]

    def _side_xh(self, b: BlockInfo, first: bool):
        """(xh_idx, xh_val) — the HEAD rows' field data for this block
        side, or None (no head tier / field not fused-eligible)."""
        fg = b.f1 if first else b.f2
        fl = b.fi if first else b.fj
        xhs = self.data.get("xh_u" if fg < self.meta.layout.fu else "xh_v")
        return xhs[fl] if xhs else None

    def _hd_side(self, u_side: bool) -> bool:
        """Head tier present on the u (True) / v (False) segment side."""
        return self.hd_u if u_side else self.hd_v

    def _hd_coeff(self, state, u_side: bool) -> Array:
        """Gradient coefficients on the head tier's slots (NCH, CHUNK) —
        elementwise on the carried head residual, or a stream-order scalar
        gather outside the carry mode (mirrors the tail's c[src])."""
        pre = "blk_u_hd_" if u_side else "blk_v_hd_"
        d = self.data
        if self.blk_yt:
            yt_hd = state["yt_u_hd" if u_side else "yt_v_hd"]
            return self._pos_coeff(yt_hd) * d[pre + "w"]
        c = self._pos_coeff(state["yt"]) * d["pos_w"]
        # pad slots gather position 0 (a REAL entry) — unlike the tail there
        # is no all-zero one-hot row to kill them, so mask via the head
        # weights (w is the 1/0 pad mask; idempotent on real entries)
        return c[d[pre + "src"]] * d[pre + "w"]

    def _side_ident(self, b: BlockInfo, first: bool):
        """(is_identity, padded_rows, true_rows) for the block side."""
        fg = b.f1 if first else b.f2
        fl = b.fi if first else b.fj
        meta = self.meta
        if fg < meta.layout.fu:
            ident = meta.ident_u[fl] if fl < len(meta.ident_u) else False
            return ident, meta.m, meta.m_true
        ident = meta.ident_v[fl] if fl < len(meta.ident_v) else False
        return ident, meta.n, meta.n_true

    def _proj(self, b: BlockInfo, first: bool, T: Array) -> Array:
        """X_side @ T.  Identity fields skip the random gather entirely:
        X is the identity over true rows, so the projection is the table
        itself zero-padded to the row count (table pad rows are zero by
        invariant)."""
        ident, rows, _ = self._side_ident(b, first)
        if ident and T.shape[0] <= rows:
            if T.shape[0] == rows:
                return T
            return jnp.pad(T, ((0, rows - T.shape[0]), (0, 0)))
        i1, v1, _, _ = self._side_arrays(b, first)
        return project(i1, v1, T)

    def _scat(self, b: BlockInfo, first: bool, Z: Array, dim: int) -> Array:
        """X_side^T @ Z.  Identity fields: a slice (row d receives exactly
        row d's contribution), masking any table pad rows — data pad rows
        carry nonzero omega terms that val==0 drops in the general path."""
        ident, rows, rows_true = self._side_ident(b, first)
        if ident and dim <= Z.shape[0]:
            G = Z[:dim]
            if dim > rows_true:
                G = G * (jnp.arange(dim) < rows_true)[:, None].astype(G.dtype)
            return G
        i1, v1, _, _ = self._side_arrays(b, first)
        return scatter(i1, v1, Z, dim)

    # -- init -----------------------------------------------------------------

    def init(self, key: Array) -> Dict[str, Any]:
        """Random block tables + all caches (reference init, ffm.cpp:467-512).

        Tables ~ U(-0.1/sqrt(k), 0.1/sqrt(k)) (init_mat, ffm.cpp:71-78).
        One jitted program for all tables (cheap dispatch on remote backends).
        """

        @jax.jit
        def init_params(key):
            meta = self.meta
            k = meta.hp.k
            scale = 0.1 / np.sqrt(k)

            def table(key, d_true, d_pad):
                t = jax.random.uniform(
                    key, (d_pad, k), meta.dtype, minval=-scale, maxval=scale
                )
                if d_pad == d_true:
                    return t
                # zero the pad rows: never indexed, zero gradient, CG keeps
                # them zero — the table-padding invariant (see pad_d)
                rows = jnp.arange(d_pad)[:, None] < d_true
                return jnp.where(rows, t, 0.0)

            params: Dict[int, Dict[str, Array]] = {}
            for b in self.blocks:
                key, k1, k2 = jax.random.split(key, 3)
                params[b.f12] = dict(
                    W=table(k1, b.d1, meta.pad_d(b.d1)),
                    H=table(k2, b.d2, meta.pad_d(b.d2)),
                )
            return params

        return self.refresh_caches({"params": init_params(key)})

    def refresh_caches(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """(Re)build P/Q, side sums a/b and the positive residual yt from
        params — used at init and after loading a checkpoint.  Jitted as one
        program (eager per-op dispatch is expensive on remote backends)."""
        return self._refresh(state["params"], self.data)

    def _refresh_entry(self, params, data):
        prev = self.data
        self.data = data
        try:
            return self._refresh_impl(params)
        finally:
            self.data = prev

    def _refresh_impl(self, params) -> Dict[str, Any]:
        P, Q = {}, {}
        for b in self.blocks:
            P[b.f12] = self._proj(b, True, params[b.f12]["W"])
            Q[b.f12] = self._proj(b, False, params[b.f12]["H"])
        a, b_vec = self._side_sums(P, Q)
        yt = self._pos_scores(P, Q, a, b_vec) - 1.0
        if not self.blk_yt:
            return dict(params=params, P=P, Q=Q, a=a, b=b_vec, yt=yt)
        # slot-order carry: the stream residual permuted into each side's
        # blocked layout (one-time gathers; epochs then never touch stream
        # order).  The blk_*_w multiply zeroes structural pad slots.
        d = self.data
        out = dict(
            params=params, P=P, Q=Q, a=a, b=b_vec,
            # srcg: global stream positions (the sharded u layout's src is
            # shard-local); a one-time gather, never in the hot passes
            yt_u=yt[d.get("blk_u_srcg", d["blk_u_src"])] * d["blk_u_w"],
            yt_v=yt[d["blk_v_src"]] * d["blk_v_w"],
        )
        if self.hd_u:
            out["yt_u_hd"] = yt[d["blk_u_hd_src"]] * d["blk_u_hd_w"]
        if self.hd_v:
            out["yt_v_hd"] = yt[d["blk_v_hd_src"]] * d["blk_v_hd_w"]
        return out

    def yt_stream(self, state) -> Array:
        """The positive-stream residual in ORIGINAL stream order, pad-masked
        (x pos_w) — stream order is diagnostics-only under the slot-order
        carry (every consumer of yt multiplies by the pad mask anyway)."""
        d = self.data
        if "yt" in state:
            return state["yt"] * d["pos_w"]
        flat = state["yt_u"].reshape(-1)
        if self.hd_u:
            # two-tier: inv maps into the concatenated (tail, head) space
            flat = jnp.concatenate([flat, state["yt_u_hd"].reshape(-1)])
        return flat[d["blk_u_inv"]] * d["pos_w"]

    def _side_sums(self, P, Q) -> Tuple[Array, Array]:
        """a_i / b_j self-interaction sums (calc_side, ffm.cpp:360-373)."""
        meta = self.meta
        a = jnp.zeros(meta.m, meta.dtype)
        b_vec = jnp.zeros(meta.n, meta.dtype)
        for blk in meta.layout.user_self_blocks():
            a = a + jnp.sum(P[blk.f12] * Q[blk.f12], axis=1)
        for blk in meta.layout.item_self_blocks():
            b_vec = b_vec + jnp.sum(P[blk.f12] * Q[blk.f12], axis=1)
        return a, b_vec

    def _pos_scores(self, P, Q, a, b_vec) -> Array:
        """yhat at every positive pair (init_y_tilde, ffm.cpp:388-403)."""
        d = self.data
        u, v = d["pos_u"], d["pos_v"]
        z = a[u] + b_vec[v]
        for blk in self.meta.layout.cross_blocks():
            z = z + pos_dot(P[blk.f12], u, Q[blk.f12], v)
        return z

    # -- ω-term rank-k caches -------------------------------------------------

    def _cache_sasb(self, P, Q) -> Tuple[Array, Array]:
        """sa_i = sum_j cross(i,j), sb_j = sum_i cross(i,j) via (Q^T 1) chains
        (cache_sasb, ffm.cpp:514-535) — O((m+n)k) per cross block."""
        meta = self.meta
        sa = jnp.zeros(meta.m, meta.dtype)
        sb = jnp.zeros(meta.n, meta.dtype)
        for blk in meta.layout.cross_blocks():
            Pb, Qb = P[blk.f12], Q[blk.f12]
            sa = sa + Pb @ jnp.sum(Qb, axis=0)
            sb = sb + Qb @ jnp.sum(Pb, axis=0)
        return sa, sb

    # -- gradients ------------------------------------------------------------

    def _pos_coeff(self, yt: Array) -> Array:
        """Per-positive gradient coefficient (1-w)*yt - w*(1-r): the exact
        decomposition the reference uses everywhere (ffm.cpp:577-579,684)."""
        hp = self.meta.hp
        return (1.0 - hp.omega) * yt - hp.omega * (1.0 - hp.r)

    def _grad_self(self, state, b: BlockInfo, first: bool, sa, sb,
                   want_diag: bool = False):
        """Gradient for one table of a self block (gd_side, ffm.cpp:537-592).

        z_i = w [ n (a_i - r) + sum(b) + sa_i ] + sum_{j in pos_i} c_ij
        G   = lam * reg * T + X1^T diag(z) Q1

        ``want_diag``: also return the Jacobi diag's scatter term — fused
        into the same streamed pass when the table kernel applies, else
        None (the caller falls back to _diag_H's own pass)."""
        meta, d = self.meta, self.data
        hp = meta.hp
        f12 = b.f12
        i1, v1, reg, rows = self._side_arrays(b, first)
        T = state["params"][f12]["W" if first else "H"]
        Q1 = state["Q"][f12] if first else state["P"][f12]
        # Padded rows of a/b/P/Q are exactly zero, so full-array sums equal
        # true-row sums — keeps every reduction GSPMD-shardable.
        if b.kind == "uu":
            n_other, side, s_cache = meta.n_true, state["a"], sa
            other_sum = jnp.sum(state["b"])
            pre, num, yt_key, cnt = "blk_u_", meta.m, "yt_u", d["cnt_u"]
        else:  # vv
            n_other, side, s_cache = meta.m_true, state["b"], sb
            other_sum = jnp.sum(state["a"])
            pre, num, yt_key, cnt = "blk_v_", meta.n, "yt_v", d["cnt_v"]
        fused = self._fused_tbl_side(b, first, T.shape[0], "grad_self")
        if fused is not None:
            # fused table kernel: dense term, positive seg-sum, X^T scatter
            # (and optionally the Jacobi diag's (X^2)^T pass) in ONE
            # streamed pass — no (rows, k) z intermediate, no random access
            xi, xv, bm = fused
            if self.blk_yt:
                c_blk = self._pos_coeff(state[yt_key]) * d[pre + "w"]
            else:
                c = self._pos_coeff(state["yt"]) * d["pos_w"]
                c_blk = c[d[pre + "src"]]
            zdense = (hp.omega * (n_other * (side - hp.r) + other_sum
                                  + s_cache)).astype(meta.dtype)
            if self._hd_side(b.kind == "uu"):
                # head entries are absent from the tail slots; their per-row
                # positive sums ride the dense z term into the fused kernel
                zdense = zdense + head_seg_sum(
                    self._hd_coeff(state, b.kind == "uu"),
                    d[pre + "hd_row"], num).astype(meta.dtype)
            dd2 = None
            if want_diag and self.cg_precond == "jacobi":
                dd2 = ((1.0 - hp.omega) * cnt
                       + hp.omega * n_other).astype(meta.dtype)
            # kt per the block's SIDE (kt_u/kt_v), not the global flag: the
            # side gate carries the kt_interpret-aware dtype check, so a
            # forced-interpret fused config (OCFFM_FUSED_TBL=interpret +
            # OCFFM_KT=auto) never routes a self solve to COMPILED kt
            # Mosaic kernels at dtypes only interpret mode supports.
            kt_side = self.kt_u if b.kind == "uu" else self.kt_v
            sharded = meta.blocked_shards > 1
            if kt_side:
                zrow = zdense[None, :]
                ddrow = None if dd2 is None else dd2[None, :]
                if sharded:
                    # shard-local rows/blocks, psum'd table-space output
                    def local(xi_l, xv_l, q1_l, z_l, own_l, cb_l, *dd_l):
                        return grad_self_tbl_kt_pallas(
                            T.shape[0], xi_l, xv_l, q1_l, z_l, own_l,
                            cb_l, bm,
                            dd_row=dd_l[0] if dd_l else None,
                            interpret=self.kt_interpret)

                    args = [(xi, "xt"), (xv, "xt"), (Q1, "m2"),
                            (zrow, "xt"), (d[pre + "own"], "m2"),
                            (c_blk, "m2")]
                    if ddrow is not None:
                        args.append((ddrow, "xt"))
                    res = self._shard_local(
                        local, args,
                        ("r", "r") if ddrow is not None else "r",
                        psum=True)
                else:
                    res = grad_self_tbl_kt_pallas(
                        T.shape[0], xi, xv, Q1, zrow,
                        d[pre + "own"], c_blk, bm, dd_row=ddrow,
                        interpret=self.kt_interpret)
            else:
                zcol = zdense[:, None]
                ddcol = None if dd2 is None else dd2[:, None]
                if sharded:
                    def local(xi_l, xv_l, q1_l, z_l, own_l, cb_l, *dd_l):
                        return grad_self_tbl_pallas(
                            T.shape[0], xi_l, xv_l, q1_l, z_l, own_l,
                            cb_l, bm, dd=dd_l[0] if dd_l else None,
                            interpret=self.fused_interpret)

                    args = [(xi, "xt"), (xv, "xt"), (Q1, "m2"),
                            (zcol, "m2"), (d[pre + "own"], "m2"),
                            (c_blk, "m2")]
                    if ddcol is not None:
                        args.append((ddcol, "m2"))
                    res = self._shard_local(
                        local, args,
                        ("r", "r") if ddcol is not None else "r",
                        psum=True)
                else:
                    res = grad_self_tbl_pallas(
                        T.shape[0], xi, xv, Q1, zcol,
                        d[pre + "own"], c_blk, bm, dd=ddcol,
                        interpret=self.fused_interpret)
            # keep the kernels' f32 table-space output UNROUNDED through
            # the gradient assembly (round 5): rounding Gt to bf16 before
            # CG put bf16-scale noise on a gradient whose terms cancel
            # near convergence, and that value noise — amplified through
            # the Newton steps — measured as a divergence spiral at the
            # k=16 tiny-omega sweep cell (PARITY.md incident log #2)
            acc = jnp.promote_types(meta.dtype, jnp.float32)
            lamT = hp.lam * (reg[:, None].astype(acc) * T.astype(acc))
            if dd2 is not None:
                Gt, Dq = res
                return lamT + Gt.astype(acc), ("tbl", Dq.astype(acc))
            G = lamT + res.astype(acc)
            return (G, None) if want_diag else G
        if self.blk_yt:
            # slot-order carry: c is elementwise on the carried residual and
            # the per-row sum streams sequentially — no random access
            cb = self._pos_coeff(state[yt_key]) * d[pre + "w"]
            if meta.blocked_shards > 1:
                zpos = self._seg_sum_blocked_sharded(b.kind == "uu", cb)
            else:
                zpos = seg_sum_blocked(
                    cb, d[pre + "own"], num,
                    meta.blocked_bm_u if b.kind == "uu"
                    else meta.blocked_bm_v)
            if self._hd_side(b.kind == "uu"):
                # the tail slots dropped the head rows' entries — add their
                # per-row sums in BOTH the sharded and single-shard branches
                zpos = zpos + head_seg_sum(
                    self._hd_coeff(state, b.kind == "uu"),
                    d[pre + "hd_row"], num)
        else:
            c = self._pos_coeff(state["yt"]) * d["pos_w"]
            zpos = jax.ops.segment_sum(
                c, d["pos_u" if b.kind == "uu" else "pos_v"],
                num_segments=num, indices_are_sorted=(b.kind == "uu"))
        z = hp.omega * (n_other * (side - hp.r) + other_sum + s_cache) + zpos
        G = hp.lam * reg[:, None] * T + self._scat(
            b, first, z[:, None] * Q1, T.shape[0]
        )
        return (G, None) if want_diag else G

    # -- shard-aligned blocked positive passes (blocked_shards > 1) ----------
    #
    # The shard-aligned stream (pad_labels shard_rows=) puts every user
    # row's positives on the row's own shard, and the blocked layout's src
    # is shard-LOCAL — so the u-side blocked passes need no communication
    # at all: shard_map runs the identical per-block one-hot MXU math (or
    # the kt/fused Mosaic kernels) device-locally.  Under the slot-order
    # carry the v side runs shard-locally too: every consumed array is in
    # slot order (coefficients elementwise on the carried residual, rows
    # pre-gathered, weights pre-permuted), sharded on the blocks dim.  The
    # collective budget of a sharded solve: the all-gather hidden in the
    # once-per-solve rows_pre gather (B is row-sharded), a psum of each
    # fused kernel's table-space output, the carry's cross-order
    # propagation gather, and the k x k Gram psums GSPMD already inserts.

    def _shard_specs(self):
        from jax.sharding import PartitionSpec as P

        ax = self.data_axis
        return P(ax), P(ax, None), P(ax, None, None), P()

    def _shard_local(self, fn, args_specs, out_specs, psum: bool = False):
        """Run a blocked-kernel call shard-locally under shard_map.

        ``args_specs``: [(array, spec), ...] with spec one of
          "v"  (ax,)            sharded vector / flat slot array
          "m2" (ax, None)       rows- or blocks-leading 2-D
          "m3" (ax, None, None) the pre-gathered stream
          "xt" (None, ax)       transposed (p, rows) / (1, rows) arrays
          "r"  replicated
        ``out_specs``: spec or tuple of specs.  ``psum``: all-reduce the
        outputs over the data axis (table-space partial sums)."""
        from jax.sharding import PartitionSpec as P

        ax = self.data_axis
        S = dict(v=P(ax), m2=P(ax, None), m3=P(ax, None, None), r=P(),
                 xt=P(None, ax))
        args = tuple(a for a, _ in args_specs)
        in_specs = tuple(S[s] for _, s in args_specs)
        outs = (tuple(S[s] for s in out_specs)
                if isinstance(out_specs, tuple) else S[out_specs])
        if psum:
            inner = fn

            def fn(*a):  # noqa: F811
                return jax.tree.map(
                    lambda t: jax.lax.psum(t, ax), inner(*a))

        wrapped = jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                                out_specs=outs, check_vma=False)
        return wrapped(*args)

    def _scatter_blocked_sharded(self, first: bool, c, rows_pre,
                                 wq_blk=None, c_blk=None, kt: bool = False):
        """The blocked gradient scatter under shard_map.

        ``c`` (stream order, u side only — shard-local src) or ``c_blk``
        (slot order, either side — the carry mode).  ``wq_blk``:
        pre-permuted diag weights.  ``kt``: the k-major kernel."""
        meta, d = self.meta, self.data
        pre = "blk_u_" if first else "blk_v_"
        num_l = (meta.m if first else meta.n) // meta.blocked_shards
        BM = meta.blocked_bm_u if first else meta.blocked_bm_v
        with_diag = wq_blk is not None
        out_specs = ("m2", "m2") if with_diag else "m2"
        if c_blk is not None:
            if kt:
                def local(cb_l, own_l, rows_l, wq_l):
                    return pos_scatter_kt_pallas(
                        cb_l, rows_l, own_l, num_l, BM,
                        w_blk=wq_l if with_diag else None,
                        interpret=self.kt_interpret)
            else:
                def local(cb_l, own_l, rows_l, wq_l):
                    return pos_scatter_blocked(
                        None, None, None, None, own_l, num_l, BM,
                        diag_w_blk=wq_l if with_diag else None,
                        rows=rows_l, coeff_blk=cb_l)
            return self._shard_local(
                local,
                [(c_blk, "m2"), (d[pre + "own"], "m2"), (rows_pre, "m3"),
                 (wq_blk if with_diag else d[pre + "w"], "m2")],
                out_specs)
        assert first and not kt, "stream-order c is the u-side fallback"

        def local(c_l, src_l, own_l, rows_l, wq_l):
            return pos_scatter_blocked(
                c_l, None, None, src_l, own_l, num_l, BM,
                diag_w_blk=wq_l if with_diag else None, rows=rows_l)

        return self._shard_local(
            local,
            [(c, "v"), (d["blk_u_src"], "m2"), (d["blk_u_own"], "m2"),
             (rows_pre, "m3"),
             (wq_blk if with_diag else d["blk_u_w"], "m2")],
            out_specs)

    def _hv_blocked_sharded(self, first: bool, phi, rows_pre, dmat,
                            w_scale, kt: bool = False):
        """The blocked per-CG-iteration positive + fused omega pass under
        shard_map (kt, Mosaic row-major, or fused-XLA form)."""
        meta, d = self.meta, self.data
        pre = "blk_u_" if first else "blk_v_"
        num_l = (meta.m if first else meta.n) // meta.blocked_shards
        BM = meta.blocked_bm_u if first else meta.blocked_bm_v
        use_pallas = self.pallas_hv_u if first else self.pallas_hv_v

        def local(phi_l, own_l, rows_l, w_l, dm):
            if kt:
                return pos_hv_kt_pallas(
                    phi_l, rows_l, own_l, w_l, dm, num_l, BM,
                    w_scale=w_scale, interpret=self.kt_interpret)
            if use_pallas:
                return pos_hv_blocked_pallas(
                    phi_l, rows_l, own_l, w_l, dm, num_l, BM,
                    w_scale=w_scale)
            return pos_hv_blocked(
                phi_l, None, None, None, None, own_l, num_l, BM,
                rows=rows_l, w_blk=w_l, w_scale=w_scale, dense_mat=dm)

        return self._shard_local(
            local,
            [(phi, "m2"), (d[pre + "own"], "m2"), (rows_pre, "m3"),
             (d[pre + "w"], "m2"), (dmat, "r")],
            "m2")

    def _gap_blocked_sharded(self, first: bool, dT, rows_pre,
                             kt: bool = False):
        """The blocked residual gap under shard_map: returns the FLAT
        slot-order gap, sharded over the data axis (block-nested slots)."""
        meta, d = self.meta, self.data
        pre = "blk_u_" if first else "blk_v_"
        BM = meta.blocked_bm_u if first else meta.blocked_bm_v

        def local(dT_l, own_l, rows_l):
            if kt:
                return pos_gap_kt_pallas(dT_l, rows_l, own_l, BM,
                                         interpret=self.kt_interpret)
            return pos_gap_blocked(dT_l, rows_l, own_l, None, BM)

        return self._shard_local(
            local,
            [(dT, "m2"), (d[pre + "own"], "m2"), (rows_pre, "m3")],
            "v")

    def _seg_sum_blocked_sharded(self, first: bool, c_blk):
        """seg_sum_blocked (per-row sums of slot-order values) under
        shard_map."""
        meta, d = self.meta, self.data
        pre = "blk_u_" if first else "blk_v_"
        num_l = (meta.m if first else meta.n) // meta.blocked_shards
        BM = meta.blocked_bm_u if first else meta.blocked_bm_v

        def local(cb_l, own_l):
            return seg_sum_blocked(cb_l, own_l, num_l, BM)

        return self._shard_local(
            local, [(c_blk, "m2"), (d[pre + "own"], "m2")], "v")

    def _expand_rows_sharded(self, first: bool, vec):
        """expand_rows_blocked (per-slot copy of a per-row vector) under
        shard_map: flat slot-order output, data-sharded."""
        meta, d = self.meta, self.data
        pre = "blk_u_" if first else "blk_v_"
        BM = meta.blocked_bm_u if first else meta.blocked_bm_v

        def local(v_l, own_l):
            return expand_rows_blocked(v_l, own_l, BM)

        return self._shard_local(
            local, [(vec, "v"), (d[pre + "own"], "m2")], "v")

    def _grad_cross(self, state, b: BlockInfo, first: bool,
                    with_diag_pos: bool = False, rows_pre=None,
                    kt: bool = False, rows_hd=None):
        """Gradient for one table of a cross block (gd_cross, ffm.cpp:630-703).

        omega part via k x k Grams: T = sum_c P_c (Q_c^T Q1), oQ = Q1^T 1,
        bQ = Q1^T b  (ffm.cpp:658-670); positive part via segment_sum.

        ``with_diag_pos``: also return the Jacobi diagonal's positive term
        (sum_t (1-w) w_t Q1[o_t]^2 per row) from the SAME gather — one
        fused (chunk, 2k) pass instead of two positive passes
        (ops.pos_scatter_pair); per-column add order is identical, so the
        gradient is bit-equal to the unfused path."""
        meta, d = self.meta, self.data
        hp = meta.hp
        f12 = b.f12
        i1, v1, reg, rows = self._side_arrays(b, first)
        T = state["params"][f12]["W" if first else "H"]
        if self.blk_yt:
            # slot-order carry: the coefficient is elementwise on the carried
            # residual — the (nnz,) random scalar gather c[src] disappears
            pre_c = "blk_u_" if first else "blk_v_"
            c = None
            c_blk = self._pos_coeff(state["yt_u" if first else "yt_v"]) \
                * d[pre_c + "w"]
        else:
            c = self._pos_coeff(state["yt"]) * d["pos_w"]
            c_blk = None

        def hd_tbl(Gt, Qt=None):
            """Head-tier additions in TABLE space for the fused gradient:
            chunk sums -> per-head-row payload -> X_head^T scatter (the
            tail kernel never saw the head entries)."""
            if rows_hd is None:
                return Gt, Qt
            pre_h = "blk_u_hd_" if first else "blk_v_hd_"
            xh_i, xh_v = self._side_xh(b, first)
            loc = d[pre_h + "loc"]
            z_c = head_chunk_sums(self._hd_coeff(state, first), rows_hd)
            z_hd = jnp.zeros((xh_i.shape[0], z_c.shape[1]),
                             z_c.dtype).at[loc].add(z_c)
            Gt = Gt + head_tbl_scatter(z_hd, xh_i, xh_v, T.shape[0])
            if Qt is not None:
                wq_hd = (1.0 - hp.omega) * d[pre_h + "w"]
                q_c = head_chunk_sums(wq_hd, rows_hd * rows_hd)
                q_hd = jnp.zeros_like(z_hd).at[loc].add(q_c)
                # the Hessian diag scatters through X^2, not X
                Qt = Qt + head_tbl_scatter(q_hd, xh_i, xh_v * xh_v,
                                           T.shape[0])
            return Gt, Qt

        def fused_grad(pre, dense):
            """Fused table-space gradient (+ Jacobi diag) when the table
            kernel applies: one streamed pass, no (rows, k) Z intermediate,
            no table scatter passes (ops.grad_cross_tbl[_kt]_pallas)."""
            fused = (self._fused_tbl_side(b, first, T.shape[0],
                                          "grad_cross", kt)
                     if rows_pre is not None else None)
            if fused is None:
                return None
            xi, xv, bm = fused
            cb = c_blk if c_blk is not None else c[d[pre + "src"]]
            kern = grad_cross_tbl_kt_pallas if kt else grad_cross_tbl_pallas
            interp = self.kt_interpret if kt else self.fused_interpret
            sharded = meta.blocked_shards > 1
            if with_diag_pos:
                if sharded:
                    def local(xi_l, xv_l, rows_l, own_l, cb_l, dn_l, w_l):
                        return kern(
                            T.shape[0], xi_l, xv_l, rows_l, own_l, cb_l,
                            dn_l, bm, w_blk=w_l,
                            wq_scale=(1.0 - hp.omega), interpret=interp)

                    Gt, Qt = self._shard_local(
                        local,
                        [(xi, "xt"), (xv, "xt"), (rows_pre, "m3"),
                         (d[pre + "own"], "m2"), (cb, "m2"), (dense, "m2"),
                         (d[pre + "w"], "m2")],
                        ("r", "r"), psum=True)
                else:
                    Gt, Qt = kern(
                        T.shape[0], xi, xv, rows_pre, d[pre + "own"], cb,
                        dense, bm, w_blk=d[pre + "w"],
                        wq_scale=(1.0 - hp.omega), interpret=interp)
                Gt, Qt = hd_tbl(Gt, Qt)
                B1 = state["Q"][f12] if first else state["P"][f12]
                qtq_d = jnp.sum(B1 * B1, axis=0)  # pad rows are zero
                colsq = self._side_colsq(b, first)
                # f32 assembly (see _grad_self): the kernels' table-space
                # outputs stay unrounded through the gradient/diag
                acc = jnp.promote_types(meta.dtype, jnp.float32)
                tblD = (hp.omega * (colsq[:, None].astype(acc)
                                    * qtq_d[None, :].astype(acc))
                        + Qt.astype(acc))
                G = (hp.lam * (reg[:, None].astype(acc) * T.astype(acc))
                     + Gt.astype(acc))
                return G, ("tbl", tblD)
            if sharded:
                def local(xi_l, xv_l, rows_l, own_l, cb_l, dn_l):
                    return kern(
                        T.shape[0], xi_l, xv_l, rows_l, own_l, cb_l,
                        dn_l, bm, interpret=interp)

                Gt = self._shard_local(
                    local,
                    [(xi, "xt"), (xv, "xt"), (rows_pre, "m3"),
                     (d[pre + "own"], "m2"), (cb, "m2"), (dense, "m2")],
                    "r", psum=True)
            else:
                Gt = kern(
                    T.shape[0], xi, xv, rows_pre, d[pre + "own"], cb,
                    dense, bm, interpret=interp)
            Gt, _ = hd_tbl(Gt)
            acc = jnp.promote_types(meta.dtype, jnp.float32)
            return (hp.lam * (reg[:, None].astype(acc) * T.astype(acc))
                    + Gt.astype(acc))

        def kt_scatter(pre, num, bm):
            """k-major gradient scatter for solves whose table side is NOT
            fused (identity / large-D): zpos (+ diag posq) from the
            (k, MAXC) stream (ops.pos_scatter_kt_pallas)."""
            cb = c_blk if c_blk is not None else c[d[pre + "src"]]
            wq = ((1.0 - hp.omega) * d[pre + "w"]) if with_diag_pos else None
            res = pos_scatter_kt_pallas(
                cb, rows_pre, d[pre + "own"], num, bm, w_blk=wq,
                interpret=self.kt_interpret)
            return res if with_diag_pos else (res, None)

        def hd_rowspace(zpos, posq, num, pre_h):
            """Head-tier additions in ROW space for the blocked (non-fused)
            gradient branches — the tail pass dropped the head entries."""
            if rows_hd is None:
                return zpos, posq
            wq_hd = ((1.0 - hp.omega) * d[pre_h + "w"]
                     if with_diag_pos else None)
            res_h = head_scatter(self._hd_coeff(state, first), rows_hd,
                                 d[pre_h + "row"], num, diag_w_hd=wq_hd)
            if with_diag_pos:
                return zpos + res_h[0], posq + res_h[1]
            return zpos + res_h, posq

        if first:
            Q1 = state["Q"][f12]  # (n, k)
            oQ = jnp.sum(Q1, axis=0)
            bQ = Q1.T @ state["b"]
            gram_T = jnp.zeros((meta.m, hp.k), meta.dtype)
            for blk in meta.layout.cross_blocks():
                gram = state["Q"][blk.f12].T @ Q1  # (k, k)
                gram_T = gram_T + state["P"][blk.f12] @ gram
            dense = hp.omega * (
                (state["a"] - hp.r)[:, None] * oQ[None, :] + bQ[None, :] + gram_T
            )
            fg = fused_grad("blk_u_", dense)
            if fg is not None:
                return fg
            if self.blk_u_on and (rows_pre is not None
                                  or not with_diag_pos):
                # blocked layout: segment-sum as MXU block matmuls.  Without
                # pre-gathered rows the Jacobi diag keeps the fused
                # pos_scatter_pair (one random gather feeds both payloads —
                # the blocked double-payload form measured slower there);
                # with rows_pre the stream is read sequentially, so the
                # blocked double payload wins at every dtype.
                # the diag weights are STATIC ((1-w) * pad mask): use the
                # pre-permuted blk_w instead of a per-solve wq[src] gather
                wq_blk = ((1.0 - hp.omega) * d["blk_u_w"]
                          if with_diag_pos else None)
                if meta.blocked_shards > 1:
                    res = self._scatter_blocked_sharded(
                        True, c, rows_pre, wq_blk=wq_blk, c_blk=c_blk,
                        kt=kt and rows_pre is not None)
                    zpos, posq = res if with_diag_pos else (res, None)
                elif kt and rows_pre is not None:
                    zpos, posq = kt_scatter("blk_u_", meta.m,
                                            meta.blocked_bm_u)
                else:
                    res = pos_scatter_blocked(
                        c, Q1, d["blk_u_take"], d["blk_u_src"],
                        d["blk_u_own"], meta.m, meta.blocked_bm_u,
                        diag_w_blk=wq_blk, rows=rows_pre, coeff_blk=c_blk)
                    zpos, posq = res if with_diag_pos else (res, None)
                zpos, posq = hd_rowspace(zpos, posq, meta.m, "blk_u_hd_")
            elif with_diag_pos:
                assert c is not None, "slot carry requires the blocked path"
                wq = (1.0 - hp.omega) * d["pos_w"]
                zpos, posq = pos_scatter_pair(
                    c, wq, Q1, d["pos_v"], d["pos_u"], meta.m, seg_sorted=True)
            else:
                assert c is not None, "slot carry requires the blocked path"
                zpos = pos_scatter(c, Q1, d["pos_v"], d["pos_u"], meta.m,
                                   seg_sorted=True)
        else:
            P1 = state["P"][f12]  # (m, k)
            oQ = jnp.sum(P1, axis=0)
            bQ = P1.T @ state["a"]
            gram_T = jnp.zeros((meta.n, hp.k), meta.dtype)
            for blk in meta.layout.cross_blocks():
                gram = state["P"][blk.f12].T @ P1
                gram_T = gram_T + state["Q"][blk.f12] @ gram
            dense = hp.omega * (
                (state["b"] - hp.r)[:, None] * oQ[None, :] + bQ[None, :] + gram_T
            )
            fg = fused_grad("blk_v_", dense)
            if fg is not None:
                return fg
            if self.blk_v_on and (rows_pre is not None
                                  or not with_diag_pos):
                wq_blk = ((1.0 - hp.omega) * d["blk_v_w"]
                          if with_diag_pos else None)
                if meta.blocked_shards > 1:
                    res = self._scatter_blocked_sharded(
                        False, None, rows_pre, wq_blk=wq_blk, c_blk=c_blk,
                        kt=kt and rows_pre is not None)
                    zpos, posq = res if with_diag_pos else (res, None)
                elif kt and rows_pre is not None:
                    zpos, posq = kt_scatter("blk_v_", meta.n,
                                            meta.blocked_bm_v)
                else:
                    res = pos_scatter_blocked(
                        c, P1, d["blk_v_take"], d["blk_v_src"],
                        d["blk_v_own"], meta.n, meta.blocked_bm_v,
                        diag_w_blk=wq_blk, rows=rows_pre, coeff_blk=c_blk)
                    zpos, posq = res if with_diag_pos else (res, None)
                zpos, posq = hd_rowspace(zpos, posq, meta.n, "blk_v_hd_")
            elif with_diag_pos:
                assert c is not None, "slot carry requires the blocked path"
                wq = (1.0 - hp.omega) * d["pos_w"]
                zpos, posq = pos_scatter_pair(
                    c, wq, P1, d["pos_u"], d["pos_v"], meta.n)
            else:
                assert c is not None, "slot carry requires the blocked path"
                zpos = pos_scatter(c, P1, d["pos_u"], d["pos_v"], meta.n)
        Z = dense + zpos
        G = hp.lam * reg[:, None] * T + self._scat(b, first, Z, T.shape[0])
        if with_diag_pos:
            return G, posq
        return G

    # -- Hessian-vector products ---------------------------------------------

    def _kt_solve_ok(self, b: BlockInfo, first: bool) -> bool:
        """True when this solve's stream passes run the k-major kernels
        (decided per side at init — kt_u/kt_v)."""
        return self.kt_u if first else self.kt_v

    def _fused_tbl_side(self, b: BlockInfo, first: bool, dim: int,
                        kind: str = "hv_cross", kt: bool = False):
        """(x_idx_t, x_val_t, block_rows) when the fused table-space kernel
        applies to this solve's table side, else None: non-identity field,
        D within the cap (the transposed arrays exist only then —
        make_device_data), rows block-aligned (the side's blocked layout
        exists), single-shard, Mosaic-supported dtype, enough streamed rows
        for the kernel to win (auto mode), and the per-grid-step VMEM
        estimate under the scoped limit.  ``kind`` names the kernel whose
        footprint to estimate: hv_self | grad_self | hv_cross | grad_cross.
        """
        meta = self.meta
        if not self.fused_tbl:
            return None
        if self.mesh is not None and not (
                meta.blocked_shards > 1 and self.blk_yt):
            # under a mesh the fused kernels run only inside the sharded
            # carry mode (shard_map-local, table outputs psum'd)
            return None
        if kind not in self.fused_kinds:
            return None
        ident, rows, _ = self._side_ident(b, first)
        if ident or dim > self.fused_tbl_d:
            return None
        if not self.fused_interpret and meta.dtype not in (
                jnp.float32, jnp.bfloat16):
            return None
        if not self.fused_forced and rows < self.fused_min_rows:
            return None
        fg = b.f1 if first else b.f2
        fl = b.fi if first else b.fj
        u_side = fg < meta.layout.fu
        bm = (meta.blocked_bm_u if u_side else meta.blocked_bm_v)
        if not bm or rows % bm:
            return None
        xts = self.data.get("xt_u" if u_side else "xt_v")
        if not xts or xts[fl] is None:
            return None
        # per-grid-step VMEM estimate (bytes): xoh + table/out blocks always;
        # the (BM, MAXC) one-hot for stream-consuming kernels; the
        # double-buffered (MAXC, k) rows block + the phig intermediate for
        # the cross forms; 1MB slack for the small streamed blocks
        isz = jnp.dtype(meta.dtype).itemsize
        dk = -(-dim // 16) * 16
        lanes = -(-meta.hp.k // 128) * 128
        est = dk * bm * isz + dk * lanes * (isz + 4) + (1 << 20)
        if kind.startswith("grad"):
            est += dk * lanes * 4 + dk * bm * isz  # outq + xoh_sq
        if kind != "hv_self":
            maxc = self.data["blk_u_own" if u_side else "blk_v_own"].shape[1]
            est += bm * maxc * isz  # the (BM, MAXC) one-hot
            if kind.endswith("cross"):
                # rows block x2 + phig; the k-major stream carries no lane
                # padding (k sublanes x MAXC lanes)
                est += 3 * maxc * (max(8, meta.hp.k) if kt
                                   else lanes) * isz
        if est > self.fused_vmem:
            return None
        return xts[fl][0], xts[fl][1], bm

    def _hv_self(self, state, b: BlockInfo, first: bool):
        """Hv closure for a self-block table (hs_side, ffm.cpp:594-628):
        d_i = (1-w)|pos_i| + w*n;  Hv = lam reg V + X1^T diag(d <Q1,Phi>) Q1.
        """
        meta, d = self.meta, self.data
        hp = meta.hp
        i1, v1, reg, rows = self._side_arrays(b, first)
        Q1 = state["Q"][b.f12] if first else state["P"][b.f12]
        if b.kind == "uu":
            dd = (1.0 - hp.omega) * d["cnt_u"] + hp.omega * meta.n_true
        else:
            dd = (1.0 - hp.omega) * d["cnt_v"] + hp.omega * meta.m_true
        dim = (state["params"][b.f12]["W" if first else "H"]).shape[0]

        fused = self._fused_tbl_side(b, first, dim, "hv_self")
        if fused is not None:
            xi, xv, bm = fused
            sharded = meta.blocked_shards > 1
            # side-consistent kt gate (see _grad_self): never route a
            # forced-interpret config to compiled kt Mosaic kernels
            if self.kt_u if b.kind == "uu" else self.kt_v:
                dd_row = dd[None, :].astype(self.meta.dtype)

                def hv_fused_kt(V: Array) -> Array:
                    if sharded:
                        G = self._shard_local(
                            lambda xi_l, xv_l, q1_l, dd_l, Vr:
                            hv_self_tbl_kt_pallas(
                                Vr, xi_l, xv_l, q1_l, dd_l, bm,
                                interpret=self.kt_interpret),
                            [(xi, "xt"), (xv, "xt"), (Q1, "m2"),
                             (dd_row, "xt"), (V, "r")],
                            "r", psum=True)
                    else:
                        G = hv_self_tbl_kt_pallas(
                            V, xi, xv, Q1, dd_row, bm,
                            interpret=self.kt_interpret)
                    return hp.lam * reg[:, None] * V + G.astype(V.dtype)

                return hv_fused_kt
            dd2 = dd[:, None].astype(self.meta.dtype)

            def hv_fused(V: Array) -> Array:
                if sharded:
                    G = self._shard_local(
                        lambda xi_l, xv_l, q1_l, dd_l, Vr:
                        hv_self_tbl_pallas(
                            Vr, xi_l, xv_l, q1_l, dd_l, bm,
                            interpret=self.fused_interpret),
                        [(xi, "xt"), (xv, "xt"), (Q1, "m2"),
                         (dd2, "m2"), (V, "r")],
                        "r", psum=True)
                else:
                    G = hv_self_tbl_pallas(V, xi, xv, Q1, dd2, bm,
                                           interpret=self.fused_interpret)
                return hp.lam * reg[:, None] * V + G.astype(V.dtype)

            return hv_fused

        def hv(V: Array) -> Array:
            phi = self._proj(b, first, V)
            s = dd * jnp.sum(Q1 * phi, axis=1)
            return hp.lam * reg[:, None] * V + self._scat(
                b, first, s[:, None] * Q1, dim
            )

        return hv

    def _hv_cross(self, state, b: BlockInfo, first: bool, rows_pre=None,
                  kt: bool = False, rows_hd=None):
        """Hv closure for a cross-block table (hs_cross, ffm.cpp:706-742):
        omega part via precomputed Q1^T Q1 (ffm.cpp:767-771); (1-w) part per
        positive."""
        meta, d = self.meta, self.data
        hp = meta.hp
        i1, v1, reg, rows = self._side_arrays(b, first)
        if first:
            Q1 = state["Q"][b.f12]
            own, other = d["pos_u"], d["pos_v"]
            num = meta.m
        else:
            Q1 = state["P"][b.f12]
            own, other = d["pos_v"], d["pos_u"]
            num = meta.n
        QTQ = Q1.T @ Q1  # pad rows are zero; full Gram == true-row Gram
        dim = (state["params"][b.f12]["W" if first else "H"]).shape[0]
        w_pos = d["pos_w"]

        blk_bm = (meta.blocked_bm_u if first else meta.blocked_bm_v) if (
            self.blk_u_on if first else self.blk_v_on) else 0
        if blk_bm:
            # blocked layout: pos_dot + pos_scatter fused into one
            # B-row gather + two one-hot MXU matmuls per row block.  The
            # omega term phi @ (omega QTQ) is fused into the same pass
            # (dense_mat), and the static weights come pre-permuted
            # (blk_*_w) so no per-iteration random access remains; with the
            # pre-gathered stream the whole pass is sequential streaming —
            # the Mosaic kernel form (pallas_hv) then writes each output
            # block in place with double-buffered DMA.
            pre = "blk_u_" if first else "blk_v_"
            w_hv = (1.0 - hp.omega) * w_pos
            w_blk = d.get(pre + "w")
            w_scale = 1.0 - hp.omega
            dmat = (hp.omega * QTQ).astype(meta.dtype)
            use_pallas = ((self.pallas_hv_u if first else self.pallas_hv_v)
                          and rows_pre is not None and w_blk is not None)

            sharded = meta.blocked_shards > 1

            fused = (self._fused_tbl_side(b, first, dim, "hv_cross", kt)
                     if rows_pre is not None and w_blk is not None else None)
            if fused is not None:
                xi, xv, bm = fused
                kern = pos_hv_tbl_kt_pallas if kt else pos_hv_tbl_pallas
                interp = self.kt_interpret if kt else self.fused_interpret

                def hv_tbl(V: Array) -> Array:
                    if sharded:
                        G = self._shard_local(
                            lambda xi_l, xv_l, rows_l, own_l, w_l, dm, Vr:
                            kern(Vr, xi_l, xv_l, rows_l, own_l, w_l, dm,
                                 bm, w_scale=w_scale, interpret=interp),
                            [(xi, "xt"), (xv, "xt"), (rows_pre, "m3"),
                             (d[pre + "own"], "m2"), (w_blk, "m2"),
                             (dmat, "r"), (V, "r")],
                            "r", psum=True)
                    else:
                        G = kern(
                            V, xi, xv, rows_pre, d[pre + "own"], w_blk,
                            dmat, bm, w_scale=w_scale, interpret=interp)
                    if rows_hd is not None:
                        # head tier in TABLE space: project the head rows
                        # only, positive chunk sums, X_head^T back — the
                        # dense omega term already covers head rows via
                        # the kernel's own pass
                        xh_i, xh_v = self._side_xh(b, first)
                        loc = d[pre + "hd_loc"]
                        phi_hd = head_project(V, xh_i, xh_v)  # (NH, k)
                        cq = head_pq(phi_hd[loc], rows_hd) * (
                            d[pre + "hd_w"]
                            * jnp.asarray(w_scale, meta.dtype))
                        z_c = head_chunk_sums(cq, rows_hd)
                        z_hd = jnp.zeros_like(phi_hd).at[loc].add(z_c)
                        G = G + head_tbl_scatter(z_hd, xh_i, xh_v, dim)
                    return hp.lam * reg[:, None] * V + G.astype(V.dtype)

                return hv_tbl

            if kt and rows_pre is not None and w_blk is not None:
                # k-major plain pass (identity / large-D table sides)

                def hv_kt(V: Array) -> Array:
                    phi = self._proj(b, first, V)
                    if sharded:
                        zp = self._hv_blocked_sharded(
                            first, phi, rows_pre, dmat, w_scale, kt=True)
                    else:
                        zp = pos_hv_kt_pallas(
                            phi, rows_pre, d[pre + "own"], w_blk, dmat,
                            num, blk_bm, w_scale=w_scale,
                            interpret=self.kt_interpret)
                    if rows_hd is not None:
                        zp = zp + head_hv(
                            phi, rows_hd, d[pre + "hd_w"],
                            d[pre + "hd_row"], num, w_scale=w_scale)
                    return hp.lam * reg[:, None] * V + self._scat(
                        b, first, zp, dim)

                return hv_kt

            def hv_blocked(V: Array) -> Array:
                phi = self._proj(b, first, V)  # (rows, k)
                if sharded:
                    zp = self._hv_blocked_sharded(
                        first, phi, rows_pre, dmat, w_scale)
                elif use_pallas:
                    zp = pos_hv_blocked_pallas(
                        phi, rows_pre, d[pre + "own"], w_blk, dmat,
                        num, blk_bm, w_scale=w_scale)
                else:
                    zp = pos_hv_blocked(
                        phi, Q1, w_hv, d[pre + "take"], d[pre + "src"],
                        d[pre + "own"], num, blk_bm, rows=rows_pre,
                        w_blk=w_blk, w_scale=w_scale, dense_mat=dmat)
                if rows_hd is not None:
                    zp = zp + head_hv(
                        phi, rows_hd, d[pre + "hd_w"],
                        d[pre + "hd_row"], num, w_scale=w_scale)
                return hp.lam * reg[:, None] * V + self._scat(
                    b, first, zp, dim)

            return hv_blocked

        def hv(V: Array) -> Array:
            phi = self._proj(b, first, V)  # (rows, k)
            dense = hp.omega * (phi @ QTQ)
            # NOTE: measured 10x SLOWER when "fused" via ops.pos_hv — the
            # manual gather materialization defeats XLA's own fusion of the
            # gather into the segment reduction.  Keep the two-call form.
            pq = pos_dot(phi, own, Q1, other) * w_pos
            zp = pos_scatter((1.0 - hp.omega) * pq, Q1, other, own, num,
                             seg_sorted=first)
            return hp.lam * reg[:, None] * V + self._scat(b, first, dense + zp, dim)

        return hv

    # -- Jacobi preconditioner ------------------------------------------------

    def _scat_sq(self, b: BlockInfo, first: bool, Z: Array, dim: int) -> Array:
        """(X_side^2)^T @ Z — the squared-feature scatter the Hessian
        diagonal needs.  Identity fields: X^2 == X, reuse the slice path."""
        ident, _, _ = self._side_ident(b, first)
        if ident and dim <= Z.shape[0]:
            return self._scat(b, first, Z, dim)
        i1, v1, _, _ = self._side_arrays(b, first)
        return scatter(i1, v1 * v1, Z, dim)

    def _diag_H(self, state, b: BlockInfo, first: bool, posq=None):
        """Exact diagonal of the block-table Hessian (oracle: diag_hessian):

          cross:  D[d,l] = lam reg[d] + sum_ij Wq_ij X1[i,d]^2 Q1[j,l]^2
                         = lam reg + X1s^T [ w diag(Q1^T Q1)
                                             + (1-w) pos-scatter of Q1^2 ]
          self :  D[d,l] = lam reg[d] + X1s^T (dd_i Q1[i,l]^2)

        ``posq``: the cross positive term precomputed by the gradient's
        fused pass (_grad_cross with_diag_pos) — the diag then costs no COO
        pass of its own, which is what makes the preconditioner pay for
        itself at every dtype."""
        meta, d = self.meta, self.data
        hp = meta.hp
        if self.cg_precond != "jacobi":
            return None
        i1, v1, reg, rows = self._side_arrays(b, first)
        if isinstance(posq, tuple) and posq[0] == "tbl":
            # the fused table-space gradient already produced the complete
            # scatter term (grad_*_tbl_pallas) — no pass of its own
            D = hp.lam * reg[:, None] + posq[1]
            return jnp.maximum(D, jnp.asarray(1e-12, D.dtype))
        Q1 = state["Q"][b.f12] if first else state["P"][b.f12]
        dim = (state["params"][b.f12]["W" if first else "H"]).shape[0]
        if b.kind == "uv":
            own = d["pos_u"] if first else d["pos_v"]
            other = d["pos_v"] if first else d["pos_u"]
            num = meta.m if first else meta.n
            qtq_d = jnp.sum(Q1 * Q1, axis=0)  # pad rows are zero
            if posq is None:
                posq = pos_scatter(
                    (1.0 - hp.omega) * d["pos_w"], Q1 * Q1, other, own, num,
                    seg_sorted=first,
                )
            rowq = hp.omega * qtq_d[None, :] + posq
        else:
            if b.kind == "uu":
                dd = (1.0 - hp.omega) * d["cnt_u"] + hp.omega * meta.n_true
            else:
                dd = (1.0 - hp.omega) * d["cnt_v"] + hp.omega * meta.m_true
            rowq = dd[:, None] * (Q1 * Q1)
        D = hp.lam * reg[:, None] + self._scat_sq(b, first, rowq, dim)
        # pad table rows have D == 0 and R == 0; clamp so R/D stays 0 not NaN
        return jnp.maximum(D, jnp.asarray(1e-12, D.dtype))

    # -- conjugate gradient ---------------------------------------------------

    def _cg(self, hv, G: Array, D: Array | None = None) -> Array:
        """Newton-step CG (cg, ffm.cpp:744-813): S = argmin quadratic; stop
        when ||r||^2 <= cg_eps ||g||^2 or after cg_max_iter iterations.

        With ``D``: Jacobi-preconditioned CG on the same system with the
        same TRUE-residual stop rule — only the search directions change
        (measured ~1.6x fewer iterations, and capped solves land closer to
        the exact Newton step).  Mirrored exactly by the fp64 oracle.

        Mixed precision: the CG recurrence (S/R/V vectors, alpha/beta/r2
        scalars) runs at an f32 floor even under bf16 storage — bf16's
        8-bit mantissa stalls the residual recurrence so solves burn to the
        iteration cap instead of converging.  Only the Hv evaluation (the
        bandwidth-bound positive passes) stays in storage dtype.  No-op for
        f32/f64 problems."""
        hp = self.meta.hp
        # Hv evaluation runs at STORAGE dtype (the bandwidth-bound stream
        # passes); the recurrence — and since round 5 the returned step S —
        # stay at the f32 floor.  G may arrive f32-assembled (fused paths)
        # or at storage dtype (plain paths); the ct floor covers both.
        storage = self.meta.dtype
        ct = jnp.promote_types(G.dtype, jnp.float32)  # f32 floor, keeps f64
        # minor-dim packing of the recurrence vectors (OCFFM_CG_PACK,
        # default auto = tables with >= 2^20 rows): a (D, k<128) f32 array
        # physically lane-pads to 128 — the 2M x 200k config's S/R/V set
        # is 5.1 GB physical for 1.3 GB logical, and that padding is what
        # starves the kt streams out of HBM there.  Packing p = 128/k rows
        # per 128-lane row is exact up to XLA reduction order in the
        # alpha/beta sums (the recurrence itself is elementwise); the hv
        # evaluation still sees the logical (D, k) shape.
        import os as _os
        pmode = _os.environ.get("OCFFM_CG_PACK", "auto").lower()
        dpad, kk = G.shape
        p = 128 // kk if kk < 128 and 128 % kk == 0 and dpad % (
            128 // kk) == 0 else 1
        if pmode in ("0", "off", "false") or (
                pmode == "auto" and dpad < (1 << 20)):
            p = 1

        def pk(a):
            return a.reshape(dpad // p, p * kk) if p > 1 else a

        def upk(a):
            return a.reshape(dpad, kk) if p > 1 else a

        Gc = pk(G.astype(ct))
        Dc = None if D is None else pk(D.astype(ct))
        g2 = jnp.sum(Gc * Gc)

        def cond(carry):
            S, R, V, r2, rz, it = carry
            return jnp.logical_and(r2 > hp.cg_eps * g2, it < hp.cg_max_iter)

        def body(carry):
            S, R, V, r2, rz, it = carry
            Hv = pk(hv(upk(V).astype(storage)).astype(ct))
            den = jnp.sum(V * Hv)
            # degenerate-denominator guard: on a (near-)converged block the
            # f32 recurrence can underflow V.Hv to exactly 0 (mathematically
            # it is >= lam * reg * |V|^2 > 0; the f64 reference never sees
            # this) — an unguarded rz/0 step writes inf/nan into the table
            # and poisons ploss forever after (found by the sweep-tier
            # parity run: 7/10 seeds NaN at k=16, lam=4, omega=2^-11, f32).
            # Take no step and force the stop condition instead.
            ok = den > 0
            alpha = jnp.where(ok, rz / jnp.where(ok, den, 1.0), 0.0)
            S = S + alpha * V
            R = R - alpha * Hv
            r2_new = jnp.where(ok, jnp.sum(R * R), 0.0)
            rz_safe = jnp.where(rz > 0, rz, 1.0)
            if Dc is None:
                rz_new = r2_new
                V = R + (rz_new / rz_safe) * V
            else:
                Z = R / Dc
                rz_new = jnp.sum(R * Z)
                V = Z + (rz_new / rz_safe) * V
            return S, R, V, r2_new, rz_new, it + 1

        S0 = jnp.zeros_like(Gc)
        V0 = -Gc if Dc is None else -Gc / Dc
        rz0 = g2 if Dc is None else jnp.sum(Gc * (Gc / Dc))
        init = (S0, -Gc, V0, g2, rz0, jnp.asarray(0, jnp.int32))
        S, _, _, _, _, it = jax.lax.while_loop(cond, body, init)
        # S returns at the f32 floor: the caller applies it to the table in
        # ONE rounding ((T + S).astype(storage)) instead of rounding S and
        # the sum separately (round 5 — the bf16 divergence incident)
        return upk(S), it

    # -- block updates (incremental cache refresh) ----------------------------

    def _apply_step(self, state, b: BlockInfo, first: bool, S: Array,
                    rows_pre=None, kt: bool = False, rows_hd=None):
        """Apply the Newton step and refresh P/Q, a/b, yt functionally
        (update_side ffm.cpp:405-437, update_cross ffm.cpp:439-465).

        ``rows_pre``: the solve's pre-gathered B-row stream
        (gather_blocked_rows).  B (= the OTHER side's cache) is untouched by
        this step — only the own-side table/cache move — so the gap pass can
        reuse it and run fully blocked (ops.pos_gap_blocked)."""
        d = self.data
        f12 = b.f12
        key = "W" if first else "H"
        i1, v1, _, _ = self._side_arrays(b, first)
        state = dict(state)
        params = dict(state["params"])
        blk_params = dict(params[f12])
        # S arrives at the CG f32 floor: sum in f32, round ONCE into the
        # stored table (no-op at f32/f64)
        blk_params[key] = (blk_params[key] + S).astype(self.meta.dtype)
        params[f12] = blk_params
        state["params"] = params

        # cache/residual increments run at storage dtype (the incremental
        # bookkeeping path; refresh_every bounds its drift)
        S = S.astype(self.meta.dtype)
        dP = self._proj(b, first, S)
        cache_key = "P" if first else "Q"
        caches = dict(state[cache_key])
        caches[f12] = caches[f12] + dP
        state[cache_key] = caches

        other = state["Q"][f12] if first else state["P"][f12]
        meta = self.meta
        sharded = meta.blocked_shards > 1
        if b.kind == "uu":
            da = jnp.sum(dP * other, axis=1)
            state["a"] = state["a"] + da
            if self.blk_yt:
                # own side: da expands per block (sequential); other side:
                # blk_v_take IS pos_u in v-slot order — one scalar gather
                # (under the mesh that gather crosses shards; GSPMD turns
                # it into the carry-propagation collective)
                exp = (self._expand_rows_sharded(True, da) if sharded
                       else expand_rows_blocked(
                           da, d["blk_u_own"], meta.blocked_bm_u))
                state["yt_u"] = state["yt_u"] + exp.reshape(
                    state["yt_u"].shape)
                state["yt_v"] = state["yt_v"] + da[d["blk_v_take"]] \
                    * d["blk_v_w"]
                # head tiers: da per slot is a broadcast on the own side
                # (chunk -> its row) and a scalar gather through hd_take
                # (= pos_u in head slot order) on the other side
                if self.hd_u:
                    state["yt_u_hd"] = state["yt_u_hd"] \
                        + da[d["blk_u_hd_row"]][:, None] * d["blk_u_hd_w"]
                if self.hd_v:
                    state["yt_v_hd"] = state["yt_v_hd"] \
                        + da[d["blk_v_hd_take"]] * d["blk_v_hd_w"]
            else:
                state["yt"] = state["yt"] + da[d["pos_u"]]
        elif b.kind == "vv":
            db = jnp.sum(dP * other, axis=1)
            state["b"] = state["b"] + db
            if self.blk_yt:
                exp = (self._expand_rows_sharded(False, db) if sharded
                       else expand_rows_blocked(
                           db, d["blk_v_own"], meta.blocked_bm_v))
                state["yt_v"] = state["yt_v"] + exp.reshape(
                    state["yt_v"].shape)
                state["yt_u"] = state["yt_u"] + db[d["blk_u_take"]] \
                    * d["blk_u_w"]
                if self.hd_v:
                    state["yt_v_hd"] = state["yt_v_hd"] \
                        + db[d["blk_v_hd_row"]][:, None] * d["blk_v_hd_w"]
                if self.hd_u:
                    state["yt_u_hd"] = state["yt_u_hd"] \
                        + db[d["blk_u_hd_take"]] * d["blk_u_hd_w"]
            else:
                state["yt"] = state["yt"] + db[d["pos_v"]]
        else:
            if self.blk_yt:
                # gap lands directly in the solving side's slot order (no
                # inverse permute); the other side's carry takes it through
                # the static cross-order map — the only scalar gather left
                pre = "blk_u_" if first else "blk_v_"
                bm = meta.blocked_bm_u if first else meta.blocked_bm_v
                if sharded:
                    gap_flat = self._gap_blocked_sharded(
                        first, dP, rows_pre, kt=kt)
                elif kt:
                    gap_flat = pos_gap_kt_pallas(
                        dP, rows_pre, d[pre + "own"], bm,
                        interpret=self.kt_interpret)
                else:
                    gap_flat = pos_gap_blocked(dP, rows_pre, d[pre + "own"],
                                               None, bm)
                gap_hd = None
                if rows_hd is not None:
                    # head gap in head slot order; the cross-order maps
                    # index the CONCATENATED (tail, head) flat space
                    gap_hd = head_pq(dP[d[pre + "hd_row"]], rows_hd)
                gap_cat = (jnp.concatenate([gap_flat, gap_hd.reshape(-1)])
                           if gap_hd is not None else gap_flat)
                if first:
                    state["yt_u"] = state["yt_u"] + gap_flat.reshape(
                        state["yt_u"].shape) * d["blk_u_w"]
                    if gap_hd is not None:
                        state["yt_u_hd"] = state["yt_u_hd"] \
                            + gap_hd * d["blk_u_hd_w"]
                    state["yt_v"] = state["yt_v"] \
                        + gap_cat[d["blk_v_from_u"]] * d["blk_v_w"]
                    if self.hd_v:
                        state["yt_v_hd"] = state["yt_v_hd"] \
                            + gap_cat[d["blk_v_hd_from_u"]] \
                            * d["blk_v_hd_w"]
                else:
                    state["yt_v"] = state["yt_v"] + gap_flat.reshape(
                        state["yt_v"].shape) * d["blk_v_w"]
                    if gap_hd is not None:
                        state["yt_v_hd"] = state["yt_v_hd"] \
                            + gap_hd * d["blk_v_hd_w"]
                    state["yt_u"] = state["yt_u"] \
                        + gap_cat[d["blk_u_from_v"]] * d["blk_u_w"]
                    if self.hd_u:
                        state["yt_u_hd"] = state["yt_u_hd"] \
                            + gap_cat[d["blk_u_hd_from_v"]] \
                            * d["blk_u_hd_w"]
                return state
            if rows_pre is not None and self.blk_gap:
                pre = "blk_u_" if first else "blk_v_"
                bm = meta.blocked_bm_u if first else meta.blocked_bm_v
                if kt:
                    flatg = pos_gap_kt_pallas(
                        dP, rows_pre, d[pre + "own"], bm,
                        interpret=self.kt_interpret)
                else:
                    flatg = pos_gap_blocked(dP, rows_pre, d[pre + "own"],
                                            None, bm)
                if rows_hd is not None:
                    # inv maps two-tier sides into the concatenated space
                    flatg = jnp.concatenate([
                        flatg,
                        head_pq(dP[d[pre + "hd_row"]],
                                rows_hd).reshape(-1)])
                gap = flatg[d[pre + "inv"]]
            else:
                own_ids = d["pos_u"] if first else d["pos_v"]
                oth_ids = d["pos_v"] if first else d["pos_u"]
                gap = pos_dot(dP, own_ids, other, oth_ids)
            state["yt"] = state["yt"] + gap * d["pos_w"]
        return state

    # -- per-block solve ------------------------------------------------------

    def _solve_half(self, state, b: BlockInfo, first: bool, sa, sb):
        jac = self.cg_precond == "jacobi"
        posq = None
        kt = False
        rows_hd = None
        if b.kind == "uv":
            # B (= Q1) is constant for the whole solve: pre-gather its
            # blocked stream once; the gradient and every CG iteration then
            # stream it sequentially instead of re-gathering randomly.
            rows_pre = None
            kt = self._kt_solve_ok(b, first)
            if self._hd_side(first):
                # the head tier's k-major stream is always pre-gathered
                # (its slot budget is bounded by the layout's cost guard)
                B1h = state["Q"][b.f12] if first else state["P"][b.f12]
                rows_hd = gather_blocked_rows_t(
                    B1h, self.data["blk_u_hd_take" if first
                                   else "blk_v_hd_take"])
            pregather = self.pregather_u if first else self.pregather_v
            if not pregather:
                # the fused table kernels consume the pre-gathered stream,
                # and the pair wins even where pregather alone loses
                # (headline: 459.1k fused+pregather vs 365.2k without vs
                # 336.8k pregather-alone era) — force it per solve, but
                # never past the materialization HBM cap (a 2M x 200k run
                # OOM'd the chip on a ~3GB forced stream; the k-major
                # stream is 4x smaller at k=32)
                import os as _os2
                side_env2 = _os2.environ.get(
                    "OCFFM_BLK_PREGATHER_SIDE", "").lower()
                dim_t = state["params"][b.f12]["W" if first else "H"].shape[0]
                take_key = "blk_u_take" if first else "blk_v_take"
                if (side_env2 not in ("u", "v")
                        or take_key.startswith(f"blk_{side_env2}_")) and (
                        self._fused_tbl_side(b, first, dim_t, "hv_cross", kt)
                        is not None and take_key in self.data):
                    nb, maxc = self.data[take_key].shape
                    if kt:
                        nbytes = _kt_stream_bytes(
                            nb, maxc, self.meta.hp.k, self.meta.dtype)
                    else:
                        lanes = -(-self.meta.hp.k // 128) * 128
                        nbytes = (nb * maxc * lanes
                                  * jnp.dtype(self.meta.dtype).itemsize)
                    hd_key = take_key.replace("take", "hd_take")
                    if hd_key in self.data:
                        nch, chunk = self.data[hd_key].shape
                        nbytes += _kt_stream_bytes(
                            nch, chunk, self.meta.hp.k, self.meta.dtype)
                    pregather = nbytes <= self.pregather_cap
            if pregather:
                d = self.data
                B1 = state["Q"][b.f12] if first else state["P"][b.f12]
                take = d["blk_u_take"] if first else d["blk_v_take"]
                rows_pre = (gather_blocked_rows_t(B1, take) if kt
                            else gather_blocked_rows(B1, take))
                if self.meta.blocked_shards > 1:
                    # the main collective of a sharded blocked solve: B is
                    # row-sharded, so this gather all-gathers it once per
                    # solve; pin the result to the block sharding the
                    # shard_map passes expect
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    rows_pre = jax.lax.with_sharding_constraint(
                        rows_pre,
                        NamedSharding(self.mesh, P(self.data_axis,
                                                   None, None)))
            if jac:
                G, posq = self._grad_cross(state, b, first,
                                           with_diag_pos=True,
                                           rows_pre=rows_pre, kt=kt,
                                           rows_hd=rows_hd)
            else:
                G = self._grad_cross(state, b, first, rows_pre=rows_pre,
                                     kt=kt, rows_hd=rows_hd)
            hv = self._hv_cross(state, b, first, rows_pre=rows_pre, kt=kt,
                                rows_hd=rows_hd)
        else:
            rows_pre = None
            if jac:
                # the fused table path returns the diag's scatter term from
                # the gradient's own pass; None falls back to _diag_H's
                G, posq = self._grad_self(state, b, first, sa, sb,
                                          want_diag=True)
            else:
                G = self._grad_self(state, b, first, sa, sb)
            hv = self._hv_self(state, b, first)
        S, it = self._cg(hv, G, self._diag_H(state, b, first, posq))
        return self._apply_step(state, b, first, S, rows_pre=rows_pre,
                                kt=kt, rows_hd=rows_hd), it

    # -- epoch ----------------------------------------------------------------

    def _epoch_impl(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """One alternating sweep in reference order (one_epoch,
        ffm.cpp:852-870): user self blocks, item self blocks, cross blocks;
        within each block the f1 table then the f2 table (ffm.cpp:815-850).

        sa/sb are refreshed once per epoch (the reference refreshes at epoch
        end, ffm.cpp:869 — refreshing at epoch start is identical since only
        self-block gradients read them and cross updates happen after)."""
        sa, sb = self._cache_sasb(state["P"], state["Q"])
        iters = []
        for b in self.meta.layout.epoch_order():
            state, it1 = self._solve_half(state, b, True, sa, sb)
            state, it2 = self._solve_half(state, b, False, sa, sb)
            iters.extend((it1, it2))
        return state, jnp.stack(iters)

    def _epoch_entry(self, state: Dict[str, Any], data: Dict[str, Any]):
        """Jit entry point: the problem arrays are runtime arguments (not
        baked constants) so their shardings drive GSPMD partitioning and the
        executable stays small."""
        prev = self.data
        self.data = data
        try:
            return self._epoch_impl(state)
        finally:
            self.data = prev

    def epoch(self, state: Dict[str, Any]) -> Dict[str, Any]:
        return self._epoch(state, self.data)[0]

    def epoch_stats(self, state):
        """(new_state, per-solve CG iteration counts) — one extra compiled
        program; the counts vector follows epoch_order() with the f1 then f2
        half of each block adjacent.  Diagnostics only (profiling, A/Bs)."""
        return self._epoch(state, self.data)

    # -- diagnostics ----------------------------------------------------------

    def objective(self, state: Dict[str, Any]) -> Array:
        return self._objective(state, self.data)

    def _objective_entry(self, state, data):
        prev = self.data
        self.data = data
        try:
            return self._objective_impl(state)
        finally:
            self.data = prev

    def _objective_impl(self, state: Dict[str, Any]) -> Array:
        """Exact loss via the rank-k decomposition (matches the reference's
        brute-force func(), ffm.cpp:1321-1351, without materializing m x n).

        sum_all w (yhat - r)^2 = w [ sum_ij (a_i + b_j + cross_ij - r)^2 ]
        expanded with Gram matrices; positives corrected via yt.
        """
        meta, d = self.meta, self.data
        hp = meta.hp
        P, Q, a, b_vec = state["P"], state["Q"], state["a"], state["b"]
        # slot-order carry: reconstruct the stream residual (pad-masked —
        # exact here, every yt term below is multiplied by w anyway)
        yt = state["yt"] if "yt" in state else self.yt_stream(state)
        m, n = meta.m_true, meta.n_true
        at = a[:m]
        bt = b_vec[:n]
        cross_blocks = meta.layout.cross_blocks()
        # sum over all pairs of yhat_ij and yhat_ij^2, using
        # yhat = (a_i - r/2) + (b_j - r/2) + sum_c <P_ci, Q_cj>  shifted by r:
        # compute E1 = sum (yhat - r), E2 = sum (yhat - r)^2.
        alpha = at - hp.r  # fold r into the user side
        sumP = {c.f12: jnp.sum(P[c.f12][:m], axis=0) for c in cross_blocks}
        sumQ = {c.f12: jnp.sum(Q[c.f12][:n], axis=0) for c in cross_blocks}
        # E2 = sum_i sum_j (alpha_i + b_j + s_ij)^2 where s_ij = sum_c <P,Q>
        #    = n sum alpha^2 + m sum b^2 + sum s^2 + 2 sum_i alpha_i sum_j b_j
        #      + 2 sum_ij (alpha_i + b_j) s_ij
        sum_alpha = jnp.sum(alpha)
        sum_b = jnp.sum(bt)
        e2 = n * jnp.sum(alpha**2) + m * jnp.sum(bt**2)
        e2 = e2 + 2.0 * sum_alpha * sum_b
        # sum_ij s_ij^2 = sum_{c,c'} <P_c^T P_c', Q_c^T Q_c'>: the (c, c')
        # block structure of the concatenated Grams covers every pair in two
        # (m, C*k) matmuls — one MXU call each instead of C^2 k x k grams
        # (and C*k hits the 128-lane tile exactly at C=4, k=32).
        Pcat = jnp.concatenate([P[c.f12][:m] for c in cross_blocks], axis=1)
        Qcat = jnp.concatenate([Q[c.f12][:n] for c in cross_blocks], axis=1)
        e2 = e2 + jnp.sum((Pcat.T @ Pcat) * (Qcat.T @ Qcat))
        # 2 sum_ij alpha_i s_ij + 2 sum_ij b_j s_ij
        for c in cross_blocks:
            e2 = e2 + 2.0 * (alpha @ (P[c.f12][:m] @ sumQ[c.f12]))
            e2 = e2 + 2.0 * (bt @ (Q[c.f12][:n] @ sumP[c.f12]))
        # positives: replace w (yhat - r)^2 by (yhat - 1)^2
        w = d["pos_w"]
        y_minus_r = yt + (1.0 - hp.r)
        loss = hp.omega * (e2 - jnp.sum(w * y_minus_r**2)) + jnp.sum(w * yt**2)
        for b in self.blocks:
            _, _, reg1, _ = self._side_arrays(b, True)
            _, _, reg2, _ = self._side_arrays(b, False)
            loss = loss + hp.lam * jnp.sum(
                reg1[:, None] * state["params"][b.f12]["W"] ** 2
            )
            loss = loss + hp.lam * jnp.sum(
                reg2[:, None] * state["params"][b.f12]["H"] ** 2
            )
        return 0.5 * loss
