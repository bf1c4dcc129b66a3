"""Sparse gather/scatter ops: XLA baselines + Pallas TPU kernels.

The hot pair (reference UTx/UTX ffm.cpp:314-331 and the X^T z gradient
scatters in gd_*/hs_*):

  project: P[i] = sum_s val[i,s] * W[idx[i,s]]     (padded gather-FMA)
  scatter: G[d] = sum_{i,s: idx[i,s]=d} val[i,s] * Z[i]

Measured on a v5e chip (m=131k, p=4, k=32, D=4096, f32, in-jit loop):

  project  XLA take+einsum   86 us     Pallas one-hot matmul   53 us  (1.6x)
  scatter  XLA segment_sum 4978 us     Pallas one-hot matmul 7282 us  (slower)

The one-hot trick turns the random-access gather into MXU work: for each
row block, build OneHot(idx) (BM, D) on the fly and matmul against the
VMEM-resident table.  It wins only while D is small enough that (a) the
table fits VMEM and (b) the extra BM x D x k FLOPs stay under the gather's
memory cost — so the dispatcher uses it for side-feature fields (D up to a
few thousand) and falls back to XLA for id-scale fields.  The scatter
equivalent is MXU-bound on the transposed one-hot matmul and loses to
XLA's segment_sum, so scatter always uses XLA.

Direct vectorized int indexing (``w_ref[rows]``) does not lower on TPU
Mosaic ("Cannot do int indexing on TPU"), which is why the one-hot
formulation is used.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jax.Array

_BM = 256  # rows per grid step
_MAX_D_PALLAS = 8192  # one-hot cost and VMEM residency cap
_VMEM_BUDGET = 8 * 1024 * 1024  # bytes allowed for the table block


def project_xla(idx: Array, val: Array, W: Array) -> Array:
    """P = X W via take + einsum (XLA fuses the FMA into the gather)."""
    return jnp.einsum("mp,mpk->mk", val, W[idx])


def scatter_xla(idx: Array, val: Array, Z: Array, d: int) -> Array:
    """G = X^T Z via segment_sum (pads carry val == 0)."""
    k = Z.shape[-1]
    flat_idx = idx.reshape(-1)
    data = (val[..., None] * Z[:, None, :]).reshape(-1, k)
    return jax.ops.segment_sum(data, flat_idx, num_segments=d)


def _project_kernel(p: int, d: int, k: int, idx_ref, val_ref, w_ref, out_ref):
    acc = jnp.zeros((idx_ref.shape[0], k), jnp.float32)
    ar = jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], d), 1)
    for s in range(p):
        oh = (ar == idx_ref[:, s][:, None]).astype(jnp.float32)
        oh = oh * val_ref[:, s][:, None].astype(jnp.float32)
        acc = acc + jnp.dot(oh, w_ref[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def project_pallas(idx: Array, val: Array, W: Array) -> Array:
    """One-hot-matmul projection kernel (see module docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, p = idx.shape
    d, k = W.shape
    kern = functools.partial(_project_kernel, p, d, k)
    return pl.pallas_call(
        kern,
        grid=(m // _BM,),
        in_specs=[
            pl.BlockSpec((_BM, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k), val.dtype),
    )(idx, val, W)


def _pallas_enabled() -> bool:
    # Opt-in (OCFFM_PALLAS=1): the kernel wins 1.6x on its own, but adds
    # noticeable compile time to the epoch program; end-to-end benefit is a
    # few percent (projection is a minor slice of the epoch).  Default off
    # until the epoch-level win is demonstrated on local TPU hardware.
    return os.environ.get("OCFFM_PALLAS", "0").lower() in ("1", "on", "true")


def _pallas_ok(idx: Array, W: Array) -> bool:
    m, p = idx.shape
    d, k = W.shape
    return (
        m % _BM == 0
        and d <= _MAX_D_PALLAS
        and d * k * 4 <= _VMEM_BUDGET
        and W.dtype in (jnp.float32, jnp.bfloat16)
    )


def project(idx: Array, val: Array, W: Array) -> Array:
    """Dispatching projection: Pallas one-hot when profitable, else XLA."""
    if _pallas_enabled() and _pallas_ok(idx, W):
        return project_pallas(idx, val, W)
    return project_xla(idx, val, W)


def scatter(idx: Array, val: Array, Z: Array, d: int) -> Array:
    """Scatter always uses the XLA segment_sum path (measured faster)."""
    return scatter_xla(idx, val, Z, d)
