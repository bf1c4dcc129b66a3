"""Model parameters: one (W, H) table pair per active field-pair block.

Initialization matches the reference distribution U(-0.1/sqrt(k), 0.1/sqrt(k))
(reference ffm.cpp:71-78 — which used an *unseeded* libc rand(); here we use a
seeded JAX PRNG so runs are reproducible, and parity with the reference is
statistical, not bitwise).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .blocks import BlockLayout

# A ModelState is a pytree: {"W": {f12: (D1, k)}, "H": {f12: (D2, k)}}
ModelState = Dict[str, Dict[int, jax.Array]]


def init_state(
    key: jax.Array,
    layout: BlockLayout,
    k: int,
    dtype=jnp.float32,
) -> ModelState:
    blocks = layout.all_blocks()
    keys = jax.random.split(key, 2 * max(len(blocks), 1))
    scale = 0.1 / (k**0.5)
    W: Dict[int, jax.Array] = {}
    H: Dict[int, jax.Array] = {}
    for i, b in enumerate(blocks):
        W[b.f12] = jax.random.uniform(
            keys[2 * i], (b.d1, k), dtype=dtype, minval=-scale, maxval=scale
        )
        H[b.f12] = jax.random.uniform(
            keys[2 * i + 1], (b.d2, k), dtype=dtype, minval=-scale, maxval=scale
        )
    return {"W": W, "H": H}
