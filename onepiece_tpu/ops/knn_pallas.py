"""Fused 1-NN (distance + argmin) Pallas kernel for ICP correspondence.

SURVEY §2 kernel #2. The XLA path (`ops/knn.py`) materialises the (N, M)
squared-distance matrix in HBM — at ICP scale (20k x 20k) that is 1.6 GB
of write+read per iteration, and the measured 6.3 ms/iter sits right at
that traffic's roofline. This kernel never lets a distance tile leave
VMEM: the whole reference cloud (M x 3 coords, a few hundred KB) is
resident per grid step, query tiles stream through, and a running
(min, argmin) pair is carried across reference chunks — HBM traffic drops
to the clouds themselves plus (N, 1) outputs.

Coordinates are laid out (4, M) for the reference (components on
sublanes, points on lanes) and (TQ, 4) for queries, so the per-chunk
distance block (TQ, CM) is built from three broadcasted FMAs — no matmul
with a degenerate inner dimension (the MXU is useless at K=3).

The argmin uses the two-pass min trick (min of d2, then min of
index-where-equal) — pure lane reductions, no Mosaic argmin dependency.
(ref: the OpenMP KD-tree NN loops this replaces,
src/Registration/ICP.cpp:64,184 + src/Geometry/KDTree.h.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LARGE = 1e30
_TQ = 256  # query rows per grid step
_CM = 2048  # reference lanes per inner chunk


def _nn_kernel(q_ref, r_ref, idx_ref, d2_ref, *, m_pad: int):
    q = q_ref[...]  # (TQ, 4)
    n_chunks = m_pad // _CM

    def chunk(c, carry):
        best_d2, best_idx = carry  # (TQ, 1) f32, (TQ, 1) f32(index)
        r = r_ref[:, pl.dslice(c * _CM, _CM)]  # (4, CM)
        d2 = jnp.zeros((_TQ, _CM), jnp.float32)
        for comp in range(3):
            diff = q[:, comp : comp + 1] - r[comp : comp + 1, :]
            d2 = d2 + diff * diff
        cmin = jnp.min(d2, axis=1, keepdims=True)  # (TQ, 1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (_TQ, _CM), 1).astype(jnp.float32)
        carg = jnp.min(
            jnp.where(d2 <= cmin, ids, jnp.float32(m_pad)), axis=1, keepdims=True
        ) + jnp.float32(c * _CM)
        better = cmin < best_d2
        return (
            jnp.where(better, cmin, best_d2),
            jnp.where(better, carg, best_idx),
        )

    init = (
        jnp.full((_TQ, 1), LARGE, jnp.float32),
        jnp.zeros((_TQ, 1), jnp.float32),
    )
    best_d2, best_idx = jax.lax.fori_loop(0, n_chunks, chunk, init)
    d2_ref[...] = best_d2
    idx_ref[...] = best_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas(
    query: jax.Array,  # (N, 3)
    ref: jax.Array,  # (M, 3)
    ref_valid: jax.Array,  # (M,) bool
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact nearest neighbour: returns (idx (N,), sqdist (N,)).

    Invalid reference points never match (their coords are pushed to
    LARGE, same convention as ops/knn.py).
    """
    n, _ = query.shape
    m = ref.shape[0]
    n_pad = (-n) % _TQ
    m_pad_n = (-m) % _CM
    qp = jnp.pad(query.astype(jnp.float32), ((0, n_pad), (0, 1)))
    rbig = jnp.where(ref_valid[:, None], ref.astype(jnp.float32), LARGE)
    rp = jnp.pad(rbig, ((0, m_pad_n), (0, 1)), constant_values=LARGE).T  # (4, Mp)
    # padded ref coords are LARGE -> their distances overflow to +inf,
    # never winning the min against any real point
    n_t = qp.shape[0]
    m_t = rp.shape[1]

    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, m_pad=m_t),
        grid=(n_t // _TQ,),
        in_specs=[
            pl.BlockSpec((_TQ, 4), lambda i: (i, 0)),
            pl.BlockSpec((4, m_t), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_TQ, 1), lambda i: (i, 0)),
            pl.BlockSpec((_TQ, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_t, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_t, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, rp)
    return idx[:n, 0], d2[:n, 0]
