"""Binary-descriptor (256-bit) Hamming matching as batched XOR+popcount.

TPU redesign of MILD's multi-index hashing matcher (ref:
3rdparty/MILD/sparse_match.cpp:228-290 `train_8`/`search_8`,
3rdparty/MILD/loop_closure_detector.cpp:134-145
`calculate_hamming_distance_256bit`). Hash buckets exist to prune candidates
on a scalar CPU; on TPU the exhaustive N x M distance table is one
vectorised XOR + `lax.population_count` pass — exact, and faster than any
pruning at the reference's scales (~1000 features/frame, a few thousand
keyframes).

Descriptors are uint32[8] words (256 bits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HAMMING_MAX = 256


def bit_signs(desc: jax.Array) -> jax.Array:
    """(..., 8) uint32 -> (..., 256) bf16 in {+1, -1} (bit=1 -> -1).

    Hamming distance between 256-bit strings is (256 - s_a . s_b) / 2 for
    their +-1 sign vectors: one bf16 matmul on the MXU replaces the
    XOR+popcount broadcast, which lowers to slow elementwise passes over a
    (N, M, 8) intermediate. EXACT: products are +-1 and the f32 accumulator
    holds integer sums up to 256.
    """
    k = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> k) & jnp.uint32(1)  # (..., 8, 32)
    return (1.0 - 2.0 * bits.astype(jnp.float32)).astype(jnp.bfloat16).reshape(
        desc.shape[:-1] + (256,)
    )


def hamming_table(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 hamming distances (MXU)."""
    sa = bit_signs(a)
    sb = bit_signs(b)
    dot = jax.lax.dot_general(
        sa, sb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def match_descriptors(
    desc_a: jax.Array,  # (N, 8) uint32
    valid_a: jax.Array,  # (N,) bool
    desc_b: jax.Array,  # (M, 8) uint32
    valid_b: jax.Array,  # (M,) bool
    max_distance: jax.Array | int = 64,
    ratio: jax.Array | float = 0.8,
) -> tuple[jax.Array, jax.Array]:
    """Best-match with Lowe 2-NN ratio test.

    Returns (match index into b (N,), match valid (N,)). max_distance
    default is in the spirit of the reference's hamming threshold
    (ref: sparse_match.cpp search_8 threshold 50; KnnMatch ratio filter
    ref: src/Odometry/SparseOdometryFunction.h:96-127).
    """
    d = hamming_table(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, HAMMING_MAX + 1)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    best, second = -neg2[:, 0], -neg2[:, 1]
    ok = (
        valid_a
        & (best <= max_distance)
        & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    )
    return idx2[:, 0], ok


@functools.partial(jax.jit, static_argnames=())
def match_descriptors_windowed(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    uv_pred_a: jax.Array,  # (N, 2) predicted pixel of a's points in b's image
    uv_b: jax.Array,  # (M, 2) keypoint pixels in b
    window: jax.Array | float = 20.0,
    max_distance: jax.Array | int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Pose-guided re-match within a spatial window.

    (ref: src/Odometry/SparseMatcher.cpp:25-50 `RefineMatches` projects
    source points by the current pose estimate and searches nearby
    keypoints; 3rdparty/MILD/sparse_match.cpp `search_8_with_range`.)
    """
    d = hamming_table(desc_a, desc_b)
    du = uv_pred_a[:, None, 0] - uv_b[None, :, 0]
    dv = uv_pred_a[:, None, 1] - uv_b[None, :, 1]
    in_win = (jnp.abs(du) <= window) & (jnp.abs(dv) <= window)
    d = jnp.where(in_win & valid_b[None, :], d, HAMMING_MAX + 1)
    best = jnp.argmin(d, axis=-1)
    bd = jnp.take_along_axis(d, best[:, None], axis=-1)[:, 0]
    ok = valid_a & (bd <= max_distance)
    return best, ok


def mutual_filter(idx_ab: jax.Array, ok_ab: jax.Array, idx_ba: jax.Array) -> jax.Array:
    """Keep matches where b's best match points back at a (cross-check)."""
    n = idx_ab.shape[0]
    back = idx_ba[idx_ab]
    return ok_ab & (back == jnp.arange(n))
