"""Loop-closure detection over binary descriptors (MILD-equivalent).

TPU redesign of MILD's multi-index-hashed loop-closure database
(ref: 3rdparty/MILD/loop_closure_detector.cpp:94-132 construct,
:149-229 insert_and_query, :232+ query; wrapper
src/LCDetection/MildLCDetector.cpp:7-44). MILD's 16x16-bit hash tables
exist to avoid exhaustive hamming distances on a scalar CPU; on TPU the
database is one padded uint32 tensor (K, F, 8) and a query is a single
XOR + population_count broadcast — exact (no hash-miss recall loss).

Scoring follows MILD's shape: per query feature, the best match distance in
each keyframe contributes a thresholded similarity vote; the per-keyframe
sum is then converted to a salient score by normalising against the running
mean/std of recent non-neighbour keyframes (ref:
3rdparty/MILD/BayesianFilter.hpp:40-100 `calculateSalientScore`). Candidate
selection keeps the reference's knobs: salient threshold 1.5, top
MAX_CANDIDATES=7, adjacent keyframes excluded
(ref: src/LCDetection/MildLCDetector.cpp:7-40).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SALIENT_THRESHOLD = 1.5  # ref: MildLCDetector.cpp threshold
MAX_CANDIDATES = 7  # ref: MildLCDetector.cpp top-k
HAMMING_VOTE_MAX = 64  # distance below which a feature votes


@functools.partial(jax.jit, static_argnames=())
def _similarity_scores(
    q_desc: jax.Array,  # (N, 8) uint32
    q_valid: jax.Array,  # (N,)
    db_desc: jax.Array,  # (K, F, 8) uint32
    db_valid: jax.Array,  # (K, F)
) -> jax.Array:
    """(K,) similarity of the query frame to each stored keyframe."""
    x = jnp.bitwise_xor(q_desc[:, None, None, :], db_desc[None, :, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)  # (N, K, F)
    d = jnp.where(db_valid[None, :, :], d, 257)
    dmin = jnp.min(d, axis=-1)  # (N, K) best distance per query feature
    votes = jnp.maximum(0.0, 1.0 - dmin.astype(jnp.float32) / HAMMING_VOTE_MAX)
    votes = jnp.where(q_valid[:, None], votes, 0.0)
    denom = jnp.clip(jnp.sum(q_valid), 1, None).astype(jnp.float32)
    return jnp.sum(votes, axis=0) / denom  # (K,)


class LoopClosureDetector:
    """Keyframe descriptor DB with salient-score candidate selection."""

    def __init__(self, feature_capacity: int = 512, initial_keyframes: int = 64):
        self.fcap = feature_capacity
        self.kcap = initial_keyframes
        self.db = jnp.zeros((self.kcap, feature_capacity, 8), jnp.uint32)
        self.db_valid = jnp.zeros((self.kcap, feature_capacity), bool)
        self.num_keyframes = 0

    def insert(self, desc: jax.Array, valid: jax.Array) -> int:
        """Add a keyframe's descriptors; returns its index.

        (ref: loop_closure_detector.cpp construct_database / Insert wrapper.)
        """
        if self.num_keyframes == self.kcap:
            self.kcap *= 2
            self.db = jnp.zeros((self.kcap,) + self.db.shape[1:], jnp.uint32).at[
                : self.num_keyframes
            ].set(self.db)
            self.db_valid = jnp.zeros((self.kcap, self.fcap), bool).at[
                : self.num_keyframes
            ].set(self.db_valid)
        n = min(desc.shape[0], self.fcap)
        row = jnp.zeros((self.fcap, 8), jnp.uint32).at[:n].set(desc[:n])
        rowv = jnp.zeros((self.fcap,), bool).at[:n].set(valid[:n])
        k = self.num_keyframes
        self.db = self.db.at[k].set(row)
        self.db_valid = self.db_valid.at[k].set(rowv)
        self.num_keyframes += 1
        return k

    def select_candidates(
        self,
        desc: jax.Array,
        valid: jax.Array,
        exclude_recent: int = 1,
    ) -> list[int]:
        """Keyframe indices that are likely loop closures for this frame.

        (ref: MildLCDetector.cpp:7-40 `SelectCandidates` — salient score
        computed against the non-adjacent history, threshold 1.5, top 7.)
        """
        k = self.num_keyframes
        if k <= exclude_recent:
            return []
        sims = np.asarray(
            _similarity_scores(desc, valid, self.db[:k], self.db_valid[:k])
        )
        history = sims[: k - exclude_recent]
        if len(history) < 2:
            return []
        mean = history.mean()
        std = history.std() + 1e-6
        salient = (history - mean) / std
        order = np.argsort(-salient)
        return [int(i) for i in order[:MAX_CANDIDATES] if salient[i] >= SALIENT_THRESHOLD]
