"""MILD-equivalent loop-closure detector: tf-idf scoring, salient score,
temporal Bayesian filter (ref: 3rdparty/MILD/loop_closure_detector.cpp,
BayesianFilter.hpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from onepiece_tpu.lcdetection.mild import (
    BayesianTemporalFilter,
    LoopClosureDetector,
    salient_scores,
)


def _rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def _noisy(rng, desc, bits=4):
    """Flip `bits` random bits in each 256-bit descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1 << b)
    return out


class TestTfIdf:
    def test_loop_detected_despite_repeated_structure(self):
        """A synthetic corridor: half of every keyframe's features are the
        SAME repeated structure. tf-idf must discount them so only the true
        revisit fires (precision), and it must fire (recall)."""
        rng = np.random.default_rng(0)
        n_kf, n_feat = 12, 64
        shared = _rand_desc(rng, n_feat // 2)  # repeated structure
        uniques = [_rand_desc(rng, n_feat // 2) for _ in range(n_kf)]
        lcd = LoopClosureDetector(feature_capacity=n_feat)
        for u in uniques:
            d = np.concatenate([shared, u])
            lcd.insert(jnp.asarray(d), jnp.ones(n_feat, bool))

        # query = revisit of keyframe 3 with descriptor noise
        q = _noisy(rng, np.concatenate([shared, uniques[3]]), bits=4)
        cands = lcd.select_candidates(jnp.asarray(q), jnp.ones(n_feat, bool))
        assert 3 in cands, f"true loop not detected: {cands}"
        assert all(c == 3 for c in cands), f"false candidates: {cands}"

        # query of fresh unique features + the repeated structure must NOT
        # fire anywhere: the shared half matches every keyframe (idf ~ 0)
        q2 = np.concatenate([shared, _rand_desc(rng, n_feat // 2)])
        cands2 = lcd.select_candidates(jnp.asarray(q2), jnp.ones(n_feat, bool))
        assert cands2 == [], f"repeated structure alone fired: {cands2}"

    def test_recent_keyframe_excluded(self):
        rng = np.random.default_rng(1)
        n_feat = 32
        lcd = LoopClosureDetector(feature_capacity=n_feat)
        descs = [_rand_desc(rng, n_feat) for _ in range(6)]
        for d in descs:
            lcd.insert(jnp.asarray(d), jnp.ones(n_feat, bool))
        # query nearly identical to the most recent keyframe
        q = _noisy(rng, descs[-1], bits=2)
        cands = lcd.select_candidates(jnp.asarray(q), jnp.ones(n_feat, bool))
        assert 5 not in cands


class TestSalient:
    def test_all_above_average_returns_3(self):
        s = salient_scores(np.array([1.0, 1.0, 1.0], np.float32))
        assert np.all(s == 3.0)

    def test_short_history_returns_1(self):
        s = salient_scores(np.array([1.0, 2.0, 0.5], np.float32))
        # trailing streak trimmed -> history of 2 (<3) -> all ones
        assert np.all(s == 1.0)

    def test_formula_matches_reference(self):
        # history_loop lands on index 5 (first below-average from the end),
        # which the reference EXCLUDES from the statistics; salient =
        # (s - std) / mean over sims[:5]
        sims = np.array([0.1, 0.12, 0.09, 0.11, 0.1, 0.08, 0.5], np.float32)
        s = salient_scores(sims)
        hist = sims[:5]
        mean = hist.mean()
        delta = np.linalg.norm(hist - hist.mean()) / np.sqrt(len(hist) - 1)
        np.testing.assert_allclose(s, (sims - delta) / mean, rtol=1e-5)
        assert s[6] > 1.5 > s.max(initial=-np.inf, where=np.arange(7) < 6)


class TestTemporalFilter:
    def test_sustained_evidence_raises_probability(self):
        """The 0.95/0.05 transition model makes the visit probability an
        accumulator: one strong frame cannot flag (likelihood is salience-
        normalised), sustained evidence converges past the threshold."""
        f = BayesianTemporalFilter()
        base = np.full(10, 1.0, np.float32)
        first = None
        probs = None
        for _ in range(12):
            s = base.copy()
            s[4] = 30.0  # strong repeated evidence at keyframe 4
            probs = f.update(np.concatenate([s, [1.0]]))
            if first is None:
                first = probs.copy()
        assert first[4] < f.probability_threshold  # no single-frame flag
        assert probs[4] > f.probability_threshold  # sustained -> flagged
        assert probs[0] < f.probability_threshold

    def test_isolated_detection_retro_erased(self):
        """A flag that fires once and is immediately unsupported (previous
        two steps unflagged, next step unflagged) is retro-erased
        (ref: BayesianFilter.hpp:139-166)."""
        f = BayesianTemporalFilter()
        base = np.full(10, 1.0, np.float32)
        s = base.copy()
        s[4] = 30.0
        for _ in range(40):  # ramp until the flag first fires
            f.update(np.concatenate([s, [1.0]]))
            if f.flags[-1][4]:
                break
        assert f.flags[-1][4] == 1 and f.flags[-2][4] == 0
        f.update(np.concatenate([base, [1.0]]))  # evidence vanishes
        # the isolated flag from the previous step must be erased
        assert f.flags[-2][4] == 0
