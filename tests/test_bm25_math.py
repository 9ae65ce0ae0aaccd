"""BM25 formula tests: closed-form hand computations per variant
(SURVEY.md §2.6) and the occurrence/nonoccurrence decomposition."""

import math

import numpy as np
import pytest

from bm25_benchmarks_ray.functions.bm25 import (
    BM25Params,
    METHODS,
    differential_shape,
    idf,
    nonoccurrence_shape,
    okapi_idf,
    query_constant,
    tf_shape,
)
from tests.oracle import build_oracle_index, oracle_scores


class TestIdf:
    N, DF = 100, 10

    def test_robertson(self):
        assert idf(BM25Params(method="robertson"), self.DF, self.N) == pytest.approx(
            math.log((100 - 10 + 0.5) / 10.5)
        )

    def test_atire(self):
        assert idf(BM25Params(method="atire"), self.DF, self.N) == pytest.approx(math.log(10.0))

    def test_lucene(self):
        assert idf(BM25Params(method="lucene"), self.DF, self.N) == pytest.approx(
            math.log(1 + 90.5 / 10.5)
        )

    def test_bm25l(self):
        assert idf(BM25Params(method="bm25l"), self.DF, self.N) == pytest.approx(
            math.log(101 / 10.5)
        )

    def test_bm25plus(self):
        assert idf(BM25Params(method="bm25+"), self.DF, self.N) == pytest.approx(
            math.log(101 / 10)
        )

    def test_robertson_negative_for_common_terms(self):
        assert idf(BM25Params(method="robertson"), 90, 100) < 0

    def test_okapi_epsilon_floor(self):
        dfs = np.array([90, 5])
        out = okapi_idf(dfs, 100, epsilon=0.0)
        assert out[0] == 0.0 and out[1] > 0


class TestTfShape:
    def test_lucene_hand_computed(self):
        p = BM25Params(method="lucene", k1=1.5, b=0.75)
        # tf=2, dl=10, avgdl=8: norm = .25 + .75*1.25 = 1.1875
        expect = 2 * 2.5 / (2 + 1.5 * 1.1875)
        assert tf_shape(p, np.array([2]), np.array([10]), 8.0)[0] == pytest.approx(expect)

    def test_bm25l_hand_computed(self):
        p = BM25Params(method="bm25l", k1=1.5, b=0.75, delta=0.5)
        norm = 1 - 0.75 + 0.75 * 10 / 8
        ctd = 2 / norm
        expect = 2.5 * (ctd + 0.5) / (1.5 + ctd + 0.5)
        assert tf_shape(p, np.array([2]), np.array([10]), 8.0)[0] == pytest.approx(expect)

    def test_bm25plus_hand_computed(self):
        p = BM25Params(method="bm25+", k1=1.5, b=0.75, delta=0.5)
        norm = 1 - 0.75 + 0.75 * 10 / 8
        expect = 2.5 * 2 / (1.5 * norm + 2) + 0.5
        assert tf_shape(p, np.array([2]), np.array([10]), 8.0)[0] == pytest.approx(expect)

    def test_monotone_in_tf(self):
        for m in METHODS:
            p = BM25Params(method=m)
            tfs = np.arange(1, 50, dtype=np.float64)
            shapes = tf_shape(p, tfs, np.full(49, 20.0), 15.0)
            assert np.all(np.diff(shapes) > 0), m


class TestNonoccurrence:
    def test_zero_for_classic_variants(self):
        for m in ("lucene", "atire", "robertson"):
            assert nonoccurrence_shape(BM25Params(method=m)) == 0.0

    def test_bm25l_value(self):
        p = BM25Params(method="bm25l", k1=1.5, delta=0.5)
        assert nonoccurrence_shape(p) == pytest.approx(2.5 * 0.5 / 2.0)

    def test_bm25plus_value(self):
        assert nonoccurrence_shape(BM25Params(method="bm25+", delta=0.5)) == 0.5

    def test_shape0_is_tf_zero_limit(self):
        # differential shape must equal tf_shape(tf) - tf_shape(0) for any dl
        for m in ("bm25l", "bm25+"):
            p = BM25Params(method=m)
            s_at_zero = tf_shape(p, np.array([0.0]), np.array([37.0]), 11.0)[0]
            assert s_at_zero == pytest.approx(nonoccurrence_shape(p)), m

    def test_differential_positive(self):
        for m in METHODS:
            p = BM25Params(method=m)
            d = differential_shape(p, np.array([1.0, 3.0]), np.array([5.0, 80.0]), 20.0)
            assert np.all(d > 0), m

    def test_query_constant(self):
        p = BM25Params(method="bm25+", delta=0.5)
        assert query_constant(p, [1.0, 2.0, 1.0]) == pytest.approx(4.0 * 0.5)
        assert query_constant(BM25Params(method="lucene"), [1.0, 2.0]) == 0.0


class TestOracleScoring:
    TEXTS = [
        "spark merge query engine",
        "merge merge merge sort",
        "query planner spark spark",
        "unrelated words entirely different",
    ]

    def test_absent_terms_zero_for_lucene(self):
        idx = build_oracle_index(self.TEXTS)
        s = oracle_scores(idx, "zzzunseen", BM25Params())
        assert np.all(s == 0)

    def test_tf_monotonicity_end_to_end(self):
        idx = build_oracle_index(self.TEXTS)
        s = oracle_scores(idx, "merge", BM25Params())
        assert s[1] > s[0]  # tf=3 beats tf=1 (same dl)

    def test_occurrence_weighted_query(self):
        idx = build_oracle_index(self.TEXTS)
        s1 = oracle_scores(idx, "merge", BM25Params())
        s2 = oracle_scores(idx, "merge merge", BM25Params())
        np.testing.assert_allclose(s2, 2 * s1)

    def test_nonoccurrence_shifts_all_docs(self):
        idx = build_oracle_index(self.TEXTS)
        p = BM25Params(method="bm25+")
        s = oracle_scores(idx, "merge", p)
        # doc 3 has no 'merge' but must still receive idf*delta
        assert s[3] > 0

    def test_ranks_stable_across_shift(self):
        # bm25+ shift is doc-independent: rank order equals the rank
        # order of the differential-only scores
        idx = build_oracle_index(self.TEXTS)
        p = BM25Params(method="bm25+")
        s = oracle_scores(idx, "merge spark", p)
        assert list(np.argsort(-s[:3])) == [1, 2, 0] or s[1] != s[2]
