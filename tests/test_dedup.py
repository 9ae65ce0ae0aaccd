"""Dedup operators on a corpus with planted exact and near duplicates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.dedup import (
    DropReport,
    MinHasher,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_hashes,
    shingles,
    simhash64,
    simhash_pairs,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "distributed inverted index construction with ray data streaming shuffle salting",
    "minhash signatures approximate jaccard similarity between shingle sets quite well",
    "completely unrelated text about cooking pasta with garlic olive oil and basil",
]


@pytest.fixture(scope="module")
def corpus(ray_session):
    texts = []
    # 0-3: base docs; 4: exact dup of 0; 5: near dup of 1 (one word changed);
    # 6: exact dup of 2; 7+: filler
    texts.extend(BASE)
    texts.append(BASE[0])
    texts.append(BASE[1].replace("salting", "skewing"))
    texts.append(BASE[2])
    for i in range(20):
        texts.append(f"filler document number {i} with some distinct words token{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}")
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    return t


def test_exact_dedup(corpus):
    out = exact_dedup(rd.from_arrow(corpus).repartition(3)).to_pandas()
    keep = set(out["doc_id"])
    assert 0 in keep and 4 not in keep
    assert 2 in keep and 6 not in keep
    assert 1 in keep and 5 in keep  # near-dup is NOT an exact dup
    assert len(keep) == corpus.num_rows - 2


def test_ngram_jaccard_finds_planted(corpus):
    out = ngram_jaccard_pairs(
        rd.from_arrow(corpus).repartition(3), threshold=0.5
    ).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert (0, 4) in pairs  # exact dup: jaccard 1.0
    assert (2, 6) in pairs
    assert (1, 5) in pairs  # near dup: most shingles shared
    # sanity: unrelated docs not paired
    assert not any(a == 3 or b == 3 for a, b in pairs)


def test_minhash_lsh_finds_planted(corpus):
    out = minhash_lsh_pairs(
        rd.from_arrow(corpus).repartition(3), threshold=0.5
    ).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert (0, 4) in pairs and (2, 6) in pairs and (1, 5) in pairs
    for _, r in out.iterrows():  # verified pairs carry true jaccard
        assert r["jaccard"] >= 0.5


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher(num_hashes=256)
    s1 = mh.signature(BASE[1])
    s2 = mh.signature(BASE[1].replace("salting", "skewing"))
    est = (s1 == s2).mean()
    sa, sb = shingles(BASE[1]), shingles(BASE[1].replace("salting", "skewing"))
    true = len(sa & sb) / len(sa | sb)
    assert abs(est - true) < 0.15


def test_simhash_pairs(corpus):
    out = simhash_pairs(rd.from_arrow(corpus).repartition(3), hamming_max=3).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert (0, 4) in pairs and (2, 6) in pairs  # exact dups: distance 0
    ham = {(int(a), int(b)): int(h) for a, b, h in zip(out["a"], out["b"], out["hamming"])}
    assert ham[(0, 4)] == 0


def test_simhash_deterministic():
    assert simhash64(BASE[0]) == simhash64(BASE[0])
    assert simhash64(BASE[0]) != simhash64(BASE[3])


def test_shingle_hashes_match_string_shingles():
    """Distinct counts and cross-doc hash equality mirror the string
    shingle sets exactly (same tokens → same window hashes)."""
    texts = BASE + ["tiny doc", "", BASE[0], "one"]
    dd, hh, n_sh = shingle_hashes(texts, 3)
    for i, t in enumerate(texts):
        assert n_sh[i] == len(shingles(t, 3)), t
    # identical docs produce identical hash sets
    h0 = sorted(hh[dd == 0].tolist())
    hdup = sorted(hh[dd == len(BASE) + 2].tolist())
    assert h0 == hdup
    # empty doc contributes nothing
    assert n_sh[len(BASE) + 1] == 0


def test_drop_report_counts_overcap_buckets(ray_session):
    """An over-cap duplicate cluster must be REPORTED, not silently
    skipped (module docstring's promise)."""
    texts = ["identical boilerplate license header text here"] * 40 + [
        f"unique filler text number {i} with words alpha{i} beta{i} gamma{i}"
        for i in range(10)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    rep = DropReport()
    out = ngram_jaccard_pairs(
        rd.from_arrow(t).repartition(2), threshold=0.8, max_bucket=8,
        drop_report=rep,
    ).to_pandas()
    got = rep.get()
    assert got["dropped_buckets"] >= 1
    assert got["dropped_docs"] >= 40
    # the planted cluster's pairs were indeed dropped ("a" column absent
    # entirely when NO pairs survive — Ray's empty to_pandas quirk)
    if "a" in out:
        assert not any((a < 40) and (b < 40) for a, b in zip(out["a"], out["b"]))

    rep2 = DropReport()
    sim = simhash_pairs(
        rd.from_arrow(t).repartition(2), hamming_max=3, max_bucket=8,
        drop_report=rep2,
    ).to_pandas()
    assert rep2.get()["dropped_buckets"] >= 1


def test_token_codes_fast_path_matches_python_re():
    """The Arrow RE2 fast path must produce the exact token stream of
    the Python-re reference (_tokens) on ASCII, and any non-ASCII
    string in the batch must route the whole batch to the Python path
    (unicode \\w semantics differ between RE2 and Python re)."""
    import numpy as np

    from bm25_benchmarks_ray.pipelines.dedup import (
        _Md5Cache,
        _token_codes,
        _tokens,
        md5_u64,
        simhash64_batch,
    )

    ascii_texts = [
        "The QUICK brown-fox_jumps 0ver 42 lazy dogs!!",
        "",
        "a",  # single 1-char token -> no tokens
        "x  y_z\t9 odd-ch!ars (parens) [brackets]",
        "repeat repeat repeat the the the",
    ]
    codes, uniq, lens = _token_codes(ascii_texts)
    flat_ref = [t for s in ascii_texts for t in _tokens(s)]
    lens_ref = [len(_tokens(s)) for s in ascii_texts]
    assert list(uniq[codes]) == flat_ref
    assert list(lens) == lens_ref

    # non-ASCII batch: falls back, still exact vs _tokens
    uni_texts = ascii_texts + ["café au lait naïve café", "日本語 テスト ascii mixed"]
    codes2, uniq2, lens2 = _token_codes(uni_texts)
    flat2 = [t for s in uni_texts for t in _tokens(s)]
    assert list(uniq2[codes2]) == flat2
    assert list(lens2) == [len(_tokens(s)) for s in uni_texts]

    # md5 cache: identical hashes to direct md5, across repeated lookups
    c = _Md5Cache()
    h1 = c.lookup(uniq)
    assert (h1 == md5_u64(list(uniq))).all()
    h2 = c.lookup(uniq)  # all-hit path
    assert (h2 == h1).all()
    assert (simhash64_batch(ascii_texts, c) == simhash64_batch(ascii_texts)).all()
    # mixed hit/miss probe
    mixed = np.concatenate([uniq[:2], np.array(["zzunseen1", "zzunseen2"], dtype=object)])
    assert (c.lookup(mixed) == md5_u64(list(mixed))).all()


def test_ngram_refuses_oversized_corpus(ray_session):
    """The exact ngram path is the oracle route — above max_docs it
    must refuse (quadratic worst case) and point at minhash_lsh_pairs."""
    import pytest
    import ray.data as rd

    from bm25_benchmarks_ray.pipelines.dedup import ngram_jaccard_pairs

    t = pa.table(
        {
            "doc_id": pa.array(range(100), type=pa.int64()),
            "text": pa.array([f"doc number {i} words" for i in range(100)]),
        }
    )
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(ds, max_docs=50)
    # forcing the exact path still works
    out = ngram_jaccard_pairs(ds, max_docs=None)
    assert out.count() >= 0
