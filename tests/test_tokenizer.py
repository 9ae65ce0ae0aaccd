"""Tokenizer unit tests — golden cases from the reference spec
(/root/reference/utils/__init__.py:56-143) and FIXTURES.md §6."""

import pytest

from bm25_benchmarks_ray.functions.tokenizer import (
    STOPWORDS_EN,
    resolve_stemmer,
    resolve_stopwords,
    term_frequencies,
    tokenize_text,
)


def toks(text, **kw):
    return tokenize_text(text, **kw)


def toks_nostem(text):
    return tokenize_text(text, stemmer=None)


class TestRegexSplit:
    def test_min_length_two(self):
        # (?u)\b\w\w+\b drops 1-char tokens
        assert toks_nostem("a b cd efg h") == ["cd", "efg"]

    def test_punctuation_explicit(self):
        # "don't re-index" -> don / re dropped? no: all len>=2 kept
        assert tokenize_text("don't re-index", stopwords=frozenset(), stemmer=None) == [
            "don", "re", "index",
        ]

    def test_digits_kept(self):
        assert tokenize_text("v2 2024 x86 x", stopwords=frozenset(), stemmer=None) == [
            "v2", "2024", "x86",
        ]

    def test_unicode_word_chars(self):
        assert tokenize_text("café naïve 東京", stopwords=frozenset(), stemmer=None) == [
            "café", "naïve", "東京",
        ]

    def test_lowercase_default(self):
        assert tokenize_text("Spark SPARK spark", stopwords=frozenset(), stemmer=None) == [
            "spark", "spark", "spark",
        ]

    def test_empty_string(self):
        assert toks("") == []

    def test_underscore_is_word_char(self):
        assert tokenize_text("foo_bar baz", stopwords=frozenset(), stemmer=None) == [
            "foo_bar", "baz",
        ]


class TestStopwords:
    def test_list_is_33_words(self):
        assert len(STOPWORDS_EN) == 33

    def test_filter_before_stemming(self):
        # "these" is a stopword; if stemming ran first it would become
        # "these"->"these" anyway, but "this" must never reach the stemmer
        assert toks("this is the index") == ["index"]

    def test_all_stopword_text(self):
        assert toks("the and of a to") == []

    def test_none_passthrough(self):
        assert resolve_stopwords("none") == frozenset()
        assert resolve_stopwords(None) == frozenset()

    def test_en_aliases(self):
        assert resolve_stopwords("en") == STOPWORDS_EN
        assert resolve_stopwords("english") == STOPWORDS_EN

    def test_bad_spec_raises(self):
        with pytest.raises(ValueError):
            resolve_stopwords("klingon")


class TestStemming:
    def test_stem_merges_variants(self):
        out = toks("index indexes indexing indexed")
        assert len(set(out)) == 1

    def test_repeated_term_tf(self):
        tf, dl = term_frequencies("spark spark spark")
        assert dl == 3 and tf["spark"] == 3

    def test_stemmer_none(self):
        assert resolve_stemmer("none") is None
        assert toks("running", stemmer=None) == ["running"]

    def test_order_and_multiplicity_preserved(self):
        assert toks("query merge query", stemmer=None) == ["query", "merge", "query"]

    def test_single_char_only_doc_is_empty(self):
        tf, dl = term_frequencies("x y z 1 2")
        assert dl == 0 and not tf


def test_resolve_splitter_paths():
    from bm25_benchmarks_ray.functions.tokenizer import (
        resolve_splitter,
        tokenize_text,
    )

    assert resolve_splitter("regex")("big cats") == ["big", "cats"]
    custom = resolve_splitter(lambda t: t.split("|"))
    assert custom("ab|cd") == ["ab", "cd"]
    assert tokenize_text(
        "Keep|the|tokens", stopwords=frozenset({"the"}), stemmer=None,
        splitter=lambda t: t.split("|"),
    ) == ["keep", "tokens"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resolve_splitter("bogus")


def test_hf_splitter_import_gated():
    """No tokenizers package in this container: the HF path must fail
    with a clear ImportError, not an AttributeError deep in the stage."""
    import pytest as _pytest

    from bm25_benchmarks_ray.functions.tokenizer import resolve_splitter

    try:
        import tokenizers  # noqa: F401

        _pytest.skip("tokenizers installed here")
    except ImportError:
        pass
    with _pytest.raises(ImportError, match="tokenizers"):
        resolve_splitter("hf:bert-base-uncased")


def test_dict_token_stream_null_text_is_empty_doc():
    import pyarrow as pa

    from bm25_benchmarks_ray.functions.tokenizer import dict_token_stream

    col = pa.array(["hello world", None, "second doc"], type=pa.string())
    codes, uniq, doc_of, lens = dict_token_stream(col, lower=True)
    assert list(lens) == [2, 0, 2]
    assert list(uniq[codes]) == ["hello", "world", "second", "doc"]
    # null mixed with non-ASCII (python fallback path)
    col2 = pa.array(["café one", None], type=pa.string())
    codes2, uniq2, doc_of2, lens2 = dict_token_stream(col2, lower=True)
    assert list(lens2) == [2, 0]
    assert list(uniq2[codes2]) == ["café", "one"]
