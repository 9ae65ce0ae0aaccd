"""bm25_benchmarks_ray — a Ray-Data-native inverted-index builder and
BM25 query engine with the query/data-processing capabilities of the
xhluca/bm25-benchmarks reference harness (see SURVEY.md), built from
scratch on ray.data.Dataset / map_batches over zero-copy Arrow.

Layout:
  functions/  pure, picklable kernels (tokenizer, Porter2 stemmer,
              BM25 math, varint codec, text analysis, hashing)
  sources/    input readers + deterministic transcript synthesis
  stages/     map_batches / groupby building blocks (tokenize actor,
              doc-id assignment, segment encode, scoring, dedup, ANN)
  pipelines/  end-to-end build/search/eval pipelines
  state/      corpus stats, index manifest (lineage + resume)
"""

from .functions.bm25 import BM25Params, METHODS  # noqa: F401

__version__ = "0.1.0"
