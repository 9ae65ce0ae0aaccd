"""Exact phrase retrieval and conjunctive (boolean AND) retrieval.

Neither exists in the reference harness (bm25s/rank_bm25 are pure
bag-of-words scorers) but both are table-stakes fulltext-index
operations (Lucene PhraseQuery / BooleanQuery.MUST), so the engine
grows them on top of its existing primitives instead of a new index
format:

**Conjunctive AND** (``bool_and_topk``) — docs containing ALL query
terms, ranked by the ordinary BM25 score.  Pure composition: the
phrase-candidate intersection below builds a packed doc-id bitmap
(pipelines/docfilter.py) and hands it to ``search(allowed=...)`` —
the filtered-retrieval machinery does the rest (mask applied inside
the scorers, stats stay full-corpus).

**Exact phrase** (``phrase_topk``) — the two-phase positions-free
design:

  Phase 1 (index): candidate docs = intersection of the phrase
    terms' posting lists.  Per index group (disjoint doc ranges), one
    term-pruned parquet read decodes only the phrase terms' postings
    and intersects sorted doc-id arrays smallest-df-first; per-group
    candidate chunks OR into the bitmap driver-side (≤ num_docs/8
    bytes total on the wire).  Read volume is the phrase terms'
    postings — the same bytes a BM25 query over those terms pays —
    never the corpus.
  Phase 2 (text verify): one streaming ``map_batches`` pass over the
    corpus parquet re-tokenizes ONLY candidate rows (bitmap mask per
    batch; read span pruned to the candidates' doc-id range) and
    counts exact phrase occurrences in each doc's kept token stream,
    vectorized over the batch's dictionary-encoded stream
    (functions/tokenizer.dict_token_stream) — no per-doc Python loop.
  Scoring: the phrase is a *virtual term*: tf = occurrence count,
    df = number of docs with ≥1 occurrence, dl = the doc's kept-stream
    length; score = idf(df) · tf_shape(tf, dl) with the standard
    variant formulas (functions/bm25).  Only matching docs are ranked
    (no dense-vector padding — a phrase is a match predicate, not a
    similarity over the whole corpus).

Semantics contract (mirrored exactly by the SQL oracle in
driver_api.phrase_topk_sql):

* adjacency is evaluated on the KEPT token stream — stopwords removed,
  positions renumbered — so phrases cross removed stopwords
  ("big query" matches "big the query"); single-char tokens never
  existed (the reference's ``\\w\\w+`` splitter);
* the phrase text is tokenized by the SAME pipeline (its own stopwords
  vanish: "the fast value" searches the bigram "fast value");
* overlapping occurrences all count ("aa aa aa" contains "aa aa"
  twice); repeated phrase terms are allowed;
* a phrase containing an out-of-vocabulary term matches nothing
  (strict conjunction — phase 1 intersects to empty);
* a one-term phrase degenerates to that term's plain BM25 score over
  its matching docs.

Scale: phase-1 cost is bounded by the phrase terms' posting lists;
phase-2 cost is proportional to the CANDIDATE set (bounded by the
rarest term's df), streamed with row-group pruning.  The candidate
counts table is (qid, doc_id, ptf, dl) — materialized once for the
df aggregate, candidate-scale, never corpus-scale.

**Positions path** (round 5): when the index carries the positional
sidecar (pipelines/positions.py — Lucene's separate ``.pos`` file;
reference analogue ``on_pyserini.py --storePositions``), phases 1+2
fuse into one term-pruned sidecar scan per group: occurrences resolve
from per-(term, doc) delta+varint kept-stream positions with NO
corpus text read (``_positions_counts``).  Opt-in via
``build_positions`` / ``positions="auto"|"force"``; the two-phase
re-tokenize above remains the positions-free fallback, and both paths
are contract-identical (tested).  The bitmap itself has the
10^12-doc sharding story documented in pipelines/docfilter.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data as rd

from ..config import IndexConfig
from ..functions.bm25 import BM25Params, idf as idf_fn, tf_shape
from ..functions.tokenizer import (
    dict_token_stream,
    resolve_stemmer,
    resolve_stopwords,
    tokenize_text,
)
from ..state.manifest import Manifest
from .docfilter import bitmap_nbytes, invert_bitmap
from .index_build import SEGMENTS_DIR, VOCAB_DIR
from .query import search
from .topk import grouped_topk

__all__ = [
    "candidate_bitmap", "phrase_topk", "bool_and_topk", "bool_query_topk",
]


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted unique int64 arrays — one binary
    search of the smaller into the larger (posting lists arrive sorted
    from decode, so never pay np.intersect1d's concat+sort)."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return a
    pos = np.searchsorted(b, a)
    ok = pos < b.size
    ok[ok] = b[pos[ok]] == a[ok]
    return a[ok]


def _cfg_from_manifest(man: Manifest, cfg: IndexConfig | None) -> IndexConfig:
    if cfg is not None:
        return cfg
    return IndexConfig(**{
        k: v for k, v in man.config.items()
        if k in IndexConfig.__dataclass_fields__
    })


def _postings_bitmaps(
    index_dir: str,
    specs: list[tuple[str, list[str] | set[str], str]],
    man: Manifest | None = None,
) -> dict[str, np.ndarray]:
    """Packed uint8 bitmaps (docfilter layout) over the index's posting
    lists, for MANY specs in ONE distributed scan.  Each spec is
    (key, terms, op): docs containing ALL terms (op="and",
    rarest-df-first sorted intersection) or ANY (op="or", running
    merge).  Returns {key: bitmap}.

    Batching is the point (a Q-query phrase/boolean batch costs one
    scheduling round-trip and ONE vocab + segment read per group, not
    Q): every task reads the UNION of all specs' terms once, decodes
    each term once into its sorted doc array, then evaluates every
    spec against the shared decode cache.

    op="and": any term absent from the vocab ⇒ all-zeros (strict
    conjunction).  op="or": absent terms simply contribute nothing."""
    man = man or Manifest.load(index_dir)
    if man is None or not man.is_complete():
        raise ValueError(f"no complete index at {index_dir}")
    num_docs = int(man.stats["num_docs"])
    block_size = int(man.config.get("block_size", 128))
    out: dict[str, np.ndarray] = {
        key: np.zeros(bitmap_nbytes(num_docs), dtype=np.uint8)
        for key, _, _ in specs
    }
    union_terms = sorted({t for _, terms, _ in specs for t in terms})
    if not union_terms:
        raise ValueError("postings bitmap needs at least one term")
    v = pads.dataset(os.path.join(index_dir, VOCAB_DIR)).to_table(
        columns=["term", "df"], filter=pc.field("term").isin(union_terms)
    )
    df_map = dict(zip(v.column("term").to_pylist(), v.column("df").to_pylist()))
    # per-spec evaluation order (AND: rarest df first for early empty)
    plans: list[tuple[str, list[str], bool]] = []
    scan_terms: set[str] = set()
    for key, terms, op in specs:
        terms = sorted(set(terms))
        conj = op == "and"
        if conj and any(t not in df_map for t in terms):
            continue  # an OOV term can match no doc: stays all-zeros
        use = [t for t in terms if t in df_map]
        if not use:
            continue
        if conj:
            use.sort(key=df_map.get)
        plans.append((key, use, conj))
        scan_terms.update(use)
    if not plans:
        return out
    use_all = sorted(scan_terms)

    def scan(batch: pa.Table) -> pa.Table:
        from ..stages.segments import decode_segment, segment_rows_by_term

        key_out: list[str] = []
        lo_out: list[int] = []
        buf_out: list[bytes] = []
        for gd in batch.column("group_dir").to_pylist():
            seg = pads.dataset(gd).to_table(
                filter=pc.field("term").isin(use_all)
            )
            rbt = segment_rows_by_term(seg)
            dec: dict[str, np.ndarray] = {}

            def docs_of(t: str) -> np.ndarray | None:
                d = dec.get(t)
                if d is None:
                    rows = rbt.get(t)
                    if not rows:
                        return None
                    # multi-part rows (term split across sort
                    # partitions) arrive sorted by first doc, so
                    # concat stays ascending
                    parts = [decode_segment(r, block_size)[0] for r in rows]
                    d = parts[0] if len(parts) == 1 else np.concatenate(parts)
                    dec[t] = d
                return d

            for key, use, conj in plans:
                cur: np.ndarray | None = None
                for t in use:
                    d = docs_of(t)
                    if d is None:
                        if conj:
                            cur = None
                            break
                        continue
                    if cur is None:
                        cur = d
                    elif conj:
                        cur = _intersect_sorted(cur, d)
                        if cur.size == 0:
                            break
                    else:
                        cur = np.union1d(cur, d)
                if cur is None or cur.size == 0:
                    continue
                b_lo = int(cur[0]) >> 3
                bits = np.zeros(
                    ((int(cur[-1]) >> 3) + 1 - b_lo) << 3, dtype=np.uint8
                )
                bits[cur - (b_lo << 3)] = 1
                key_out.append(key)
                lo_out.append(b_lo)
                buf_out.append(
                    np.packbits(bits, bitorder="little").tobytes()
                )
        return pa.table(
            {"key": pa.array(key_out, type=pa.string()),
             "byte_lo": pa.array(lo_out, type=pa.int64()),
             "buf": pa.array(buf_out, type=pa.binary())}
        )

    items = [
        {"group_dir": os.path.join(index_dir, SEGMENTS_DIR, f"group={g}")}
        for g in man.done_groups()
    ]
    chunks = rd.from_items(items).map_batches(
        scan, batch_format="pyarrow", batch_size=1
    )
    # groups own disjoint doc ranges, so chunk ORs commute
    for b in chunks.iter_batches(batch_size=None, batch_format="pyarrow"):
        for key_, lo_, buf in zip(b.column("key").to_pylist(),
                                  b.column("byte_lo").to_pylist(),
                                  b.column("buf").to_pylist()):
            chunk = np.frombuffer(buf, dtype=np.uint8)
            out[key_][lo_: lo_ + chunk.size] |= chunk
    return out


def _postings_bitmap(
    index_dir: str,
    terms: list[str] | set[str],
    man: Manifest | None = None,
    op: str = "and",
) -> np.ndarray:
    """Single-spec convenience wrapper over :func:`_postings_bitmaps`."""
    return _postings_bitmaps(index_dir, [("q", terms, op)], man=man)["q"]


def candidate_bitmap(
    index_dir: str,
    terms: list[str] | set[str],
    man: Manifest | None = None,
) -> np.ndarray:
    """Packed bitmap of docs containing ALL ``terms`` — distributed
    posting-list intersection (see _postings_bitmap)."""
    return _postings_bitmap(index_dir, terms, man=man, op="and")


def _bit_test(bitmap: np.ndarray, ids: np.ndarray) -> np.ndarray:
    return (bitmap[ids >> 3] >> (ids & 7).astype(np.uint8)) & 1


def _make_phrase_counter(
    bitmap_ref,
    phrases: list[tuple[str, list[str]]],
    stopwords: frozenset[str],
    stemmer,
    id_col: str,
    text_col: str,
    gap: int = 1,
):
    """Batch fn: (qid, doc_id, ptf, dl) for every candidate doc with
    ≥1 occurrence of a phrase.  All phrases share one tokenize pass;
    matching runs on the batch's dictionary-encoded kept stream —
    equality tests against phrase-term class ids, one vectorized AND
    chain per phrase.

    ``gap`` — ordered-proximity slack: each next term must appear
    within ``gap`` kept-stream positions after the previous one
    (gap=1 ⇒ strict adjacency, the exact-phrase case).  For gap > 1
    an occurrence is a START position from which a full in-order
    chain exists (exists-semantics, counted once per start — mirrored
    by count(DISTINCT k0.rn) in the SQL oracle); the chain test is a
    backward sweep of one searchsorted per phrase term (take the
    NEAREST valid continuation — if any continuation is in range, the
    nearest is), never a tuple enumeration."""
    # phrase terms → dense class ids (shared across phrases)
    pterm_cls: dict[str, int] = {}
    seqs: list[tuple[str, np.ndarray]] = []
    for qid, toks in phrases:
        seqs.append(
            (qid, np.array([pterm_cls.setdefault(t, len(pterm_cls)) for t in toks],
                           dtype=np.int64))
        )

    def count(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"qid": pa.array([], type=pa.string()),
             "doc_id": pa.array([], type=pa.int64()),
             "ptf": pa.array([], type=pa.int64()),
             "dl": pa.array([], type=pa.int64())}
        )
        ids = batch.column(id_col).to_numpy().astype(np.int64, copy=False)
        if ids.size == 0:
            return empty
        sel = np.flatnonzero(_bit_test(ray.get(bitmap_ref), ids))
        if sel.size == 0:
            return empty
        sel_ids = ids[sel]
        codes, uniq, doc_of, _ = dict_token_stream(
            batch.column(text_col).take(pa.array(sel))
        )
        # kept stream: stopwords out, positions renumbered (module doc)
        if stopwords:
            stop = np.fromiter((u in stopwords for u in uniq), dtype=bool,
                               count=len(uniq))
            keep = ~stop[codes]
            codes, doc_of = codes[keep], doc_of[keep]
        dl = np.bincount(doc_of, minlength=sel.size)
        # class id per occurrence: phrase-term id or -1 (stem-unique-once)
        names = [stemmer(u) for u in uniq] if stemmer else uniq
        cls = np.fromiter((pterm_cls.get(n, -1) for n in names),
                          dtype=np.int64, count=len(uniq))
        cls_codes = cls[codes] if codes.size else codes
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        out_dl: list[np.ndarray] = []
        L = cls_codes.size
        for qid, seq in seqs:
            n = seq.size
            if n == 0 or L < n:
                continue
            if gap == 1:
                m = L - n + 1
                valid = cls_codes[:m] == seq[0]
                for j in range(1, n):
                    valid &= cls_codes[j: m + j] == seq[j]
                valid &= doc_of[:m] == doc_of[n - 1:]  # start+end in one doc
                if not valid.any():
                    continue
                starts = np.flatnonzero(valid)
            else:
                # backward exists-DP: ok = ALL positions of term j+1 from
                # which a full chain completes; a position p of term j
                # chains iff the nearest ok strictly after p is within
                # gap and in the same doc (nearest-of-the-VALID-set, so
                # no greedy misses — a farther valid q implies this
                # nearest one is also in range)
                ok = np.flatnonzero(cls_codes == seq[n - 1])
                for j in range(n - 2, -1, -1):
                    if ok.size == 0:
                        break
                    pj = np.flatnonzero(cls_codes == seq[j])
                    if pj.size == 0:
                        ok = pj
                        break
                    nxt = np.searchsorted(ok, pj, side="right")
                    has = nxt < ok.size
                    q = ok[np.minimum(nxt, ok.size - 1)]
                    ok = pj[has & (q <= pj + gap) & (doc_of[q] == doc_of[pj])]
                starts = ok
                if starts.size == 0:
                    continue
            ptf = np.bincount(doc_of[starts], minlength=sel.size)
            hit = np.flatnonzero(ptf)
            out_q.append(np.full(hit.size, qid, dtype=object))
            out_d.append(sel_ids[hit])
            out_tf.append(ptf[hit])
            out_dl.append(dl[hit])
        if not out_q:
            return empty
        return pa.table(
            {"qid": pa.array(np.concatenate(out_q), type=pa.string()),
             "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
             "ptf": pa.array(np.concatenate(out_tf).astype(np.int64)),
             "dl": pa.array(np.concatenate(out_dl).astype(np.int64))}
        )

    return count


_EMPTY_COUNTS = pa.table(
    {"qid": pa.array([], type=pa.string()),
     "doc_id": pa.array([], type=pa.int64()),
     "ptf": pa.array([], type=pa.int64()),
     "dl": pa.array([], type=pa.int64())}
)


def _positions_counts(
    index_dir: str,
    phrases: list[tuple[str, list[str]]],
    gap: int,
    man: Manifest,
) -> rd.Dataset:
    """Phase 1+2 fused on the positions sidecar (pipelines/positions.py
    — the Lucene .pos path, reference analogue on_pyserini.py
    --storePositions): per group, ONE term-pruned read of the phrase
    terms' positional postings resolves every query's occurrence count
    without touching the corpus text.  Per (query, group): each phrase
    slot's occurrences become sorted uint64 keys
    ((doc - doc_lo) << 32) | kept_pos, and the same chain test
    _make_phrase_counter runs on token streams runs here on keys —
    gap=1 membership (key p matches iff p+j present for every slot j),
    gap>1 the backward nearest-continuation DP.  Emits the candidate-
    scale (qid, doc_id, ptf, dl) counts table; cost is the phrase
    terms' postings + ~1 varint per occurrence."""
    from .positions import POSITIONS_DIR, positions_for_terms

    union_terms = sorted({t for _, toks in phrases for t in toks})
    items = []
    for g in man.done_groups():
        e = man.groups[str(g)]
        items.append({
            "group_dir": os.path.join(index_dir, POSITIONS_DIR, f"group={g}"),
            "doc_lo": int(e["doc_lo"]),
        })

    def scan(batch: pa.Table) -> pa.Table:
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        out_dl: list[np.ndarray] = []
        for gd, lo in zip(batch.column("group_dir").to_pylist(),
                          batch.column("doc_lo").to_pylist()):
            pmap = positions_for_terms(gd, union_terms)
            key_cache: dict[str, np.ndarray] = {}

            def keys_of(t: str) -> np.ndarray | None:
                ks = key_cache.get(t)
                if ks is None:
                    v = pmap.get(t)
                    if v is None:
                        return None
                    docs, _dls, counts, pos_abs = v
                    # sorted: docs ascending, positions ascending in doc
                    ks = key_cache[t] = (
                        (np.repeat((docs - lo).astype(np.uint64), counts)
                         << np.uint64(32))
                        | pos_abs.astype(np.uint64)
                    )
                return ks

            for qid, toks in phrases:
                slot_keys = [keys_of(t) for t in toks]
                if any(ksj is None or ksj.size == 0 for ksj in slot_keys):
                    continue  # strict conjunction within this group
                n = len(toks)
                if gap == 1:
                    p = slot_keys[0]
                    valid = np.ones(p.size, dtype=bool)
                    for j in range(1, n):
                        tgt = p + np.uint64(j)
                        ksj = slot_keys[j]
                        posn = np.searchsorted(ksj, tgt)
                        okj = posn < ksj.size
                        okj[okj] = ksj[posn[okj]] == tgt[okj]
                        valid &= okj
                        if not valid.any():
                            break
                    starts = p[valid]
                else:
                    ok = slot_keys[n - 1]
                    for j in range(n - 2, -1, -1):
                        if ok.size == 0:
                            break
                        pj = slot_keys[j]
                        nxt = np.searchsorted(ok, pj, side="right")
                        has = nxt < ok.size
                        q = ok[np.minimum(nxt, ok.size - 1)]
                        ok = pj[
                            has
                            & (q <= pj + np.uint64(gap))
                            & ((q >> np.uint64(32)) == (pj >> np.uint64(32)))
                        ]
                    starts = ok
                if starts.size == 0:
                    continue
                doc_rel, ptf = np.unique(
                    (starts >> np.uint64(32)).astype(np.int64),
                    return_counts=True,
                )
                hit_docs = doc_rel + lo
                docs0, dls0, _c0, _p0 = pmap[toks[0]]
                dl = dls0[np.searchsorted(docs0, hit_docs)]
                out_q.append(np.full(hit_docs.size, qid, dtype=object))
                out_d.append(hit_docs)
                out_tf.append(ptf.astype(np.int64))
                out_dl.append(dl.astype(np.int64))
        if not out_q:
            return _EMPTY_COUNTS
        return pa.table(
            {"qid": pa.array(np.concatenate(out_q), type=pa.string()),
             "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
             "ptf": pa.array(np.concatenate(out_tf)),
             "dl": pa.array(np.concatenate(out_dl))}
        )

    return rd.from_items(items).map_batches(
        scan, batch_format="pyarrow", batch_size=1
    )


def phrase_topk(
    index_dir: str,
    docs_path: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    params: BM25Params | None = None,
    cfg: IndexConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gap: int = 1,
    positions: str = "auto",
) -> pa.Table:
    """Top-k exact-phrase retrieval: (qid, doc_id, rank, score) with
    round-6 deterministic (score desc, doc_id asc) ranking — module doc
    for semantics and the two-phase design.

    ``gap`` > 1 relaxes adjacency into ordered proximity (NEAR/n):
    each next phrase term within ``gap`` kept-stream positions of the
    previous; tf counts chain START positions (_make_phrase_counter).
    gap=1 is the exact phrase.

    ``positions``: "auto" (default) resolves occurrences from the
    positional sidecar (pipelines/positions.py) when the index has
    one — no corpus text read at all — and falls back to the
    two-phase re-tokenize otherwise; "force" requires the sidecar;
    "off" always re-tokenizes.  Both paths produce identical counts
    (the sidecar stores the same kept-stream positions the fallback
    recomputes)."""
    if positions not in ("auto", "force", "off"):
        raise ValueError("positions must be 'auto', 'force' or 'off'")
    if gap < 1:
        raise ValueError("gap must be >= 1")
    params = params or BM25Params()
    man = Manifest.load(index_dir)
    if man is None or not man.is_complete():
        raise ValueError(f"no complete index at {index_dir}")
    cfg = _cfg_from_manifest(man, cfg)
    num_docs = int(man.stats["num_docs"])
    avgdl = float(man.stats["avgdl"])
    stopwords = resolve_stopwords(cfg.stopwords)
    stemmer = resolve_stemmer(cfg.stemmer)

    empty = pa.table(
        {"qid": pa.array([], type=pa.string()),
         "doc_id": pa.array([], type=pa.int64()),
         "rank": pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.float64())}
    )

    tokenized: list[tuple[str, list[str]]] = []
    for qid, text in queries:
        toks = tokenize_text(text, stopwords=stopwords, stemmer=stemmer)
        if toks:
            tokenized.append((qid, toks))
    if not tokenized:
        return empty

    from .positions import has_positions

    use_pos = positions == "force" or (
        positions == "auto" and has_positions(index_dir, man)
    )
    if positions == "force" and not has_positions(index_dir, man):
        raise ValueError(
            f"positions='force' but no complete positions sidecar at "
            f"{index_dir} (build_positions)"
        )

    if use_pos:
        # positions path: phase 1+2 fused on the sidecar, no corpus
        # text read (_positions_counts)
        counts = _positions_counts(
            index_dir, tokenized, gap, man
        ).materialize()
        if counts.count() == 0:
            return empty
    else:
        toks_of: dict[str, list[str]] = dict(tokenized)
        specs = [(qid, toks, "and") for qid, toks in tokenized]
        # phase 1, ALL queries in ONE distributed scan (each group's
        # vocab + segments read once; shared per-term decode across
        # queries)
        bms = _postings_bitmaps(index_dir, specs, man=man)
        phrases: list[tuple[str, list[str]]] = []
        union = np.zeros(bitmap_nbytes(num_docs), dtype=np.uint8)
        for qid, toks in toks_of.items():
            bm = bms.get(qid)
            if bm is None or not bm.any():
                continue
            phrases.append((qid, toks))
            union |= bm
        if not phrases:
            return empty

        # phase 2: stream candidates only (bitmap mask; read span
        # pruned to the candidates' doc-id range via the byte envelope
        # of set bits)
        nz = np.flatnonzero(union)
        span_lo, span_hi = int(nz[0]) << 3, (int(nz[-1]) + 1) << 3
        # real row-group pruning: the doc-id span predicate is pushed
        # into the parquet fragments (statistics skip whole row groups
        # outside the candidates' range); the in-task span filter below
        # stays as the exactness guard for writers without row-group
        # stats
        ds = rd.read_parquet(
            docs_path, columns=[id_col, text_col],
            filter=(pc.field(id_col) >= span_lo)
            & (pc.field(id_col) < span_hi),
        )
        counter = _make_phrase_counter(
            ray.put(union), phrases, stopwords, stemmer, id_col, text_col,
            gap,
        )

        def spanned(batch: pa.Table) -> pa.Table:
            d = batch.column(id_col)
            m = pc.and_(pc.greater_equal(d, span_lo), pc.less(d, span_hi))
            return counter(batch.filter(m))

        counts = ds.map_batches(spanned, batch_format="pyarrow").materialize()
        if counts.count() == 0:
            return empty

    # per-phrase df: per-block partial value counts (≤ #phrases rows per
    # block leave each task — the driver never pulls the qid column)
    def dfc(b: pa.Table) -> pa.Table:
        qarr = b.column("qid").combine_chunks().to_numpy(zero_copy_only=False)
        q, c = np.unique(qarr, return_counts=True)
        return pa.table(
            {"qid": pa.array(q, type=pa.string()),
             "n": pa.array(c, type=pa.int64())}
        )

    dfs: dict[str, int] = {}
    for b in counts.map_batches(dfc, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for qq, cc in zip(b.column("qid").to_pylist(),
                          b.column("n").to_pylist()):
            dfs[qq] = dfs.get(qq, 0) + int(cc)
    avg_idf = man.stats.get("avg_robertson_idf")
    idf_map = {
        q: float(idf_fn(params, d, num_docs, avg_idf=avg_idf))
        for q, d in dfs.items()
    }

    def score(batch: pa.Table) -> pa.Table:
        w = batch.column("qid").to_pandas().map(idf_map).to_numpy()
        s = w * tf_shape(
            params,
            batch.column("ptf").to_numpy(),
            batch.column("dl").to_numpy(),
            avgdl,
        )
        return pa.table(
            {"qid": batch.column("qid"),
             "doc_id": batch.column("doc_id"),
             "score": pa.array(np.round(s, 6), type=pa.float64())}
        )

    top = grouped_topk(
        counts.map_batches(score, batch_format="pyarrow"),
        key="qid", score="score", id_col="doc_id", k=k,
    )
    parts = list(top.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return empty
    tbl = pa.concat_tables(parts)
    if tbl.num_rows == 0:
        return empty
    return pa.table(
        {"qid": tbl.column("qid").cast(pa.string()),
         "doc_id": tbl.column("doc_id").cast(pa.int64()),
         "rank": tbl.column("rank").cast(pa.int64()),
         "score": tbl.column("score").cast(pa.float64())}
    )


def bool_and_topk(
    index_dir: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    params: BM25Params | None = None,
    cfg: IndexConfig | None = None,
) -> pa.Table:
    """Conjunctive top-k: BM25 ranking restricted to docs containing
    ALL of each query's terms (Lucene BooleanQuery.MUST).  A query with
    an out-of-vocab term returns nothing (strict AND); fewer than k
    conjunctive matches return fewer rows.  Per query: one posting-list
    intersection → ``search(allowed=bitmap)`` (docfilter mask inside
    the scorers; full-corpus idf/avgdl, identical score values to the
    unfiltered ranking)."""
    params = params or BM25Params()
    man = Manifest.load(index_dir)
    if man is None or not man.is_complete():
        raise ValueError(f"no complete index at {index_dir}")
    cfg = _cfg_from_manifest(man, cfg)
    stopwords = resolve_stopwords(cfg.stopwords)
    stemmer = resolve_stemmer(cfg.stemmer)

    q_terms: dict[str, set[str]] = {}
    for qid, text in queries:
        terms = set(tokenize_text(text, stopwords=stopwords, stemmer=stemmer))
        if terms:
            q_terms[qid] = terms
    # all intersections in one distributed scan (ADVICE: Q queries no
    # longer pay Q scheduling round-trips / segment re-reads)
    bms = _postings_bitmaps(
        index_dir, [(q, t, "and") for q, t in q_terms.items()], man=man
    ) if q_terms else {}
    frames: list[pd.DataFrame] = []
    for qid, text in queries:
        bm = bms.get(qid)
        if bm is None or not bm.any():
            continue
        res = search(
            index_dir, [(qid, text)], params=params, k=k, cfg=cfg,
            join_back=False, allowed=bm,
        ).to_pandas()
        frames.append(res)
    if not frames:
        return pa.table(
            {"qid": pa.array([], type=pa.string()),
             "doc_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}
        )
    res = pd.concat(frames, ignore_index=True)
    res["score"] = res["score"].round(6)
    res = res.sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True])
    res["rank"] = res.groupby("qid").cumcount() + 1
    return pa.table(
        {"qid": pa.array(res["qid"], type=pa.string()),
         "doc_id": pa.array(res["doc_id"], type=pa.int64()),
         "rank": pa.array(res["rank"].astype(np.int64)),
         "score": pa.array(res["score"], type=pa.float64())}
    )


def bool_query_topk(
    index_dir: str,
    specs: list[tuple[str, str, str, str]],
    k: int = 10,
    params: BM25Params | None = None,
    cfg: IndexConfig | None = None,
) -> pa.Table:
    """Full boolean retrieval — Lucene's MUST / SHOULD / MUST_NOT triad.

    ``specs``: (qid, must, should, must_not) text fields, each run
    through the index's analyzer.  Eligibility: a doc must contain ALL
    must terms (strict — an OOV must term empties the query; empty
    must text means "all docs") and NONE of the must_not terms (an OOV
    must_not term excludes nothing).  Scoring: ordinary BM25 over the
    CONCATENATED must + should text (MUST clauses score too, Lucene's
    behavior), dense semantics confined to the eligible set — an
    eligible doc matching no scoring term ranks at the query constant.

    Bitmap algebra on the docfilter layout: AND-intersection bitmap
    for must (posting-list intersection), OR-union bitmap for
    must_not, eligibility = must & ~must_not, then one
    ``search(allowed=...)`` per query — the exclusion never touches
    the scorers, it is pure mask composition."""
    params = params or BM25Params()
    man = Manifest.load(index_dir)
    if man is None or not man.is_complete():
        raise ValueError(f"no complete index at {index_dir}")
    cfg = _cfg_from_manifest(man, cfg)
    num_docs = int(man.stats["num_docs"])
    stopwords = resolve_stopwords(cfg.stopwords)
    stemmer = resolve_stemmer(cfg.stemmer)

    def toks(text: str) -> list[str]:
        return tokenize_text(text, stopwords=stopwords, stemmer=stemmer)

    # one batched scan for every query's must-AND and must_not-OR
    # bitmaps (shared per-term decodes across the whole spec set)
    scan_specs: list[tuple[str, list[str], str]] = []
    m_of: dict[str, list[str]] = {}
    n_of: dict[str, list[str]] = {}
    for qid, must, _should, must_not in specs:
        m_of[qid] = toks(must)
        n_of[qid] = toks(must_not)
        if m_of[qid]:
            scan_specs.append((f"m:{qid}", m_of[qid], "and"))
        if n_of[qid]:
            scan_specs.append((f"n:{qid}", n_of[qid], "or"))
    bms = _postings_bitmaps(index_dir, scan_specs, man=man) if scan_specs else {}

    frames: list[pd.DataFrame] = []
    for qid, must, should, must_not in specs:
        if m_of[qid]:
            bm = bms[f"m:{qid}"]
            if not bm.any():
                continue
        else:
            bm = invert_bitmap(
                np.zeros(bitmap_nbytes(num_docs), dtype=np.uint8), num_docs
            )
        if n_of[qid]:
            bm = bm & invert_bitmap(bms[f"n:{qid}"], num_docs)
            if not bm.any():
                continue
        score_text = (must + " " + should).strip()
        if not toks(score_text):
            continue  # nothing to rank by (must and should all stopword/OOV)
        res = search(
            index_dir, [(qid, score_text)], params=params, k=k, cfg=cfg,
            join_back=False, allowed=bm,
        ).to_pandas()
        frames.append(res)
    if not frames:
        return pa.table(
            {"qid": pa.array([], type=pa.string()),
             "doc_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}
        )
    res = pd.concat(frames, ignore_index=True)
    res["score"] = res["score"].round(6)
    res = res.sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True])
    res["rank"] = res.groupby("qid").cumcount() + 1
    return pa.table(
        {"qid": pa.array(res["qid"], type=pa.string()),
         "doc_id": pa.array(res["doc_id"], type=pa.int64()),
         "rank": pa.array(res["rank"].astype(np.int64)),
         "score": pa.array(res["score"], type=pa.float64())}
    )
