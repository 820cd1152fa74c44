"""Byte-pair-encoding tokenizer training + encoding over a Ray Dataset.

The missing token-axis operator: learn a subword vocabulary from a corpus
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units") and apply it — the standard pre-training tokenizer
pipeline.  Reference analogue: none (malli is a single-value library);
this follows SURVEY.md §2.14's training-data operator mandate.

Scale shape (the same split every production BPE trainer uses —
HuggingFace tokenizers, SentencePiece, subword-nmt):

* the CORPUS-scale work is one distributed pass: tokenize + word-frequency
  count with map-side combine (:func:`malli_ray.stages.text.word_counts`
  — one row per distinct word per block shuffles, never one per token);
* the merge loop then operates on the *distinct-word* table capped to the
  ``max_words`` most frequent words (deterministic ``(cnt desc, word)``
  order) — bounded driver memory BY CONSTRUCTION, independent of corpus
  size.  At 100 TB the corpus pass is the only thing that grows; the
  capped word table is the same V rows.

The merge loop here is the *incremental* formulation: per merge, only the
words containing the chosen pair are touched (subtract their old adjacent
pair counts, apply the merge, add the new ones) — O(affected words), not
O(V), per iteration.  It is provably equivalent to the naive
recount-everything-each-iteration trainer, and tests/test_stages_ray.py
asserts bit-equality against exactly that naive reference
(tools/make_golden.py::bpe_merges_ref) on random corpora.

Determinism contract (shared with the golden fixture):
* words = ASCII ``\\S+`` runs (the engine-wide RE2-compatible split);
* symbols of a word = its characters plus a final ``"</w>"`` marker;
* pair counting sees every ADJACENT occurrence ("aaa" -> (a,a) twice);
* merge application is greedy left-to-right NON-overlapping;
* best pair = max count, ties broken by lexicographically smallest
  ``(left, right)``;
* training stops at ``num_merges`` or when the best count < ``min_count``.
"""

from __future__ import annotations

import re
from typing import Any

import pyarrow as pa

from ray.data import Dataset

from . import concurrency_kwargs

WORD_RE = re.compile(r"[^\t\n\f\r ]+")
END = "</w>"

MERGES_SCHEMA = pa.schema([("rank", pa.int32()),
                           ("left", pa.string()),
                           ("right", pa.string()),
                           ("pair_count", pa.int64())])


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _adjacent_pairs(symbols: tuple) -> dict:
    """Counts of every adjacent (overlapping) pair in one symbol sequence."""
    out: dict = {}
    for i in range(len(symbols) - 1):
        p = (symbols[i], symbols[i + 1])
        out[p] = out.get(p, 0) + 1
    return out


def _apply_merge(symbols: tuple, left: str, right: str) -> tuple:
    """Greedy left-to-right non-overlapping replacement of (left, right)."""
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_merges(word_count_pairs, num_merges: int,
                 min_count: int = 1) -> list:
    """Incremental BPE merge learning over a (word, count) list.

    Returns ``[(rank, left, right, pair_count), ...]``.  Equivalent to the
    naive full-recount trainer (see module docstring); per iteration only
    the words containing the winning pair are re-counted.
    """
    vocab = [(tuple(w) + (END,), int(c)) for w, c in word_count_pairs]
    stats: dict = {}                 # pair -> total count
    where: dict = {}                 # pair -> set of vocab indexes
    for idx, (syms, cnt) in enumerate(vocab):
        for p, k in _adjacent_pairs(syms).items():
            stats[p] = stats.get(p, 0) + k * cnt
            where.setdefault(p, set()).add(idx)

    merges = []
    for rank in range(num_merges):
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), total = best
        if total < min_count:
            break
        merges.append((rank, left, right, total))
        for idx in sorted(where.get((left, right), ())):
            syms, cnt = vocab[idx]
            old = _adjacent_pairs(syms)
            new_syms = _apply_merge(syms, left, right)
            new = _adjacent_pairs(new_syms)
            vocab[idx] = (new_syms, cnt)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    stats[p] = stats.get(p, 0) + d * cnt
                    if stats[p] <= 0:
                        del stats[p]
                if new.get(p, 0):
                    where.setdefault(p, set()).add(idx)
                elif old.get(p, 0) and p in where:
                    where[p].discard(idx)
        where.pop((left, right), None)
        stats.pop((left, right), None)
    return merges


def bpe_train(ds: Dataset, text_column: str, num_merges: int = 120,
              max_words: int = 50_000, min_count: int = 1,
              lowercase: bool = False) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a corpus Dataset.

    One distributed corpus pass (word_counts, map-side combined), then the
    incremental merge loop over the ``max_words`` most frequent words
    (ties broken by word — deterministic).  Returns the ranked merge
    table (MERGES_SCHEMA)."""
    from .text import word_counts

    counts = (word_counts(ds, text_column, lowercase=lowercase)
              .sort(["cnt", "word"], descending=[True, False])
              .limit(max_words))
    pairs = [(r["word"], r["cnt"]) for r in counts.take_all()]
    merges = train_merges(pairs, num_merges, min_count=min_count)
    return pa.table({"rank": pa.array([m[0] for m in merges], pa.int32()),
                     "left": pa.array([m[1] for m in merges], pa.string()),
                     "right": pa.array([m[2] for m in merges], pa.string()),
                     "pair_count": pa.array([m[3] for m in merges],
                                            pa.int64())})


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict) -> list:
    """BPE-encode ONE word: repeatedly merge the lowest-rank adjacent pair
    (left-to-right non-overlapping within a round) until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = list(_apply_merge(tuple(syms), *best_pair))
    return syms


class BpeEncoder:
    """Stateful stage: merge ranks held once per worker; per-word encode
    results memoized (words repeat heavily — the GPT-2 encoder uses the
    same cache), bounded by ``cache_max`` with clear-on-full.

    Emits (id, n_bpe, bpe_text) — tokens joined by a single space (tokens
    never contain spaces: words are ``\\S+`` runs and merges only
    concatenate their characters plus the ``</w>`` marker)."""

    CACHE_MAX = 1 << 20

    def __init__(self, text_column: str, id_column: str, merges_ref,
                 lowercase: bool = False):
        import ray
        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, (list, pa.Table))
                  else merges_ref)
        if isinstance(merges, pa.Table):
            merges = list(zip(merges.column("left").to_pylist(),
                              merges.column("right").to_pylist()))
        self.ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self.text_column = text_column
        self.id_column = id_column
        self.lowercase = lowercase
        self._cache: dict = {}

    def _encode(self, word: str) -> list:
        toks = self._cache.get(word)
        if toks is None:
            toks = encode_word(word, self.ranks)
            if len(self._cache) >= self.CACHE_MAX:
                self._cache.clear()
            self._cache[word] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_out, joined = [], []
        for t in texts:
            t = t or ""
            if self.lowercase:
                t = t.lower()
            toks: list = []
            for w in WORD_RE.findall(t):
                toks.extend(self._encode(w))
            n_out.append(len(toks))
            joined.append(" ".join(toks))
        return pa.table({self.id_column: batch.column(self.id_column),
                         "n_bpe": pa.array(n_out, pa.int64()),
                         "bpe_text": pa.array(joined, pa.string())})


def bpe_tokenize(ds: Dataset, merges: "pa.Table | list", text_column: str,
                 id_column: str, lowercase: bool = False,
                 concurrency: Any = None) -> Dataset:
    """Apply a learned merge table to a corpus: broadcast the ranks once
    (ray.put), encode per batch with a per-worker word cache."""
    import ray

    from . import cached_stage

    if isinstance(merges, pa.Table):
        merges = list(zip(merges.column("left").to_pylist(),
                          merges.column("right").to_pylist()))
    ref = ray.put(list(merges))
    return ds.map_batches(
        cached_stage(BpeEncoder, text_column=text_column,
                     id_column=id_column, merges_ref=ref,
                     lowercase=lowercase),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
