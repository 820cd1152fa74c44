"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All hot paths are vectorized pyarrow.compute string kernels
(count_substring_regex / utf8_length); only language-ID scoring walks small
per-language hit counts (still vectorized per language, not per row).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..state.sketches import hash64

__all__ = ["add_token_count", "add_quality", "LangID", "add_lang_id",
           "Fingerprinter", "add_fingerprint", "word_counts", "top_words",
           "VocabTokenizer", "tokenize_with_vocab",
           "PII_PATTERNS", "Redactor", "redact", "contamination_pairs",
           "add_repetition", "canonicalize_urls",
           "token_ngram_contamination", "token_dup_ngram_stats",
           "remap_token_ids", "add_sentinel_tokens", "fim_transform",
           "shift_labels", "token_rarity"]


def add_token_count(ds: Dataset, text_column: str,
                    out: str = "n_tokens") -> Dataset:
    """Whitespace token count + a BPE-ish subword estimate (vectorized)."""

    def count(batch: pa.Table) -> pa.Table:
        words = pc.count_substring_regex(batch.column(text_column), r"\S+")
        # BPE-ish upper bound: words + punctuation marks + long-word splits
        # (every 6 chars of a word beyond the first 6 ~ one extra token)
        punct = pc.count_substring_regex(batch.column(text_column), r"[^\w\s]")
        longparts = pc.count_substring_regex(batch.column(text_column), r"\w{7,}")
        est = pc.add(pc.add(words, punct), longparts)
        batch = batch.append_column(out, words.cast(pa.int64()))
        return batch.append_column(out + "_bpe_est", est.cast(pa.int64()))

    return ds.map_batches(count, batch_format="pyarrow")


_STOPWORDS = ("the", "a", "an", "of", "to", "in", "and", "is", "it", "that")


def add_quality(ds: Dataset, text_column: str) -> Dataset:
    """Quality-scoring features: length, word stats, punctuation/stopword/
    digit ratios + a composite [0,1] score (heuristics in the spirit of
    Gopher/C4 quality filters, computed fully vectorized)."""
    stop_re = r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column(text_column)
        n_chars = pc.utf8_length(text).cast(pa.float64())
        n_words = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
        n_punct = pc.count_substring_regex(text, r"[^\w\s]").cast(pa.float64())
        n_stop = pc.count_substring_regex(text, stop_re).cast(pa.float64())
        n_digit = pc.count_substring_regex(text, r"\d").cast(pa.float64())
        safe_words = pc.max_element_wise(n_words, 1.0)
        safe_chars = pc.max_element_wise(n_chars, 1.0)
        mean_word_len = pc.divide(pc.subtract(n_chars, pc.subtract(n_words, 1.0)),
                                  safe_words)
        punct_ratio = pc.divide(n_punct, safe_chars)
        stop_ratio = pc.divide(n_stop, safe_words)
        digit_ratio = pc.divide(n_digit, safe_chars)
        # composite: long enough, has stopwords, not punctuation/digit soup
        len_ok = pc.if_else(pc.greater_equal(n_words, 10.0), 1.0, pc.divide(n_words, 10.0))
        stop_ok = pc.min_element_wise(pc.multiply(stop_ratio, 4.0), 1.0)
        punct_ok = pc.subtract(1.0, pc.min_element_wise(pc.multiply(punct_ratio, 4.0), 1.0))
        digit_ok = pc.subtract(1.0, pc.min_element_wise(pc.multiply(digit_ratio, 4.0), 1.0))
        quality = pc.multiply(pc.multiply(len_ok, pc.add(pc.multiply(stop_ok, 0.5), 0.5)),
                              pc.multiply(pc.add(pc.multiply(punct_ok, 0.5), 0.5),
                                          pc.add(pc.multiply(digit_ok, 0.5), 0.5)))
        for name, arr in (("n_chars_q", n_chars), ("n_words", n_words),
                          ("mean_word_len", mean_word_len),
                          ("punct_ratio", punct_ratio), ("stop_ratio", stop_ratio),
                          ("digit_ratio", digit_ratio), ("quality", quality)):
            batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(score, batch_format="pyarrow")


#: Gopher rule stopwords (Rae et al. 2021, "Scaling Language Models:
#: Methods, Analysis & Insights from Training Gopher", appendix A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(ds: Dataset, text_column: str, id_column: str,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 max_ellipsis_ratio: float = 0.3,
                 min_alpha_ratio: float = 0.8,
                 min_stop_hits: int = 2,
                 append: bool = False) -> Dataset:
    """Gopher-style quality rule suite (Rae et al. 2021 A1.1): per-rule
    feature columns plus the combined ``pass_gopher`` flag, fully
    vectorized (polars list kernels), shuffle-free.

    Engine/oracle float contract: every ratio is ONE IEEE float64 division
    of two exactly-computed integers, so the SQL oracle reproduces each
    value bit-for-bit.  Divergence from the paper, documented: the paper
    tests hash and ellipsis symbol ratios separately; this combines them
    into one ``symbol_ratio`` (sum of both counts over words).

    ``append=True`` keeps the input columns and appends the features
    (filter-in-place shape for pipelines); default projects to
    (id, features)."""
    import numpy as np

    def rules(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        s = pl.from_arrow(col).fill_null("")
        words = s.str.extract_all(r"[^\t\n\f\r ]+")
        n_words = words.list.len().cast(pl.Int64).to_numpy()
        word_chars = (words.list.eval(pl.element().str.len_chars()
                                      .cast(pl.Int64))
                      .list.sum().fill_null(0).to_numpy())
        alpha_words = (words.list.eval(pl.element().str
                                       .contains("[A-Za-z]").cast(pl.Int64))
                       .list.sum().fill_null(0).to_numpy())
        n_hash = s.str.count_matches("#", literal=True).cast(pl.Int64) \
            .to_numpy()
        n_ell = s.str.count_matches(r"\.\.\.").cast(pl.Int64).to_numpy()
        lines = s.str.split("\n")
        n_lines = lines.list.len().cast(pl.Int64).to_numpy()
        bullet = (lines.list.eval(pl.element().str.contains(r"^[-*]")
                                  .cast(pl.Int64))
                  .list.sum().fill_null(0).to_numpy())
        ell_end = (lines.list.eval(pl.element().str.contains(r"\.\.\.$")
                                   .cast(pl.Int64))
                   .list.sum().fill_null(0).to_numpy())
        stop_hits = np.zeros(len(s), dtype=np.int64)
        for w in GOPHER_STOPWORDS:
            stop_hits += s.str.contains(rf"(?i)\b{w}\b").cast(pl.Int64) \
                .to_numpy()
        safe_w = np.maximum(n_words, 1).astype(np.float64)
        safe_l = np.maximum(n_lines, 1).astype(np.float64)
        mean_word_len = word_chars.astype(np.float64) / safe_w
        symbol_ratio = (n_hash + n_ell).astype(np.float64) / safe_w
        alpha_ratio = alpha_words.astype(np.float64) / safe_w
        bullet_ratio = bullet.astype(np.float64) / safe_l
        ellipsis_ratio = ell_end.astype(np.float64) / safe_l
        ok = ((n_words >= min_words) & (n_words <= max_words)
              & (mean_word_len >= min_mean_word_len)
              & (mean_word_len <= max_mean_word_len)
              & (symbol_ratio <= max_symbol_ratio)
              & (bullet_ratio <= max_bullet_ratio)
              & (ellipsis_ratio <= max_ellipsis_ratio)
              & (alpha_ratio >= min_alpha_ratio)
              & (stop_hits >= min_stop_hits))
        cols = {
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            "bullet_ratio": pa.array(bullet_ratio, pa.float64()),
            "ellipsis_ratio": pa.array(ellipsis_ratio, pa.float64()),
            "stop_hits": pa.array(stop_hits, pa.int64()),
            "pass_gopher": pa.array(ok)}
        if append:
            for name, arr in cols.items():
                batch = batch.append_column(name, arr)
            return batch
        return pa.table({id_column: batch.column(id_column), **cols})

    return ds.map_batches(rules, batch_format="pyarrow")


#: fixed kernel order for strip_html — each is one RE2 pass, so the SQL
#: oracle replays the same chain with regexp_replace(..., 'g')
_HTML_STEPS = (
    # script/style blocks go first, WITH their content (RE2 has no
    # lookaround — dotall non-greedy is the RE2-compatible form)
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),                          # comments
    (r"</?[A-Za-z][^>]*>", " "),                       # any remaining tag
)
_HTML_ENTITIES = (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                  ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def strip_html(ds: Dataset, text_column: str, out: str | None = None,
               collapse_whitespace: bool = True) -> Dataset:
    """HTML/boilerplate stripping (the C4 extraction step): drop
    script/style blocks with their payload, comments, then all remaining
    tags; decode the six common entities; optionally collapse runs of
    whitespace.  Chained RE2 kernels (pc.replace_substring_regex) in a
    FIXED order — no HTML parser dependency, and the SQL oracle replays
    the identical chain byte-for-byte.  Malformed markup degrades
    gracefully (unclosed tags strip to the next '>'), it never raises."""
    out = out or text_column

    def strip(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        for pat, rep in _HTML_STEPS:
            col = pc.replace_substring_regex(col, pat, rep)
        for lit, rep in _HTML_ENTITIES:
            col = pc.replace_substring(col, lit, rep)
        if collapse_whitespace:
            # '^ | $' instead of a trim kernel: RE2 semantics are shared
            # with the SQL oracle byte-for-byte (trim kernels differ on
            # unicode whitespace classes)
            col = pc.replace_substring_regex(
                pc.replace_substring_regex(col, r"[\t\n\f\r ]+", " "),
                r"^ | $", "")
        i = batch.schema.get_field_index(out)
        if i >= 0:
            return batch.set_column(i, out, col)
        return batch.append_column(out, col)

    return ds.map_batches(strip, batch_format="pyarrow")


#: sentence = shortest run ending in [.!?]+, or the unterminated tail.
#: Leftmost-first alternation — identical in rust-regex (polars) and RE2
#: (DuckDB regexp_extract_all), so the SQL oracle reproduces the split.
SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+$"
_WS = " \t\n\f\r"


def split_sentences(ds: Dataset, text_column: str, id_column: str,
                    out: str = "sentence") -> Dataset:
    """Sentence segmentation: flat-map each doc to (id, sent_idx, sentence)
    rows — the unit step before sentence-level dedup / packing / chunking.
    Vectorized polars extract_all + explode; whitespace-trimmed; empty
    sentences dropped; shuffle-free."""
    import polars as pl

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        df = pl.DataFrame({
            "_id": pl.from_arrow(batch.column(id_column).combine_chunks()
                                 if isinstance(batch.column(id_column),
                                               pa.ChunkedArray)
                                 else batch.column(id_column)),
            "_s": pl.from_arrow(col).fill_null("")
                  .str.extract_all(SENTENCE_RE)})
        ex = (df.with_columns(pl.col("_s").list.eval(
                  pl.element().str.strip_chars(_WS)))
              .explode("_s")
              .with_columns(pl.col("_s").cum_count().over("_id")
                            .cast(pl.Int64).alias("_i") - 1)
              .filter(pl.col("_s").is_not_null() & (pl.col("_s") != "")))
        return pa.table({id_column: ex.get_column("_id").to_arrow(),
                         "sent_idx": ex.get_column("_i").to_arrow(),
                         out: ex.get_column("_s").to_arrow()
                         .cast(pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def dedup_lines_within_doc(ds: Dataset, text_column: str,
                           out: str | None = None,
                           count_out: str = "n_dup_lines_dropped",
                           sep: str = "\n") -> Dataset:
    """Within-document duplicate-line removal (the RefinedWeb /
    RedPajama-V2 in-document repetition scrub): keep the FIRST occurrence
    of each exact line inside a document, preserving order, and count the
    dropped repeats.  Complements :func:`~..dedup.drop_frequent_lines`
    (corpus-frequency boilerplate) — this one needs no corpus pass and no
    shuffle: pure per-batch polars list kernels
    (``is_first_distinct`` inside ``list.eval`` is per-list).  ``sep``
    generalizes to paragraph granularity (``"\\n\\n"``)."""
    out = out or text_column

    def scrub(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        s = pl.from_arrow(col).fill_null("")
        lines = s.str.split(sep)
        kept = lines.list.eval(
            pl.element().filter(pl.element().is_first_distinct()))
        text = kept.list.join(sep).to_arrow().cast(pa.string())
        dropped = (lines.list.len().cast(pl.Int64)
                   - kept.list.len().cast(pl.Int64)).to_arrow() \
            .cast(pa.int64())
        i = batch.schema.get_field_index(out)
        batch = (batch.set_column(i, out, text) if i >= 0
                 else batch.append_column(out, text))
        return batch.append_column(count_out, dropped)

    return ds.map_batches(scrub, batch_format="pyarrow")


#: C4 line-retention: terminal punctuation at line end (Raffel et al.
#: 2020 §2.2 — period, exclamation, question mark, or end quotation).
C4_TERMINAL_RE = r'[.!?"]$'


def c4_rules(ds: Dataset, text_column: str, id_column: str,
             min_line_words: int = 3, min_sentences: int = 5,
             blocklist: tuple[str, ...] = (),
             append: bool = False) -> Dataset:
    """C4 cleaning-rule suite (Raffel et al. 2020 §2.2): line-level
    retention (terminal punctuation + >= ``min_line_words`` words + no
    'javascript') and page-level flags (>= ``min_sentences`` sentences in
    the retained text, no 'lorem ipsum', no curly brace, no blocklisted
    word).  Emits the retained text (``text_clean``), per-rule features,
    and the combined ``pass_c4`` flag.  Fully vectorized (polars list
    kernels over split lines), shuffle-free; sentence counting reuses the
    pinned :data:`SENTENCE_RE` (leftmost-first parity between rust-regex
    and RE2, so the SQL oracle reproduces every count exactly).

    Reference parity anchor: the quality-rule family of the validator
    suite (reference test/malli/core_test.cljc golden-value style);
    the rule set itself is public C4.  Complements
    :func:`gopher_rules` (Gopher A1.1) — real corpus prep runs both."""
    bad_res = [rf"(?i)\b{re.escape(w)}\b" for w in blocklist]

    def rules(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        s = pl.from_arrow(col).fill_null("")
        lines = s.str.split("\n")
        kept = lines.list.eval(pl.element().filter(
            pl.element().str.contains(C4_TERMINAL_RE)
            & (pl.element().str.count_matches(r"\S+")
               >= min_line_words)
            & ~pl.element().str.contains(r"(?i)\bjavascript\b")))
        n_lines = lines.list.len().cast(pl.Int64).to_numpy()
        n_kept = kept.list.len().cast(pl.Int64).to_numpy()
        kept_text = kept.list.join("\n")
        n_sent = kept_text.str.count_matches(SENTENCE_RE) \
            .cast(pl.Int64).to_numpy()
        has_lorem = s.str.contains(r"(?i)lorem ipsum").to_numpy()
        has_brace = s.str.contains("{", literal=True).to_numpy()
        has_bad = np.zeros(len(s), dtype=bool)
        for pat in bad_res:
            has_bad |= s.str.contains(pat).to_numpy()
        ok = ((n_sent >= min_sentences)
              & ~has_lorem & ~has_brace & ~has_bad)
        cols = {
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "has_lorem_ipsum": pa.array(has_lorem),
            "has_brace": pa.array(has_brace),
            "has_bad_word": pa.array(has_bad),
            "pass_c4": pa.array(ok),
            "text_clean": kept_text.to_arrow().cast(pa.string())}
        if append:
            for name, arr in cols.items():
                batch = batch.append_column(name, arr)
            return batch
        return pa.table({id_column: batch.column(id_column), **cols})

    return ds.map_batches(rules, batch_format="pyarrow")


def normalize_unicode(ds: Dataset, text_column: str,
                      out: str | None = None, form: str = "NFC") -> Dataset:
    """Unicode normalization (NFC default — the dedup/tokenizer
    pre-pass: visually-identical byte sequences collapse to one form, so
    hash dedup and vocab building see them as equal).  Per-string
    ``unicodedata.normalize`` C calls (media-probe cost class); NFC
    agrees byte-for-byte with DuckDB's ``nfc_normalize`` (the oracle);
    NFKC/NFD/NFKD available for callers."""
    import unicodedata
    out = out or text_column

    def norm(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        fixed = pa.array(
            [None if t is None else unicodedata.normalize(form, t)
             for t in texts], pa.string())
        i = batch.schema.get_field_index(out)
        if i >= 0:
            return batch.set_column(i, out, fixed)
        return batch.append_column(out, fixed)

    return ds.map_batches(norm, batch_format="pyarrow")


def add_compression_ratio(ds: Dataset, text_column: str, id_column: str,
                          level: int = 6) -> Dataset:
    """Compressibility quality signal: DEFLATE output bytes / input bytes
    per document (the CCNet/RedPajama-style "gibberish and boilerplate
    compress differently from prose" heuristic — highly repetitive or
    machine-generated text lands far from the prose band).

    zlib at a FIXED level is the pinned primitive (deterministic for a
    given zlib build, like polars' xxhash for the dedup family), so the
    expected output is pinned by golden fixture, not SQL.  Per-doc loop is
    one C call per document — same cost class as the media header probe;
    ratio is ONE float64 division of two exact ints."""
    import zlib

    def compress(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        n_bytes, n_comp = [], []
        for t in texts:
            raw = (t or "").encode("utf-8")
            n_bytes.append(len(raw))
            n_comp.append(len(zlib.compress(raw, level)))
        nb = pa.array(n_bytes, pa.int64())
        nc = pa.array(n_comp, pa.int64())
        import numpy as np
        ratio = (np.asarray(n_comp, dtype=np.float64)
                 / np.maximum(np.asarray(n_bytes, dtype=np.float64), 1.0))
        return pa.table({id_column: batch.column(id_column),
                         "n_bytes": nb, "n_compressed": nc,
                         "compression_ratio": pa.array(ratio, pa.float64())})

    return ds.map_batches(compress, batch_format="pyarrow")


#: fixed-point scale for the entropy log table (same 2^40 trick as DSIR /
#: PageRank: quantized logs make the per-doc reduction an integer sum —
#: associative, so batch-split- and partition-invariant)
ENTROPY_SCALE = 1 << 40


def _qlog_table(max_c: int) -> np.ndarray:
    """q[c] = floor(ln(c) * 2^40 + 0.5) for c in 0..max_c (q[0] unused).
    Scalar ``math.log`` per distinct count (tiny loop — counts, not rows):
    numpy's SIMD log is NOT guaranteed bit-identical to libm, and the
    golden fixture is defined in terms of ``math.log``."""
    import math
    q = np.zeros(max_c + 1, dtype=np.int64)
    for c in range(2, max_c + 1):  # ln(1) == 0
        q[c] = int(math.floor(math.log(c) * ENTROPY_SCALE + 0.5))
    return q


def add_entropy(ds: Dataset, text_column: str, id_column: str) -> Dataset:
    """Unigram word-entropy quality signal per document:
    ``H = ln(n) - (1/n) * sum_w c_w * ln(c_w)`` (nats) over whitespace
    words — low entropy flags repetitive/boilerplate text (keyword-stuffed
    or template pages), complementing :func:`add_compression_ratio`'s
    byte-level view and :func:`add_repetition`'s top-gram view.

    Bit-reproducibility: logs come from the quantized table
    ``q(c) = floor(ln(c) * 2^40 + 0.5)`` (scalar libm), so the per-doc sum
    ``ent_q = n * q(n) - sum c_w * q(c_w)`` is an EXACT int64 — immune to
    float accumulation order — and ``entropy`` is the single IEEE division
    ``float(ent_q) / float(n * 2^40)``.  Pinned by golden fixture
    (tools/make_golden.entropy_ref: independent Counter-per-doc loop);
    not SQL because DuckDB's ``ln`` is not guaranteed bit-identical to
    libm under quantization.

    Empty / whitespace-only docs: ``n_words = 0``, ``ent_q = 0``,
    ``entropy = 0.0``.

    Scale shape: map-only (no corpus pass, no shuffle) — one polars
    extract_all + explode + two group_bys per batch; the log table is
    sized to the batch's max count (tiny: distinct counts, not rows).
    Overflow bound: n * q(n) < 2^63 holds to n ~ 3e5 words per doc with
    q(n) <= ln(3e5) * 2^40 ~ 1.4e13.
    """
    import polars as pl

    def entropy(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        s = pl.from_arrow(batch.column(text_column)).fill_null("")
        words = pl.DataFrame({
            "__row": pl.int_range(n_rows, eager=True, dtype=pl.Int64),
            "w": s.str.extract_all(r"[^\t\n\f\r ]+")}).explode("w")
        counts = (words.drop_nulls("w")
                  .group_by(["__row", "w"]).len(name="c"))
        n_out = np.zeros(n_rows, dtype=np.int64)
        ent_q = np.zeros(n_rows, dtype=np.int64)
        if counts.height:
            c = counts.get_column("c").cast(pl.Int64).to_numpy()
            q = _qlog_table(int(c.max()))
            per_row = (counts.with_columns(
                cq=pl.Series(c * q[c]))
                .group_by("__row")
                .agg(pl.col("c").sum().alias("n"),
                     pl.col("cq").sum().alias("s")))
            rows = per_row.get_column("__row").to_numpy()
            n = per_row.get_column("n").cast(pl.Int64).to_numpy()
            sm = per_row.get_column("s").cast(pl.Int64).to_numpy()
            qn = _qlog_table(int(n.max()))
            n_out[rows] = n
            ent_q[rows] = n * qn[n] - sm
        denom = np.maximum(n_out, 1).astype(np.float64) * float(ENTROPY_SCALE)
        ent = ent_q.astype(np.float64) / denom
        batch = batch.append_column("n_words", pa.array(n_out, pa.int64()))
        batch = batch.append_column("ent_q", pa.array(ent_q, pa.int64()))
        return batch.append_column("entropy", pa.array(ent, pa.float64()))

    return ds.map_batches(entropy, batch_format="pyarrow")


#: tiny per-language marker-word profiles (public common-word lists)
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "that", "it", "for", "with", "was"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "por", "una", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "zu"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que", "pour", "qui"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这", "中", "不"),
}


class LangID:
    """N-gram/marker-word language heuristic (stateful: regexes compiled once
    per actor — the 'load once, use many' actor-pool pattern)."""

    def __init__(self, text_column: str, out: str = "lang_pred",
                 default: str = "en"):
        self.text_column = text_column
        self.out = out
        self.default = default
        self.patterns = {
            lang: r"(?i)\b(?:" + "|".join(map(re.escape, words)) + r")\b"
            if lang != "zh" else "[" + "".join(words) + "]"
            for lang, words in _LANG_MARKERS.items()
        }
        self.langs = sorted(self.patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_column)
        n = batch.num_rows
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            hits = pc.count_substring_regex(text, self.patterns[lang])
            scores[:, i] = np.asarray(pc.fill_null(hits, 0).to_numpy(zero_copy_only=False),
                                      dtype=np.float64)
        best = scores.argmax(axis=1)
        no_signal = scores.max(axis=1) == 0
        preds = np.array(self.langs, dtype=object)[best]
        preds[no_signal] = self.default
        return batch.append_column(self.out, pa.array(preds, type=pa.string()))


from . import concurrency_kwargs as _conc


def add_lang_id(ds: Dataset, text_column: str, concurrency=None) -> Dataset:
    from . import cached_stage
    return ds.map_batches(cached_stage(LangID, text_column=text_column),
                          batch_format="pyarrow", **_conc(concurrency))


def word_counts(ds: Dataset, text_column: str,
                lowercase: bool = False) -> Dataset:
    """Corpus word-frequency table (word, cnt) — the vocabulary builder.

    Map-side combine: each batch tokenizes vectorized (polars extract_all +
    explode) and pre-aggregates its own counts, so the groupby shuffles one
    row per DISTINCT word per block, never one per token (the same
    hot-key-safe shape as dedup's exact_dup_groups)."""
    from ray.data.aggregate import Sum

    def batch_counts(batch: pa.Table) -> pa.Table:
        import polars as pl
        s = pl.from_arrow(batch.column(text_column).combine_chunks()
                          if isinstance(batch.column(text_column), pa.ChunkedArray)
                          else batch.column(text_column))
        if lowercase:
            s = s.str.to_lowercase()
        # explicit ASCII non-space class: rust-regex \S is unicode-aware,
        # RE2 (the SQL oracle + pc kernels) is not — match RE2
        words = s.str.extract_all(r"[^\t\n\f\r ]+").explode().drop_nulls()
        if len(words) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        vc = words.value_counts()  # columns: [word-ish name, "count"]
        name = vc.columns[0]
        return pa.table({"word": vc[name].to_arrow().cast(pa.string()),
                         "cnt": vc["count"].to_arrow().cast(pa.int64())})

    partial = ds.map_batches(batch_counts, batch_format="pyarrow")
    return partial.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))


def word_stats(ds: Dataset, text_column: str) -> "pa.Table":
    """(word, cnt, df) in ONE corpus pass — the fused stats table feeding
    BOTH :func:`corpus_freq_score` (needs cnt = total occurrences) and
    :func:`tfidf_keywords` (needs df = documents containing).  Composing
    the two scorers used to cost two full stats scans; pass this table to
    their ``vocab_table=`` / ``df_table=`` parameters and the corpus is
    scanned once.

    Same map-side-combine shape as word_counts/document_frequencies: each
    batch explodes once and emits one (word, cnt, df) partial row per
    distinct word per block; one groupby sums both columns."""
    import polars as pl
    from ray.data.aggregate import Sum

    def batch_stats(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = (pl.from_arrow(col).fill_null("")
                 .str.extract_all(r"[^\t\n\f\r ]+"))
        exploded = (pl.DataFrame({"w": words})
                    .with_row_index("doc")
                    .explode("w")
                    .drop_nulls("w"))
        if exploded.height == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        cnt = exploded.group_by("w").agg(pl.len().cast(pl.Int64)
                                         .alias("cnt"))
        df = (exploded.unique(subset=["doc", "w"])
              .group_by("w").agg(pl.len().cast(pl.Int64).alias("df")))
        stats = cnt.join(df, on="w", how="inner")  # identical key sets
        return pa.table({"word": stats.get_column("w").to_arrow()
                         .cast(pa.string()),
                         "cnt": stats.get_column("cnt").to_arrow(),
                         "df": stats.get_column("df").to_arrow()})

    out = (ds.map_batches(batch_stats, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("cnt", alias_name="cnt"),
                                      Sum("df", alias_name="df")))
    parts = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64()),
                         "df": pa.array([], type=pa.int64())})
    return pa.concat_tables(parts)


def top_words(ds: Dataset, text_column: str, k: int = 100,
              lowercase: bool = False) -> Dataset:
    """Top-k vocabulary by frequency (ties broken by word — deterministic)."""
    counts = word_counts(ds, text_column, lowercase=lowercase)
    return counts.sort(["cnt", "word"], descending=[True, False]).limit(k)


class VocabTokenizer:
    """Stateful stage: broadcast word->id vocabulary held once per worker;
    per batch, vectorized split + explode + dict mapping (polars
    replace_strict) — text rows flat-map to (id, pos, token_id) rows.

    The two-phase learn-then-apply shape of a real training-data tokenizer:
    build the vocab with ``top_words`` (one groupby over the corpus),
    ``ray.put`` it once, stream the corpus through this stage.  ``pos`` is
    1-based (matches SQL generate_subscripts).
    """

    def __init__(self, vocab_ref, text_column: str, id_column: str,
                 unk_id: int = 0):
        import ray
        vocab = (ray.get(vocab_ref)
                 if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        self.vocab = dict(vocab)
        self.text_column = text_column
        self.id_column = id_column
        self.unk_id = unk_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column(self.id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch.column(self.text_column)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pl.from_arrow(text).fill_null("").str.extract_all(r"[^\t\n\f\r ]+")
        counts = words.list.len().to_numpy().astype(np.int64)
        flat = words.explode().drop_nulls()
        token_ids = flat.replace_strict(
            self.vocab, default=self.unk_id, return_dtype=pl.Int64).to_numpy()
        # repeat doc ids per word; per-doc 1-based positions, vectorized
        total = int(counts.sum())
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts) + 1
        import pyarrow.compute as pc
        return pa.table({
            self.id_column: pc.take(ids, pa.array(doc_idx, type=pa.int64())),
            "pos": pa.array(pos),
            "token_id": pa.array(token_ids, type=pa.int64())})


def tokenize_with_vocab(ds: Dataset, text_column: str, id_column: str,
                        vocab: dict, unk_id: int = 0,
                        concurrency=None) -> Dataset:
    """Apply a learned word->id vocabulary over the corpus (broadcast once,
    flat-map to token rows)."""
    import ray
    from . import cached_stage, concurrency_kwargs
    ref = ray.put(dict(vocab))
    return ds.map_batches(
        cached_stage(VocabTokenizer, vocab_ref=ref, text_column=text_column,
                     id_column=id_column, unk_id=unk_id),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class Fingerprinter:
    """Winnowed rolling-hash document fingerprint (Rabin-Karp over word
    hashes + window minima — Schleimer et al. 2003 'winnowing')."""

    def __init__(self, text_column: str, out: str = "fingerprint",
                 ngram: int = 4, window: int = 8):
        self.text_column = text_column
        self.out = out
        self.ngram = ngram
        self.window = window
        self.word_re = re.compile(r"[^\t\n\f\r ]+")  # RE2-compatible ASCII \S

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized winnowing: polars word extraction, one
        flat rolling-hash pass, segmented sliding-window minima and a
        lexsort-deduped segmented XOR — no per-document Python loop
        (bitwise-identical to the per-doc construction, tested)."""
        import polars as pl
        from numpy.lib.stride_tricks import sliding_window_view

        n_docs = batch.num_rows
        if n_docs == 0:
            return batch.append_column(self.out,
                                       pa.array([], type=pa.uint64()))
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(col).fill_null("")
        words = s.str.extract_all(self.word_re.pattern)
        wc = words.list.len().to_numpy().astype(np.int64)
        # empty docs count one "" word (explode emits a null row for an
        # empty list — fill_null restores the "" placeholder)
        counts = np.maximum(wc, 1)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        h = (words.explode(empty_as_null=True).fill_null("").hash(seed=13)
             .to_numpy().astype(np.uint64))
        B = np.uint64(1099511628211)
        k = self.ngram
        total = int(offsets[-1])
        # per-doc gram counts: n-k+1 rolling k-grams, or ONE wrap-sum gram
        # for docs shorter than k words
        long_mask = counts >= k
        gc = np.where(long_mask, counts - k + 1, 1)
        g_off = np.concatenate(([0], np.cumsum(gc)))
        flat_grams = np.empty(int(g_off[-1]), dtype=np.uint64)
        if long_mask.any():
            # one rolling polynomial pass over the flat word hashes; gram
            # windows that straddle a doc boundary are simply never selected
            G = np.zeros(total - k + 1, dtype=np.uint64)
            for j in range(k):
                G = G * B + h[j:total - k + 1 + j]
            lc = gc[long_mask]
            intra = np.arange(int(lc.sum())) - np.repeat(np.cumsum(lc) - lc, lc)
            flat_grams[np.repeat(g_off[:-1][long_mask], lc) + intra] = \
                G[np.repeat(offsets[:-1][long_mask], lc) + intra]
        if (~long_mask).any():
            sums = np.add.reduceat(h, offsets[:-1])
            flat_grams[g_off[:-1][~long_mask]] = sums[~long_mask]
        # winnowing: per-doc sliding-window minima (window w=min(window, g);
        # g<=w docs contribute their single segment min)
        W = self.window
        if W <= 1:
            mins_flat = flat_grams
            m_counts = gc
        else:
            m_counts = np.where(gc > W, gc - W + 1, 1)
            m_off = np.concatenate(([0], np.cumsum(m_counts)))
            mins_flat = np.empty(int(m_off[-1]), dtype=np.uint64)
            seg_min = np.minimum.reduceat(flat_grams, g_off[:-1])
            small = gc <= W
            mins_flat[m_off[:-1][small]] = seg_min[small]
            big = ~small
            if big.any():
                SW = sliding_window_view(flat_grams, W).min(axis=1)
                bc = m_counts[big]
                intra = np.arange(int(bc.sum())) - np.repeat(
                    np.cumsum(bc) - bc, bc)
                mins_flat[np.repeat(m_off[:-1][big], bc) + intra] = \
                    SW[np.repeat(g_off[:-1][big], bc) + intra]
        # XOR of UNIQUE window minima per doc: lexsort by (doc, value),
        # drop in-doc duplicates, segmented bitwise_xor.reduceat
        doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), m_counts)
        order = np.lexsort((mins_flat, doc_ids))
        sm = mins_flat[order]
        sd = doc_ids[order]
        keep = np.empty(len(sm), dtype=bool)
        keep[0] = True
        keep[1:] = (sd[1:] != sd[:-1]) | (sm[1:] != sm[:-1])
        km, kd = sm[keep], sd[keep]
        starts = np.searchsorted(kd, np.arange(n_docs, dtype=np.int64))
        out = np.bitwise_xor.reduceat(km, starts)
        return batch.append_column(self.out, pa.array(out, type=pa.uint64()))


def add_fingerprint(ds: Dataset, text_column: str, concurrency=None) -> Dataset:
    from . import cached_stage
    return ds.map_batches(cached_stage(Fingerprinter, text_column=text_column),
                          batch_format="pyarrow", **_conc(concurrency))


# -- PII / pattern redaction -------------------------------------------------

#: default scrub patterns (RE2 — same dialect in pyarrow and DuckDB):
#: emails, international-ish phone numbers, IPv4 addresses.
PII_PATTERNS = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    r"\+?\d[\d\-\(\) ]{7,}\d",
    r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
)


class Redactor:
    """Vectorized regex redaction (PII scrub for training corpora).

    A chain of ``pc.replace_substring_regex`` kernels — one pass per
    pattern, zero Python per row. Patterns are fixed at construction
    (compile-once per actor; the malli analog is a :re-driven
    ``:decode/redact`` transformer, src/malli/transform.cljc:411-426)."""

    def __init__(self, text_column: str, patterns=PII_PATTERNS,
                 replacement: str = "[REDACTED]", out: str | None = None):
        self.text_column = text_column
        self.patterns = tuple(patterns)
        self.replacement = replacement
        self.out = out or text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_column)
        if pa.types.is_null(col.type):  # an all-null block types as null
            col = col.cast(pa.string())
        for pat in self.patterns:
            col = pc.replace_substring_regex(col, pat, self.replacement)
        if self.out == self.text_column:
            return batch.set_column(
                batch.schema.get_field_index(self.text_column),
                self.text_column, col)
        return batch.append_column(self.out, col)


def normalize_text(ds: Dataset, text_column: str, out: str | None = None,
                   lowercase: bool = True, collapse_whitespace: bool = True,
                   strip_control: bool = True, trim: bool = True,
                   concurrency=None) -> Dataset:
    """Canonical text normalization (the first pass of most corpus-prep
    pipelines): strip C0/DEL control characters, collapse whitespace runs
    to single spaces, trim, lowercase — all chained Arrow kernels, zero
    Python per row, shuffle-free.  Each step is SQL-reproducible
    (regexp_replace / trim / lower), so the pass sits under the oracle
    gate; kernel order is fixed (control -> collapse -> trim -> lower) and
    documented so two runs or two engines agree byte-for-byte."""

    def norm(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        if strip_control:
            col = pc.replace_substring_regex(
                col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
        if collapse_whitespace:
            col = pc.replace_substring_regex(col, r"[\t\n\f\r ]+", " ")
        if trim:
            col = pc.utf8_trim_whitespace(col)
        if lowercase:
            col = pc.utf8_lower(col)
        name = out or text_column
        if name == text_column:
            return batch.set_column(
                batch.schema.get_field_index(text_column), text_column, col)
        return batch.append_column(name, col)

    return ds.map_batches(norm, batch_format="pyarrow", **_conc(concurrency))


def extract_urls(ds: Dataset, text_column: str, id_column: str,
                 pattern: str = r"https?://[^\t\n\f\r ]+",
                 out: str = "url", concurrency=None) -> Dataset:
    """Flat-map URL extraction: one output row per URL occurrence
    (id, url) — polars ``str.extract_all`` + explode (vectorized, RE2-class
    pattern so DuckDB's regexp_extract_all sees the same matches).
    Shuffle-free expansion; docs without URLs emit nothing."""

    def explode(batch: pa.Table) -> pa.Table:
        import polars as pl
        id_type = batch.schema.field(id_column).type
        texts = batch.column(text_column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s = pl.from_arrow(texts).fill_null("")
        df = pl.DataFrame({
            "id": np.arange(batch.num_rows, dtype=np.int64),
            out: s.str.extract_all(pattern)}).explode(out)
        df = df.filter(pl.col(out).is_not_null())
        idx = pa.array(df.get_column("id").to_numpy(), type=pa.int64())
        return pa.table({
            id_column: pc.take(batch.column(id_column), idx),
            out: pa.array(df.get_column(out).to_list(), type=pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow",
                          **_conc(concurrency))


def canonicalize_urls(ds: Dataset, url_column: str,
                      out: str = "canonical_url",
                      concurrency=None) -> Dataset:
    """Append a canonical form of ``url_column`` — the key for URL-level
    corpus dedup (Common-Crawl-style "one document per canonical URL").
    Fixed, documented kernel order so two runs (and the SQL oracle's
    regexp_replace/regexp_extract chain) agree byte-for-byte:

      1. strip the fragment (``#...``) and the query string (``?...``);
      2. split ``scheme://host path`` (rows that do not look like a URL
         get a null canonical form);
      3. lowercase the scheme and host, strip one leading ``www.`` from
         the host, strip trailing ``/`` runs from the path — the path's
         CASE is preserved (paths are case-sensitive; hosts are not).

    All chained Arrow kernels (RE2) — zero Python per row, shuffle-free.
    Query parameters are stripped wholesale by design (the aggressive
    variant); keep-list normalization of params is a different op."""

    def canon(batch: pa.Table) -> pa.Table:
        col = batch.column(url_column)
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.replace_substring_regex(col, r"#.*$", "")
        u = pc.replace_substring_regex(u, r"\?.*$", "")
        parts = pc.extract_regex(
            u, r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<h>[^/]*)(?P<p>.*)$")
        scheme = pc.utf8_lower(pc.struct_field(parts, "s"))
        host = pc.replace_substring_regex(
            pc.utf8_lower(pc.struct_field(parts, "h")), r"^www\.", "")
        path = pc.replace_substring_regex(
            pc.struct_field(parts, "p"), r"/+$", "")
        canonical = pc.binary_join_element_wise(
            scheme, pa.scalar("://"), host, path, pa.scalar(""))
        return batch.append_column(out, canonical)

    return ds.map_batches(canon, batch_format="pyarrow",
                          **_conc(concurrency))


def bm25_topk(ds: Dataset, text_column: str, id_column: str,
              queries: dict[int, str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> Dataset:
    """BM25 top-k retrieval (Robertson/Lucene formulation:
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``) for a small fixed query
    set — the sparse sibling of ``similarity.brute_topk``.

    Two streaming passes, both shuffle-light:
      1. corpus stats — one row of partials per BATCH (n_docs, sum of
         doc lengths, per-query-term document frequencies via exact
         token equality), reduced on the driver (O(batches) rows);
      2. scoring — per-term tf via the vectorized polars
         ``list.count_matches`` (exact whole-token equality, NOT
         substring), per-batch top-k per query, then the skew-safe
         ``analytics.top_k_per_group`` finisher: at most k x |queries|
         rows shuffle per batch.

    Float contract (for the golden fixture): idf is a driver-side
    ``math.log`` scalar per term; per-doc score accumulates in term
    order as ``idf * (tf * (k1+1)) / (tf + k1*((1-b) + (b*dl)/avgdl))``
    — every op is IEEE float64 elementwise, so an independent reference
    with the same operation order reproduces scores bit-for-bit."""
    import math

    word_re = r"[^\t\n\f\r ]+"
    qterms = {qid: q.split() for qid, q in queries.items()}
    terms = sorted({t for ts in qterms.values() for t in ts})

    def _words(batch: pa.Table):
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        return pl.from_arrow(col).fill_null("").str.extract_all(word_re)

    def partials(batch: pa.Table) -> pa.Table:
        words = _words(batch)
        row = {"n_docs": [batch.num_rows],
               "sum_dl": [int(words.list.len().sum() or 0)]}
        for i, t in enumerate(terms):
            row[f"df_{i}"] = [int((words.list.count_matches(t) > 0).sum())]
        return pa.table(row)

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .to_pandas().sum())
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = float(stats["sum_dl"]) / float(n_docs)
    idf = {t: math.log(1.0 + (n_docs - float(stats[f"df_{i}"]) + 0.5)
                       / (float(stats[f"df_{i}"]) + 0.5))
           for i, t in enumerate(terms)}

    def score(batch: pa.Table) -> pa.Table:
        words = _words(batch)
        dl = words.list.len().to_numpy().astype(np.float64)
        norm = k1 * ((1.0 - b) + (b * dl) / avgdl)
        tf_cache = {t: words.list.count_matches(t).to_numpy()
                    .astype(np.float64) for t in terms}
        qid_out, doc_out, score_out = [], [], []
        docs = batch.column(id_column)
        for qid, ts in qterms.items():
            sc = np.zeros(batch.num_rows, dtype=np.float64)
            for t in ts:
                tf = tf_cache[t]
                sc = sc + idf[t] * (tf * (k1 + 1.0)) / (tf + norm)
            top = min(k, len(sc))
            # per-batch candidate cut: top-k by (score desc, doc asc)
            idx = np.lexsort((docs.to_numpy(zero_copy_only=False),
                              -sc))[:top]
            qid_out.append(np.full(top, qid, dtype=np.int64))
            doc_out.append(idx)
            score_out.append(sc[idx])
        take = pa.array(np.concatenate(doc_out))
        return pa.table({
            "query_id": pa.array(np.concatenate(qid_out), pa.int64()),
            id_column: pc.take(docs, take),
            "score": pa.array(np.concatenate(score_out), pa.float64())})

    from .analytics import top_k_per_group
    cands = ds.map_batches(score, batch_format="pyarrow")
    return top_k_per_group(cands, "query_id", ["score", id_column], k,
                           rank_col="rank")


#: host capture for domain filtering — group 1 is the authority up to
#: the first path/port/query/fragment delimiter (RE2/rust-regex shared).
URL_HOST_RE = r"https?://([^/\t\n\f\r :?#]+)"


def domain_filter(ds: Dataset, text_column: str, id_column: str,
                  blocklist: tuple[str, ...],
                  mode: str = "flag",
                  url_pattern: str = URL_HOST_RE,
                  strip_www: bool = True) -> Dataset:
    """URL-domain blocklist filtering (the UT1-blacklist step of
    C4/RefinedWeb-style curation): extract every URL host in the text,
    normalize (lowercase, optional leading ``www.`` strip), and match the
    blocklist by exact domain OR dot-suffix (``ads.bad.example`` matches
    blocked ``bad.example``).  ``mode="flag"`` emits per-doc counts +
    ``blocked``; ``mode="drop"`` keeps only clean docs (input columns
    pass through).  Vectorized polars list kernels, shuffle-free.

    The matcher scales to 1e6+-entry blocklists (the UT1 list is ~4M
    domains): entries are label-reversed (``bad.example`` ->
    ``example.bad.``), MINIMALIZED (an entry covered by a shorter
    blocked suffix is dropped — the matched-host set is unchanged) and
    sorted once per actor; each extracted host label-reverses and ONE
    ``np.searchsorted`` + an elementwise ``startswith`` against its
    single sorted predecessor decides membership — O(log n) per host,
    never a per-entry pass.  Completeness of the single-predecessor
    check: if minimal entry e is a '.'-terminated prefix of query q,
    every sorted entry in (e, q] starts with e and is therefore
    redundant, so e IS the predecessor.  ``n_blocked_urls`` counts each
    blocked HOST once, however many entries cover it — the SQL
    ``list_filter``-count semantics."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"domain_filter: unknown mode {mode!r}")
    bl = tuple(b.lower() for b in blocklist)
    rev = sorted({".".join(reversed(b.split("."))) + "." for b in bl})
    minimal: "list[str]" = []
    for e in rev:
        if not minimal or not e.startswith(minimal[-1]):
            minimal.append(e)
    keys = np.array(minimal, dtype=np.str_)

    def hosts_of(s):
        import polars as pl
        h = s.str.extract_all(url_pattern).list.eval(
            pl.element().str.extract(url_pattern, 1).str.to_lowercase())
        if strip_www:
            h = h.list.eval(pl.element().str.replace(r"^www\.", ""))
        return h

    def flags(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        h = hosts_of(pl.from_arrow(col).fill_null(""))
        n_urls = h.list.len().cast(pl.Int64).to_numpy()
        n_blocked = np.zeros(batch.num_rows, dtype=np.int64)
        if len(keys):
            ex = (pl.DataFrame({"row": np.arange(batch.num_rows,
                                                 dtype=np.int64),
                                "h": h})
                  .explode("h").drop_nulls("h")
                  .with_columns(q=pl.col("h").str.split(".")
                                .list.reverse().list.join(".") + "."))
            rows = ex.get_column("row").to_numpy()
            q = ex.get_column("q").to_numpy().astype(np.str_)
            if len(q):
                idx = np.searchsorted(keys, q, side="right") - 1
                ok = idx >= 0
                match = np.zeros(len(q), dtype=bool)
                match[ok] = np.char.startswith(q[ok], keys[idx[ok]])
                n_blocked = np.bincount(
                    rows[match],
                    minlength=batch.num_rows).astype(np.int64)
        if mode == "drop":
            return batch.filter(pa.array(n_blocked == 0))
        return pa.table({
            id_column: batch.column(id_column),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_blocked_urls": pa.array(n_blocked, pa.int64()),
            "blocked": pa.array(n_blocked > 0)})

    return ds.map_batches(flags, batch_format="pyarrow")


def redact(ds: Dataset, text_column: str, patterns=PII_PATTERNS,
           replacement: str = "[REDACTED]", out: str | None = None,
           concurrency=None) -> Dataset:
    from . import cached_stage
    return ds.map_batches(
        cached_stage(Redactor, text_column=text_column, patterns=patterns,
                     replacement=replacement, out=out),
        batch_format="pyarrow", **_conc(concurrency))


# -- benchmark decontamination ----------------------------------------------

class _ContaminationScan:
    """Flag documents containing any broadcast probe string (benchmark
    decontamination). One vectorized ``pc.match_substring`` literal scan per
    probe per batch — right for O(10-100) probes; a large benchmark suite
    should compile the probes into one Aho-Corasick automaton per actor
    instead (same stage signature, different __call__)."""

    def __init__(self, id_column: str, text_column: str, probes_ref):
        import ray
        probes = (ray.get(probes_ref)
                  if isinstance(probes_ref, ray.ObjectRef) else probes_ref)
        self.id_column = id_column
        self.text_column = text_column
        self.probes = list(probes)  # [(probe_id, literal_string), ...]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_column)
        if pa.types.is_null(text.type):  # an all-null block types as null
            text = text.cast(pa.string())
        ids = batch.column(self.id_column)
        id_chunks, probe_chunks = [], []
        for probe_id, probe in self.probes:
            mask = pc.match_substring(text, probe)
            hit = ids.filter(mask)
            if len(hit):
                id_chunks.append(hit)
                probe_chunks.append(pa.array([probe_id] * len(hit)))
        if not id_chunks:
            return pa.table({self.id_column: pa.array([], type=ids.type),
                             "probe_id": pa.array(
                                 [], type=pa.array(
                                     [p for p, _ in self.probes[:1]] or [0]).type)})
        return pa.table({self.id_column: pa.concat_arrays(
                             [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                              else c for c in id_chunks]),
                         "probe_id": pa.concat_arrays(probe_chunks)})


class _ContaminationScanRK:
    """Multi-pattern literal scan via ONE vectorized Rabin-Karp anchor pass
    per batch (the automaton alternative to per-probe regex scans).

    Cost is O(batch_bytes * anchor_len) numpy work REGARDLESS of probe
    count, vs one C substring scan PER probe in ``_ContaminationScan`` —
    the right shape for large benchmark suites (10^3-10^6 probes).  Exact
    (no false positives/negatives): every anchor-hash candidate is
    confirmed byte-for-byte inside the owning document.  Build (anchor
    hashing, bucket dict) happens once per actor in ``__init__``.

    anchor = first min(min probe length, 16) BYTES of each probe; the
    rolling hash is evaluated at every byte offset of the batch text, so a
    probe occurrence always presents its anchor.  Candidates straddling a
    document boundary fail the fits-in-document check.
    """

    _B = 1099511628211  # FNV prime, matching the winnowing hash base

    def __init__(self, id_column: str, text_column: str, probes_ref):
        import ray
        probes = (ray.get(probes_ref)
                  if isinstance(probes_ref, ray.ObjectRef) else probes_ref)
        self.id_column = id_column
        self.text_column = text_column
        enc = [(pid, p.encode("utf-8") if isinstance(p, str) else bytes(p))
               for pid, p in probes]
        if any(len(p) == 0 for _, p in enc):
            raise ValueError("contamination probes must be non-empty")
        self.probe_id_type = (pa.array([pid for pid, _ in enc]).type
                              if enc else pa.int64())
        self.A = min([len(p) for _, p in enc] + [16]) if enc else 1
        by_anchor: dict[int, list] = {}
        for pid, p in enc:
            h = 0
            for b in p[:self.A]:
                h = (h * self._B + b) & 0xFFFFFFFFFFFFFFFF
            by_anchor.setdefault(h, []).append((pid, p))
        self.by_anchor = by_anchor
        self.anchors = np.sort(np.fromiter(by_anchor.keys(), dtype=np.uint64,
                                           count=len(by_anchor)))

    def _empty(self, ids: pa.Array) -> pa.Table:
        return pa.table({self.id_column: pa.array([], type=ids.type),
                         "probe_id": pa.array([], type=self.probe_id_type)})

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column)
        if batch.num_rows == 0 or not len(self.anchors):
            return self._empty(ids)
        text = batch.column(self.text_column)
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # large_string: int64 offsets into one flat utf-8 buffer (zero-copy
        # views; pc.match_substring is byte-level too, so semantics match)
        arr = pc.fill_null(text.cast(pa.large_string()), "")
        off_buf = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        offs = off_buf[arr.offset:arr.offset + len(arr) + 1]
        data_all = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        data = data_all[offs[0]:offs[-1]]
        offsets = (offs - offs[0]).astype(np.int64)
        N, A = len(data), self.A
        if N < A:
            return self._empty(ids)
        B = np.uint64(self._B)
        H = np.zeros(N - A + 1, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        for j in range(A):
            H = H * B + d64[j:N - A + 1 + j]
        cand = np.flatnonzero(np.isin(H, self.anchors))
        if not len(cand):
            return self._empty(ids)
        mem = data.tobytes()
        pairs: set[tuple[int, Any]] = set()
        docs = np.searchsorted(offsets, cand, side="right") - 1
        for pos, doc in zip(cand.tolist(), docs.tolist()):
            for pid, p in self.by_anchor.get(int(H[pos]), ()):
                if (pos + len(p) <= offsets[doc + 1]
                        and mem[pos:pos + len(p)] == p):
                    pairs.add((doc, pid))
        if not pairs:
            return self._empty(ids)
        ordered = sorted(pairs)
        take = pa.array([d for d, _ in ordered], type=pa.int64())
        return pa.table({
            self.id_column: pc.take(ids, take),
            "probe_id": pa.array([pid for _, pid in ordered],
                                 type=self.probe_id_type)})


def contamination_pairs(ds: Dataset, text_column: str, id_column: str,
                        probes, concurrency=None,
                        method: str = "auto") -> Dataset:
    """(doc id, probe_id) for every document containing a probe literal.

    ``probes``: [(probe_id, literal_string), ...] — broadcast ONCE via
    ray.put and read per actor (never re-shipped per batch). The scan side
    streams; no shuffle at all.

    ``method``: ``"per-probe"`` (one vectorized substring scan per probe —
    fastest for O(10-100) probes), ``"rabin-karp"`` (one anchor-hash pass
    regardless of probe count — the scale path for large suites), or
    ``"auto"`` (rabin-karp above 64 probes)."""
    import ray
    from . import cached_stage
    probes = list(probes)
    if method == "auto":
        method = "rabin-karp" if len(probes) > 64 else "per-probe"
    cls = {"per-probe": _ContaminationScan,
           "rabin-karp": _ContaminationScanRK}[method]
    probes_ref = ray.put(probes)
    return ds.map_batches(
        cached_stage(cls, id_column=id_column,
                     text_column=text_column, probes_ref=probes_ref),
        batch_format="pyarrow", **_conc(concurrency))


def add_repetition(ds: Dataset, text_column: str, out: str = "rep_ratio",
                   concurrency=None) -> Dataset:
    """Repetition / boilerplate signal: 1 - distinct_words / words per doc
    (a Gopher-style duplicated-token-fraction quality filter). Vectorized:
    polars extract_all + list.n_unique over the zero-copy Arrow column —
    no Python per row. Empty text scores 0.0; null text stays null.

    The ASCII non-space word class matches the engine-wide RE2 convention
    (see word_counts) so the SQL oracle tokenizes identically."""

    def rep(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pl.from_arrow(col).str.extract_all(r"[^\t\n\f\r ]+")
        n = words.list.len().cast(pl.Float64)
        d = words.list.n_unique().cast(pl.Float64)
        ratio = (1.0 - d / n).fill_nan(0.0)  # 0/0 (empty text) -> 0.0
        return batch.append_column(out, ratio.to_arrow().cast(pa.float64()))

    return ds.map_batches(rep, batch_format="pyarrow", **_conc(concurrency))


# ---------------------------------------------------------------------------
# corpus-frequency LM scoring (unigram quality signal)
# ---------------------------------------------------------------------------


class _FreqScorer:
    """Per-batch unigram scorer against a broadcast corpus frequency table.

    All per-doc aggregates are INTEGER sums (token count, total corpus
    frequency, OOV count) so the result is order-deterministic and
    hash-exact against a SQL oracle; the only float is ONE final IEEE
    division (total_freq / n_words)."""

    def __init__(self, text_column: str, id_column: str, vocab_ref,
                 min_count: int):
        import polars as pl
        import ray
        vocab = (ray.get(vocab_ref)
                 if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        self.vocab = pl.from_arrow(vocab)  # (word, cnt)
        self.text_column = text_column
        self.id_column = id_column
        self.min_count = int(min_count)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column(self.id_column)
        n_docs = batch.num_rows
        if n_docs == 0:
            return pa.table({self.id_column: ids,
                             "n_words": pa.array([], type=pa.int64()),
                             "total_freq": pa.array([], type=pa.int64()),
                             "avg_word_freq": pa.array([], type=pa.float64()),
                             "oov_words": pa.array([], type=pa.int64())})
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        s = pl.from_arrow(col).fill_null("")
        exploded = (pl.DataFrame({"row": np.arange(n_docs, dtype=np.int64),
                                  "word": s.str.extract_all(
                                      r"[^\t\n\f\r ]+")})
                    .explode("word")
                    .drop_nulls("word")
                    .join(self.vocab, on="word", how="left")
                    .with_columns(pl.col("cnt").fill_null(0)))
        agg = (exploded.group_by("row")
               .agg(pl.len().cast(pl.Int64).alias("n_words"),
                    pl.col("cnt").sum().cast(pl.Int64).alias("total_freq"),
                    (pl.col("cnt") < self.min_count).sum().cast(pl.Int64)
                    .alias("oov_words")))
        full = (pl.DataFrame({"row": np.arange(n_docs, dtype=np.int64)})
                .join(agg, on="row", how="left")
                .sort("row")
                .with_columns(pl.col("n_words").fill_null(0),
                              pl.col("total_freq").fill_null(0),
                              pl.col("oov_words").fill_null(0)))
        n = full.get_column("n_words").to_numpy()
        tot = full.get_column("total_freq").to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = tot.astype(np.float64) / n.astype(np.float64)
        avg_arr = pa.array(avg, type=pa.float64(),
                           mask=(n == 0))  # no words -> null avg
        return pa.table({self.id_column: ids,
                         "n_words": pa.array(n),
                         "total_freq": pa.array(tot),
                         "avg_word_freq": avg_arr,
                         "oov_words": full.get_column("oov_words").to_arrow()
                         .cast(pa.int64())})


def corpus_freq_score(ds: Dataset, text_column: str, id_column: str,
                      min_count: int = 30, concurrency=None,
                      vocab_table: "pa.Table | None" = None) -> Dataset:
    """Unigram corpus-frequency quality score (the integer-exact core of a
    unigram LM perplexity filter: avg_word_freq is a monotone transform of
    the geometric-mean token probability's arithmetic cousin, and
    ``oov_words`` counts tokens rarer than ``min_count`` corpus-wide).

    Two streaming passes:
      1. corpus word counts (map-side combined shuffle of one row per
         distinct word per block — see word_counts);
      2. broadcast the frequency table ONCE via ray.put, then a per-batch
         vectorized polars explode + join + integer group-sum.

    At web scale the full (word, cnt) table can outgrow a broadcast; the
    scale path is to prune it to words with cnt >= min_count plus an OOV
    default (exact for oov_words, changes total_freq only by the pruned
    tail) or to shuffle-join the exploded (id, word) rows against the
    frequency table (stages/joins.hash_join) — documented, not default."""
    import ray
    from . import cached_stage
    if vocab_table is not None:
        # precomputed stats (e.g. word_stats's fused (word, cnt, df)
        # table) — share ONE corpus pass across composed scorers
        vocab_tbl = vocab_table.select(["word", "cnt"])
    else:
        vocab_tbl = pa.concat_tables(
            [pa.table(b) for b in word_counts(ds, text_column)
             .iter_batches(batch_format="pyarrow")]
            or [pa.table({"word": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})])
    vocab_ref = ray.put(vocab_tbl)
    return ds.map_batches(
        cached_stage(_FreqScorer, text_column=text_column,
                     id_column=id_column, vocab_ref=vocab_ref,
                     min_count=min_count),
        batch_format="pyarrow", **_conc(concurrency))


# ---------------------------------------------------------------------------
# n-gram decontamination (GPT-3 appendix-C style overlap filter)
# ---------------------------------------------------------------------------


def _gram_rows(texts, k: int, seeds=(11,)):
    """Per-row word-k-gram occurrences, fully vectorized (polars shifted
    concat_str — the MinHasher construction, see stages/dedup.py).

    Returns ``(rows int64[], pos int64[], [hashes uint64[] per seed])`` —
    one entry per gram in document order; ``pos`` is the 0-based word index
    of the gram's first word within its document.  Docs with fewer than
    ``k`` words emit NO grams (the decontamination / substring-dedup
    contract, unlike minhash's join-all shingle)."""
    import polars as pl
    if not isinstance(texts, pl.Series):
        texts = pl.Series("t", texts, dtype=pl.Utf8)
    words = texts.fill_null("").str.extract_all(r"[^\t\n\f\r ]+")
    lf = (pl.DataFrame({"w": words}).lazy()
          .with_row_index("doc")
          .explode("w", empty_as_null=True))
    cols = [pl.col("w")] + [pl.col("w").shift(-i).over("doc")
                            for i in range(1, k)]
    df = (lf.select(pl.col("doc"),
                    pl.concat_str(cols, separator=" ").alias("g"))
          .collect()
          .drop_nulls("g"))
    rows = df.get_column("doc").to_numpy().astype(np.int64)
    g = df.get_column("g")
    hashes = [g.hash(seed=s).to_numpy().astype(np.uint64) for s in seeds]
    # grams arrive in document order with contiguous per-doc runs: the
    # within-doc position is the index minus the run start
    if len(rows):
        new = np.ones(len(rows), dtype=bool)
        new[1:] = rows[1:] != rows[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(rows)))
        pos = np.arange(len(rows), dtype=np.int64) - np.repeat(starts, lens)
    else:
        pos = np.empty(0, dtype=np.int64)
    return rows, pos, hashes


def _gram_hash_rows(texts, k: int, seed: int = 11):
    """Back-compat wrapper over :func:`_gram_rows`: (rows, hashes) only."""
    rows, _, hashes = _gram_rows(texts, k, (seed,))
    return rows, hashes[0]


def probe_gram_hashes(probe_ds: Dataset, text_column: str,
                      k: int = 5) -> np.ndarray:
    """Distinct sorted word-k-gram hashes of a benchmark/probe corpus.

    Map-side: each batch emits its DISTINCT gram hashes only (int64
    bit-pattern views — Ray round-trips values through Python ints where
    uint64 overflows); driver unions them.  Probe suites are small by
    nature (benchmarks, eval sets), so the result broadcasts whole."""

    def distinct_grams(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        _, h = _gram_hash_rows(pl.from_arrow(col), k)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = [pa.table(b) for b in
             probe_ds.map_batches(distinct_grams, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    h = pa.concat_tables(parts).column("h").to_numpy().astype(np.int64)
    return np.unique(h).view(np.uint64)


class _NgramContaminationScorer:
    """Per-batch k-gram overlap counter against broadcast probe grams."""

    def __init__(self, text_column: str, id_column: str, probe_ref, k: int):
        import ray
        grams = (ray.get(probe_ref)
                 if isinstance(probe_ref, ray.ObjectRef) else probe_ref)
        self.probe = np.sort(np.asarray(grams, dtype=np.uint64))
        self.text_column = text_column
        self.id_column = id_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        n_docs = batch.num_rows
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        rows, h = _gram_hash_rows(pl.from_arrow(col), self.k)
        n_grams = np.bincount(rows, minlength=n_docs).astype(np.int64)
        hit = np.zeros(len(h), dtype=bool)
        if len(self.probe) and len(h):
            pos = np.searchsorted(self.probe, h)
            pos[pos == len(self.probe)] = 0
            hit = self.probe[pos] == h
        n_hit = np.bincount(rows[hit], minlength=n_docs).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = n_hit.astype(np.float64) / n_grams.astype(np.float64)
        # append (not project): the payload stays in place, so composed
        # pipelines can filter on n_hit without a join back to the text
        return (batch
                .append_column("n_grams", pa.array(n_grams))
                .append_column("n_hit", pa.array(n_hit))
                .append_column("hit_frac",
                               pa.array(frac, type=pa.float64(),
                                        mask=(n_grams == 0))))


def ngram_contamination(ds: Dataset, text_column: str, id_column: str,
                        probe_ds: Dataset, k: int = 5,
                        concurrency=None) -> Dataset:
    """Benchmark decontamination by word-k-gram overlap (the GPT-3
    appendix-C discipline, at the gram granularity rather than
    contamination_pairs' whole-probe substring match).

    probe grams are collected distinct and broadcast ONCE via ray.put;
    scoring is one shuffle-free vectorized pass APPENDING ``n_grams``,
    ``n_hit`` and ``hit_frac`` to each row (payload stays in place, so a
    composed pipeline filters on ``n_hit == 0`` without a join back).  Gram identity is a 64-bit polars
    string hash (collision odds ~n^2/2^64 — the exact-dedup argument)."""
    import ray
    from . import cached_stage
    probe = probe_gram_hashes(probe_ds, text_column, k)
    probe_ref = ray.put(probe)
    return ds.map_batches(
        cached_stage(_NgramContaminationScorer, text_column=text_column,
                     id_column=id_column, probe_ref=probe_ref, k=k),
        batch_format="pyarrow", **_conc(concurrency))


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


class _HashPairSet:
    """Sorted (h1, h2) membership with a vectorized unique-h1 fast path
    (the drop_frequent_lines lookup, factored for reuse)."""

    def __init__(self, h1s: np.ndarray, h2s: np.ndarray):
        order = np.lexsort((h2s, h1s))
        self.h1_sorted = h1s[order]
        self.h2_for_h1 = h2s[order]
        self.h1_unique = (len(self.h1_sorted) < 2
                          or bool(np.all(np.diff(self.h1_sorted) > 0)))
        self.pair_set = (None if self.h1_unique
                         else {(int(a), int(b)) for a, b in zip(h1s, h2s)})

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        hit = np.zeros(len(h1), dtype=bool)
        if not len(self.h1_sorted):
            return hit
        cand = np.flatnonzero(np.isin(h1, self.h1_sorted))
        if not len(cand):
            return hit
        if self.h1_unique:
            pos = np.searchsorted(self.h1_sorted, h1[cand])
            hit[cand] = self.h2_for_h1[pos] == h2[cand]
        else:
            for i in cand.tolist():
                hit[i] = (int(h1[i]), int(h2[i])) in self.pair_set
        return hit


def frequent_gram_hashes(ds: Dataset, text_column: str, min_count: int,
                         k: int = 2,
                         max_frequent: int = 5_000_000) -> "pa.Table":
    """Corpus-frequent word-k-gram 128-bit hashes (h1, h2, cnt >=
    min_count) — map-side (h1, h2, cnt) combine, one groupby; int64
    bit-pattern views (Ray groupby round-trips Python ints; uint64
    overflows).  Raises above ``max_frequent`` (the broadcast-set bound —
    never silently truncates)."""
    from ray.data.aggregate import Sum

    def batch_counts(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        _, _, (a, b) = _gram_rows(pl.from_arrow(col), k, seeds=(21, 22))
        if not len(a):
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        comb = np.stack([a.view(np.int64), b.view(np.int64)], axis=1)
        uniq, counts = np.unique(comb, axis=0, return_counts=True)
        return pa.table({"h1": uniq[:, 0], "h2": uniq[:, 1],
                         "cnt": counts.astype(np.int64)})

    freq = (ds.map_batches(batch_counts, batch_format="pyarrow")
            .groupby(["h1", "h2"]).aggregate(Sum("cnt", alias_name="cnt"))
            .filter(expr=f"cnt >= {int(min_count)}"))
    parts = [pa.table(x) for x in freq.iter_batches(batch_format="pyarrow")]
    tbl = (pa.concat_tables(parts) if parts
           else pa.table({"h1": pa.array([], pa.int64()),
                          "h2": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())}))
    if tbl.num_rows > max_frequent:
        raise RuntimeError(
            f"frequent_gram_hashes: {tbl.num_rows} frequent grams exceed "
            f"max_frequent={max_frequent}; raise min_count or the cap")
    return tbl


class _BigramCoverage:
    """Per-worker state: the broadcast frequent-bigram hash-pair set."""

    def __init__(self, text_column: str, id_column: str, freq_ref, k: int):
        import ray
        tbl = ray.get(freq_ref) if not isinstance(freq_ref, pa.Table) \
            else freq_ref
        self.pairs = _HashPairSet(
            tbl.column("h1").to_numpy(zero_copy_only=False),
            tbl.column("h2").to_numpy(zero_copy_only=False))
        self.text_column = text_column
        self.id_column = id_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        n = batch.num_rows
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        rows, _, (a, b) = _gram_rows(pl.from_arrow(col), self.k,
                                     seeds=(21, 22))
        known = self.pairs.contains(a.view(np.int64), b.view(np.int64))
        n_grams = np.bincount(rows, minlength=n).astype(np.int64)
        n_known = np.bincount(rows[known], minlength=n).astype(np.int64)
        cov = n_known.astype(np.float64) / np.maximum(n_grams, 1)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "n_bigrams": pa.array(n_grams, pa.int64()),
            "n_known": pa.array(n_known, pa.int64()),
            "bigram_coverage": pa.array(cov, pa.float64())})


def bigram_coverage(ds: Dataset, text_column: str, id_column: str,
                    min_count: int = 3, k: int = 2,
                    max_frequent: int = 5_000_000,
                    concurrency=None) -> Dataset:
    """Bigram LM coverage score: the fraction of a document's word-bigram
    OCCURRENCES that are corpus-frequent (count >= min_count) — the
    bigram-level sibling of :func:`corpus_freq_score` (a cheap fluency /
    domain-fit proxy: rare-bigram-heavy docs score low).

    Two passes: map-side-combined bigram counts -> tiny (h1, h2) frequent
    set broadcast once via ray.put -> shuffle-free scoring.  Counts are
    integer-exact and the score is ONE IEEE division, so the SQL oracle
    reproduces it bit-for-bit (128-bit gram hashes stand in for the gram
    strings — the drop_frequent_lines contract)."""
    import ray

    from . import cached_stage, concurrency_kwargs

    freq = frequent_gram_hashes(ds, text_column, min_count, k=k,
                                max_frequent=max_frequent)
    ref = ray.put(freq.select(["h1", "h2"]))
    return ds.map_batches(
        cached_stage(_BigramCoverage, text_column=text_column,
                     id_column=id_column, freq_ref=ref, k=k),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _WordSpanScrubber:
    """Actor-pool stage of :func:`scrub_probe_word_spans`: broadcast
    probe gram-pair set + one vectorized gram pass + the shared word
    mask per batch."""

    def __init__(self, ref, k, text_column, id_column, out_column,
                 drop_count_column):
        import ray
        tbl = ray.get(ref)
        self.pairs = _HashPairSet(
            tbl.column("h1").to_numpy(zero_copy_only=False),
            tbl.column("h2").to_numpy(zero_copy_only=False))
        self.k = k
        self.text_column = text_column
        self.id_column = id_column
        self.out_column = out_column
        self.drop_count_column = drop_count_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        from .dedup import _mask_words

        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        rows, pos, (a, b) = _gram_rows(pl.from_arrow(col), self.k,
                                       seeds=(21, 22))
        hit = (self.pairs.contains(a.view(np.int64), b.view(np.int64))
               if len(rows) else np.zeros(0, dtype=bool))
        hi = np.flatnonzero(hit)
        text_out, dropped = _mask_words(col, rows[hi], pos[hi],
                                        pos[hi] + self.k)
        keep_cols = [c for c in batch.column_names
                     if c not in (self.id_column, self.text_column)]
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out_column: text_out,
            self.drop_count_column: dropped,
            **{c: batch.column(c) for c in keep_cols}})


def scrub_probe_word_spans(ds: Dataset, probe_ds: Dataset,
                           text_column: str = "text",
                           id_column: str = "doc_id", k: int = 5,
                           out_column: str = "text_clean",
                           drop_count_column: str = "n_words_scrubbed",
                           max_probe_grams: int = 5_000_000,
                           concurrency=None) -> Dataset:
    """Benchmark decontamination by REMOVAL at word granularity: every
    word covered by a probe-corpus k-gram match drops, the text rebuilds
    from the survivors joined by single spaces (whitespace-normalized —
    the :func:`dedup.remove_duplicate_spans` contract).  The scrub
    sibling of :func:`ngram_contamination`, which only FLAGS; the token
    sibling is :func:`scrub_probe_token_spans`.  Output: one row per
    input row — ``(id, out_column, drop_count_column)`` plus every other
    projected column verbatim.

    Scale shape: the probe grams collapse to a 128-bit (h1, h2) pair
    table (:func:`frequent_gram_hashes` at min_count=1 — fail-loud
    ``max_probe_grams`` cap) broadcast ONCE via ray.put; scoring is
    ENTIRELY map-only — one vectorized gram pass + the shared coverage
    mask per batch, no exchange at any corpus size.  Gram identity is
    the house 128-bit hash discipline (collision odds ~n^2/2^128)."""
    import ray

    from . import cached_stage, concurrency_kwargs

    probe = frequent_gram_hashes(probe_ds, text_column, min_count=1,
                                 k=k, max_frequent=max_probe_grams)
    ref = ray.put(probe.select(["h1", "h2"]))
    return ds.map_batches(
        cached_stage(_WordSpanScrubber, ref=ref, k=k,
                     text_column=text_column, id_column=id_column,
                     out_column=out_column,
                     drop_count_column=drop_count_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def build_inverted_index(ds: Dataset, text_column: str, id_column: str,
                         min_df: int = 2, max_df: int | None = None,
                         max_postings: int = 100_000,
                         num_partitions: int | None = None) -> Dataset:
    """Inverted index: (word, df, postings) with postings = the sorted
    distinct doc ids containing the word, comma-joined.

    Map-side combine: each batch emits its DISTINCT (word, id) pairs
    (polars explode + unique), so the groupby shuffles one row per
    distinct pair per block.  ``min_df``/``max_df`` bound the emitted
    vocabulary (frequent words belong to stopword handling — an
    unbounded posting list is a hot key by definition); a list longer
    than ``max_postings`` raises loudly."""
    import polars as pl

    def pairs(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        idc = batch.column(id_column)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        df = (pl.DataFrame({
                "_id": pl.from_arrow(idc),
                "w": pl.from_arrow(col).fill_null("")
                     .str.extract_all(r"[^\t\n\f\r ]+")})
              .explode("w").drop_nulls("w").unique(subset=["_id", "w"]))
        return pa.table({"word": df.get_column("w").to_arrow()
                         .cast(pa.string()),
                         "_id": df.get_column("_id").to_arrow()})

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher: hash(word) % buckets — NEVER one Python
        # map_groups call per word (a vocabulary-sized number of Ray
        # calls); per bucket ONE (word, id) sort dedups pairs across
        # batches and yields df + sorted postings per word run
        from .analytics import _adjacent_change_mask
        t = g.sort_by([("word", "ascending"), ("_id", "ascending")])
        t = t.filter(pa.array(_adjacent_change_mask(t, ["word", "_id"])))
        starts = np.flatnonzero(_adjacent_change_mask(t, ["word"]))
        bounds = np.append(starts, t.num_rows)
        dfs = np.diff(bounds)
        sel = dfs >= min_df
        if max_df is not None:
            sel &= dfs <= max_df
        if len(dfs) and (dfs[sel] > max_postings).any():
            bad = int(dfs[sel].max())
            raise RuntimeError(
                f"build_inverted_index: posting list of {bad} ids exceeds "
                f"max_postings={max_postings}; lower max_df")
        sel_idx = np.flatnonzero(sel)
        ids = t.column("_id").to_pylist()
        postings = [",".join(str(i) for i in
                             ids[bounds[j]:bounds[j + 1]])
                    for j in sel_idx]
        wcol = t.column("word")
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        return pa.table({
            "word": wcol.take(pa.array(starts[sel_idx], pa.int64())),
            "df": pa.array(dfs[sel_idx], pa.int64()),
            "postings": pa.array(postings, pa.string())})

    from .analytics import bucketed_groups
    return bucketed_groups(
        ds.select_columns([id_column, text_column])
        .map_batches(pairs, batch_format="pyarrow"),
        "word", per_bucket, seed=17, num_partitions=num_partitions)


def document_frequencies(ds: Dataset, text_column: str) -> "pa.Table":
    """(word, df) — number of DOCUMENTS containing each word.

    Map-side combine: each batch emits one row per (distinct word per doc)
    pre-summed to (word, batch_df), so the groupby shuffles one row per
    distinct word per block."""
    from ray.data.aggregate import Sum

    def batch_df(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = (pl.from_arrow(col).fill_null("")
                 .str.extract_all(r"[^\t\n\f\r ]+"))
        per_doc = (pl.DataFrame({"w": words})
                   .with_row_index("doc")
                   .explode("w")
                   .drop_nulls("w")
                   .unique(subset=["doc", "w"]))
        vc = per_doc.get_column("w").value_counts()
        name = vc.columns[0]
        return pa.table({"word": vc[name].to_arrow().cast(pa.string()),
                         "df": vc["count"].to_arrow().cast(pa.int64())})

    out = (ds.map_batches(batch_df, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("df", alias_name="df")))
    parts = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "df": pa.array([], type=pa.int64())})
    return pa.concat_tables(parts)


class _TfIdfKeywords:
    """Per-batch top-k keyword extraction against broadcast document
    frequencies.

    The ranking key is the tf/df ratio — ONE IEEE division of two int64
    exact counts, so score and order are bit-reproducible by a SQL oracle
    (unlike ln(N/df) variants, where libm implementations diverge in the
    last ulp).  Ties break on ascending word."""

    def __init__(self, text_column: str, id_column: str, df_ref, k: int):
        import polars as pl
        import ray
        df_tbl = (ray.get(df_ref)
                  if isinstance(df_ref, ray.ObjectRef) else df_ref)
        self.df = pl.from_arrow(df_tbl)  # (word, df)
        self.text_column = text_column
        self.id_column = id_column
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column(self.id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = (pl.from_arrow(col).fill_null("")
                 .str.extract_all(r"[^\t\n\f\r ]+"))
        scored = (pl.DataFrame({"row": np.arange(batch.num_rows,
                                                 dtype=np.int64),
                                "word": words})
                  .explode("word")
                  .drop_nulls("word")
                  .group_by("row", "word")
                  .agg(pl.len().cast(pl.Int64).alias("tf"))
                  .join(self.df, on="word", how="inner")
                  .with_columns((pl.col("tf").cast(pl.Float64)
                                 / pl.col("df").cast(pl.Float64))
                                .alias("score"))
                  .sort(["row", "score", "word"],
                        descending=[False, True, False])
                  .with_columns(pl.col("word").cum_count().over("row")
                                .cast(pl.Int64).alias("rk"))
                  .filter(pl.col("rk") <= self.k))
        rows = scored.get_column("row").to_numpy()
        out_ids = pc.take(ids, pa.array(rows))
        return pa.table({self.id_column: out_ids,
                         "word": scored.get_column("word").to_arrow()
                         .cast(pa.string()),
                         "tf": scored.get_column("tf").to_arrow(),
                         "df": scored.get_column("df").to_arrow(),
                         "score": scored.get_column("score").to_arrow(),
                         "rk": scored.get_column("rk").to_arrow()})


def tfidf_keywords(ds: Dataset, text_column: str, id_column: str,
                   k: int = 3, concurrency=None,
                   df_table: "pa.Table | None" = None) -> Dataset:
    """Top-k TF-IDF keywords per document.

    Two streaming passes: document frequencies (map-side combined, one row
    per distinct word per block on the shuffle), broadcast ONCE via
    ray.put, then a shuffle-free vectorized polars pass per batch (tf
    counts, tf/df ranking, top-k head).  Web-scale vocabularies outgrow a
    broadcast — the scale path (prune df to words above a support floor,
    or hash-join exploded words) matches corpus_freq_score's note.

    ``df_table``: a precomputed (word, df[, ...]) table — pass
    :func:`word_stats`'s output to share one stats pass with
    corpus_freq_score when composing both."""
    import ray
    from . import cached_stage
    df_tbl = (df_table.select(["word", "df"]) if df_table is not None
              else document_frequencies(ds, text_column))
    df_ref = ray.put(df_tbl)
    return ds.map_batches(
        cached_stage(_TfIdfKeywords, text_column=text_column,
                     id_column=id_column, df_ref=df_ref, k=k),
        batch_format="pyarrow", **_conc(concurrency))


class _FusedFrequencyPass:
    """ONE pass-2 stage for the composed frequency family: boilerplate
    line scrub (_FrequentLineFilter) + corpus-frequency quality scoring
    (_FreqScorer) + top-k keyword string (_TfIdfKeywords joined to one
    rank-ordered string per doc), all against broadcast tables built by
    the shared pass-1.  Delegates to the proven single-op stage classes,
    so each signal's values are bit-identical to running the op alone."""

    def __init__(self, text_column: str, id_column: str, freq_ref=None,
                 vocab_ref=None, df_ref=None, min_count: int = 30,
                 k: int = 3):
        from .dedup import _FrequentLineFilter
        self.line = (_FrequentLineFilter(text_column, "text_clean",
                                         "n_lines_dropped", freq_ref)
                     if freq_ref is not None else None)
        self.freq = (_FreqScorer(text_column, id_column, vocab_ref,
                                 min_count)
                     if vocab_ref is not None else None)
        self.tfidf = (_TfIdfKeywords(text_column, id_column, df_ref, k)
                      if df_ref is not None else None)
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        out = batch
        if self.line is not None:
            out = self.line(out)
        if self.freq is not None:
            f = self.freq(batch)
            for c in ("n_words", "total_freq", "avg_word_freq",
                      "oov_words"):
                out = out.append_column(c, f.column(c))
        if self.tfidf is not None:
            t = self.tfidf(batch)
            ids = batch.column(self.id_column)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            tw = (pl.from_arrow(t)
                  .sort([self.id_column, "rk"])
                  .group_by(self.id_column, maintain_order=True)
                  .agg(pl.col("word").str.join(" ").alias("top_words")))
            joined = (pl.DataFrame({self.id_column: pl.from_arrow(ids)})
                      .join(tw, on=self.id_column, how="left")
                      .with_columns(pl.col("top_words").fill_null("")))
            col = joined.get_column("top_words").to_arrow()
            if col.type != pa.string():
                col = col.cast(pa.string())
            out = out.append_column("top_words", col)
        return out


def with_frequencies(ds: Dataset, text_column: str, id_column: str, *,
                     corpus: "Dataset | None" = None,
                     drop_lines_min_count: "int | None" = None,
                     freq_min_count: "int | None" = None,
                     tfidf_k: "int | None" = None,
                     max_frequent: int = 5_000_000,
                     concurrency=None) -> Dataset:
    """Fused frequency-family annotation: compute any combination of the
    three two-pass corpus-frequency signals — boilerplate line scrub
    (``drop_lines_min_count``), corpus-frequency quality score
    (``freq_min_count``) and top-k TF-IDF keywords (``tfidf_k``) — with
    the MINIMUM number of corpus scans.  Chaining the three ops costs
    three pass-1 scans + three pass-2 scans; this fuses them into at
    most TWO pass-1 scans (ONE ``word_stats`` scan shared by freq +
    tfidf, one line-hash scan) and exactly ONE pass-2 ``map_batches``
    over the payload — at 100 TB the scan count is the cost.

    Appends, per requested signal: ``text_clean`` + ``n_lines_dropped``;
    ``n_words``/``total_freq``/``avg_word_freq``/``oov_words``;
    ``top_words`` (the rank-ordered top-k keywords space-joined, ''
    when the doc has no scorable words).  Each signal is computed by the
    single-op stage class, so values are bit-identical to running
    ``drop_frequent_lines`` / ``corpus_freq_score`` / ``tfidf_keywords``
    separately — all signals score the ORIGINAL text against the
    ORIGINAL corpus (annotate-then-filter composition; chain ops
    explicitly when a signal must see scrubbed text).

    ``corpus`` (default ``ds``): the dataset the frequency tables are
    built from — pass a reference corpus to score against it."""
    import ray

    from . import cached_stage
    from .dedup import frequent_line_hashes

    if (drop_lines_min_count is None and freq_min_count is None
            and tfidf_k is None):
        raise ValueError("with_frequencies: request at least one signal")
    corpus = corpus if corpus is not None else ds
    freq_ref = vocab_ref = df_ref = None
    if freq_min_count is not None or tfidf_k is not None:
        stats = word_stats(corpus, text_column)
        if freq_min_count is not None:
            vocab_ref = ray.put(stats.select(["word", "cnt"]))
        if tfidf_k is not None:
            df_ref = ray.put(stats.select(["word", "df"]))
    if drop_lines_min_count is not None:
        freq_ref = ray.put(frequent_line_hashes(
            corpus, text_column, drop_lines_min_count,
            max_frequent=max_frequent))
    return ds.map_batches(
        cached_stage(_FusedFrequencyPass, text_column=text_column,
                     id_column=id_column, freq_ref=freq_ref,
                     vocab_ref=vocab_ref, df_ref=df_ref,
                     min_count=(freq_min_count
                                if freq_min_count is not None else 30),
                     k=(tfidf_k if tfidf_k is not None else 3)),
        batch_format="pyarrow", **_conc(concurrency))


def cooccurrence_counts(ds: Dataset, text_column: str, window: int = 2,
                        min_count: int = 2,
                        num_partitions: int | None = None) -> Dataset:
    """Skip-gram co-occurrence counts: for every pair of word positions
    ``(i, j)`` with ``1 <= j - i <= window`` within a document, count the
    ordered pair ``(words[i], words[j])`` over the whole corpus — the
    word2vec/GloVe co-occurrence-matrix build (Mikolov 2013 trains from
    exactly these center->context pairs; PMI/GloVe statistics are a
    driver-side formula over the emitted counts).

    Shuffle shape: each batch emits its LOCAL pair counts (polars
    shifted-concat pairs — the `_gram_rows` construction once per offset —
    then a local group_by), so the exchange moves one row per distinct
    pair per block, never one per occurrence; the global groupby sums
    int64 partials (associative, partitioning-independent).  ``min_count``
    prunes the long Zipf tail AFTER the global sum (correctness requires
    summing before thresholding); the pair key travels as a single
    space-joined string (words cannot contain whitespace by construction,
    so the join is unambiguous and splits back losslessly)."""
    import polars as pl

    from ray.data.aggregate import Sum

    if window < 1:
        raise ValueError("cooccurrence_counts: window must be >= 1")

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        words = texts.str.extract_all(r"[^\t\n\f\r ]+")
        lf = (pl.DataFrame({"w": words}).lazy()
              .with_row_index("doc")
              .explode("w", empty_as_null=True))
        exprs = [pl.concat_str(
                     [pl.col("w"), pl.col("w").shift(-d).over("doc")],
                     separator=" ").alias(f"p{d}")
                 for d in range(1, window + 1)]
        df = lf.select(exprs).collect()
        pairs = pl.concat([df.get_column(f"p{d}").drop_nulls()
                           .alias("pair") for d in range(1, window + 1)])
        cnt = pl.DataFrame({"pair": pairs}).group_by("pair").len()
        return pa.table({
            "pair": cnt.get_column("pair").to_arrow().cast(pa.string()),
            "cnt": cnt.get_column("len").to_arrow().cast(pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch.column("sum(cnt)")
        keep = pc.greater_equal(cnt, pa.scalar(min_count, pa.int64()))
        batch = batch.filter(keep)
        parts = pc.split_pattern(batch.column("pair"), " ", max_splits=1)
        return pa.table({
            "word_a": pc.list_element(parts, 0),
            "word_b": pc.list_element(parts, 1),
            "cnt": batch.column("sum(cnt)")})

    return (ds.select_columns([text_column])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("pair", num_partitions=num_partitions)
            .aggregate(Sum("cnt"))
            .map_batches(finish, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Hashed Naive-Bayes quality classifier (the fastText/CCNet filter shape)
# ---------------------------------------------------------------------------


def train_nb_classifier(ds: Dataset, text_column: str, label_column: str,
                        n_buckets: int = 4096, alpha: float = 1.0,
                        seed: int = 11) -> dict:
    """Train a hashed-feature multinomial Naive-Bayes text classifier in
    ONE streaming pass — the quality-filter shape of CCNet / the GPT-3 and
    LLaMA "looks like the curated corpus" classifiers (there a fastText
    linear model; NB over the same hashed unigram+bigram features is the
    count-based sibling and trains in a single distributed pass with no
    SGD order-dependence).

    ``label_column`` is boolean (true = positive class).  Each batch emits
    one fixed-size partial row (per-class bucket-count vectors + doc
    counts — the ``dsir_bucket_counts`` shape, O(batches) driver traffic).
    The returned model is the quantized per-bucket log-likelihood-ratio
    table ``round((ln p(b|pos) - ln p(b|neg)) * 2^40)`` (int64, via
    :func:`~malli_ray.stages.sampling.dsir_log_ratio_table` with raw=neg /
    target=pos — smoothed with ``alpha``) plus the quantized class-prior
    log-odds; scoring is then integer-exact (see :func:`nb_classify`)."""
    import polars as pl

    from .sampling import DSIR_SCALE, dsir_log_ratio_table

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        lab = np.asarray(
            batch.column(label_column).to_numpy(zero_copy_only=False),
            dtype=bool)
        cnt_p = np.zeros(n_buckets, dtype=np.int64)
        cnt_n = np.zeros(n_buckets, dtype=np.int64)
        nb = np.uint64(n_buckets)
        for k in (1, 2):
            rows, _, (h,) = _gram_rows(texts, k, (seed,))
            if len(rows):
                b = (h % nb).astype(np.int64)
                m = lab[rows]
                cnt_p += np.bincount(b[m], minlength=n_buckets)
                cnt_n += np.bincount(b[~m], minlength=n_buckets)
        return pa.table({
            "cp": pa.FixedSizeListArray.from_arrays(
                pa.array(cnt_p, pa.int64()), n_buckets),
            "cn": pa.FixedSizeListArray.from_arrays(
                pa.array(cnt_n, pa.int64()), n_buckets),
            "np": pa.array([int(lab.sum())], pa.int64()),
            "nn": pa.array([int((~lab).sum())], pa.int64())})

    rows = ds.select_columns([text_column, label_column]).map_batches(
        partials, batch_format="pyarrow").take_all()
    cnt_p = np.zeros(n_buckets, dtype=np.int64)
    cnt_n = np.zeros(n_buckets, dtype=np.int64)
    n_pos = n_neg = 0
    for r in rows:
        cnt_p += np.asarray(r["cp"], dtype=np.int64)
        cnt_n += np.asarray(r["cn"], dtype=np.int64)
        n_pos += r["np"]
        n_neg += r["nn"]
    if n_pos == 0 or n_neg == 0:
        raise ValueError("train_nb_classifier: both classes need >= 1 doc")
    import math
    lam = dsir_log_ratio_table(cnt_n, cnt_p, alpha)
    prior_q = round((math.log(float(n_pos)) - math.log(float(n_neg)))
                    * DSIR_SCALE)
    return {"lam": lam, "prior_q": int(prior_q), "seed": seed,
            "n_buckets": n_buckets, "n_pos": int(n_pos), "n_neg": int(n_neg)}


def nb_classify(ds: Dataset, text_column: str, id_column: str,
                model: dict) -> Dataset:
    """Score every document with a :func:`train_nb_classifier` model:
    ``logit_q = prior_q + sum over hashed unigram+bigram features of
    lam[bucket]`` — an int64 scatter-add (associative: independent of
    batch split, feature order and summation strategy — the DSIR
    contract), so results are bit-reproducible and a golden fixture from
    an independent per-doc reference checks them exactly.  ``logit`` is
    the single int->float conversion + one exact power-of-two division;
    ``pred = logit_q > 0`` (log-odds decision).  Shuffle-free; the 8B x
    n_buckets table rides the task closure (ray.put it for 1e6+
    buckets)."""
    from .sampling import DSIR_SCALE

    lam = np.ascontiguousarray(model["lam"], dtype=np.int64)
    prior_q = int(model["prior_q"])
    seed = int(model["seed"])
    nb = np.uint64(len(lam))

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        wq = np.full(batch.num_rows, prior_q, dtype=np.int64)
        nf = np.zeros(batch.num_rows, dtype=np.int64)
        for k in (1, 2):
            rows, _, (h,) = _gram_rows(texts, k, (seed,))
            if len(rows):
                b = (h % nb).astype(np.int64)
                np.add.at(wq, rows, lam[b])
                np.add.at(nf, rows, 1)
        return pa.table({
            id_column: batch.column(id_column),
            "n_features": pa.array(nf, pa.int64()),
            "logit_q": pa.array(wq, pa.int64()),
            "logit": pa.array(wq.astype(np.float64) / DSIR_SCALE,
                              pa.float64()),
            "pred": pa.array((wq > 0).astype(np.int64), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Hashed logistic regression (distributed full-batch gradient descent —
# the trainable fastText-linear sibling of the one-pass Naive Bayes above)
# ---------------------------------------------------------------------------

#: fixed-point denominator for quantized logistic-regression residuals and
#: per-doc losses — small enough that sum(|rq| * features) over ~1e10 docs
#: stays inside int64 (2^20 * 1e3 features * 1e10 docs ~ 1e19 worst case;
#: real residuals shrink as training converges)
LOGREG_RESID_SCALE = 1 << 20


def _logreg_doc_logits(texts, w: np.ndarray, bias: float,
                       seed: int) -> "tuple[np.ndarray, np.ndarray, list]":
    """Per-doc raw logits ``z = bias + mean over features of w[bucket]``
    (fastText-style feature AVERAGING — bounded logits however long the
    doc, so full-batch GD is well-conditioned) over hashed unigram+bigram
    features, plus feature counts and the per-k (rows, buckets) occurrence
    lists (reused by the gradient scatter).  Zero-feature docs score
    ``bias`` exactly.

    DETERMINISM CONTRACT: the weight-sum accumulator starts at 0 and
    ``np.add.at`` (unbuffered ufunc.at) adds each occurrence's weight
    sequentially in document order — all unigrams, then all bigrams — so a
    doc's float64 addition order depends only on its own text, never on
    batch boundaries or co-resident docs; the mean is then ONE division +
    ONE add per doc.  The golden-fixture reference replays the identical
    per-doc scalar op sequence."""
    n = len(texts)
    s = np.zeros(n, dtype=np.float64)
    nf = np.zeros(n, dtype=np.int64)
    occ = []
    nb = np.uint64(len(w))
    for k in (1, 2):
        rows, _, (h,) = _gram_rows(texts, k, (seed,))
        b = (h % nb).astype(np.int64)
        occ.append((rows, b))
        if len(rows):
            np.add.at(s, rows, w[b])
            np.add.at(nf, rows, 1)
    z = bias + s / np.maximum(nf, 1)
    return z, nf, occ


def train_logreg_classifier(ds: Dataset, text_column: str,
                            label_column: str, n_buckets: int = 4096,
                            epochs: int = 8, lr: float = 0.5,
                            l2: float = 0.0, seed: int = 11) -> dict:
    """Train a hashed-feature logistic-regression text classifier by
    distributed FULL-BATCH gradient descent — the trainable linear-model
    shape of the fastText/CCNet quality filter (:func:`train_nb_classifier`
    is its one-pass count-based sibling; logistic regression optimizes
    log-loss directly and tolerates correlated features).

    Each epoch is ONE streaming ``map_batches`` pass emitting a fixed-size
    partial per batch (int64 gradient vector + bias gradient + quantized
    loss — the ``dsir_bucket_counts`` driver-traffic shape, O(batches)
    rows of ``8 * n_buckets`` bytes); the input re-executes per epoch, so
    pass a MATERIALIZED (or parquet-backed) training set — at corpus
    scale the training set is a bounded labeled sample anyway (CCNet
    trains its filter on ~1e5-1e6 docs, not the corpus).

    DETERMINISM: weights start at zero (no RNG); per-doc logits follow the
    :func:`_logreg_doc_logits` addition-order contract; per-doc residuals
    ``sigmoid(z) - y`` and losses quantize to int64 at
    ``LOGREG_RESID_SCALE`` BEFORE the cross-doc reduction, so gradient
    sums are associative — independent of batch split, partitioning, and
    reduction tree (the PageRank/DSIR fixed-point discipline).  The driver
    update ``w -= lr * (g / n_docs + l2 * w)`` is elementwise float64.
    Pinned float primitives shared with the golden fixture: elementwise
    ``np.exp``/``np.log`` (sigmoid + log-loss) and banker's ``np.round``.

    Returns ``{"w", "bias", "n_buckets", "seed", "n_docs",
    "loss_history"}`` — ``loss_history`` is the mean log-loss per epoch
    measured BEFORE that epoch's update (dequantized driver floats)."""
    import polars as pl

    if epochs < 1:
        raise ValueError("train_logreg_classifier: epochs must be >= 1")
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    n_docs = None
    loss_history = []
    scale = float(LOGREG_RESID_SCALE)
    proj = ds.select_columns([text_column, label_column])

    for _ in range(epochs):
        w_now, bias_now = w, bias

        def partials(batch: pa.Table, _w=w_now, _b=bias_now) -> pa.Table:
            col = batch.column(text_column)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_null(col.type):
                col = col.cast(pa.string())
            texts = pl.from_arrow(col).fill_null("")
            y = np.asarray(
                batch.column(label_column).to_numpy(zero_copy_only=False),
                dtype=bool)
            z, nf, occ = _logreg_doc_logits(texts, _w, _b, seed)
            sig = 1.0 / (1.0 + np.exp(-z))
            resid = sig - y.astype(np.float64)
            # mean features: dz/dw[bucket] = count/nf, so each OCCURRENCE
            # contributes resid/nf — quantized per doc pre-reduction
            rq = np.round(resid / np.maximum(nf, 1) * scale).astype(
                np.int64)
            rq_bias = np.round(resid * scale).astype(np.int64)
            # per-doc log-loss, quantized pre-reduction (same contract)
            eps = 1e-12
            loss = np.where(y, -np.log(sig + eps), -np.log(1.0 - sig + eps))
            lq = np.round(loss * scale).astype(np.int64)
            g = np.zeros(n_buckets, dtype=np.int64)
            for rows, b in occ:
                if len(rows):
                    np.add.at(g, b, rq[rows])
            return pa.table({
                "g": pa.FixedSizeListArray.from_arrays(
                    pa.array(g, pa.int64()), n_buckets),
                "gb": pa.array([int(rq_bias.sum())], pa.int64()),
                "loss_q": pa.array([int(lq.sum())], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64())})

        rows = proj.map_batches(partials, batch_format="pyarrow").take_all()
        g = np.zeros(n_buckets, dtype=np.int64)
        gb = loss_q = n = 0
        for r in rows:
            g += np.asarray(r["g"], dtype=np.int64)
            gb += r["gb"]
            loss_q += r["loss_q"]
            n += r["n"]
        if n == 0:
            raise ValueError("train_logreg_classifier: empty training set")
        if n_docs is None:
            n_docs = n
        loss_history.append(float(loss_q) / scale / n)
        gf = g.astype(np.float64) / scale
        w = w - lr * (gf / n + l2 * w)
        bias = bias - lr * (float(gb) / scale / n)
    return {"w": w, "bias": float(bias), "n_buckets": n_buckets,
            "seed": seed, "n_docs": int(n_docs),
            "loss_history": loss_history}


def logreg_classify(ds: Dataset, text_column: str, id_column: str,
                    model: dict, keep_columns: tuple = ()) -> Dataset:
    """Score every document with a :func:`train_logreg_classifier` model.
    Shuffle-free map-only pass; the float64 weight table rides the task
    closure (``ray.put`` it for 1e6+ buckets).  Output per doc:
    ``n_features``, ``logit_q = round(z * 2^40)`` (int64), ``prob``
    (sigmoid of the DEQUANTIZED logit — a pure function of ``logit_q``,
    so the float column is exactly fixture-replayable), and ``pred``
    (``logit_q > 0`` — the quantized decision boundary, documented: a
    true logit in (0, 2^-41) rounds to 0 and predicts negative).
    ``keep_columns`` pass extra input columns through verbatim (e.g. the
    label, for a downstream :func:`~malli_ray.stages.analytics.confusion_report`)."""
    import polars as pl

    w = np.ascontiguousarray(model["w"], dtype=np.float64)
    bias = float(model["bias"])
    seed = int(model["seed"])
    q = float(1 << 40)

    def score(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        z, nf, _ = _logreg_doc_logits(texts, w, bias, seed)
        zq = np.round(z * q).astype(np.int64)
        prob = 1.0 / (1.0 + np.exp(-(zq.astype(np.float64) / q)))
        out = pa.table({
            id_column: batch.column(id_column),
            "n_features": pa.array(nf, pa.int64()),
            "logit_q": pa.array(zq, pa.int64()),
            "prob": pa.array(prob, pa.float64()),
            "pred": pa.array((zq > 0).astype(np.int64), pa.int64())})
        for extra in keep_columns:
            out = out.append_column(extra, batch.column(extra))
        return out

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bigram LM scoring with stupid backoff (the CCNet/KenLM perplexity-filter
# shape, exact-integer fixed-point contract)
# ---------------------------------------------------------------------------

#: ln(0.4) backoff penalty at 2^40 fixed point (driver-side math.log — the
#: shared-libm scalar contract)
def _lm_q(x: float) -> int:
    import math
    return int(math.floor(math.log(x) * (1 << 40) + 0.5))


#: hash seeds for the hashed-bucket LM tables (shared by table build and
#: scorer lookups)
_LM_UNI_SEED, _LM_BI_SEED = 71, 73


class _BigramLMScorer:
    """Per-worker state: corpus unigram/bigram count tables from the
    object store — polars frames (joined vectorized per batch) in exact
    mode, sorted int64 bucket arrays (searchsorted lookups) in hashed
    mode — + a count->quantized-log cache that persists across batches."""

    def __init__(self, ref, text_column: str, id_column: str,
                 hashed_buckets: "int | None" = None):
        import polars as pl

        import ray
        uni_tbl, bi_tbl, total = (ray.get(ref)
                                  if not isinstance(ref, tuple) else ref)
        self.hashed = hashed_buckets is not None
        if self.hashed:
            self.H = int(hashed_buckets)
            self.uni_h = uni_tbl.column("h").to_numpy(zero_copy_only=False)
            self.uni_c = uni_tbl.column("cnt").to_numpy(
                zero_copy_only=False).astype(np.int64)
            self.bi_h = bi_tbl.column("h").to_numpy(zero_copy_only=False)
            self.bi_c = bi_tbl.column("cnt").to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            self.uni = pl.from_arrow(uni_tbl)
            self.bi = pl.from_arrow(bi_tbl)
        self.total = int(total)
        self.text_column = text_column
        self.id_column = id_column
        self.q_alpha = _lm_q(0.4)
        self.q_total = _lm_q(max(self.total, 1))
        self._qcache: dict = {0: 0}

    @staticmethod
    def _lookup(h: np.ndarray, keys: np.ndarray,
                vals: np.ndarray) -> np.ndarray:
        """Sorted-bucket count lookup: 0 where the bucket is absent."""
        if len(keys) == 0 or len(h) == 0:
            return np.zeros(len(h), dtype=np.int64)
        pos = np.minimum(np.searchsorted(keys, h), len(keys) - 1)
        return np.where(keys[pos] == h, vals[pos], 0)

    def _q(self, counts: np.ndarray) -> np.ndarray:
        """Vectorized count -> floor(ln(c) * 2^40 + 0.5) via a persistent
        scalar-math.log cache (distinct counts, not rows)."""
        uniq = np.unique(counts)
        for c in uniq.tolist():
            if c not in self._qcache:
                self._qcache[c] = _lm_q(c)
        lut_keys = np.array(sorted(self._qcache), dtype=np.int64)
        lut_vals = np.array([self._qcache[k] for k in lut_keys.tolist()],
                            dtype=np.int64)
        return lut_vals[np.searchsorted(lut_keys, counts)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        n_rows = batch.num_rows
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = (pl.from_arrow(col).fill_null("")
                 .str.extract_all(r"[^\t\n\f\r ]+"))
        lf = (pl.DataFrame({"w": words}).lazy()
              .with_row_index("doc")
              .explode("w", empty_as_null=True)
              .with_columns(w2=pl.col("w").shift(-1).over("doc"))
              .drop_nulls(["w", "w2"])
              .with_columns(pair=pl.concat_str(
                  [pl.col("w"), pl.col("w2")], separator=" ")))
        if self.hashed:
            from ..state.sketches import hash64
            df = lf.select(["doc", "w", "w2", "pair"]).collect()
            doc = df.get_column("doc").cast(pl.Int64).to_numpy()
            H = np.uint64(self.H)

            def _h(col, seed):
                arr = df.get_column(col).to_arrow().cast(pa.string())
                return (hash64(arr, seed=seed) % H).astype(np.int64)

            cb = self._lookup(_h("pair", _LM_BI_SEED),
                              self.bi_h, self.bi_c)
            cv = self._lookup(_h("w", _LM_UNI_SEED),
                              self.uni_h, self.uni_c)
            cw = self._lookup(_h("w2", _LM_UNI_SEED),
                              self.uni_h, self.uni_c)
        else:
            df = (lf.join(self.bi.lazy(), on="pair", how="left")
                  .join(self.uni.lazy(), left_on="w", right_on="w",
                        how="left")
                  .rename({"cw": "cv"})
                  .join(self.uni.lazy(), left_on="w2", right_on="w",
                        how="left")
                  .select(["doc", "cb", "cv", "cw"]).collect())
            doc = df.get_column("doc").cast(pl.Int64).to_numpy()
            cb = df.get_column("cb").fill_null(0).cast(pl.Int64).to_numpy()
            cv = df.get_column("cv").fill_null(0).cast(pl.Int64).to_numpy()
            cw = df.get_column("cw").fill_null(0).cast(pl.Int64).to_numpy()
        qb, qv, qw = self._q(cb), self._q(cv), self._q(cw)
        lp = np.where(
            cb > 0, qb - qv,
            np.where(cw > 0, self.q_alpha + qw - self.q_total,
                     -self.q_total)).astype(np.int64)
        lp_sum = np.zeros(n_rows, dtype=np.int64)
        n_bi = np.zeros(n_rows, dtype=np.int64)
        np.add.at(lp_sum, doc, lp)
        np.add.at(n_bi, doc, 1)
        denom = np.maximum(n_bi, 1).astype(np.float64) * float(1 << 40)
        avg = lp_sum.astype(np.float64) / denom
        batch = batch.append_column("n_bigrams", pa.array(n_bi, pa.int64()))
        batch = batch.append_column("lp_q", pa.array(lp_sum, pa.int64()))
        return batch.append_column("avg_logprob", pa.array(avg, pa.float64()))


def _hashed_lm_tables(corpus: Dataset, text_column: str,
                      hashed_buckets: int,
                      num_partitions: "int | None" = None
                      ) -> "tuple[pa.Table, pa.Table, int]":
    """Bounded hashed-bucket LM count tables (the DSIR-bucket shape): one
    corpus pass emits per-batch LOCAL (kind, bucket, cnt) partials where
    bucket = ``hash64(word or pair) % hashed_buckets`` — hashing happens
    MAP-SIDE, so the shuffle and both result tables are <= hashed_buckets
    rows each regardless of vocabulary size.  Returns (uni, bi, total)
    with each table sorted by bucket for searchsorted lookups."""
    import polars as pl

    from ray.data.aggregate import Sum

    H = np.uint64(int(hashed_buckets))

    def partials(batch: pa.Table) -> pa.Table:
        from ..state.sketches import hash64
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        words = texts.str.extract_all(r"[^\t\n\f\r ]+")
        df = (pl.DataFrame({"w": words}).lazy()
              .with_row_index("doc")
              .explode("w", empty_as_null=True)
              .with_columns(w2=pl.col("w").shift(-1).over("doc"))
              .collect())
        kinds, hs, cnts = [], [], []
        uni = df.drop_nulls("w")
        if uni.height:
            h = (hash64(uni.get_column("w").to_arrow().cast(pa.string()),
                        seed=_LM_UNI_SEED) % H).astype(np.int64)
            hh, cc = np.unique(h, return_counts=True)
            kinds.append(np.zeros(len(hh), dtype=np.int8))
            hs.append(hh)
            cnts.append(cc.astype(np.int64))
        bi = df.drop_nulls(["w", "w2"])
        if bi.height:
            pair = bi.select(pl.concat_str(
                [pl.col("w"), pl.col("w2")],
                separator=" ").alias("p")).get_column("p")
            h = (hash64(pair.to_arrow().cast(pa.string()),
                        seed=_LM_BI_SEED) % H).astype(np.int64)
            hh, cc = np.unique(h, return_counts=True)
            kinds.append(np.ones(len(hh), dtype=np.int8))
            hs.append(hh)
            cnts.append(cc.astype(np.int64))
        if not kinds:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "h": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({"kind": pa.array(np.concatenate(kinds)),
                         "h": pa.array(np.concatenate(hs)),
                         "cnt": pa.array(np.concatenate(cnts))})

    out = (corpus.select_columns([text_column])
           .map_batches(partials, batch_format="pyarrow")
           .groupby(["kind", "h"], num_partitions=num_partitions)
           .aggregate(Sum("cnt", alias_name="cnt")))
    parts = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    t = (pa.concat_tables(parts) if parts
         else pa.table({"kind": pa.array([], type=pa.int8()),
                        "h": pa.array([], type=pa.int64()),
                        "cnt": pa.array([], type=pa.int64())}))
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    h = t.column("h").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)

    def side(k: int) -> pa.Table:
        m = kind == k
        hh, cc = h[m], cnt[m]
        o = np.argsort(hh)
        return pa.table({"h": pa.array(hh[o], type=pa.int64()),
                         "cnt": pa.array(cc[o], type=pa.int64())})

    uni_tbl = side(0)
    total = int(cnt[kind == 0].sum())
    return uni_tbl, side(1), total


def bigram_lm_score(ds: Dataset, text_column: str, id_column: str,
                    corpus: "Dataset | None" = None,
                    concurrency=None,
                    min_count: int = 1,
                    max_vocab: int = 5_000_000,
                    max_bigrams: int = 20_000_000,
                    hashed_buckets: "int | None" = None) -> Dataset:
    """Per-doc bigram language-model log-probability with stupid backoff
    (Brants 2007) — the CCNet/KenLM-style perplexity quality signal:
    fluent prose scores near the corpus distribution, gibberish and
    boilerplate fall into the tails.  ``corpus`` (default: ``ds``
    itself) is the dataset the LM tables are built from — pass a
    held-out / reference corpus to score against it (CCNet scores
    Common Crawl against a Wikipedia LM).

    Spec (mirrored by the golden fixture): for each adjacent word pair
    (v, w): ``ln P = ln c(vw) - ln c(v)`` when the bigram was seen, else
    ``ln 0.4 + ln c(w) - ln N`` (unigram backoff), else ``-ln N``
    (uniform OOV).  Every log is quantized to 2^40 fixed point (scalar
    math.log per DISTINCT count, cached), so the per-doc sum ``lp_q`` is
    an exact int64 — order/partition-invariant — and ``avg_logprob`` is
    ONE IEEE division.

    Scale shape: two corpus passes build the unigram (word_stats) and
    bigram (cooccurrence_counts window=1) tables — both Zipf-collapsed
    map-side; the tables broadcast once via ray.put as ARROW tables
    (never Python lists), and scoring is a shuffle-free batch join.

    **Memory bound (exact mode)**: the exact tables are O(distinct
    words/bigrams) on the driver — unbounded at corpus scale with
    ``min_count=1``.  The build FAILS LOUD when the tables exceed
    ``max_vocab`` / ``max_bigrams`` (the bigram table's size is checked
    on the materialized dataset BEFORE any driver pull); raise
    ``min_count`` to prune the Zipf tail, or pass ``hashed_buckets`` to
    switch to the bounded DSIR-bucket variant: words and pairs hash to
    ``hash64(x) % hashed_buckets`` MAP-SIDE, so the shuffle, the
    broadcast tables and worker memory are all <= hashed_buckets rows
    regardless of vocabulary (documented trade: hash collisions merge a
    colliding pair's counts and smooth the LM slightly; with buckets >>
    vocabulary the scores are bit-identical to exact mode)."""
    import ray

    from . import cached_stage, concurrency_kwargs

    corpus = corpus if corpus is not None else ds
    if hashed_buckets is not None:
        uni_tbl, bi_tbl, total = _hashed_lm_tables(
            corpus, text_column, hashed_buckets)
        ref = ray.put((uni_tbl, bi_tbl, total))
        return ds.map_batches(
            cached_stage(_BigramLMScorer, ref=ref,
                         text_column=text_column, id_column=id_column,
                         hashed_buckets=int(hashed_buckets)),
            batch_format="pyarrow", **concurrency_kwargs(concurrency))

    stats = word_stats(corpus, text_column)
    if stats.num_rows > max_vocab:
        raise ValueError(
            f"bigram_lm_score: {stats.num_rows} distinct words > "
            f"max_vocab={max_vocab} — raise min_count / max_vocab or "
            f"pass hashed_buckets for the bounded variant")
    total = int(pc.sum(stats.column("cnt")).as_py() or 0)
    bi = cooccurrence_counts(corpus, text_column, window=1,
                             min_count=min_count).materialize()
    n_bigrams = bi.count()  # metadata on a materialized dataset
    if n_bigrams > max_bigrams:
        raise ValueError(
            f"bigram_lm_score: {n_bigrams} distinct bigrams > "
            f"max_bigrams={max_bigrams} — raise min_count / max_bigrams "
            f"or pass hashed_buckets for the bounded variant")
    parts = [pa.table(b) for b in bi.iter_batches(batch_format="pyarrow")]
    bi_arrow = (pa.concat_tables(parts) if parts
                else pa.table({"word_a": pa.array([], type=pa.string()),
                               "word_b": pa.array([], type=pa.string()),
                               "cnt": pa.array([], type=pa.int64())}))
    pair = pc.binary_join_element_wise(
        bi_arrow.column("word_a").combine_chunks(),
        bi_arrow.column("word_b").combine_chunks(), " ")
    uni_tbl = pa.table({"w": stats.column("word"),
                        "cw": stats.column("cnt")})
    bi_tbl = pa.table({"pair": pair, "cb": bi_arrow.column("cnt")})
    ref = ray.put((uni_tbl, bi_tbl, total))
    return ds.map_batches(
        cached_stage(_BigramLMScorer, ref=ref, text_column=text_column,
                     id_column=id_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


# ---------------------------------------------------------------------------
# token-id n-gram decontamination (the sequences-table sibling of
# ngram_contamination: benchmark probes are TOKEN windows, not strings)
# ---------------------------------------------------------------------------


def _prep_probes(probes):
    """Validate equal-length int probes and build the sorted rolling-hash
    index: returns ``(n, probe_hash_sorted, probe_mat_sorted)``."""
    probes = [np.asarray(p, dtype=np.int64) for p in probes]
    if not probes:
        raise ValueError("need at least one probe")
    n = len(probes[0])
    if n < 1 or any(len(p) != n for p in probes):
        raise ValueError("probes must be non-empty and equal-length")
    B = np.uint64(1099511628211)
    probe_mat = np.stack(probes)
    h = np.zeros(probe_mat.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(n):
            h = h * B + probe_mat[:, k].astype(np.uint64)
    order = np.argsort(h)
    return n, h[order], probe_mat[order]


def _probe_hit_starts(flat: np.ndarray, offs: np.ndarray, n: int,
                      ph: np.ndarray, pm: np.ndarray) -> np.ndarray:
    """Flat start indices of every EXACT probe match: one Horner
    rolling-hash pass over the flattened values buffer, row-boundary
    windows masked via the offsets, hash candidates verified
    element-wise ONLY against the probes sharing their hash (one
    aligned compare per candidate — O(cand x n), never the
    cand x probes x n tensor a 50k-probe decon suite would blow up
    on; probes sharing a 64-bit hash fall to a rare per-candidate
    loop, collision-safe either way)."""
    if len(flat) < n:
        return np.empty(0, dtype=np.int64)
    B = np.uint64(1099511628211)
    starts = np.arange(len(flat) - n + 1, dtype=np.int64)
    h = np.zeros(len(starts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(n):
            h = h * B + flat[k:k + len(starts)].astype(np.uint64)
    lens = np.diff(offs)
    pos_end = np.repeat(offs[1:], lens)          # row end per position
    fits = pos_end[starts] - starts >= n
    idx = np.searchsorted(ph, h)
    idx[idx >= len(ph)] = 0
    cand = np.flatnonzero((ph[idx] == h) & fits)
    if not len(cand):
        return cand.astype(np.int64)
    hc = h[cand]
    left = np.searchsorted(ph, hc, side="left")
    right = np.searchsorted(ph, hc, side="right")
    win = flat[cand[:, None] + np.arange(n)]
    ok = np.zeros(len(cand), dtype=bool)
    single = (right - left) == 1
    if single.any():
        s = np.flatnonzero(single)
        ok[s] = (win[s] == pm[left[s]]).all(axis=1)
    for j in np.flatnonzero(~single).tolist():   # shared probe hash: rare
        ok[j] = (pm[left[j]:right[j]] == win[j]).all(axis=1).any()
    return cand[ok].astype(np.int64)


def scrub_probe_token_spans(ds: Dataset, probes,
                            tokens_column: str = "tokens",
                            id_column: str = "doc_id",
                            out_column: str = "tokens_clean",
                            drop_count_column: str = "n_tokens_scrubbed",
                            concurrency=None) -> Dataset:
    """Benchmark decontamination by REMOVAL: drop every token covered by
    an exact benchmark probe n-gram match (overlapping matches merge)
    and rebuild the list column — the scrub sibling of
    :func:`token_ngram_contamination`, which only FLAGS.  The GPT-3
    appendix-C discipline applied surgically: the sequence survives,
    the benchmark substring does not.  Output: one row per input row —
    ``(id, out_column, drop_count_column)`` plus every other projected
    column verbatim.

    Scale shape: ENTIRELY map-only — the sorted probe-hash index rides
    the object store (read once per worker), each batch runs ONE Horner
    rolling-hash pass over the flattened values buffer, verifies
    candidates element-wise, and masks covered positions with the
    shared coverage-difference kernel (dedup._mask_token_lists).  No
    exchange at any corpus size."""
    import ray

    from . import cached_stage, concurrency_kwargs

    n, ph, pm = _prep_probes(probes)
    probes_ref = ray.put((ph, pm))
    val_type = (ds.schema().base_schema.field(tokens_column)
                .type.value_type)
    return ds.map_batches(
        cached_stage(_TokenSpanScrubber, ref=probes_ref, n=n,
                     tokens_column=tokens_column, id_column=id_column,
                     out_column=out_column,
                     drop_count_column=drop_count_column,
                     val_type=val_type),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _TokenSpanScrubber:
    """Actor-pool stage of :func:`scrub_probe_token_spans`: probe-hash
    index fetched once per worker, one rolling-hash scan + coverage mask
    per batch."""

    def __init__(self, ref, n, tokens_column, id_column, out_column,
                 drop_count_column, val_type):
        import ray
        self.ph, self.pm = ray.get(ref)
        self.n = n
        self.tokens_column = tokens_column
        self.id_column = id_column
        self.out_column = out_column
        self.drop_count_column = drop_count_column
        self.val_type = val_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _list_values_offsets, _mask_token_lists

        flat, offs = _list_values_offsets(batch.column(self.tokens_column))
        hits = _probe_hit_starts(flat.astype(np.int64, copy=False),
                                 offs, self.n, self.ph, self.pm)
        rows = np.searchsorted(offs, hits, side="right") - 1
        rel_start = hits - offs[rows]
        lists, dropped = _mask_token_lists(
            batch, self.tokens_column, rows, rel_start,
            rel_start + self.n, self.val_type)
        keep_cols = [c for c in batch.column_names
                     if c not in (self.id_column, self.tokens_column)]
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out_column: lists,
            self.drop_count_column: dropped,
            **{c: batch.column(c) for c in keep_cols}})


def token_ngram_contamination(ds: Dataset, probes,
                              tokens_column: str = "tokens",
                              id_column: str = "doc_id") -> Dataset:
    """Per-document hit counts of benchmark probe n-grams over a
    pre-tokenized sequence column — decontamination AFTER tokenization,
    when the raw text is gone (the north-rule table's shape).

    ``probes``: list of equal-length int sequences (mixed lengths = one
    call per length).  Exact — every rolling-hash candidate window is
    verified element-wise — and emits ONLY contaminated docs
    ``(id, n_hits)``, so the per-doc-id combine exchange carries O(hits)
    rows, never the corpus.

    Per batch: ONE Horner rolling-hash pass over the flattened values
    buffer (n vector ops for width n, zero-copy from Arrow), windows
    crossing a row boundary masked via the offsets, candidate membership
    by searchsorted against the sorted probe-hash array.  Wraparound
    uint64 arithmetic matches ``state.sketches.hash64``'s FNV base."""
    import ray
    from ray.data.aggregate import Sum

    n, ph_sorted, pm_sorted = _prep_probes(probes)
    probes_ref = ray.put((ph_sorted, pm_sorted))

    def scan(batch: pa.Table) -> pa.Table:
        from .dedup import _list_values_offsets

        ph, pm = ray.get(probes_ref)
        # null-safe offsets (null list rows read as empty) — raw
        # .offsets + .flatten() misalign window-to-row attribution when
        # null slots span non-zero-width offsets
        flat, offs = _list_values_offsets(batch.column(tokens_column))
        out_ids = batch.column(id_column).slice(0, 0)
        empty = pa.table({id_column: out_ids,
                          "n_hits": pa.array([], pa.int64())})
        hits = _probe_hit_starts(flat, offs, n, ph, pm)
        if not len(hits):
            return empty
        rows = np.searchsorted(offs, hits, side="right") - 1
        counts = np.bincount(rows, minlength=batch.num_rows)
        rowsel = np.flatnonzero(counts)
        return pa.table({
            id_column: batch.column(id_column).take(pa.array(rowsel)),
            "n_hits": pa.array(counts[rowsel], pa.int64())})

    flagged = ds.map_batches(scan, batch_format="pyarrow")
    # duplicate doc_ids are legal in the table — combine per id (tiny:
    # only contaminated rows reach the exchange)
    return (flagged.groupby(id_column)
            .aggregate(Sum("n_hits", alias_name="n_hits")))


def token_dup_ngram_stats(ds: Dataset, tokens_column: str = "tokens",
                          id_column: str = "doc_id", n: int = 2,
                          vocab: int = 50257) -> Dataset:
    """Within-sequence duplicate-n-gram fraction over a pre-tokenized
    column — the Gopher repetition signal (Rae 2021 §A1.1) computed on
    token ids when the raw text is gone.  High duplicate fraction =
    degenerate/boilerplate sequence.

    Exactness contract: each n-gram packs into ONE int64 in base
    ``vocab`` (requires ``vocab**n < 2**63`` — n<=3 at GPT-2 vocab;
    raises beyond), so "distinct" is EXACT integer equality — the SQL
    oracle's COUNT(DISTINCT slice) replays it with no hash-collision
    caveat.  Shuffle-free map-only pass: one flatten, one packed-gram
    vector, one lexsort per batch; per-row distincts via run-boundary
    masks (never a Python loop over rows).  Rows with fewer than n
    tokens emit nothing (they have no n-grams — SQL parity).

    Emits ``(id, dup_ngrams, total_ngrams, dup_frac)``; ``dup_frac`` is
    one IEEE division of two exact int64s."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if float(vocab) ** n >= float(2 ** 63):
        raise ValueError(
            f"vocab**n = {vocab}**{n} overflows the exact int64 gram "
            f"packing; use n <= {int(np.log(2.0 ** 63) / np.log(vocab))}")

    def stats(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = batch.column(id_column)
        empty = pa.table({
            id_column: ids.slice(0, 0),
            "dup_ngrams": pa.array([], pa.int64()),
            "total_ngrams": pa.array([], pa.int64()),
            "dup_frac": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(flat) < n:
            return empty
        grams = np.zeros(len(flat) - n + 1, dtype=np.int64)
        for k in range(n):
            grams = grams * vocab + flat[k:k + len(grams)]
        lens = np.diff(offs)
        pos_end = np.repeat(offs[1:], lens)
        starts = np.arange(len(grams), dtype=np.int64)
        fits = pos_end[starts] - starts >= n
        g = grams[fits]
        row = (np.searchsorted(offs, starts[fits], side="right") - 1)
        total = np.bincount(row, minlength=batch.num_rows).astype(np.int64)
        # per-row distinct grams via ONE sort + adjacent-equal run mask.
        # Fast path: (row, gram) packs into a single int64 key (row ids
        # are batch-local, so rows x vocab**n usually fits) — a
        # single-key np.sort is ~6x a two-key lexsort on 8M grams;
        # identical 'new' mask, bit-identical outputs.
        K = vocab ** n
        if batch.num_rows * K < 2 ** 63:
            sk = np.sort(row * K + g)
            new = np.ones(len(sk), dtype=bool)
            if len(sk) > 1:
                new[1:] = sk[1:] != sk[:-1]
            uniq = np.bincount((sk // K)[new],
                               minlength=batch.num_rows).astype(np.int64)
        else:
            order = np.lexsort((g, row))
            rs, gs = row[order], g[order]
            new = np.ones(len(gs), dtype=bool)
            if len(gs) > 1:
                new[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
            uniq = np.bincount(rs[new], minlength=batch.num_rows).astype(
                np.int64)
        keep = total > 0
        sel = np.flatnonzero(keep)
        dup = total[sel] - uniq[sel]
        return pa.table({
            id_column: ids.take(pa.array(sel)),
            "dup_ngrams": pa.array(dup, pa.int64()),
            "total_ngrams": pa.array(total[sel], pa.int64()),
            "dup_frac": pa.array(
                dup.astype(np.float64) / total[sel].astype(np.float64),
                pa.float64())})

    return ds.map_batches(stats, batch_format="pyarrow")


class _TokenRemapper:
    """Per-actor broadcast vocabulary remap table: fetch the mapping array
    ONCE per worker (``ray.get`` on the broadcast ref in ``__init__``),
    then each batch is one ``np.take`` over the flattened values buffer."""

    def __init__(self, tokens_column: str, mapping_ref, unk_id: int,
                 out: str | None):
        import ray
        m = (ray.get(mapping_ref)
             if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref)
        self.mapping = np.ascontiguousarray(np.asarray(m, dtype=np.int64))
        self.tokens_column = tokens_column
        self.unk_id = int(unk_id)
        self.out = out or tokens_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = batch.column(self.tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        if flat.null_count:  # null elements are out-of-vocab -> unk_id
            flat = pc.fill_null(flat, -1)
        v = flat.to_numpy(zero_copy_only=False).astype(np.int64)
        in_vocab = (v >= 0) & (v < len(self.mapping))
        new = np.full(len(v), self.unk_id, dtype=np.int64)
        new[in_vocab] = self.mapping[v[in_vocab]]
        off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        col = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()),
            pa.array(new, type=pa.int64()).cast(val_type))
        idx = batch.schema.get_field_index(self.out)
        if idx >= 0:
            return batch.set_column(idx, self.out, col)
        return batch.append_column(self.out, col)


def remap_token_ids(ds: Dataset, mapping, tokens_column: str = "tokens",
                    unk_id: int = 0, out: str | None = None,
                    concurrency=None) -> Dataset:
    """Vocabulary surgery / tokenizer-migration remap: rewrite every token
    id through a broadcast old->new lookup table (``mapping[old] = new``);
    ids outside ``[0, len(mapping))`` map to ``unk_id``.  The re-tokenize-
    by-table step of a vocab swap (merge two vocabs, drop ids, renumber
    after pruning) — cheap enough to run over the full corpus because it
    never re-tokenizes text.

    Scale shape: the table broadcasts ONCE (``ray.put``; a 100k-entry
    vocab is ~800 KB) and is fetched once per worker (actor-style
    ``__init__`` via the stage cache, zero-copy from the local object
    store); each batch is one vectorized gather over the flattened values
    buffer — map-only, shuffle-free, list offsets preserved.  Output list
    values keep the input value type (overflowing ids fail loud in the
    cast)."""
    import ray
    from . import cached_stage

    m = np.asarray(mapping, dtype=np.int64)
    if m.ndim != 1:
        raise ValueError("remap_token_ids: mapping must be 1-D")
    mapping_ref = ray.put(m)
    return ds.map_batches(
        cached_stage(_TokenRemapper, tokens_column=tokens_column,
                     mapping_ref=mapping_ref, unk_id=unk_id, out=out),
        batch_format="pyarrow", **_conc(concurrency))


def add_sentinel_tokens(ds: Dataset, tokens_column: str = "tokens",
                        bos_id: int | None = None,
                        eos_id: int | None = None,
                        out: str | None = None,
                        count_column: str | None = None) -> Dataset:
    """Sentinel-token insertion (the tokenize -> pack seam of a GPT-style
    pipeline): prepend ``bos_id`` and/or append ``eos_id`` to every token
    list, so document boundaries survive concat-and-cut packing
    (:func:`malli_ray.stages.packing.assemble_packed_blocks` then needs no
    separator logic of its own).  Null lists count as empty — they still
    mark a document, so they get sentinels too (SQL parity:
    ``[bos] || COALESCE(tokens, []) || [eos]``).  ``count_column`` (when
    given) is refreshed to the new length.

    Map-only, shuffle-free: one output values allocation + one vectorized
    scatter per batch; list offsets rebuilt by cumsum."""
    if bos_id is None and eos_id is None:
        raise ValueError("add_sentinel_tokens: pass bos_id and/or eos_id")
    nb = 1 if bos_id is not None else 0
    ne = 1 if eos_id is not None else 0
    target = out or tokens_column

    def add(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        v = toks.flatten().to_numpy(zero_copy_only=False)
        rows = batch.num_rows
        new_n = n + nb + ne
        new_off = np.zeros(rows + 1, dtype=np.int64)
        np.cumsum(new_n, out=new_off[1:])
        out_v = np.empty(int(new_off[-1]), dtype=np.int64)
        if nb:
            out_v[new_off[:-1]] = bos_id
        if ne:
            out_v[new_off[1:] - 1] = eos_id
        # scatter the original values into their shifted positions
        idx = np.repeat(new_off[:-1] + nb, n) \
            + (np.arange(len(v), dtype=np.int64)
               - np.repeat(np.cumsum(n) - n, n))
        out_v[idx] = v
        col = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), type=pa.int32()),
            pa.array(out_v, type=pa.int64()).cast(val_type))
        i = batch.schema.get_field_index(target)
        batch = (batch.set_column(i, target, col) if i >= 0
                 else batch.append_column(target, col))
        if count_column is not None:
            ci = batch.schema.get_field_index(count_column)
            cnt = pa.array(new_n, type=pa.int64())
            if ci >= 0:
                cnt = cnt.cast(batch.schema.field(ci).type)
                batch = batch.set_column(ci, count_column, cnt)
            else:
                batch = batch.append_column(count_column, cnt)
        return batch

    return ds.map_batches(add, batch_format="pyarrow")


def fim_transform(ds: Dataset, tokens_column: str = "tokens",
                  cut1_column: str = "fim_c1", cut2_column: str = "fim_c2",
                  pre_id: int = 50281, suf_id: int = 50283,
                  mid_id: int = 50282, mode: str = "psm",
                  out: str | None = None,
                  count_column: str | None = None,
                  drop_cut_columns: bool = True) -> Dataset:
    """Fill-in-the-middle reordering of token sequences (Bavarian 2022,
    "Efficient Training of Language Models to Fill in the Middle"): each
    document splits at two cut points into (prefix, middle, suffix) and is
    re-emitted with sentinel tokens so an autoregressive model learns to
    infill:

      - ``psm``: ``[pre] prefix [suf] suffix [mid] middle``
      - ``spm``: ``[pre] [suf] suffix [mid] prefix middle`` (the paper's
        joined suffix-prefix-middle variant — no sentinel between prefix
        and middle)

    Cut points come from COLUMNS (``cut1_column``/``cut2_column``) so the
    caller controls the randomness source deterministically (a seeded RNG,
    a hash of the id, a fixed fraction); they are clamped to
    ``0 <= c1 <= c2 <= n`` and nulls read as 0.  Null token lists count as
    empty (output = the three sentinels).  Output length is always
    ``n + 3``; ``count_column`` (when given) is refreshed.

    Map-only, shuffle-free: per batch one output values allocation, one
    vectorized gather for the token pieces, and one scatter for the
    sentinels — the same kernel shape as :func:`add_sentinel_tokens`."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"fim_transform: mode must be psm|spm, got {mode!r}")
    target = out or tokens_column

    def fim(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        rows = batch.num_rows
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        v = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = pc.fill_null(pc.cast(batch.column(cut1_column), pa.int64()),
                          0).to_numpy(zero_copy_only=False)
        c2 = pc.fill_null(pc.cast(batch.column(cut2_column), pa.int64()),
                          0).to_numpy(zero_copy_only=False)
        c1 = np.clip(c1, 0, n)
        c2 = np.clip(c2, c1, n)
        doc_off = np.cumsum(n) - n
        one = np.ones(rows, dtype=np.int64)
        zero = np.zeros(rows, dtype=np.int64)
        if mode == "psm":
            # [pre] prefix [suf] suffix [mid] middle
            L = np.column_stack([one, c1, one, n - c2, one, c2 - c1])
            srel = np.column_stack([zero, zero, zero, c2, zero, c1])
            sent_piece = np.array([True, False, True, False, True, False])
            sent_vals = np.array([pre_id, 0, suf_id, 0, mid_id, 0],
                                 dtype=np.int64)
        else:
            # [pre] [suf] suffix [mid] prefix middle
            L = np.column_stack([one, one, n - c2, one, c1, c2 - c1])
            srel = np.column_stack([zero, zero, c2, zero, zero, c1])
            sent_piece = np.array([True, True, False, True, False, False])
            sent_vals = np.array([pre_id, suf_id, 0, mid_id, 0, 0],
                                 dtype=np.int64)
        Lf = L.ravel()
        src = (doc_off[:, None] + srel).ravel()
        tot = int(Lf.sum())
        pstart = np.cumsum(Lf) - Lf
        intra = np.arange(tot, dtype=np.int64) - np.repeat(pstart, Lf)
        sent_f = np.tile(sent_piece, rows)
        tok_pos = np.repeat(~sent_f, Lf)
        out_v = np.empty(tot, dtype=np.int64)
        src_flat = np.repeat(src, Lf) + intra
        out_v[tok_pos] = v[src_flat[tok_pos]]
        out_v[pstart[sent_f]] = np.tile(sent_vals[sent_piece], rows)
        new_n = n + 3
        new_off = np.zeros(rows + 1, dtype=np.int64)
        np.cumsum(new_n, out=new_off[1:])
        col = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), type=pa.int32()),
            pa.array(out_v, type=pa.int64()).cast(val_type))
        i = batch.schema.get_field_index(target)
        batch = (batch.set_column(i, target, col) if i >= 0
                 else batch.append_column(target, col))
        if count_column is not None:
            ci = batch.schema.get_field_index(count_column)
            cnt = pa.array(new_n, type=pa.int64())
            if ci >= 0:
                cnt = cnt.cast(batch.schema.field(ci).type)
                batch = batch.set_column(ci, count_column, cnt)
            else:
                batch = batch.append_column(count_column, cnt)
        if drop_cut_columns:
            keep = [c for c in batch.column_names
                    if c not in (cut1_column, cut2_column)]
            batch = batch.select(keep)
        return batch

    return ds.map_batches(fim, batch_format="pyarrow")


def add_loss_mask(ds: Dataset, tokens_column: str = "tokens",
                  prompt_len_column: str = "prompt_len",
                  out: str = "loss_mask") -> Dataset:
    """SFT loss-mask generation: per sequence, a ``list<int8>`` aligned
    with the tokens — 0 for the first ``prompt_len`` positions (the
    prompt is context, not a training target), 1 for the completion.
    ``prompt_len`` clamps to [0, len(tokens)]; null prompt lengths read
    as 0 (everything trains); null token lists emit empty masks.

    Map-only, shuffle-free, one comparison per token: positions rebuild
    from the list offsets and the mask is a single vectorized
    ``position >= prompt_len`` gather — SQL replays it with an indexed
    ``list_transform``."""

    def mask(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        p = (pc.fill_null(pc.cast(batch.column(prompt_len_column),
                                  pa.int64()), 0)
             .to_numpy(zero_copy_only=False))
        p = np.clip(p, 0, n)
        off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        pos = (np.arange(int(off[-1]), dtype=np.int64)
               - np.repeat(off[:-1], n))
        m = (pos >= np.repeat(p, n)).astype(np.int8)
        col = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()),
            pa.array(m, type=pa.int8()))
        i = batch.schema.get_field_index(out)
        return (batch.set_column(i, out, col) if i >= 0
                else batch.append_column(out, col))

    return ds.map_batches(mask, batch_format="pyarrow")


def shift_labels(ds: Dataset, tokens_column: str = "tokens",
                 out: str = "labels", pad_id: int = -100) -> Dataset:
    """Next-token prediction labels: ``labels[i] = tokens[i+1]`` with the
    final position set to ``pad_id`` (the loss-ignore convention) — the
    last map-only step before a training loader consumes the table.  Null
    lists count as empty (empty labels).  Keeps the input column; the
    label list has the same length and value type as the input
    (``pad_id`` must fit the value type — the cast raises otherwise).

    Map-only, shuffle-free: one shifted copy of the values buffer per
    batch; row boundaries fixed by a vectorized scatter of ``pad_id`` at
    each row's last slot."""

    def shift(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        rows = batch.num_rows
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        v = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.zeros(rows + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        tot = int(off[-1])
        out_v = np.empty(tot, dtype=np.int64)
        if tot:
            out_v[:-1] = v[1:]
        lasts = off[1:][n > 0] - 1
        out_v[lasts] = pad_id
        col = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), type=pa.int32()),
            pa.array(out_v, type=pa.int64()).cast(val_type))
        i = batch.schema.get_field_index(out)
        return (batch.set_column(i, out, col) if i >= 0
                else batch.append_column(out, col))

    return ds.map_batches(shift, batch_format="pyarrow")


def token_type_stats(ds: Dataset, tokens_column: str = "tokens",
                     id_column: str = "doc_id") -> Dataset:
    """Per-sequence type/token statistics on the token-id lists: ``n_tok``
    (list length), ``n_distinct`` (distinct token ids), ``n_repeated``
    (n_tok - n_distinct), and ``ttr`` (type-token ratio, one exact
    int/int double division) — the tokenized analogue of the
    text-quality repetition signals (a near-zero TTR flags degenerate
    looping sequences; Rae 2021's repetition filters, applied to ids).

    Map-only, one pass, fully vectorized: rows pack as ``row << 32 |
    token`` (ids validated to [0, 2**32) — both bounds raise) and ONE
    sort + run mask per batch counts distinct ids per row.  Empty/null
    token rows emit NULL ``ttr`` (0/0), exactly as the SQL replay's
    ``n_distinct / n_tok`` evaluates in DuckDB.  SQL replay:
    ``len(list_distinct(tokens))``."""
    from .dedup import _list_values_offsets

    def stats(batch: pa.Table) -> pa.Table:
        values, offsets = _list_values_offsets(batch.column(tokens_column))
        n = batch.num_rows
        lengths = np.diff(offsets)
        if len(values) and (values.min() < 0 or
                            values.max() >= np.int64(1) << np.int64(32)):
            raise ValueError("token_type_stats: token id outside "
                             "[0, 2**32) — the row<<32|token pack needs "
                             "ids that fit 32 bits")
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        key = np.sort((row << np.int64(32)) | values)
        uniq = np.ones(len(key), dtype=bool)
        uniq[1:] = key[1:] != key[:-1]
        n_distinct = np.bincount(key[uniq] >> np.int64(32),
                                 minlength=n).astype(np.int64)
        # empty/null rows get NULL ttr (0/0), matching SQL's
        # n_distinct/n_tok which DuckDB evaluates to NULL for n_tok = 0
        ttr = n_distinct / np.maximum(lengths, 1)
        empty = lengths == 0
        return pa.table({
            id_column: batch.column(id_column),
            "n_tok": pa.array(lengths, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "n_repeated": pa.array(lengths - n_distinct, pa.int64()),
            "ttr": pa.array(ttr, pa.float64(),
                            mask=empty if empty.any() else None)})

    return ds.map_batches(stats, batch_format="pyarrow")


def token_rarity(ds: Dataset, tokens_column: str = "tokens",
                 id_column: str = "doc_id",
                 vocab_range: tuple = (0, 50257)) -> Dataset:
    """Corpus-frequency rarity scoring on token ids (the CCNet-style
    quality signal of Wenzek 2019, kept exactly integer so SQL can replay
    it bit-for-bit): pass 1 counts every token's corpus frequency, pass 2
    scores each document with

      - ``rarity_sum``: sum over its tokens of the corpus count (int64),
      - ``rarity_min``: the rarest token's corpus count (int64; 0 for
        empty/null lists),
      - ``n_tok``: token count.

    Low ``rarity_min`` flags corrupt/garbage sequences (tokens almost
    nobody uses); ``rarity_sum / n_tok`` is the mean-frequency filter.

    Scale shape: pass 1 is :func:`malli_ray.stages.analytics
    .list_value_counts` in its bounded mode — each batch emits ONE
    fixed-size np.bincount vector (out-of-range tokens RAISE — this
    table's contract is validated ids) and a single constant-key reduce
    sums the vectors, with NO per-key shuffle at all (the original
    ``(token, cnt)``-row groupby shipped ~vocab rows PER BATCH into the
    hash exchange — ~24M rows at sf0.1 under the default 1024-row batch
    size, 28 s of the measured 33 s; this path runs in ~2 s).  The count
    vector (8 B x vocab, ~400 KB at 50k) broadcasts via ``ray.put`` and
    pass 2 is one map-only gather + two segment reductions per batch.
    No unbounded driver state — the driver holds exactly one
    vocab-length vector."""
    import ray

    from .analytics import list_value_counts

    lo, hi = int(vocab_range[0]), int(vocab_range[1])
    if hi <= lo:
        raise ValueError("token_rarity: empty vocab_range")

    rows = list_value_counts(ds, tokens_column, out_value="token",
                             out_count="cnt",
                             bounded_range=(lo, hi)).take_all()  # O(vocab)
    vec = np.zeros(hi - lo, dtype=np.int64)
    for r in rows:
        vec[int(r["token"]) - lo] = int(r["cnt"])
    vec_ref = ray.put(vec)

    def score(batch: pa.Table) -> pa.Table:
        counts = ray.get(vec_ref)
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        v = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        g = counts[v - lo]
        off = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        c = np.zeros(len(g) + 1, dtype=np.int64)
        np.cumsum(g, out=c[1:])
        rsum = c[off[1:]] - c[off[:-1]]
        rmin = np.zeros(len(n), dtype=np.int64)
        nz = n > 0
        if nz.any():
            rmin[nz] = np.minimum.reduceat(g, off[:-1][nz])
        return pa.table({
            id_column: batch.column(id_column),
            "n_tok": pa.array(n, pa.int64()),
            "rarity_sum": pa.array(rsum, pa.int64()),
            "rarity_min": pa.array(rmin, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")
