"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().

- ``entry()``: flagship fused validation pipeline over the synthesized
  north-rule `sequences` table at sf0.001 (BASELINE.json input_hint) —
  returns the violations table.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md SS2 +
  the training-data ops); each callable takes ``sf_dir`` and returns a
  Dataset / pandas DataFrame / pyarrow Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query
  (identical column names); non-SQL ops (sketches, LSH, fingerprints,
  inference) are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# shared specs
# ---------------------------------------------------------------------------

_DOC_LANGS = ["en", "es", "de", "fr"]          # zh rows violate (by design)
_DOC_SOURCES = [f"src{i}" for i in range(16)]  # src16-19 violate
_DOC_MIN_CHARS = 50                            # a few short docs violate

DOC_DSL = ["map",
           ["doc_id", "int"],
           ["text", ["string", {"min": 1}]],
           ["lang", ["enum", *_DOC_LANGS]],
           ["source", ["enum", *_DOC_SOURCES]],
           ["n_chars", ["int", {"min": _DOC_MIN_CHARS}]]]

_EVENT_TYPES_OK = ["click", "view", "purchase"]


def _doc_spec():
    from malli_ray.stages.validator import ValidationSpec
    return ValidationSpec(schema=DOC_DSL, id_column="doc_id")


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _seq_paths(sf: float):
    from malli_ray.sources.sequences import ensure_sequences, sequences_dir_for
    d, n = sequences_dir_for(sf)
    return ensure_sequences(d, n)


def _sf_of(sf_dir: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: fused checkpointed validation job over the sequences table
    (sf0.001), returning the violation rows."""
    import glob
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.sources.sequences import ALLOWED_SOURCES, SEQUENCES_DSL
    from malli_ray.stages.validator import ValidationSpec

    paths = _seq_paths(0.001)
    spec = ValidationSpec(
        schema=SEQUENCES_DSL,
        checks=[{"kind": "list_len_eq", "list_col": "tokens", "len_col": "n_tok",
                 "name": "n_tok_consistency"},
                {"kind": "in_set", "column": "source", "allowed": ALLOWED_SOURCES,
                 "name": "referential_source"}],
        id_column="doc_id",
        hll_columns=["doc_id"], tdigest_columns=["n_tok"], hist_columns=["source"])
    ds = rd.read_parquet(paths)
    return vj.explain(ds, spec)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_validate_documents(sf_dir: str):
    from malli_ray.pipelines import validation_job as vj
    ds = _read(sf_dir, "documents")
    out = vj.validate(ds, _doc_spec())
    return out.select_columns(["doc_id", "valid"])


def _q_violations_documents(sf_dir: str):
    from malli_ray.pipelines import validation_job as vj
    ds = _read(sf_dir, "documents")
    vio = vj.explain(ds, _doc_spec())
    return vio.select_columns(["id", "column"])


def _q_verdict_by_source(sf_dir: str):
    import pyarrow.compute as pc
    from malli_ray.pipelines import validation_job as vj
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents")
    v = vj.validate(ds, _doc_spec())

    def to_int(batch: pa.Table) -> pa.Table:
        return batch.append_column("valid_i", batch.column("valid").cast(pa.int64()))

    v = v.map_batches(to_int, batch_format="pyarrow")
    return (v.groupby("source")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("valid_i", alias_name="n_valid")))


def _q_column_stats_documents(sf_dir: str):
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.stages.validator import ValidationSpec

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    rep = vj.summarize(ds, ValidationSpec(schema=["map"]))
    rows = []
    for col in ("doc_id", "n_chars"):
        s = rep["stats"][col]
        rows.append({"column_name": col, "n": s["count"],
                     "null_count": s["null_count"],
                     "min_v": int(s["min"]), "max_v": int(s["max"])})
    return pa.Table.from_pylist(rows)


def _q_unique_violations_events(sf_dir: str):
    from malli_ray.stages import constraints as C
    ds = _read(sf_dir, "events", columns=["user_id"])
    return C.uniqueness_violations(ds, "user_id")


def _q_referential_events(sf_dir: str):
    from malli_ray.stages import constraints as C
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
    return C.check_referential(ds, "event_type", _EVENT_TYPES_OK)


def _q_hist_source_documents(sf_dir: str):
    from malli_ray.stages import constraints as C
    hist = C.histogram(_read(sf_dir, "documents", columns=["source"]), "source")
    return pa.Table.from_pylist(
        [{"source": k, "cnt": v} for k, v in sorted(hist.items())])


def _q_hist_nchars_documents(sf_dir: str):
    """Numeric drift histogram (fixed edges) for n_chars; empty bins dropped
    to match SQL GROUP BY semantics."""
    from malli_ray.stages.constraints import numeric_histogram
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    hist = numeric_histogram(ds, "n_chars", edges=list(range(0, 1100, 100)))
    rows = [{"bin": int(k.split("_")[1]), "cnt": v}
            for k, v in sorted(hist.items()) if v > 0]
    return pa.Table.from_pylist(rows)


def _q_quality_documents(sf_dir: str):
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return T.add_quality(ds, "text").select_columns(
        ["doc_id", "n_words", "punct_ratio", "stop_ratio", "quality"])


def _q_dedup_exact_documents(sf_dir: str):
    from malli_ray.stages import dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.exact_dedup_keep_first(ds, "text", "doc_id")


def _q_token_count_documents(sf_dir: str):
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return T.add_token_count(ds, "text").select_columns(["doc_id", "n_tokens"])


def _q_redact_documents(sf_dir: str):
    """PII-scrub stage demo: the corpus is synthetic word salad, so the
    demo patterns redact a word + digit runs; the stage takes arbitrary
    RE2 patterns (text.PII_PATTERNS is the real default set)."""
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = T.redact(ds, "text", patterns=(r"\bcustomer\b", r"\d+"),
                   replacement="[X]", out="text_redacted")
    return out.select_columns(["doc_id", "text_redacted"])


def _q_pack_blocks_documents(sf_dir: str):
    """Training-shard packing: chunk documents into ~4000-char blocks per
    source (one groupby shuffle + vectorized per-group cumsum; SQL window
    oracle)."""
    from malli_ray.stages import packing
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return packing.chunk_blocks(ds, "source", "doc_id", "n_chars", cap=4000)


def _q_corpus_prep_documents(sf_dir: str):
    """Composed corpus-prep flagship: exact dedup (keep min id) -> Gopher
    repetition filter (< 0.6) -> pack into 4000-char blocks per source.
    Three stages, two shuffles (dedup groupby + packing groupby) plus one
    semi-join; payload columns never enter a shuffle."""
    from malli_ray.stages import dedup, joins, packing, text as T
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "source", "n_chars"])
    kept = dedup.exact_dedup_keep_first(ds, "text", "doc_id")
    d = joins.semi_join(ds, kept, on="doc_id")
    d = T.add_repetition(d, "text")
    d = d.filter(expr="rep_ratio < 0.6")
    return packing.chunk_blocks(d, "source", "doc_id", "n_chars", cap=4000)


def _q_repetition_documents(sf_dir: str):
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return T.add_repetition(ds, "text").select_columns(["doc_id", "rep_ratio"])


def _q_contamination_documents(sf_dir: str):
    """Benchmark decontamination: probes = 40-char prefixes of three fixed
    docs, broadcast once; one vectorized literal scan per probe per batch."""
    import pyarrow.parquet as pq
    from malli_ray.stages import text as T
    probe_ids = [0, 1, 2]
    tt = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"],
                       filters=[("doc_id", "in", probe_ids)])
    lookup = dict(zip(tt.column("doc_id").to_pylist(),
                      tt.column("text").to_pylist()))
    probes = [(i, lookup[i][:40]) for i in probe_ids]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return T.contamination_pairs(ds, "text", "doc_id", probes)


def _q_text_counts_documents(sf_dir: str):
    import pyarrow.compute as pc
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, r"[^\w\s]").cast(pa.int64()),
            "n_digit": pc.count_substring_regex(text, r"\d").cast(pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


def _q_ann_topk_embeddings(sf_dir: str):
    import pyarrow.parquet as pq
    from malli_ray.stages.similarity import topk_cosine

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.slice(0, 3)
    queries = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = topk_cosine(ds, queries, "embedding", "vec_id", k=5)
    return out.select_columns(["query_id", "vec_id"])


def _q_events_daily(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def day(batch: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(batch.column("ts"), "%Y-%m-%d"),
                         "event_type": batch.column("event_type")})

    return (ds.map_batches(day, batch_format="pyarrow")
            .groupby(["day", "event_type"]).aggregate(Count(alias_name="n")))


def _q_q1_lineitem(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"),
                       type=pa.timestamp("us"))
    ds = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["l_shipdate"], cutoff)),
        batch_format="pyarrow")

    def qty_int(batch: pa.Table) -> pa.Table:
        return batch.append_column("qty_i",
                                   batch.column("l_quantity").cast(pa.int64()))

    ds = ds.map_batches(qty_int, batch_format="pyarrow")
    return (ds.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_i", alias_name="sum_qty"),
                       Count(alias_name="count_order")))


def _q_top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def _q_orders_by_nation(sf_dir: str):
    """Broadcast join: customer (small) shipped to actors as a dict; orders
    stream through and group by nation."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    order_srt = np.argsort(cust.column("c_custkey").to_numpy())
    lookup_ref = ray.put((cust.column("c_custkey").to_numpy()[order_srt],
                          cust.column("c_nationkey").to_numpy()[order_srt]))

    class AttachNation:
        """Broadcast hash-join side held once per actor; vectorized
        searchsorted probe per batch (never a Python loop over keys)."""

        def __init__(self, ref):
            self.keys, self.vals = (ray.get(ref)
                                    if isinstance(ref, ray.ObjectRef) else ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            probe = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.keys, probe)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            nk = np.where(self.keys[idx] == probe, self.vals[idx], -1)
            return batch.append_column("n_nationkey",
                                       pa.array(nk, type=pa.int64()))

    from malli_ray.stages import cached_stage
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ds = ds.map_batches(cached_stage(AttachNation, ref=lookup_ref),
                        batch_format="pyarrow")
    return ds.groupby("n_nationkey").aggregate(Count(alias_name="order_count"))


def _q_filter_lineitem(sf_dir: str):
    import pyarrow.compute as pc
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    ds = ds.map_batches(lambda t: t.filter(pc.greater(t["l_quantity"], 45.0)),
                        batch_format="pyarrow")

    def qty_i(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_linenumber": batch.column("l_linenumber").cast(pa.int64()),
                         "qty": batch.column("l_quantity").cast(pa.int64())})

    return ds.map_batches(qty_i, batch_format="pyarrow")


def _q_events_window_30m(sf_dir: str):
    from malli_ray.stages.windows import tumbling_window
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    return tumbling_window(ds, "ts", 30, ["event_type"])


def _q_median_value_by_type(sf_dir: str):
    """Per-group EXACT quantiles via groupby + map_groups (sort-based,
    deterministic — unlike float sums, safe for value-hash comparison).
    The t-digest sketch path (validate_sequences) is the at-scale
    approximation; this is the exact small-group counterpart."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def quantiles(group: pa.Table) -> pa.Table:
        v = group.column("value").drop_null().to_numpy(zero_copy_only=False)
        v = np.sort(v)
        q = (np.quantile(v, [0.5, 0.9], method="linear")
             if len(v) else np.array([None, None]))
        return pa.table({
            "event_type": [group.column("event_type")[0].as_py()],
            "p50": pa.array([q[0]], type=pa.float64()),
            "p90": pa.array([q[1]], type=pa.float64())})

    return ds.groupby("event_type").map_groups(quantiles,
                                               batch_format="pyarrow")


def _q_events_hopping(sf_dir: str):
    """Hopping window: 30-minute windows every 15 minutes (each event in 2
    overlapping windows)."""
    from malli_ray.stages.windows import hopping_window
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    return hopping_window(ds, "ts", size_minutes=30, hop_minutes=15,
                          key_cols=["event_type"])


def _q_sessions_events(sf_dir: str):
    from malli_ray.stages.windows import sessionize
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ds, "user_id", "ts", gap_minutes=30)


def _q_asof_prev_event(sf_dir: str):
    """Self as-of join: each event paired with the same user's latest strictly
    earlier event."""
    import pyarrow.compute as pc
    from malli_ray.stages.windows import asof_join

    left = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    right = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def rename_r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["prev_event_id", "user_id", "ts"])

    right = right.map_batches(rename_r, batch_format="pyarrow")
    joined = asof_join(left, right, key="user_id", left_ts="ts",
                       right_ts="ts", right_cols=["prev_event_id"],
                       suffix="_prev", strict=True)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id"),
            "prev_event_id": batch.column("prev_event_id_prev").cast(pa.int64()),
        })

    return joined.map_batches(project, batch_format="pyarrow")


#: orn over the events.value double column — branch tags in first-match-wins
#: parse order (m/parse + Tag, src/malli/core.cljc:2684-2714, 164-183)
EVENTS_VALUE_ORN = ["orn",
                    ["neg", ["<", 0.0]],
                    ["small", ["<=", 10.0]],
                    ["large", "double"]]


def _q_join_priority_qty(sf_dir: str):
    """Big-big hash join (lineitem x orders) -> group by order priority."""
    from malli_ray.stages.joins import hash_join
    from ray.data.aggregate import Count, Sum
    import pyarrow.compute as pc

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def qty_i(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "qty_i": batch.column("l_quantity").cast(pa.int64())})

    li = li.map_batches(qty_i, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    return (joined.groupby("o_orderpriority")
            .aggregate(Sum("qty_i", alias_name="total_qty"),
                       Count(alias_name="n_items")))


def _q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no high-value (>400k) order."""
    import pyarrow.compute as pc
    from malli_ray.stages.joins import anti_join

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    return anti_join(cust, big, on="c_custkey", right_on="o_custkey")


def _q_vocab_top_words(sf_dir: str):
    """Corpus vocabulary: top-100 words by frequency (map-side combined)."""
    from malli_ray.stages.text import top_words
    ds = _read(sf_dir, "documents", columns=["text"])
    return top_words(ds, "text", k=100)


def _q_tokenize_documents(sf_dir: str):
    """Two-phase tokenizer: learn the top-100 vocab (one corpus groupby),
    broadcast it, flat-map every doc to (doc_id, pos, token_id) rows
    (rank 1..100; out-of-vocab words -> 0)."""
    from malli_ray.stages.text import tokenize_with_vocab, top_words

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab_rows = top_words(_read(sf_dir, "documents", columns=["text"]),
                           "text", k=100).take_all()
    vocab = {r["word"]: i + 1 for i, r in enumerate(vocab_rows)}
    return tokenize_with_vocab(docs, "text", "doc_id", vocab)


def _q_stratified_sample_documents(sf_dir: str):
    """Deterministic stratified head: first 3 doc_ids per source."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def first_k(group: pa.Table) -> pa.Table:
        g = group.sort_by([("doc_id", "ascending")])
        return g.slice(0, 3)

    return ds.groupby("source").map_groups(first_k, batch_format="pyarrow")


def _q_parse_events_orn(sf_dir: str):
    """Vectorized batch parse projection: Tag branch per row as a struct
    column, projected to (event_id, branch, parsed_value)."""
    import pyarrow.compute as pc
    from malli_ray.stages.parse_stage import parse_projection

    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    parsed = parse_projection(ds, EVENTS_VALUE_ORN, "value", out="parsed")

    def project(batch: pa.Table) -> pa.Table:
        p = batch.column("parsed")
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        return pa.table({"event_id": batch.column("event_id"),
                         "branch": pc.struct_field(p, "tag"),
                         "parsed_value": pc.struct_field(p, "value")})

    return parsed.map_batches(project, batch_format="pyarrow")


def _q_decode_events_props(sf_dir: str):
    import pyarrow.compute as pc
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def decode(batch: pa.Table) -> pa.Table:
        k = pc.extract_regex(batch.column("props"), r"\"k\": (?P<k>\d+)")
        kv = pc.struct_field(k, [0]).cast(pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k": kv})

    return ds.map_batches(decode, batch_format="pyarrow")


# -- rows-only (non-SQL-expressible) ops ------------------------------------


def _q_lang_id_documents(sf_dir: str):
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return T.add_lang_id(ds, "text").select_columns(
        ["doc_id", "lang_pred"])


def _q_fingerprint_documents(sf_dir: str):
    from malli_ray.stages import text as T
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = T.add_fingerprint(ds, "text")

    def to_str(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint": batch.column("fingerprint").cast(pa.string())})

    return out.map_batches(to_str, batch_format="pyarrow")


def _q_minhash_dedup_documents(sf_dir: str):
    from malli_ray.stages import dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.minhash_lsh_candidates(ds, "text", "doc_id", threshold=0.5,
                                        )


def _exact_jaccard_verify(cands, sf_dir: str, threshold: float = 0.5):
    """Exact word-3-gram Jaccard verify over candidate pairs — scale-safe.

    The candidate PAIRS table is small by construction (bounded by the LSH
    caps), so: materialize it, fetch ONLY the participant texts by streaming
    the corpus through a broadcast ``is_in`` filter (one pass, no shuffle,
    output bounded by 2x|pairs| — the corpus itself is never broadcast),
    then attach text_a/text_b with two ``broadcast_join`` passes and verify
    each pair with the exact ``ngram_jaccard``.  For pathological pair
    volumes that outgrow driver memory, swap the two broadcast joins for
    ``stages.joins.hash_join`` — same plan shape, both sides shuffle.
    """
    import pyarrow.compute as pc
    import ray
    from malli_ray.stages import cached_stage, dedup
    from malli_ray.stages.constraints import ReferentialCheck
    from malli_ray.stages.joins import broadcast_join

    cand_batches = list(cands.iter_batches(batch_format="pyarrow"))
    if cand_batches:
        # distinct (id_a, id_b) driver-side: the pairs table is small, so
        # this replaces the candidate stage's dedup shuffle (dedupe=False)
        pairs_tbl = (pa.concat_tables(cand_batches)
                     .select(["id_a", "id_b"])
                     .group_by(["id_a", "id_b"]).aggregate([]))
    else:
        pairs_tbl = pa.table({"id_a": pa.array([], type=pa.string()),
                              "id_b": pa.array([], type=pa.string())})
    ids: set = set(pairs_tbl.column("id_a").to_pylist())
    ids.update(pairs_tbl.column("id_b").to_pylist())
    if not ids:
        id_type = pairs_tbl.schema.field("id_a").type
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], type=id_type),
            "id_b": pa.array([], type=id_type),
            "jaccard": pa.array([], type=pa.float64())}))
    pairs = ray.data.from_arrow(pairs_tbl)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    participant = docs.map_batches(
        cached_stage(ReferentialCheck, column="doc_id",
                     allowed=sorted(ids), invert=False),
        batch_format="pyarrow")
    texts_tbl = pa.concat_tables(
        list(participant.iter_batches(batch_format="pyarrow")))
    with_a = broadcast_join(
        pairs, texts_tbl.rename_columns(["doc_id", "text_a"]),
        key="doc_id", value_cols=["text_a"], probe_key="id_a")
    with_ab = broadcast_join(
        with_a, texts_tbl.rename_columns(["doc_id", "text_b"]),
        key="doc_id", value_cols=["text_b"], probe_key="id_b")

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("text_a").to_pylist()
        b = batch.column("text_b").to_pylist()
        j = [dedup.ngram_jaccard(x or "", y or "", 3) for x, y in zip(a, b)]
        t = pa.table({"id_a": batch.column("id_a"),
                      "id_b": batch.column("id_b"),
                      "jaccard": pa.array(j, type=pa.float64())})
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow")



def _q_near_dup_pairs_exact(sf_dir: str, bands: int = 32, num_perm: int = 64):
    """MinHash LSH candidates -> EXACT word-3-gram Jaccard verify >= 0.5.

    High-recall LSH setting (r=2, b=32: miss prob <= 0.75^32 ~ 1e-4 at the
    j=0.5 decision boundary; the synthetic corpora's true near-dup pairs all
    sit at j >= 0.8 where the bound is 0.36^32 ~ 7e-15 — verified band-for-
    band against the brute-force oracle at sf0.01 AND sf0.1) with a low
    candidate threshold, then the exact ngram_jaccard verifier — so the
    result equals the brute-force SQL oracle.  Raise ``bands`` (and
    ``num_perm = 2*bands``) for a tighter boundary guarantee; r=2/b=64
    restores the ~1e-8 bound at 2x the shuffle.  ``fail_on_truncation``
    makes any cap that would drop a candidate pair RAISE — exactness runs
    fail loudly instead of returning a quietly incomplete pair set.  The
    default near-dup pipeline (minhash_dedup_documents) keeps the
    scale-friendly r=8/b=16 banding.
    """
    from malli_ray.stages import dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan
    # hash_buckets is a PER-BAND modulus: total groups ~ bands x buckets.
    # Folding only bounds GROUP COUNT (pairwise work happens per ORIGINAL
    # bucket inside each group), so size for ~1000 band-rows per folded
    # group; max_bucket bounds each original bucket and the run RAISES on
    # any truncation (fail_on_truncation).
    buckets = max(8, min(65536, n_docs // 1000))
    cands = dedup.minhash_lsh_candidates(ds, "text", "doc_id", threshold=0.2,
                                         num_perm=num_perm, bands=bands,
                                         hash_buckets=buckets,
                                         max_bucket=8192,
                                         fail_on_truncation=True,
                                         dedupe=False)
    return _exact_jaccard_verify(cands, sf_dir)


def _q_near_dup_pairs_simhash(sf_dir: str):
    """SimHash-bucketed candidates -> EXACT word-3-gram Jaccard >= 0.5.

    ROWS-ONLY (no SQL oracle): simhash hamming distance does NOT bound
    Jaccard — borderline near-dups (j just above 0.5) can exceed any fixed
    hamming radius, so unlike near_dup_pairs_exact (whose minhash banding
    has a provable ~1e-8 miss bound at j=0.5) this pipeline's recall is
    only empirical (high for j near 1, e.g. all 25 sf0.01 pairs at j>=0.9).
    Precision IS exact: every emitted pair passed the exact verifier.
    """
    from malli_ray.stages import dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cands = dedup.simhash_near_dups(ds, "text", "doc_id",
                                    max_hamming=15, n_chunks=16)
    return _exact_jaccard_verify(cands, sf_dir)


def _q_simhash_documents(sf_dir: str):
    from malli_ray.stages import dedup
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from malli_ray.stages import cached_stage
    out = ds.map_batches(cached_stage(dedup.SimHasher, text_column="text"),
                         batch_format="pyarrow")

    def to_str(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": batch.column("simhash").cast(pa.string())})

    return out.map_batches(to_str, batch_format="pyarrow")


def _q_embedding_near_dups(sf_dir: str):
    from malli_ray.stages import dedup
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup.embedding_near_dups(ds, "embedding", "vec_id", threshold=0.95,
                                     )


def _q_infer_schema_documents(sf_dir: str):
    import json
    from malli_ray.provider import infer_dataset
    form = infer_dataset(_read(sf_dir, "documents"))
    return pa.table({"schema_form": [json.dumps(form)]})


def _q_validate_sequences(sf_dir: str):
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.sources.sequences import ALLOWED_SOURCES, SEQUENCES_DSL
    from malli_ray.stages.validator import ValidationSpec

    paths = _seq_paths(_sf_of(sf_dir))
    spec = ValidationSpec(
        schema=SEQUENCES_DSL,
        checks=[{"kind": "list_len_eq", "list_col": "tokens", "len_col": "n_tok",
                 "name": "n_tok_consistency"},
                {"kind": "in_set", "column": "source", "allowed": ALLOWED_SOURCES,
                 "name": "referential_source"}],
        id_column="doc_id",
        hll_columns=["doc_id"], tdigest_columns=["n_tok"], hist_columns=["source"])
    rep = vj.summarize(rd.read_parquet(paths), spec)
    return pa.table({
        "n_rows": [rep["n_rows"]], "n_valid": [rep["n_valid"]],
        "n_violations": [rep["n_violations"]],
        "distinct_doc_id": [round(rep["distinct"]["doc_id"])],
        "n_tok_p50": [round(rep["quantiles"]["n_tok"][0.5])],
    })


def _q_ivf_topk_embeddings(sf_dir: str):
    import pyarrow.parquet as pq
    from malli_ray.stages.similarity import ivf_topk

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).slice(0, 2)
    queries = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, queries, "embedding", "vec_id", k=5,
                    n_centroids=8, n_probe=3)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # validation engine core
        "validate_documents": _q_validate_documents,
        "violations_documents": _q_violations_documents,
        "verdict_by_source": _q_verdict_by_source,
        "column_stats_documents": _q_column_stats_documents,
        "unique_violations_events": _q_unique_violations_events,
        "referential_events": _q_referential_events,
        "hist_source_documents": _q_hist_source_documents,
        "hist_nchars_documents": _q_hist_nchars_documents,
        "quality_documents": _q_quality_documents,
        # dedup / similarity / text
        "dedup_exact_documents": _q_dedup_exact_documents,
        "token_count_documents": _q_token_count_documents,
        "redact_documents": _q_redact_documents,
        "repetition_documents": _q_repetition_documents,
        "corpus_prep_documents": _q_corpus_prep_documents,
        "pack_blocks_documents": _q_pack_blocks_documents,
        "contamination_documents": _q_contamination_documents,
        "text_counts_documents": _q_text_counts_documents,
        "ann_topk_embeddings": _q_ann_topk_embeddings,
        "lang_id_documents": _q_lang_id_documents,
        "fingerprint_documents": _q_fingerprint_documents,
        "minhash_dedup_documents": _q_minhash_dedup_documents,
        "near_dup_pairs_exact": _q_near_dup_pairs_exact,
        "near_dup_pairs_simhash": _q_near_dup_pairs_simhash,
        "simhash_documents": _q_simhash_documents,
        "embedding_near_dups": _q_embedding_near_dups,
        "ivf_topk_embeddings": _q_ivf_topk_embeddings,
        # general dataset ops (groupby/sort/limit/join/filter/decode)
        "events_daily": _q_events_daily,
        "events_window_30m": _q_events_window_30m,
        "events_hopping_30m_15m": _q_events_hopping,
        "median_value_by_type": _q_median_value_by_type,
        "sessions_events": _q_sessions_events,
        "asof_prev_event": _q_asof_prev_event,
        "parse_events_orn": _q_parse_events_orn,
        "q1_lineitem": _q_q1_lineitem,
        "join_priority_qty": _q_join_priority_qty,
        "customers_without_orders": _q_customers_without_orders,
        "vocab_top_words": _q_vocab_top_words,
        "tokenize_documents": _q_tokenize_documents,
        "stratified_sample_documents": _q_stratified_sample_documents,
        "top_orders": _q_top_orders,
        "orders_by_nation": _q_orders_by_nation,
        "filter_lineitem": _q_filter_lineitem,
        "decode_events_props": _q_decode_events_props,
        # inference + north-rule sequences table
        "infer_schema_documents": _q_infer_schema_documents,
        "validate_sequences": _q_validate_sequences,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_DOC_VALID_EXPR = (
    "(text IS NOT NULL AND length(text) >= 1 "
    "AND lang IN ('en','es','de','fr') "
    f"AND source IN ({', '.join(repr(s) for s in _DOC_SOURCES)}) "
    f"AND n_chars IS NOT NULL AND n_chars >= {_DOC_MIN_CHARS} "
    "AND doc_id IS NOT NULL)"
)


def oracle_sql() -> dict[str, str]:
    src_list = ", ".join(repr(s) for s in _DOC_SOURCES)
    # brute-force exact near-dup pairs: shared by BOTH LSH-candidate
    # pipelines (minhash and simhash) — each uses a high-recall bucketing
    # plus the exact ngram_jaccard verifier, so both equal this oracle
    near_dup_exact_sql = r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words
                         FROM documents),
             g AS (SELECT doc_id,
                     CASE WHEN len(words) = 0 THEN ['']
                          WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                          ELSE list_transform(range(1, len(words) - 1),
                                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                     END AS grams
                   FROM w),
             s AS (SELECT doc_id, list_distinct(grams) AS gs FROM g)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.gs, b.gs))) AS jaccard
              FROM s a JOIN s b ON a.doc_id < b.doc_id
             WHERE 3 * len(list_intersect(a.gs, b.gs)) >= len(a.gs) + len(b.gs)
        """
    from malli_ray.stages.text import _LANG_MARKERS, _STOPWORDS
    stop_re = r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"
    quality_sql = rf"""
        WITH f AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_words,
                 CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
                 CAST(len(regexp_extract_all(text, '{stop_re}')) AS DOUBLE) AS n_stop,
                 CAST(len(regexp_extract_all(text, '\d')) AS DOUBLE) AS n_digit
            FROM documents),
         r AS (
          SELECT doc_id, n_words,
                 n_punct / GREATEST(n_chars, 1.0) AS punct_ratio,
                 n_stop / GREATEST(n_words, 1.0) AS stop_ratio,
                 n_digit / GREATEST(n_chars, 1.0) AS digit_ratio
            FROM f)
        SELECT doc_id, n_words, punct_ratio, stop_ratio,
               ((CASE WHEN n_words >= 10.0 THEN 1.0 ELSE n_words / 10.0 END
                 * (LEAST(stop_ratio * 4.0, 1.0) * 0.5 + 0.5))
                * (((1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.5 + 0.5)
                   * ((1.0 - LEAST(digit_ratio * 4.0, 1.0)) * 0.5 + 0.5))
               ) AS quality
          FROM r
    """
    # per-language marker regexes generated from the SAME _LANG_MARKERS the
    # engine compiles (text.py LangID) — argmax tie-break = sorted lang order
    import re as _re
    pat = {lang: (r"(?i)\b(?:" + "|".join(map(_re.escape, words)) + r")\b"
                  if lang != "zh" else "[" + "".join(words) + "]")
           for lang, words in _LANG_MARKERS.items()}
    lang_sql = f"""
        WITH c AS (
          SELECT doc_id,
            len(regexp_extract_all(text, '{pat["de"]}')) AS c_de,
            len(regexp_extract_all(text, '{pat["en"]}')) AS c_en,
            len(regexp_extract_all(text, '{pat["es"]}')) AS c_es,
            len(regexp_extract_all(text, '{pat["fr"]}')) AS c_fr,
            len(regexp_extract_all(text, '{pat["zh"]}')) AS c_zh
          FROM documents)
        SELECT doc_id, CASE
          WHEN GREATEST(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'en'
          WHEN c_de >= GREATEST(c_en, c_es, c_fr, c_zh) THEN 'de'
          WHEN c_en >= GREATEST(c_es, c_fr, c_zh) THEN 'en'
          WHEN c_es >= GREATEST(c_fr, c_zh) THEN 'es'
          WHEN c_fr >= c_zh THEN 'fr'
          ELSE 'zh' END AS lang_pred
        FROM c
    """
    return {
        "quality_documents": quality_sql,
        "lang_id_documents": lang_sql,
        "validate_documents":
            f"SELECT doc_id, {_DOC_VALID_EXPR} AS valid FROM documents",
        "violations_documents": f"""
            SELECT CAST(doc_id AS VARCHAR) AS id, 'text' AS "column"
              FROM documents WHERE text IS NULL OR length(text) < 1
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'lang' FROM documents
             WHERE lang IS NULL OR lang NOT IN ('en','es','de','fr')
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'source' FROM documents
             WHERE source IS NULL OR source NOT IN ({src_list})
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'n_chars' FROM documents
             WHERE n_chars IS NULL OR n_chars < {_DOC_MIN_CHARS}
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'doc_id' FROM documents
             WHERE doc_id IS NULL
        """,
        "verdict_by_source": f"""
            SELECT source, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN {_DOC_VALID_EXPR} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_valid
              FROM documents GROUP BY source
        """,
        "column_stats_documents": """
            SELECT 'doc_id' AS column_name, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_count,
                   MIN(doc_id) AS min_v, MAX(doc_id) AS max_v FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*),
                   CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   MIN(n_chars), MAX(n_chars) FROM documents
        """,
        "unique_violations_events": """
            SELECT user_id, COUNT(*) AS cnt FROM events
             GROUP BY user_id HAVING COUNT(*) > 1
        """,
        "referential_events": """
            SELECT event_id, event_type FROM events
             WHERE event_type NOT IN ('click','view','purchase')
        """,
        "hist_source_documents":
            "SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source",
        "hist_nchars_documents": """
            SELECT CAST(FLOOR(n_chars / 100) AS INT) AS bin, COUNT(*) AS cnt
              FROM documents WHERE n_chars >= 0 AND n_chars <= 1000
             GROUP BY 1
        """,
        "dedup_exact_documents":
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
        "token_count_documents": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens
              FROM documents
        """,
        "redact_documents": r"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(text, '\bcustomer\b', '[X]', 'g'),
                                  '\d+', '[X]', 'g') AS text_redacted
              FROM documents
        """,
        "corpus_prep_documents": r"""
            WITH kept AS (SELECT MIN(doc_id) AS doc_id
                            FROM documents GROUP BY text),
                 d AS (SELECT doc.doc_id, doc.source, doc.n_chars, doc.text
                         FROM documents doc
                         JOIN kept ON doc.doc_id = kept.doc_id),
                 f AS (SELECT doc_id, source, n_chars FROM d
                        WHERE CASE WHEN len(regexp_extract_all(text, '[^\t\n\f\r ]+')) = 0
                                   THEN 0.0
                                   ELSE 1.0 - CAST(len(list_distinct(
                                            regexp_extract_all(text, '[^\t\n\f\r ]+'))) AS DOUBLE)
                                          / len(regexp_extract_all(text, '[^\t\n\f\r ]+'))
                              END < 0.6)
            SELECT source, doc_id, n_chars,
                   CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source
                                                  ORDER BY doc_id) - n_chars)
                              / 4000) AS BIGINT) AS block_id
              FROM f
        """,
        "pack_blocks_documents": """
            SELECT source, doc_id, n_chars,
                   CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source
                                                  ORDER BY doc_id) - n_chars)
                              / 4000) AS BIGINT) AS block_id
              FROM documents
        """,
        "repetition_documents": r"""
            SELECT doc_id,
                   CASE WHEN len(regexp_extract_all(text, '[^\t\n\f\r ]+')) = 0
                        THEN 0.0
                        ELSE 1.0 - CAST(len(list_distinct(
                                 regexp_extract_all(text, '[^\t\n\f\r ]+'))) AS DOUBLE)
                               / len(regexp_extract_all(text, '[^\t\n\f\r ]+'))
                   END AS rep_ratio
              FROM documents
        """,
        "contamination_documents": """
            WITH probes AS (SELECT doc_id AS probe_id, substr(text, 1, 40) AS p
                              FROM documents WHERE doc_id IN (0, 1, 2))
            SELECT d.doc_id, pr.probe_id
              FROM documents d JOIN probes pr ON position(pr.p IN d.text) > 0
        """,
        "text_counts_documents": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_words,
                   len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                   len(regexp_extract_all(text, '\d')) AS n_digit
              FROM documents
        """,
        "ann_topk_embeddings": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                         FROM embeddings WHERE vec_id < 3),
                 scored AS (
                   SELECT q.query_id, e.vec_id,
                          list_cosine_similarity(q.qe, e.embedding) AS score
                     FROM q CROSS JOIN embeddings e),
                 ranked AS (
                   SELECT query_id, vec_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY score DESC, vec_id) AS rk
                     FROM scored)
            SELECT CAST(query_id AS INT) AS query_id, vec_id
              FROM ranked WHERE rk <= 5
        """,
        "events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
              FROM events GROUP BY 1, 2
        """,
        "events_window_30m": """
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window, event_type,
                   COUNT(*) AS n
              FROM events GROUP BY 1, 2
        """,
        "median_value_by_type": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
              FROM events GROUP BY event_type
        """,
        "events_hopping_30m_15m": """
            SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                     - j * INTERVAL 15 MINUTE AS window,
                   event_type, COUNT(*) AS n
              FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j) u
             GROUP BY 1, 2
        """,
        "sessions_events": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
                FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
                FROM g)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events, MIN(ts) AS session_start
              FROM s GROUP BY 1, 2
        """,
        "asof_prev_event": """
            SELECT e.event_id,
                   p.event_id AS prev_event_id
              FROM events e
              ASOF LEFT JOIN events p
                ON e.user_id = p.user_id AND e.ts > p.ts
        """,
        "near_dup_pairs_exact": near_dup_exact_sql,
        "parse_events_orn": """
            SELECT event_id,
                   CASE WHEN value IS NULL THEN NULL
                        WHEN value < 0.0 THEN 'neg'
                        WHEN value <= 10.0 THEN 'small'
                        ELSE 'large' END AS branch,
                   value AS parsed_value
              FROM events
        """,
        "q1_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS count_order
              FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             GROUP BY l_returnflag, l_linestatus
        """,
        "join_priority_qty": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
                   COUNT(*) AS n_items
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             GROUP BY o_orderpriority
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_totalprice > 400000.0)
        """,
        "vocab_top_words": r"""
            SELECT word, COUNT(*) AS cnt
              FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
                      FROM documents)
             GROUP BY word
             ORDER BY cnt DESC, word
             LIMIT 100
        """,
        "tokenize_documents": r"""
            WITH v AS (
              SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS vid
                FROM (SELECT word, COUNT(*) AS cnt
                        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
                                FROM documents)
                       GROUP BY word
                       ORDER BY cnt DESC, word
                       LIMIT 100)
            ),
            w AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS word,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS pos
                FROM documents)
            SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos,
                   CAST(COALESCE(v.vid, 0) AS BIGINT) AS token_id
              FROM w LEFT JOIN v USING (word)
        """,
        "stratified_sample_documents": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rk
                FROM documents)
             WHERE rk <= 3
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "orders_by_nation": """
            SELECT c.c_nationkey AS n_nationkey, COUNT(*) AS order_count
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY c.c_nationkey
        """,
        "filter_lineitem": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(l_quantity AS BIGINT) AS qty
              FROM lineitem WHERE l_quantity > 45.0
        """,
        "decode_events_props": r"""
            SELECT event_id,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
              FROM events
        """,
    }
