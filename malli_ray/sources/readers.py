"""Schema-aware file sources: CSV / JSON / Parquet with decode + validation.

Composes Ray Data's native readers with the engine's decode stage — the batch
analog of reading stringly data through malli's string-transformer
(transform.cljc:454-458): ``read_csv_with_schema`` parses, casts each column
to its schema-declared type (tolerant: unparseable -> null -> flagged by
validation), and optionally appends the ``valid`` mask.
"""

from __future__ import annotations

from typing import Any

from ray.data import Dataset

__all__ = ["read_csv_with_schema", "read_json_with_schema",
           "read_parquet_for_schema", "write_jsonl_with_schema"]


def _decode_and_validate(ds: Dataset, schema: Any, validate: bool) -> Dataset:
    from ..stages import cached_stage
    from ..stages.transform_stage import DecodeBatch
    ds = ds.map_batches(cached_stage(DecodeBatch, schema=schema),
                        batch_format="pyarrow")
    if validate:
        from ..pipelines.validation_job import validate as validate_ds
        from ..stages.validator import ValidationSpec
        ds = validate_ds(ds, ValidationSpec(schema=schema))
    return ds


def read_csv_with_schema(paths, schema: Any, validate: bool = False,
                         **read_kwargs) -> Dataset:
    """CSV -> typed columns per the schema (string-transformer semantics)."""
    import ray.data as rd
    return _decode_and_validate(rd.read_csv(paths, **read_kwargs), schema, validate)


def read_json_with_schema(paths, schema: Any, validate: bool = False,
                          **read_kwargs) -> Dataset:
    """JSON lines -> typed columns per the schema (json-transformer semantics)."""
    import ray.data as rd
    return _decode_and_validate(rd.read_json(paths, **read_kwargs), schema, validate)


def read_parquet_for_schema(paths, schema: Any, validate: bool = False,
                            **read_kwargs) -> Dataset:
    """Parquet with column pruning derived FROM the schema: only the columns
    the :map schema names leave storage (prune-at-the-read)."""
    import ray.data as rd
    from ..core import DEFAULT_KEY, MapSchema, schema as to_schema
    sc = to_schema(schema)
    sc = sc if isinstance(sc, MapSchema) else sc.deref()
    cols = [k for (k, _, _) in sc.children if k != DEFAULT_KEY]
    ds = rd.read_parquet(paths, columns=cols, **read_kwargs)
    if validate:
        from ..pipelines.validation_job import validate as validate_ds
        from ..stages.validator import ValidationSpec
        ds = validate_ds(ds, ValidationSpec(schema=schema))
    return ds


def write_jsonl_with_schema(ds: Dataset, schema: Any, out_dir: str,
                            name: str = "string", **write_kwargs) -> None:
    """Schema-encoded JSONL sink: ENCODE typed columns back to canonical
    strings per the string-transformer encode direction
    (stages/transform_stage.EncodeBatch — the write-side mirror of the
    readers above), then Ray's native sharded ``write_json`` (one file
    per block — resumable output, never one giant file)."""
    from ..stages import cached_stage
    from ..stages.transform_stage import EncodeBatch
    ds = ds.map_batches(cached_stage(EncodeBatch, schema=schema, name=name),
                        batch_format="pyarrow")
    ds.write_json(out_dir, **write_kwargs)
