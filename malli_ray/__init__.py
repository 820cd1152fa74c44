"""malli_ray — a Ray-Data-native schema + constraint validation engine.

Row-level semantics core (malli contract): ``malli_ray.core``, ``.error``,
``.transform``, ``.util``, ``.regex_engine``, ``.provider``.
Vectorized Arrow path: ``malli_ray.arrow_compile``.
Ray Data stages: ``malli_ray.stages`` (validator actors, stats/sketches,
constraints, dedup, similarity, text analysis).
Pipelines: ``malli_ray.pipelines`` (checkpointed validation job).
"""

from .core import (  # noqa: F401
    DEFAULT_KEY, INVALID, Invalid, Schema, SchemaError, Tag, Tags,
    assert_, ast, children, coerce, coercer, decode, decoder, default_registry,
    default_schema, deref, deref_all, deref_recursive,
    encode, encoder, entries, explain, explainer, explicit_keys, form,
    from_ast, into_schema, is_schema, old_parse_format, options, parse,
    parser, parser_info, properties, register_type,
    schema, schema_type, schema_walker, tag, tags, type_properties,
    unparse, unparser, validate, validator, walk,
)
from .error import error_message, humanize  # noqa: F401

__version__ = "0.1.0"
