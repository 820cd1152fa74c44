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
    ast, children, coerce, coercer, decode, decoder, default_registry, deref,
    encode, encoder, entries, explain, explainer, form, from_ast,
    old_parse_format, parse, parser, parser_info, properties, register_type,
    schema, schema_type, tag, tags, unparse, unparser,
    validate, validator, walk,
)
from .error import error_message, humanize  # noqa: F401

__version__ = "0.1.0"
