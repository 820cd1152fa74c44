"""Property-based conformance over randomly composed schemas.

Contract invariants (the malli API contract, SURVEY.md SS1.1):
  - validate(s, v) <=> explain(s, v) is None
  - validate(s, v) <=> parse(s, v) is not INVALID
  - for valid v: unparse(parse(v)) == v
  - generate(s, seed) always validates
  - Arrow mask == row validate for table-shaped schemas
"""

import random

import numpy as np
import pyarrow as pa
import pytest

import malli_ray as m
from malli_ray import INVALID
from malli_ray.generator import generate

SCALARS = ["int", "string", "boolean", "double",
           ["int", {"min": -5, "max": 5}],
           ["string", {"min": 1, "max": 3}],
           ["enum", "a", "b", "c"], "pos-int?", ["=", 7], [">", 0]]


def random_schema(rng: random.Random, depth: int = 0):
    if depth >= 3:
        return rng.choice(SCALARS)
    roll = rng.random()
    if roll < 0.35:
        return rng.choice(SCALARS)
    if roll < 0.45:
        return ["maybe", random_schema(rng, depth + 1)]
    if roll < 0.55:
        return ["vector", {"min": 0, "max": 4}, random_schema(rng, depth + 1)]
    if roll < 0.65:
        return ["or", random_schema(rng, depth + 1), random_schema(rng, depth + 1)]
    if roll < 0.72:
        return ["and", ["int", {"min": -100, "max": 100}], ["not", ["=", 13]]]
    if roll < 0.82:
        entries = []
        for i in range(rng.randint(1, 3)):
            props = {"optional": True} if rng.random() < 0.3 else None
            e = [f"k{i}", props, random_schema(rng, depth + 1)] if props else \
                [f"k{i}", random_schema(rng, depth + 1)]
            entries.append(e)
        return ["map", *entries]
    if roll < 0.9:
        return ["tuple", random_schema(rng, depth + 1), random_schema(rng, depth + 1)]
    return ["map-of", "string", random_schema(rng, depth + 1)]


CANDIDATE_VALUES = [None, 0, 1, -1, 7, 13, 100, 1.5, -0.5, True, False,
                    "", "a", "ab", "abc", "zzzz", [], [1], ["a", 1], {},
                    {"k0": 1}, {"k0": "a", "k1": 1}, {"x": 1}, [1, 2, 3, 4, 5],
                    [None], {"k0": None}]


@pytest.mark.parametrize("seed", range(25))
def test_contract_invariants(seed):
    rng = random.Random(seed)
    for _ in range(8):
        form = random_schema(rng)
        s = m.schema(form)
        valid = s.validator()
        exp = m.explainer(s)
        parse = s.parser()
        for v in CANDIDATE_VALUES:
            ok = valid(v)
            e = exp(v)
            assert ok == (e is None), (form, v, e)
            if e is not None:
                assert len(e["errors"]) >= 1
            p = parse(v)
            assert ok == (p is not INVALID), (form, v)
        # generated values always validate; unparse . parse == identity
        g = generate(s, seed=seed)
        assert valid(g), (form, g)
        p = parse(g)
        assert p is not INVALID
        assert s.unparser()(p) == g, (form, g, p)


@pytest.mark.parametrize("seed", range(10))
def test_arrow_mask_fuzz(seed):
    from malli_ray.arrow_compile import compile_node

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    scalar_forms = [f for f in SCALARS if f != "boolean"]
    for arr, forms in [
        (pa.array([int(x) if x is not None else None
                   for x in nprng.choice([None, *range(-10, 11)], 40)],
                  type=pa.int64()),
         ["int", ["int", {"min": -5, "max": 5}], "pos-int?", ["=", 7],
          [">", 0], ["maybe", ["int", {"min": 0}]],
          ["and", "int", ["not", ["=", 3]]]]),
        (pa.array([rng.choice([None, "", "a", "ab", "abc", "b", "c"])
                   for _ in range(40)], type=pa.string()),
         ["string", ["string", {"min": 1, "max": 2}], ["enum", "a", "b", "c"],
          ["maybe", ["enum", "a"]], ["re", "^a"]]),
    ]:
        for form in forms:
            s = m.schema(form)
            got = compile_node(s, arr.type)(arr).tolist()
            want = [s.validator()(v) for v in arr.to_pylist()]
            assert got == want, (form, arr.to_pylist(), got, want)
