"""instrument() UDF guards + path<->in translation."""

import pytest

import malli_ray as m
from malli_ray.instrument import instrument
from malli_ray.util import in_to_paths, path_to_in


def test_instrument_ok():
    @instrument(["=>", ["cat", "int", "int"], "int"])
    def add(x, y):
        return x + y

    assert add(1, 2) == 3
    assert add.__malli_schema__.type == "=>"


def test_instrument_bad_input():
    @instrument(["=>", ["cat", "int", "int"], "int"])
    def add(x, y):
        return x + y

    with pytest.raises(m.SchemaError):
        add(1, "2")


def test_instrument_bad_output():
    @instrument(["=>", ["cat", "int"], "string"])
    def f(x):
        return x  # returns int, schema says string

    with pytest.raises(m.SchemaError):
        f(1)


def test_instrument_report_fn():
    events = []

    @instrument(["=>", ["cat", "int"], "int"],
                report=lambda kind, data: events.append(kind))
    def f(x):
        return x

    f("bad")
    # report-fn does not raise, so both input and (propagated bad) output fire
    assert events == ["input", "output"]


SCHEMA = ["map",
          ["addr", ["map", ["lonlat", ["tuple", "double", "double"]]]],
          ["v", ["vector", ["or", "int", "string"]]]]


def test_path_to_in():
    assert path_to_in(SCHEMA, ["addr", "lonlat", 1]) == ["addr", "lonlat", 1]
    # the :or branch index is a schema step, not a value step
    assert path_to_in(SCHEMA, ["v", 0, 1]) == ["v", 0]
    orn = ["orn", ["pos", "pos-int?"], ["neg", "neg-int?"]]
    assert path_to_in(orn, ["pos"]) == []


def test_in_to_paths():
    paths = in_to_paths(SCHEMA, ["addr", "lonlat", 0])
    assert ["addr", "lonlat", 0] in paths
    paths = in_to_paths(SCHEMA, ["v", 0])
    assert ["v", 0] in [p[:2] for p in paths] or any(p[:2] == ["v", 0] for p in paths)
