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


def test_instrument_arity_single(ray_session=None):
    """Wrong arg count on a single :=> reports 'arity' BEFORE input
    (core_test.cljc:2836-2849 ::m/invalid-arity)."""
    @instrument(["=>", ["cat", "int"], ["int", {"max": 6}]])
    def pow2(x):
        return x * x

    assert pow2(2) == 4
    with pytest.raises(m.SchemaError):
        pow2(4, 2)  # noqa: E501  — arity 2 against a 1-arity schema


def test_instrument_multi_arity_dispatch():
    """:function dispatch by arg count with reports collected
    (core_test.cljc:2851-2869)."""
    events = []

    def f(x, y=None):
        return x * x if y is None else x * y

    pow2 = instrument(["function",
                       ["=>", ["cat", "int"], ["int", {"max": 6}]],
                       ["=>", ["cat", "int", "int"], ["int", {"max": 6}]]],
                      f, report=lambda kind, data: events.append(kind))
    assert pow2(2) == 4 and events == []
    assert pow2(4) == 16
    assert events == ["output"]; events.clear()
    assert pow2(5, 0.1) == 0.5
    assert events == ["input", "output"]; events.clear()
    # no matching arity and no varargs
    pow2(1, 2, 3)
    assert events == ["arity"]


def test_instrument_varargs_fallback():
    """varargs arity catches counts >= its min (core_test.cljc:2305-2308)."""
    events = []

    def f(x, *rest):
        return x

    g = instrument(["function",
                    ["=>", ["cat", "int"], "int"],
                    ["=>", ["cat", "int", "int", ["*", "int"]], "int"]],
                   f, report=lambda kind, data: events.append(kind))
    assert g(1) == 1 and g(1, 2) == 1 and g(1, 2, 3, 4) == 1
    assert events == []


def test_instrument_seqex_arity_bounds():
    """Sequence-schema input: [:cat :int [:schema [:cat kw :int]]
    [:? [:cat :int :int]]] has min 2 / max 4 (core_test.cljc:2871-2898)."""
    events = []

    def f(x, *rest):
        return x

    fun = instrument(
        ["=>", ["cat", "int", ["schema", ["cat", "keyword", "int"]],
                ["?", ["cat", "int", "int"]]],
         ["int", {"max": 6}]],
        f, report=lambda kind, data: events.append(kind))
    assert fun(1, ["x", 3]) == 1 and events == []
    assert fun(1, ["x", 3], 4, 5) == 1 and events == []
    fun(16, ["x", 3])
    assert events == ["output"]; events.clear()
    # between min and max arity but invalid seqex split
    fun(16, ["x", 3], 4)
    assert events == ["input", "output"]; events.clear()
    # over max arity: arity AND input both fire
    fun(1, ["x", 3], 4, 5, 6)
    assert events == ["arity", "input"]; events.clear()
    # under min arity
    fun(1)
    assert events == ["arity", "input"]; events.clear()
    # invalid sub-sequence inside the [:schema ...] item
    fun(1, [2, 3], 4, 5)
    assert events == ["input"]


def test_instrument_guard():
    """Optional third :=> child — the guard relates [args, return-value]
    (reference ::m/invalid-guard, core.cljc:2217-2236): reported with
    kind 'guard' after output validation; silent when it holds."""
    import pytest

    from malli_ray.core import SchemaError
    from malli_ray.instrument import instrument

    reports = []
    f = instrument(["=>", ["cat", "int", "int"], "int",
                    ["fn", "x[1] >= x[0][0]"]],
                   lambda a, b: a - b,
                   report=lambda kind, data: reports.append((kind, data)))
    assert f(2, 1) == 1            # 1 >= 2 fails the guard
    assert reports and reports[0][0] == "guard"
    assert reports[0][1]["args"] == [2, 1] and reports[0][1]["value"] == 1

    ok = instrument(["=>", ["cat", "int", "int"], "int",
                     ["fn", "x[1] >= x[0][0]"]], lambda a, b: a + b)
    assert ok(2, 1) == 3           # holds -> no raise

    bad = instrument(["=>", ["cat", "int"], "int", ["fn", "x[1] > 10"]],
                     lambda a: a)
    with pytest.raises(SchemaError, match="guard"):
        bad(1)
