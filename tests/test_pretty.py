"""malli.dev.pretty parity: the pretty report surface
(reference test/malli/dev/pretty_test.cljc + pretty.cljc formatters)."""

import io

import pytest

from malli_ray import core, pretty
from malli_ray.core import SchemaError
from malli_ray.instrument import instrument


def test_explain_valid_returns_none_and_prints_nothing(capsys):
    # pretty_test.cljc:7 — (nil? (pretty/explain :string "1"))
    assert pretty.explain("string", "1") is None
    assert capsys.readouterr().out == ""


def test_explain_invalid_prints_report_and_returns_explanation():
    # pretty_test.cljc:8-18 — "Validation Error" + the explanation map
    out = io.StringIO()
    expl = pretty.explain("string", 1, file=out)
    text = out.getvalue()
    assert "Validation Error" in text
    assert "should be a string" in text
    assert expl["value"] == 1
    err = expl["errors"][0]
    assert err["path"] == [] and err["in"] == [] and err["value"] == 1


def test_explain_report_blocks():
    expl = core.explain(
        core.schema(["map", {"closed": True},
                     ["x", ["int", {"min": 0}]], ["name", "string"]]),
        {"x": -1, "name": "ok", "extra": 1})
    text = pretty.format_explain(expl)
    # the four pretty.cljc ::m/explain blocks
    for block in ("Value", "Errors", "Schema", "More information"):
        assert block in text
    # the VALID 'name' value masks to '...' (::me/mask-valid-values '...)
    assert "'name' '...'" in text
    assert "should be at least 0" in text
    assert "disallowed key" in text
    # footer/header rules at the configured width
    assert "-" * 80 in text


def test_schema_creation_error_did_you_mean():
    # pretty.cljc ::m/invalid-schema proposals
    with pytest.raises(SchemaError) as ei:
        core.schema(["stirng"])
    text = pretty.format_exception(ei.value)
    assert "Schema Creation Error" in text
    assert "Did you mean" in text
    assert "string" in text


def test_generic_exception_report():
    text = pretty.format_exception(ValueError("boom"))
    assert "Unknown Error" in text and "boom" in text


def test_thrower_instrument_input_report():
    f = instrument(["=>", ["cat", "int", "int"], "int"],
                   lambda x, y: x + y, report=pretty.thrower())
    assert f(1, 2) == 3
    with pytest.raises(SchemaError) as ei:
        f("a", 2)
    msg = str(ei.value.args[0])
    assert "Invalid Function Input" in msg
    assert "should be an integer" in msg


def test_reporter_instrument_output_report():
    sink = io.StringIO()
    f = instrument(["=>", ["cat", "int"], "string"],
                   lambda x: x, report=pretty.reporter(file=sink))
    f(1)  # invalid output -> reported, not raised
    text = sink.getvalue()
    assert "Invalid Function Output" in text
    assert "should be a string" in text


def test_dark_colors_and_width():
    p = pretty.printer(width=40, colors="dark")
    expl = core.explain(core.schema("int"), "x")
    text = pretty.format_explain(expl, p)
    assert "\033[38;5;45m" in text      # title color from virhe -dark-colors
    plain = pretty.format_explain(expl, pretty.printer(width=40))
    assert "\033[" not in plain
    bar = plain.splitlines()[0]
    assert len(bar) == 40 and bar.startswith("-- Validation Error ")
