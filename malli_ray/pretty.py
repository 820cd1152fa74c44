"""Pretty development-time error reports — the ``malli.dev.pretty`` /
``malli.dev.virhe`` surface (reference src/malli/dev/pretty.cljc:1-190,
src/malli/dev/virhe.cljc:1-205) re-expressed for Python.

The reference renders fipp documents with ANSI-256 colors; here the same
report structure (``-- Title ---`` bar, titled blocks indented two spaces,
a footer rule) is built as plain strings, with the reference's dark color
theme applied optionally (``colors="dark"``).  Values print through a
small width-aware formatter that unwraps Schema objects to their forms
and sorts dict keys (virhe's arrangement sort).

Public api mirrors pretty.cljc's: :func:`explain` (print a Validation
Error report, return the explanation with error messages),
:func:`reporter` / :func:`thrower` (instrument-compatible ``(kind,
data)`` callbacks — pretty.cljc:163-180), and :func:`format_exception`
for SchemaError (Schema Creation Error with "Did you mean" proposals —
pretty.cljc:100-138)."""

from __future__ import annotations

from typing import Any, Callable

from .core import Schema, SchemaError
from .error import (_levenshtein, error_value, humanize,
                    with_spell_checking)

__all__ = ["printer", "explain", "reporter", "thrower",
           "format_explain", "format_report", "format_exception"]

MORE_INFO = "https://github.com/metosin/malli"

#: virhe -dark-colors (virhe.cljc:15-22), ANSI-256 codes
_DARK = {"title": 45, "title-dark": 32, "text": 253, "link": 255,
         "string": 180, "constant": 149, "type": 123, "error": 196}


def printer(width: int = 80, colors: "str | dict | None" = None,
            title: str = "Schema Error") -> dict:
    """Printer options (virhe -printer / pretty -printer).  ``colors``:
    None (plain text — the default, right for logs and tests), ``"dark"``
    (the reference's ANSI-256 theme), or a custom code map."""
    cmap = _DARK if colors == "dark" else (colors or None)
    return {"width": int(width), "colors": cmap, "title": title}


def _color(kind: str, text: str, p: dict) -> str:
    colors = p.get("colors")
    if not colors:
        return text
    code = colors.get(kind, colors.get("error", 196))
    return f"\033[38;5;{code}m{text}\033[0m"


def _form_of(x: Any) -> Any:
    if isinstance(x, Schema):
        try:
            return x.form   # cached property (core.Schema.form)
        except Exception:
            return x
    return x


def _fmt(x: Any, width: int, indent: int = 0) -> str:
    """Width-aware value formatter: one line when it fits, else children
    on their own lines (dict keys sorted — virhe's arrangement order)."""
    x = _form_of(x)
    one = _oneline(x)
    if indent + len(one) <= width:
        return one
    pad = " " * (indent + 1)
    if isinstance(x, dict):
        items = [f"{_oneline(k)} {_fmt(v, width, indent + 1)}"
                 for k, v in _sorted_items(x)]
        return "{" + ("\n" + pad).join(items) + "}"
    if isinstance(x, (list, tuple, set, frozenset)):
        op, cl = (("[", "]") if isinstance(x, list)
                  else ("(", ")") if isinstance(x, tuple)
                  else ("#{", "}"))
        xs = sorted(x, key=_oneline) if isinstance(x, (set, frozenset)) \
            else list(x)
        items = [_fmt(v, width, indent + len(op)) for v in xs]
        return op + ("\n" + " " * (indent + len(op))).join(items) + cl
    return one


def _sorted_items(d: dict):
    try:
        return sorted(d.items(), key=lambda kv: (str(type(kv[0])),
                                                 _oneline(kv[0])))
    except Exception:
        return list(d.items())


def _oneline(x: Any) -> str:
    x = _form_of(x)
    if isinstance(x, dict):
        return ("{" + ", ".join(f"{_oneline(k)} {_oneline(v)}"
                                for k, v in _sorted_items(x)) + "}")
    if isinstance(x, list):
        return "[" + " ".join(_oneline(v) for v in x) + "]"
    if isinstance(x, tuple):
        return "(" + " ".join(_oneline(v) for v in x) + ")"
    if isinstance(x, (set, frozenset)):
        return "#{" + " ".join(sorted(_oneline(v) for v in x)) + "}"
    if isinstance(x, str):
        return repr(x)
    if x is None:
        return "nil"
    if x is True:
        return "true"
    if x is False:
        return "false"
    return repr(x)


def _title_bar(message: str, p: dict) -> str:
    width = p["width"]
    dashes = max(0, width - len(message) - 6)
    return (_color("title-dark", "-- ", p)
            + _color("title", message + " ", p)
            + _color("title-dark", "-" * dashes + "--", p))


def _footer(p: dict) -> str:
    return _color("title-dark", "-" * p["width"], p)


def _block(title: str, body: Any, p: dict) -> str:
    txt = body if isinstance(body, str) else _fmt(body, p["width"] - 2)
    indented = "\n".join("  " + ln for ln in txt.splitlines())
    return _color("text", title, p) + "\n\n" + indented


def _section(title: str, blocks: "list[str]", p: dict) -> str:
    body = "\n\n".join(b for b in blocks if b)
    return (_title_bar(title, p) + "\n\n" + body + "\n\n"
            + _footer(p) + "\n")


def format_explain(explanation: "dict | None", p: "dict | None" = None,
                   title: str = "Validation Error") -> str:
    """The ::m/explain report (pretty.cljc:41-46): masked error value,
    spell-checked humanized errors, the schema form, a doc link."""
    p = p or printer()
    if explanation is None:
        return _section(title, [_block("Value", "nil", p),
                                _block("Errors", "nil", p)], p)
    ev = error_value(explanation, {"mask_valid_values": "..."})
    errs = humanize(with_spell_checking(explanation))
    return _section(title, [
        _block("Value", ev, p),
        _block("Errors", errs, p),
        _block("Schema", explanation.get("schema"), p),
        _block("More information", _color("link", MORE_INFO, p), p)], p)


def explain(schema: Any, value: Any, p: "dict | None" = None,
            file=None) -> "dict | None":
    """Pretty-print a Validation Error report for ``value`` against
    ``schema`` (pretty.cljc:184-188) and return the explanation (None
    when valid — nothing prints, matching the reference's prettifier)."""
    from .core import explain as _explain
    from .core import schema as _schema
    expl = _explain(_schema(schema), value)
    if expl is None:
        return None
    print(format_explain(expl, p), file=file, end="")
    return expl


def format_report(kind: str, data: dict, p: "dict | None" = None) -> str:
    """Format an instrument report (pretty.cljc ::m/invalid-input /
    -output / -guard / -arity formatters) or a generic (kind, data)."""
    p = p or printer()
    link = _block("More information", _color("link", MORE_INFO, p), p)
    if kind == "input":
        expl = data.get("explain")
        return _section("Invalid Function Input", [
            _block("Invalid function arguments", data.get("args"), p),
            _block("Input Schema",
                   expl.get("schema") if expl else None, p),
            _block("Errors",
                   humanize(with_spell_checking(expl)) if expl
                   else data.get("humanized"), p),
            link], p)
    if kind == "output":
        expl = data.get("explain")
        return _section("Invalid Function Output", [
            _block("Invalid function return value", data.get("value"), p),
            _block("Output Schema",
                   expl.get("schema") if expl else None, p),
            _block("Errors",
                   humanize(with_spell_checking(expl)) if expl
                   else data.get("humanized"), p),
            link], p)
    if kind == "guard":
        expl = data.get("explain")
        return _section("Function Guard Error", [
            _block("Guard arguments",
                   [data.get("args"), data.get("value")], p),
            _block("Errors",
                   humanize(expl) if expl else data.get("humanized"), p),
            link], p)
    if kind == "arity":
        return _section(f"Invalid function arity ({data.get('arity')})", [
            _block("Arguments", data.get("args"), p),
            _block("Expected arity",
                   {"min": data.get("min"), "max": data.get("max")}, p),
            link], p)
    return _section("Unknown Error", [
        _block("Type", kind, p),
        _block("Data", data, p), link], p)


def format_exception(e: BaseException, p: "dict | None" = None) -> str:
    """Format a SchemaError — Schema Creation Error with "Did you mean"
    type proposals for unknown schema types (pretty.cljc:100-108), the
    generic Unknown Error block otherwise (virhe.cljc:184-192)."""
    p = p or printer()
    link = _block("More information", _color("link", MORE_INFO, p), p)
    data = getattr(e, "data", None)
    bad = (data or {}).get("type") if isinstance(data, dict) else None
    if isinstance(e, SchemaError) and bad is not None:
        from .core import default_registry
        keys = [k for k in default_registry() if isinstance(k, str)]
        near = sorted(k for k in keys
                      if _levenshtein(str(bad), k) <= 2)
        blocks = [_block("Invalid Schema", bad, p)]
        if near:
            blocks.append(_block("Did you mean", "\n".join(near), p))
        blocks.append(link)
        return _section("Schema Creation Error", blocks, p)
    blocks = [_block("Type", type(e).__name__, p),
              _block("Message", _color("string", str(e.args[0] if e.args
                                                     else e), p), p)]
    if data is not None:
        blocks.append(_block("Ex-data", data, p))
    blocks.append(link)
    return _section("Unknown Error", blocks, p)


def reporter(p: "dict | None" = None, file=None) -> Callable:
    """An instrument-compatible report callback that pretty-prints
    (pretty.cljc:163-169).  Pass as ``instrument(..., report=reporter())``
    to log violations without raising."""
    p = p or printer()

    def report(kind: str, data: dict) -> None:
        print(format_report(kind, data, p), file=file, end="")

    return report


def thrower(p: "dict | None" = None) -> Callable:
    """An instrument-compatible report callback that raises SchemaError
    with the pretty report as the message (pretty.cljc:171-177)."""
    p = p or printer()

    def report(kind: str, data: dict) -> None:
        raise SchemaError(format_report(kind, data, p),
                          {"kind": kind, "data": data})

    return report
