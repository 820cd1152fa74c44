"""Sequence-regex schemas: :cat :catn :alt :altn :? :* :+ :repeat.

A from-scratch backtracking matcher over Python sequences implementing the
semantics of malli's CPS/packrat regex engine
(/root/reference/src/malli/impl/regex.cljc:1-662; schema wiring
src/malli/core.cljc:2404-2448, 2968-3024).  This is the designated row-level
slow path (SURVEY.md SS2.2 "Ray note on seq-regex"); homogeneous token lists
never come through here — they vectorize via arrow_compile.

Error types mirror the reference: ``malli.core/end-of-input`` when the regex
needed more input (impl/regex.cljc:84) and ``malli.core/input-remaining`` when
items remain after a complete match (impl/regex.cljc:122).

Parse results follow malli: :cat -> list, :catn -> Tags, :alt -> value,
:altn -> Tag, :? -> value-or-None, :*/:+/:repeat -> list.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

from .core import (
    INVALID, Invalid, Schema, SchemaError, Tag, Tags, _entry_ctor, _error, schema,
)

# A matcher yields (next_pos, parsed) for every way it can match items[pos:].
Matcher = Callable[[list, int], Iterator[tuple[int, Any]]]

_MAX_STEPS = 1_000_000  # backtracking safety valve


class _Budget:
    __slots__ = ("steps",)

    def __init__(self) -> None:
        self.steps = 0

    def tick(self) -> None:
        self.steps += 1
        if self.steps > _MAX_STEPS:
            raise SchemaError("seq-regex backtracking budget exceeded")


def _item_matcher(child: Schema) -> Matcher:
    """A non-regex schema consumes exactly one item it validates."""
    valid = child.validator()
    parse = child.parser()

    def match(items: list, pos: int, budget: _Budget, parsing: bool):
        budget.tick()
        if pos < len(items):
            if parsing:
                p = parse(items[pos])
                if p is not INVALID:
                    yield pos + 1, p
            elif valid(items[pos]):
                yield pos + 1, None

    return match


def _compile_matcher(s: Schema) -> Matcher:
    if isinstance(s, RegexSchema):
        return s.matcher()
    return _item_matcher(s)


_POS_OPS_BUDGET = 2_000_000


def _tick(memo: dict, n: int) -> None:
    """Complexity budget for the position engine: bounds worst-case ambiguous
    patterns (e.g. deeply nested stars over long invalid inputs) — mirrors the
    backtracking engine's step budget."""
    ops = memo.get("__ops__")
    if ops is None:
        ops = memo["__ops__"] = [0]
    ops[0] += n
    if ops[0] > _POS_OPS_BUDGET:
        raise SchemaError("seq-regex position-engine budget exceeded")


def _item_pos_fn(child: Schema):
    """Position-set engine leaf: consume one validating item. In explain
    mode (memo carries "__fails__") failed attempts are recorded as
    (pos, kind, child) — the analog of the reference driver's fail!
    (impl/regex.cljc:75-84, 603-609)."""
    valid = child.validator()
    empty = frozenset()

    def pos(items: list, p: int, memo: dict, furthest: list) -> frozenset:
        if p < len(items) and valid(items[p]):
            if p + 1 > furthest[0]:
                furthest[0] = p + 1
            return frozenset((p + 1,))
        fails = memo.get("__fails__")
        if fails is not None:
            fails.append((p, "eoi" if p >= len(items) else "item", child))
        return empty

    return pos


def _compile_pos(s: Schema):
    if isinstance(s, RegexSchema):
        return s.pos_fn()
    return _item_pos_fn(s)


class RegexSchema(Schema):
    """Base for seq-regex schema types: full-sequence validate/explain/parse.

    Two engines, mirroring the reference's validator/parser split:
      - validation uses a MEMOIZED position-set engine (poly-time, the
        packrat idea from impl/regex.cljc's (fn,pos) memo tables);
      - parsing uses the backtracking matcher (first full match wins),
        budget-guarded.
    """

    def matcher(self) -> Matcher:
        m = self._cache.get("matcher")
        if m is None:
            m = self._matcher()
            self._cache["matcher"] = m
        return m

    def _matcher(self) -> Matcher:
        raise NotImplementedError

    # -- memoized position-set engine (validation) ------------------------
    def pos_fn(self):
        f = self._cache.get("pos_fn")
        if f is None:
            f = self._pos_fn()
            self._cache["pos_fn"] = f
        return f

    def _pos_fn(self):
        raise NotImplementedError

    def _match_positions(self, items: list, collect: bool = False
                         ) -> tuple[frozenset, int, list]:
        """(reachable end positions from 0, furthest position seen, and —
        when ``collect`` — the recorded item failures for explain)."""
        memo: dict = {}
        if collect:
            memo["__fails__"] = []
        furthest = [0]
        ends = self.pos_fn()(items, 0, memo, furthest)
        return ends, furthest[0], memo.get("__fails__") or []

    def _first_match(self, items: Any, parsing: bool) -> tuple[Any, int]:
        """Return (parsed | INVALID, furthest_pos)."""
        if not isinstance(items, (list, tuple)):
            return INVALID, -1
        items = list(items)
        n = len(items)
        budget = _Budget()
        furthest = 0
        complete_at = -1  # furthest pos where the regex itself completed
        try:
            for (end, parsed) in self.matcher()(items, 0, budget, parsing):
                furthest = max(furthest, end)
                complete_at = max(complete_at, end)
                if end == n:
                    return (parsed if parsing else True), n
        except SchemaError:
            return INVALID, furthest
        # no full match: report how far we got (for error classification)
        return INVALID, complete_at if complete_at >= 0 else -(furthest + 1)

    def _validator(self):
        this = self

        def valid(x):
            if not isinstance(x, (list, tuple)):
                return False
            items = list(x)
            ends, _, _ = this._match_positions(items)
            return len(items) in ends

        return valid

    def _explainer(self, path):
        this = self

        def explain_(x, in_, acc):
            if not isinstance(x, (list, tuple)):
                acc.append(_error(path, in_, this, x, "malli.core/invalid-type"))
                return acc
            items = list(x)
            ends, furthest, fails = this._match_positions(items, collect=True)
            if len(items) in ends:
                return acc
            # reference driver semantics (impl/regex.cljc:603-625): keep ALL
            # errors recorded at the MAXIMUM failure position — failed item
            # attempts (the child's own errors), end-of-input when an item
            # ran past the input, and input-remaining when an alternative
            # completed early.
            cands: list = list(fails)
            if ends:
                reach = max(ends)
                cands.append((reach, "rest", None))
            if not cands:
                acc.append(_error(path, in_ + [furthest], this,
                                  (x[furthest] if furthest < len(x) else None),
                                  "malli.core/end-of-input"))
                return acc
            top = max(p for (p, _, _) in cands)
            for (p, kind, child) in cands:
                if p != top:
                    continue
                if kind == "item":
                    cpath = this._child_path(child, path) or path
                    acc = child._explainer(cpath)(items[p], in_ + [p], acc)
                elif kind == "eoi":
                    cpath = this._child_path(child, path) or path
                    acc.append(_error(cpath, in_ + [p], child, None,
                                      "malli.core/end-of-input"))
                else:
                    acc.append(_error(path, in_ + [p], this,
                                      list(x[p:]), "malli.core/input-remaining"))
            return acc

        return explain_

    def _child_path(self, target: Schema, path: list) -> list | None:
        """Schema path of ``target`` within this regex subtree (identity
        search; explain-only)."""
        def parts_of(s: "RegexSchema"):
            if isinstance(s, (CatSchema, AltSchema)):
                return s._parts()
            return [(0, s.children[0])]

        def search(s, p):
            for (k, c) in parts_of(s):
                if c is target:
                    return p + [k]
                if isinstance(c, RegexSchema):
                    found = search(c, p + [k])
                    if found is not None:
                        return found
            return None

        return search(self, list(path))

    def _parser(self):
        this = self
        return lambda x: this._first_match(x, parsing=True)[0]

    def _unparser(self):
        this = self

        def unparse_(x):
            out = this._unparse_value(x)
            if out is INVALID:
                return INVALID
            flat: list = []
            if not _flatten_unparse(out, flat):
                return INVALID
            return flat

        return unparse_

    # each subtype turns its parse shape back into a (possibly nested) item seq
    def _unparse_value(self, x: Any) -> Any:
        return INVALID


class _Splice:
    """Marks a sub-sequence to splice into the parent during unparse."""

    __slots__ = ("items",)

    def __init__(self, items: list):
        self.items = items


def _flatten_unparse(v: Any, acc: list) -> bool:
    if v is INVALID:
        return False
    if isinstance(v, _Splice):
        for i in v.items:
            if not _flatten_unparse(i, acc):
                return False
        return True
    acc.append(v)
    return True


def _child_unparse(s: Schema, v: Any) -> Any:
    """Unparse one child: regex children yield a _Splice, plain children one item."""
    if isinstance(s, RegexSchema):
        return s._unparse_value(v)
    return s.unparser()(v)


class CatSchema(RegexSchema):
    """:cat / :catn — concatenation. impl/regex.cljc cat*/catn wiring."""

    named = False

    def __init__(self, type_, properties, children, options):
        super().__init__(type_, properties, children, options)
        self.named = type_ == "catn"

    def _parts(self) -> list[tuple[Any, Schema]]:
        if self.named:
            return [(k, s) for (k, _, s) in self.children]
        return [(i, s) for i, s in enumerate(self.children)]

    def _matcher(self) -> Matcher:
        parts = [(k, _compile_matcher(s), isinstance(s, RegexSchema)) for (k, s) in self._parts()]
        named = self.named

        def match(items, pos, budget, parsing):
            def step(i, p, acc):
                budget.tick()
                if i == len(parts):
                    if parsing:
                        yield p, (Tags(dict(acc)) if named else [v for (_, v) in acc])
                    else:
                        yield p, None
                    return
                k, m, _ = parts[i]
                for (np, pv) in m(items, p, budget, parsing):
                    yield from step(i + 1, np, acc + [(k, pv)] if parsing else acc)

            yield from step(0, pos, [])

        return match

    def _pos_fn(self):
        part_fns = [_compile_pos(s) for (_, s) in self._parts()]
        me = id(self)

        def pos(items, p, memo, furthest):
            key = (me, p)
            hit = memo.get(key)
            if hit is not None:
                return hit
            memo[key] = frozenset()  # recursion guard
            _tick(memo, 1)
            cur = {p}
            for pf in part_fns:
                _tick(memo, len(cur))
                nxt: set = set()
                for e in sorted(cur):
                    nxt |= pf(items, e, memo, furthest)
                cur = nxt
                if not cur:
                    break
            out = frozenset(cur)
            memo[key] = out
            return out

        return pos

    def _unparse_value(self, x):
        parts = self._parts()
        if self.named:
            if not isinstance(x, Tags):
                return INVALID
            vals = x.values
            out = []
            for (k, s) in parts:
                if k not in vals:
                    return INVALID
                u = _child_unparse(s, vals[k])
                if u is INVALID:
                    return INVALID
                out.append(u)
            return _Splice(out)
        if not isinstance(x, (list, tuple)) or len(x) != len(parts):
            return INVALID
        out = []
        for (k, s), v in zip(parts, x):
            u = _child_unparse(s, v)
            if u is INVALID:
                return INVALID
            out.append(u)
        return _Splice(out)

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        if self.named:
            for (k, props, s) in self.children:
                out.append([k, props, s.form] if props else [k, s.form])
        else:
            out.extend(c.form for c in self.children)
        return out


class AltSchema(RegexSchema):
    """:alt / :altn — alternation."""

    def __init__(self, type_, properties, children, options):
        super().__init__(type_, properties, children, options)
        self.named = type_ == "altn"

    def _parts(self):
        if self.named:
            return [(k, s) for (k, _, s) in self.children]
        return [(i, s) for i, s in enumerate(self.children)]

    def _matcher(self) -> Matcher:
        parts = [(k, _compile_matcher(s)) for (k, s) in self._parts()]
        named = self.named

        def match(items, pos, budget, parsing):
            for k, m in parts:
                budget.tick()
                for (np, pv) in m(items, pos, budget, parsing):
                    yield np, (Tag(k, pv) if (parsing and named) else pv)

        return match

    def _pos_fn(self):
        branch_fns = [_compile_pos(s) for (_, s) in self._parts()]
        me = id(self)

        def pos(items, p, memo, furthest):
            key = (me, p)
            hit = memo.get(key)
            if hit is not None:
                return hit
            memo[key] = frozenset()
            out: set = set()
            for bf in branch_fns:
                out |= bf(items, p, memo, furthest)
            result = frozenset(out)
            memo[key] = result
            return result

        return pos

    def _unparse_value(self, x):
        if self.named:
            if not isinstance(x, Tag):
                return INVALID
            for (k, _, s) in self.children:
                if k == x.key:
                    u = _child_unparse(s, x.value)
                    return INVALID if u is INVALID else _Splice([u])
            return INVALID
        for s in [s for (_, s) in self._parts()]:
            u = _child_unparse(s, x)
            if u is not INVALID:
                return _Splice([u])
        return INVALID

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        if self.named:
            for (k, props, s) in self.children:
                out.append([k, props, s.form] if props else [k, s.form])
        else:
            out.extend(c.form for c in self.children)
        return out


class RepeatSchema(RegexSchema):
    """:? :* :+ :repeat — bounded repetition (greedy with backtracking).

    Reference: impl/regex.cljc repeat/opt/plus/star combinators (:repeat uses
    min/max registers, impl/regex.cljc:300-420).
    """

    def __init__(self, type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(f":{type_} expects exactly one child")
        super().__init__(type_, properties, children, options)
        props = properties or {}
        if type_ == "?":
            self.min, self.max = 0, 1
        elif type_ == "*":
            self.min, self.max = 0, None
        elif type_ == "+":
            self.min, self.max = 1, None
        else:  # :repeat
            self.min = props.get("min", 0)
            self.max = props.get("max")

    def _matcher(self) -> Matcher:
        child = self.children[0]
        cm = _compile_matcher(child)
        mn, mx = self.min, self.max
        is_opt = self.type == "?"

        def match(items, pos, budget, parsing):
            # greedy: try more repetitions first, backtrack to fewer
            def step(count, p, acc):
                budget.tick()
                if mx is None or count < mx:
                    for (np, pv) in cm(items, p, budget, parsing):
                        if np == p and count >= mn:
                            continue  # zero-width guard: skip THIS match only
                        yield from step(count + 1, np, acc + [pv] if parsing else acc)
                if count >= mn:
                    if parsing:
                        if is_opt:
                            yield p, (acc[0] if acc else None)
                        else:
                            yield p, list(acc)
                    else:
                        yield p, None

            yield from step(0, pos, [])

        return match

    def _pos_fn(self):
        child_fn = _compile_pos(self.children[0])
        mn, mx = self.min, self.max
        me = id(self)

        def pos(items, p, memo, furthest):
            key = (me, p)
            hit = memo.get(key)
            if hit is not None:
                return hit
            memo[key] = frozenset()
            result: set = set()
            if mn == 0:
                result.add(p)
            frontier = {p}
            count = 0
            n_rest = len(items) - p
            # correctness bound: a path needing count >= mn reps either has a
            # pumpable zero-width cycle (which the free-running frontier
            # keeps alive: q stays in the frontier iff q in child(q)) or has
            # at most n_rest+1 distinct-position reps — so iterating to
            # mn + n_rest + 1 covers every achievable (position, count>=mn)
            limit = mx if mx is not None else mn + n_rest + 1
            saturated = n_rest + 1  # every position from p..n reached
            # cycle fast-forward: if a frontier state repeats, the sequence
            # is periodic; every position in the cycle recurs at arbitrarily
            # large counts (hence at some count within [mn, limit])
            state_first: dict = {}
            while frontier and count < limit:
                _tick(memo, len(frontier))
                nxt: set = set()
                for e in sorted(frontier):
                    nxt |= child_fn(items, e, memo, furthest)
                count += 1
                if count >= mn:
                    result |= nxt
                    if len(result) == saturated:
                        break  # cannot grow further (positions are monotone)
                state = frozenset(nxt)
                prev_count = state_first.get(state)
                if prev_count is not None:
                    # periodic from prev_count with period (count-prev_count):
                    # all states in the cycle repeat forever, so when mx is
                    # unbounded (or the cycle fits below mx) their positions
                    # are reachable at counts >= mn
                    if mx is None:
                        cycle_union: set = set()
                        for s, c0 in state_first.items():
                            if c0 >= prev_count:
                                cycle_union |= s
                        result |= cycle_union | nxt
                        break
                    if prev_count >= mn:
                        # bounded mx: the whole cycle already ran with
                        # count >= mn, so every recurring position is in result
                        break
                else:
                    state_first[state] = count
                frontier = nxt
            out = frozenset(result)
            memo[key] = out
            return out

        return pos

    def _unparse_value(self, x):
        child = self.children[0]
        if self.type == "?":
            if x is None:
                return _Splice([])
            u = _child_unparse(child, x)
            return INVALID if u is INVALID else _Splice([u])
        if not isinstance(x, (list, tuple)):
            return INVALID
        # repetition count must satisfy the bounds (repeat-unparse-test,
        # core_test.cljc:3071-3086: out-of-bounds parse shapes are invalid)
        if len(x) < self.min or (self.max is not None and len(x) > self.max):
            return INVALID
        out = []
        for v in x:
            u = _child_unparse(child, v)
            if u is INVALID:
                return INVALID
            out.append(u)
        return _Splice(out)

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        out.extend(c.form for c in self.children)
        return out


def register_into(reg: dict) -> None:
    reg["cat"] = CatSchema
    reg["catn"] = _entry_ctor(CatSchema)
    reg["alt"] = AltSchema
    reg["altn"] = _entry_ctor(AltSchema)
    for t in ("?", "*", "+", "repeat"):
        reg[t] = RepeatSchema


def regex_min_max(s: Schema, nested: bool = False) -> tuple[int, int | None]:
    """(min, max) sequence length a seqex schema can match; max None means
    unbounded. Reference: -regex-min-max (src/malli/core.cljc:87,154,
    297-303, 2968-3024); non-regex schemas count as one item ({:min 1
    :max 1}, core.cljc:154); :ref fails (::potentially-recursive-seqex,
    core.cljc:2055)."""
    from .core import RefSchema, WrapperSchema

    if isinstance(s, RefSchema):
        raise SchemaError("potentially recursive seqex: :ref inside a "
                          "sequence regex has no static min/max")
    if isinstance(s, WrapperSchema):
        # [:schema X] nested inside an outer regex counts as ONE item;
        # the internal ::m/schema wrapper stays transparent even nested
        # (core.cljc:2147-2150 — `(and nested? (not internal))`)
        internal = s.type == "malli.core/schema"
        if nested and not internal:
            return (1, 1)
        return regex_min_max(s.deref(), nested)
    if isinstance(s, RepeatSchema):
        cmin, cmax = regex_min_max(s.children[0], True)
        t = s.type
        if t == "+":
            return (cmin, None)          # {:min child-min}
        if t == "*":
            return (0, None)
        if t == "?":
            return (0, cmax)
        # :repeat — property bounds scale the child bounds (-re-min-max *)
        pmin = (s.properties or {}).get("min", 0)
        pmax = (s.properties or {}).get("max")
        mx = pmax * cmax if (pmax is not None and cmax is not None) else None
        return (pmin * cmin, mx)
    if isinstance(s, CatSchema):
        mn, mx = 0, 0
        for (_, child) in s._parts():
            cmin, cmax = regex_min_max(child, True)
            mn += cmin
            mx = mx + cmax if (mx is not None and cmax is not None) else None
        return (mn, mx)
    if isinstance(s, AltSchema):
        mn: int | None = None
        mx = 0
        for (_, child) in s._parts():
            cmin, cmax = regex_min_max(child, True)
            mn = cmin if mn is None else min(mn, cmin)
            mx = max(mx, cmax) if (mx is not None and cmax is not None) else None
        return (mn or 0, mx)
    return (1, 1)
