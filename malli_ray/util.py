"""Schema algebra — the malli.util surface (driver-side, data-free).

Reimplements the semantics of /root/reference/src/malli/util.cljc over our
Python schema trees: ``merge`` (:53-101), ``union`` (:103-112), entry editing
(select-keys/dissoc/assoc/rename/optional/required, :238-388),
closed/open (:128-166), subschemas & path translation (:168-207), and the lazy
wrapper schema types :merge / :union / :select-keys (:394-418).

These are pure schema-tree manipulations; they never touch data
(SURVEY.md SS2.6).
"""

from __future__ import annotations

from typing import Any, Callable

from .core import (
    DEFAULT_KEY, MapSchema, Schema, SchemaError, schema,
)

__all__ = [
    "merge", "union", "select_keys", "dissoc", "assoc", "update", "rename_keys",
    "optional_keys", "required_keys", "keys", "get", "get_in", "assoc_in",
    "closed_schema", "open_schema", "subschemas", "equals", "find",
    "transform_entries", "register_into", "path_to_in", "in_to_paths",
    "update_properties", "find_first", "distinct_by",
    "update_entry_properties", "update_in", "data_explainer", "explain_data",
]


def path_to_in(s: Any, path: list, options: dict | None = None) -> list:
    """Schema path -> value path (mu/path->in, src/malli/util.cljc:189-199).

    Drops branch/positional steps that do not index into the value
    (:or/:and/:maybe child indexes, :orn branch names)."""
    out: list = []
    sc = schema(s, options)
    for step in path:
        sc = _deref_all(sc)
        t = sc.type
        if isinstance(sc, MapSchema):
            out.append(step)
            sc = next((cs for (k, _, cs) in sc.children if k == step), sc)
        elif t in ("vector", "sequential", "seqable", "set", "every"):
            out.append(step)
            sc = sc.children[0]
        elif t == "tuple":
            out.append(step)
            sc = sc.children[step]
        elif t == "map-of":
            # path 0 = key schema, 1 = value schema; both index by map key
            sc = sc.children[step if isinstance(step, int) else 1]
        elif t in ("or", "and", "maybe", "not", "schema", "malli.core/schema",
                   "ref"):
            cs = sc.children
            if isinstance(step, int) and step < len(cs) and isinstance(cs[step], Schema):
                sc = cs[step]
        elif t in ("orn", "andn", "multi"):
            sc = next((cs for (k, _, cs) in sc.children if k == step), sc)
        else:
            out.append(step)
    return out


def in_to_paths(s: Any, in_: list, options: dict | None = None) -> list:
    """Value path -> all matching schema paths (mu/in->paths,
    src/malli/util.cljc:201-207)."""
    results: list = []

    def walk_(sc: Schema, remaining: list, acc: list) -> None:
        sc = _deref_all(sc)
        if not remaining:
            results.append(acc)
            return
        step, rest = remaining[0], remaining[1:]
        t = sc.type
        if isinstance(sc, MapSchema):
            for (k, _, cs) in sc.children:
                if k == step:
                    walk_(cs, rest, acc + [k])
        elif t in ("vector", "sequential", "seqable", "set", "every"):
            walk_(sc.children[0], rest, acc + [0])
        elif t == "tuple":
            if isinstance(step, int) and step < len(sc.children):
                walk_(sc.children[step], rest, acc + [step])
        elif t in ("or", "and", "maybe"):
            for i, cs in enumerate(sc.children):
                walk_(cs, remaining, acc + [i])
        elif t in ("orn", "andn", "multi"):
            for (k, _, cs) in sc.children:
                walk_(cs, remaining, acc + [k])
        else:
            return

    walk_(schema(s, options), list(in_), [])
    return results


def _as_map(s: Any, options=None) -> MapSchema:
    sc = schema(s, options)
    sc = _deref_all(sc)
    if not isinstance(sc, MapSchema):
        raise SchemaError(f"expected :map schema, got {sc.type}")
    return sc


def _deref_all(sc: Schema) -> Schema:
    seen = 0
    while True:
        d = sc.deref()
        if d is sc or seen > 100:
            return sc
        sc = d
        seen += 1


def _rebuild_map(template: MapSchema, entries: list, properties: dict | None = None) -> MapSchema:
    props = properties if properties is not None else dict(template.properties)
    return MapSchema("map", props, entries, template.options)


def _merge_entry(p1, cs1, p2, cs2, options, merge_default,
                 merge_required) -> tuple:
    """-entry (util.cljc:25-28): entry props MERGE, required-ness resolved
    by ``merge_required`` (merge: last wins; union: both), child schemas
    merge recursively."""
    mr = merge_required or (lambda a, b: b)
    r1 = not bool((p1 or {}).get("optional"))
    r2 = not bool((p2 or {}).get("optional"))
    p = {**(p1 or {}), **(p2 or {})}
    p["optional"] = not mr(r1, r2)
    if p.get("optional") is False:
        p.pop("optional")
    return (p or None,
            merge(cs1, cs2, options, merge_default=merge_default,
                  merge_required=merge_required))


def merge(s1: Any, s2: Any, options: dict | None = None, *,
          merge_default=None, merge_required=None) -> Schema:
    """mu/merge (src/malli/util.cljc:53-101):

    - nil on either side: the other wins;
    - two :map schemas: keys and values merge deeply; entry properties
      merge; required-ness resolved by ``merge_required`` (default: the
      LAST entry wins);
    - :and schemas: the FIRST child joins the merge, the remaining
      conjuncts are kept as-is (props merged);
    - :multi distributes (only when no custom hooks are given, matching the
      reference's can-distribute? guard);
    - anything else: ``merge_default`` (default: last wins).
    """
    can_distribute = merge_default is None and merge_required is None
    md = merge_default or (lambda a, b, _o: b)
    mr = merge_required or (lambda r1, r2: r2)
    if s1 is None:
        return schema(s2, options)
    if s2 is None:
        return schema(s1, options)
    from .core import MultiSchema
    da = _deref_all(schema(s1, options))
    db = _deref_all(schema(s2, options))

    def recur(a, b):
        return merge(a, b, options, merge_default=merge_default,
                     merge_required=merge_required)

    if can_distribute:
        def multi_distribute(multi: MultiSchema, other, right: bool) -> Schema:
            entries = []
            for (k, p, cs) in multi.children:
                merged = recur(cs, other) if right else recur(other, cs)
                entries.append([k, p, merged.form] if p else [k, merged.form])
            form: list = ["multi", dict(multi.properties or {}), *entries]
            return schema(form, options)

        # distributivity over :multi (util.cljc:85-87)
        if isinstance(da, MultiSchema):
            return multi_distribute(da, db, right=True)
        if isinstance(db, MultiSchema):
            return multi_distribute(db, da, right=False)

    ta = "map" if isinstance(da, MapSchema) else da.type
    tb = "map" if isinstance(db, MapSchema) else db.type
    if ta not in ("map", "and") or tb not in ("map", "and"):
        return md(da, db, options)  # merge-default (util.cljc:88-90)

    if ta == "and" or tb == "and":
        # join (util.cljc:79-80): merge the first children, keep the rest
        def tear(t, s):
            if t == "map":
                return None, [s]
            return (s.properties or None), list(s.children)

        p1, cs1 = tear(ta, da)
        p2, cs2 = tear(tb, db)
        head = recur(cs1[0], cs2[0])
        props = {**(p1 or {}), **(p2 or {})}
        form: list = ["and"]
        if props:
            form.append(props)
        form.append(head.form)
        form.extend(c.form for c in cs1[1:])
        form.extend(c.form for c in cs2[1:])
        return schema(form, options)

    out: list = []
    index: dict = {}
    for (k, p, cs) in da.children:
        index[k] = len(out)
        out.append((k, p, cs))
    for (k, p, cs) in db.children:
        if k in index:
            # every duplicate key — INCLUDING ::m/default — goes through
            # -entry, so child schemas merge recursively (util.cljc:92-101)
            (k0, p0, cs0) = out[index[k]]
            mp, mc = _merge_entry(p0, cs0, p, cs, options,
                                  merge_default, merge_required)
            out[index[k]] = (k, mp, mc)
        else:
            index[k] = len(out)
            out.append((k, p, cs))
    props = dict(da.properties)
    props.update(db.properties)
    return _rebuild_map(da, out, props)


def union(s1: Any, s2: Any, options: dict | None = None) -> Schema:
    """mu/union (src/malli/util.cljc:103-112): merge with
    merge-default = [:or s1 s2] unless equal, and merge-required = AND
    (an entry is required only if required on BOTH sides)."""

    def or_unless_equal(a: Schema, b: Schema, _o):
        if equals(a, b):
            return a
        return schema(["or", a.form, b.form], options)

    return merge(s1, s2, options, merge_default=or_unless_equal,
                 merge_required=lambda r1, r2: r1 and r2)


def select_keys(s: Any, ks: list, options: dict | None = None) -> Schema:
    m = _as_map(s, options)
    ks_set = set(ks)
    return _rebuild_map(m, [(k, p, cs) for (k, p, cs) in m.children if k in ks_set])


def dissoc(s: Any, key: Any, options: dict | None = None) -> Schema:
    m = _as_map(s, options)
    return _rebuild_map(m, [(k, p, cs) for (k, p, cs) in m.children if k != key])


def assoc(s: Any, key: Any, child: Any, options: dict | None = None,
          entry_props: dict | None = None) -> Schema:
    """LensSchema -set: entry schemas replace/append the entry; other
    schemas set the positional child (util.cljc:300-330 via m/-set)."""
    sc = _deref_all(schema(s, options))
    cs = schema(child, options or sc.options)
    if isinstance(sc, MapSchema):
        out = []
        replaced = False
        for (k, p, c) in sc.children:
            if k == key:
                out.append((k, entry_props if entry_props is not None else p, cs))
                replaced = True
            else:
                out.append((k, p, c))
        if not replaced:
            out.append((key, entry_props, cs))
        return _rebuild_map(sc, out)
    if _entry_children(sc):
        out2 = []
        replaced = False
        for (k, p, c) in sc.children:
            if k == key:
                out2.append([k, entry_props if entry_props is not None else p, cs.form])
                replaced = True
            else:
                out2.append([k, p, c.form if isinstance(c, Schema) else c])
        if not replaced:
            out2.append([key, entry_props, cs.form])
        form: list = [sc.type]
        if sc.properties:
            form.append(dict(sc.properties))
        form.extend([e[0], e[2]] if not e[1] else e for e in out2)
        return schema(form, sc.options)
    # positional set
    if not isinstance(key, int) or key < 0 or key > len(sc.children):
        raise SchemaError(f"cannot assoc key {key!r} into {sc.type}")
    kids = [c.form if isinstance(c, Schema) else c for c in sc.children]
    if key == len(kids):
        kids.append(cs.form)
    else:
        kids[key] = cs.form
    form = [sc.type]
    if sc.properties:
        form.append(dict(sc.properties))
    form.extend(kids)
    return schema(form, sc.options)


def update(s: Any, key: Any, f: Callable[[Schema | None], Any],
           options: dict | None = None) -> Schema:
    """mu/update (util.cljc:332-340): f over -get, result -set back."""
    sc = _deref_all(schema(s, options))
    current = get(sc, key, options)
    return assoc(sc, key, f(current), options)


def rename_keys(s: Any, kmap: dict, options: dict | None = None) -> Schema:
    m = _as_map(s, options)
    return _rebuild_map(m, [(kmap.get(k, k), p, cs) for (k, p, cs) in m.children])


def _set_optional(s: Any, ks, value: bool, options) -> Schema:
    m = _as_map(s, options)
    ks_set = set(ks) if ks is not None else None
    out = []
    for (k, p, cs) in m.children:
        if ks_set is None or k in ks_set:
            np = dict(p or {})
            if value:
                np["optional"] = True
            else:
                np.pop("optional", None)
            out.append((k, np or None, cs))
        else:
            out.append((k, p, cs))
    return _rebuild_map(m, out)


def optional_keys(s: Any, ks=None, options: dict | None = None) -> Schema:
    return _set_optional(s, ks, True, options)


def required_keys(s: Any, ks=None, options: dict | None = None) -> Schema:
    return _set_optional(s, ks, False, options)


def keys(s: Any, options: dict | None = None) -> list:
    return [k for (k, _, _) in _as_map(s, options).children if k != DEFAULT_KEY]


def find(s: Any, key: Any, options: dict | None = None):
    m = _as_map(s, options)
    return next(((k, p, cs) for (k, p, cs) in m.children if k == key), None)


def _entry_children(sc: Schema) -> bool:
    cs = getattr(sc, "children", [])
    return bool(cs) and all(isinstance(c, (tuple, list)) and len(c) == 3
                            for c in cs)


def get(s: Any, key: Any, options: dict | None = None) -> Any:
    """LensSchema -get (util.cljc:246-253; basic-lens-schema-test):
    entry schemas look up by key; collections return the single child for
    ANY index; other schemas index positionally (literal children — :enum
    values, :re patterns — are returned as-is); :ref returns its key."""
    from .core import CollectionSchema, RefSchema, WrapperSchema
    sc = schema(s, options)
    if isinstance(sc, RefSchema):
        # mu/get on :ref at 0 returns a pointer: form is the ref key,
        # getting 0 again reaches the target (util_test.cljc:443-451)
        if key != 0:
            return None
        w = WrapperSchema("malli.core/schema", {}, [sc.deref()], sc.options)
        w._cache["form"] = sc.key
        return w
    # proxies (:merge/:union/:select-keys) deref; :schema wrappers do NOT —
    # their -get returns the wrapped child positionally
    while sc.type in ("merge", "union", "select-keys"):
        sc = sc.deref()
    if isinstance(sc, MapSchema) or _entry_children(sc):
        return next((cs for (k, _, cs) in sc.children if k == key), None)
    if isinstance(sc, CollectionSchema):
        return sc.children[0]
    if isinstance(key, int) and 0 <= key < len(sc.children):
        return sc.children[key]
    return None


def get_in(s: Any, path: list, options: dict | None = None) -> Schema | None:
    sc: Schema | None = schema(s, options)
    for k in path:
        if sc is None:
            return None
        sc = get(sc, k, options)
    return sc


def assoc_in(s: Any, path: list, child: Any, options: dict | None = None) -> Schema:
    if not path:
        return schema(child, options)
    k, rest = path[0], path[1:]
    m = _as_map(s, options)
    if rest:
        # missing intermediate entries default to :map (util.cljc:375-377
        # `(get schema k (m/schema :map ...))` — test-874 builds nested maps
        # into an empty [:map])
        sub = get(m, k)
        if sub is None:
            sub = schema(["map"], options)
        return assoc(m, k, assoc_in(sub, rest, child, options), options)
    return assoc(m, k, child, options)


def _set_closed(s: Any, closed: bool, options) -> Schema:
    def walker(sc: Schema, path, walked):
        if isinstance(sc, MapSchema):
            props = dict(sc.properties)
            if closed:
                props["closed"] = True
            else:
                props.pop("closed", None)
            return MapSchema("map", props, walked, sc.options)
        return _rebuild_node(sc, walked)

    return schema(s, options).walk(walker)


def _rebuild_node(sc: Schema, walked: list) -> Schema:
    if walked == sc.children:
        return sc
    # re-run the real constructor so derived fields (MultiSchema.branches,
    # MapSchema.explicit_keys, ...) are rebuilt from the new children —
    # a __dict__ copy would leave them pointing at the OLD child schemas
    try:
        return type(sc)(sc.type, sc.properties, walked, sc.options)
    except Exception:
        new = object.__new__(type(sc))
        new.__dict__.update(sc.__dict__)
        new.children = walked
        new._cache = {}
        return new


def closed_schema(s: Any, options: dict | None = None) -> Schema:
    """Recursively close all :map schemas. src/malli/util.cljc:128-146."""
    return _set_closed(s, True, options)


def open_schema(s: Any, options: dict | None = None) -> Schema:
    return _set_closed(s, False, options)


def find_first(s: Any, f: Callable, options: dict | None = None):
    """Prewalk; return the first non-None ``f(schema, path, options)``
    (mu/find-first, util.cljc:37-52)."""
    for (path, sub) in subschemas(s, options):
        out = f(sub, path, options)
        if out is not None:
            return out
    return None


def distinct_by(f: Callable, coll) -> list:
    """Distinct by ``f(x)``, first occurrence wins (util.cljc:183-188)."""
    seen = set()
    out = []
    for x in coll:
        v = f(x)
        if v not in seen:
            seen.add(v)
            out.append(x)
    return out


def update_entry_properties(s: Any, key: Any, f: Callable[[dict], dict],
                            options: dict | None = None) -> Schema:
    """Update the ENTRY properties of entry ``key`` on ANY entry schema
    (:map, :orn, :multi, ... — mu/update-entry-properties,
    util.cljc:120-127; orn case util_test.cljc:1090-1095)."""
    sc = _deref_all(schema(s, options))
    children = getattr(sc, "children", [])
    if not children or not all(isinstance(c, (tuple, list)) and len(c) == 3
                               for c in children):
        raise SchemaError(f"no entry {key!r} in {sc.form!r} (malli.util/no-entry)")
    if not any(k == key for (k, _, _) in children):
        raise SchemaError(f"no entry {key!r} in {sc.form!r} (malli.util/no-entry)")
    entries = []
    for (k, p, cs) in children:
        if k == key:
            p = f(dict(p or {}))
            entries.append((k, p or None, cs))
        else:
            entries.append((k, p, cs))
    if isinstance(sc, MapSchema):
        return _rebuild_map(sc, entries, sc.properties)
    form: list = [sc.type]
    if sc.properties:
        form.append(dict(sc.properties))
    for (k, p, cs) in entries:
        cf = cs.form if isinstance(cs, Schema) else cs
        form.append([k, p, cf] if p else [k, cf])
    return schema(form, sc.options)


def update_in(s: Any, path: list, f: Callable, options: dict | None = None) -> Schema:
    """Like assoc_in but transforms the existing child with ``f``
    (mu/update-in, util.cljc:379-389)."""
    if not path:
        return schema(f(schema(s, options)), options)
    cur = get_in(s, path, options)
    return assoc_in(s, path, f(cur), options)


def _form_of(x: Any) -> Any:
    return x.form if isinstance(x, Schema) else x


def data_explainer(s: Any, options: dict | None = None) -> Callable[[Any], Any]:
    """Like m/explainer but output is PURE data: Schema objects replaced by
    their forms — serializable errors (mu/data-explainer, util.cljc:209-223)."""
    from .core import explainer as m_explainer
    exp = m_explainer(s, options)

    def data_explain(value):
        e = exp(value)
        if e is None:
            return None
        return {"schema": _form_of(e["schema"]), "value": e["value"],
                "errors": [{**err, "schema": _form_of(err.get("schema"))}
                           for err in e["errors"]]}

    return data_explain


def explain_data(s: Any, value: Any, options: dict | None = None):
    """m/explain with serializable (form-only) output
    (mu/explain-data, util.cljc:224-236)."""
    return data_explainer(s, options)(value)


def subschemas(s: Any, options: dict | None = None) -> list:
    """All (path, schema) pairs, preorder. src/malli/util.cljc:168-187."""
    out: list = []

    def walker(sc: Schema, path, walked):
        out.append((list(path), sc))
        return sc

    schema(s, options).walk(walker)
    # walk is bottom-up; re-sort to preorder by path
    out.sort(key=lambda kv: (len(kv[0]), [str(p) for p in kv[0]]))
    return out


def equals(s1: Any, s2: Any, options: dict | None = None) -> bool:
    """Form equality. src/malli/util.cljc:183-187."""
    return schema(s1, options).form == schema(s2, options).form


def transform_entries(s: Any, f: Callable[[list], list], options: dict | None = None) -> Schema:
    m = _as_map(s, options)
    return _rebuild_map(m, f(list(m.children)))


def update_properties(s: Any, f: Callable[[dict], dict],
                      options: dict | None = None) -> Schema:
    """mu/update-properties: rebuild the schema with f(properties)
    (src/malli/util.cljc:114-126)."""
    sc = schema(s, options)
    new_props = f(dict(sc.properties)) or {}
    form = sc.form
    if isinstance(form, list):
        rest = form[1:]
        if rest and (isinstance(rest[0], dict) or rest[0] is None):
            rest = rest[1:]
        new_form = [form[0]] + ([new_props] if new_props else []) + rest
    else:
        new_form = [form, new_props] if new_props else form
    return schema(new_form, sc.options)


# --------------------------------------------------------------------------
# lazy wrapper schema types :merge / :union / :select-keys
# (mu/schemas, src/malli/util.cljc:394-418, via -proxy-schema core.cljc:2323-2380)
# --------------------------------------------------------------------------


class _ProxySchema(Schema):
    """A schema type that derives a concrete schema from its children."""

    def __init__(self, type_, properties, children, options):
        super().__init__(type_, properties, children, options)
        self._derived: Schema | None = None

    def deref(self) -> Schema:
        if self._derived is None:
            self._derived = self._derive()
        return self._derived

    def _derive(self) -> Schema:
        raise NotImplementedError

    def _validator(self):
        return self.deref().validator()

    def _explainer(self, path):
        return self.deref()._explainer(path)

    def _parser(self):
        return self.deref().parser()

    def _unparser(self):
        return self.deref().unparser()

    def _children_transformer(self, transformer, method, options):
        return self.deref()._transformer(transformer, method, options)


class MergeSchema(_ProxySchema):
    def __init__(self, type_, properties, children, options):
        if not children:
            # -reducing requires >= 1 child (::m/child-error,
            # util_test.cljc:1128-1139)
            raise SchemaError(f":{type_} expects at least one child")
        super().__init__(type_, properties, children, options)

    def _derive(self) -> Schema:
        out = None
        for c in self.children:
            out = merge(out, c, self.options) if out is not None else c
        return out if out is not None else schema("map", self.options)


class UnionSchema(MergeSchema):
    def _derive(self) -> Schema:
        out = None
        for c in self.children:
            out = union(out, c, self.options) if out is not None else c
        return out if out is not None else schema("map", self.options)


class SelectKeysSchema(_ProxySchema):
    def _derive(self) -> Schema:
        if len(self.children) != 2:
            raise SchemaError(":select-keys expects [map-schema [keys...]]")
        base, ks = self.children
        return select_keys(base, ks, self.options)

    def _form(self):
        base, ks = self.children
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        out.append(base.form if isinstance(base, Schema) else base)
        out.append(list(ks))
        return out


def _select_keys_ctor(type_, props, children, options):
    if len(children) != 2:
        raise SchemaError(":select-keys expects [map-schema [keys...]]")
    return SelectKeysSchema(type_, props, [schema(children[0], options), list(children[1])], options)


def register_into(reg: dict) -> None:
    reg["merge"] = MergeSchema
    reg["union"] = UnionSchema
    reg["select-keys"] = _select_keys_ctor
