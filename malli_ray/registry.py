"""Registry variants — the malli.registry surface.

Reference: /root/reference/src/malli/registry.cljc:17-95 — fast (plain map),
composite (first hit wins), mutable (atom-backed), lazy (provider-fn), and
var registries. Our registries are plain dicts from the engine's point of
view (``core.schema`` only needs ``__getitem__``/``__contains__``); these
classes provide the same composition semantics with dict protocol.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Mapping

from .core import default_registry

__all__ = ["fast_registry", "composite_registry", "MutableRegistry",
           "LazyRegistry", "registry_of"]


def fast_registry(schemas: Mapping[str, Any]) -> dict:
    """A plain dict registry (registry.cljc:17-22 uses a HashMap for speed —
    Python dicts already are one)."""
    return dict(schemas)


class composite_registry(Mapping):
    """First-match-wins composition (registry.cljc:54-60)."""

    def __init__(self, *registries: Mapping):
        self.registries = registries

    def __getitem__(self, key):
        for r in self.registries:
            if key in r:
                return r[key]
        raise KeyError(key)

    def __contains__(self, key) -> bool:
        return any(key in r for r in self.registries)

    def __iter__(self) -> Iterator:
        seen = set()
        for r in self.registries:
            for k in r:
                if k not in seen:
                    seen.add(k)
                    yield k

    def __len__(self) -> int:
        return sum(1 for _ in self)


class MutableRegistry(Mapping):
    """Atom-backed mutable registry (registry.cljc:62-70): register/deregister
    after creation; schemas compiled later see the updates."""

    def __init__(self, base: Mapping | None = None):
        self._store: dict = dict(base or {})

    def register(self, type_name: str, schema_or_ctor: Any) -> "MutableRegistry":
        self._store[type_name] = schema_or_ctor
        return self

    def deregister(self, type_name: str) -> "MutableRegistry":
        self._store.pop(type_name, None)
        return self

    def __getitem__(self, key):
        return self._store[key]

    def __contains__(self, key) -> bool:
        return key in self._store

    def __iter__(self) -> Iterator:
        return iter(self._store)

    def __len__(self) -> int:
        return len(self._store)


class LazyRegistry(Mapping):
    """Provider-backed lazy registry (registry.cljc:72-84): unknown names are
    resolved by ``provider(name)`` on first use and cached."""

    def __init__(self, provider: Callable[[str], Any], base: Mapping | None = None):
        self.provider = provider
        self._cache: dict = dict(base or {})

    def __getitem__(self, key):
        if key not in self._cache:
            resolved = self.provider(key)
            if resolved is None:
                raise KeyError(key)
            self._cache[key] = resolved
        return self._cache[key]

    def __contains__(self, key) -> bool:
        if key in self._cache:
            return True
        try:
            self[key]
            return True
        except KeyError:
            return False

    def __iter__(self) -> Iterator:
        return iter(self._cache)

    def __len__(self) -> int:
        return len(self._cache)


def registry_of(*extras: Mapping) -> composite_registry:
    """Extras layered over the default built-in registry."""
    return composite_registry(*extras, default_registry())
