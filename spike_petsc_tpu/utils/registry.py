"""Name-based plugin registries.

The reference registers orderings, preconditioners and Krylov methods into
PETSc's runtime registries so everything is reachable from the options
database (`MatOrderingRegister("wbm", ...)`, `PCRegister("banded", ...)`,
`KSPRegister("reorder", ...)` — /root/reference/src/testbed2.c:61-73).

Here the registries map names to plain Python callables/factories; the
framework pre-registers its built-ins and user code can add more at runtime.
"""

from __future__ import annotations

from typing import Callable, Dict, List


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str, factory: Callable) -> None:
        self._entries[name] = factory

    def get(self, name: str) -> Callable:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"Unknown {self.kind} {name!r}; known: {known}") from None

    def has(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> List[str]:
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


# Global registries, mirroring PETSc's MatOrderingList / PCList / KSPList.
ORDERINGS = Registry("mat ordering")
PRECONDITIONERS = Registry("preconditioner (PC)")
SOLVERS = Registry("krylov solver (KSP)")


def register_ordering(name: str, fn: Callable = None):
    """Register a matrix ordering, usable as a decorator.

    Equivalent of MatOrderingRegister (/root/reference/src/testbed.c:67-68).
    Ordering signature: fn(csr_matrix, options) -> OrderingResult.
    """
    if fn is None:
        return lambda f: (ORDERINGS.register(name, f), f)[1]
    ORDERINGS.register(name, fn)
    return fn


def register_pc(name: str, fn: Callable = None):
    """Equivalent of PCRegister (/root/reference/src/testbed2.c:70)."""
    if fn is None:
        return lambda f: (PRECONDITIONERS.register(name, f), f)[1]
    PRECONDITIONERS.register(name, fn)
    return fn


def register_ksp(name: str, fn: Callable = None):
    """Equivalent of KSPRegister (/root/reference/src/testbed2.c:71)."""
    if fn is None:
        return lambda f: (SOLVERS.register(name, f), f)[1]
    SOLVERS.register(name, fn)
    return fn
