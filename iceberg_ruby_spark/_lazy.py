"""Import-on-first-use helpers (optimization guide §1.2: fixed costs).

Every forked Python process that unpickles an engine class — streaming
source runners, streaming sink committers, executor UDF workers — pays
the import of the defining module's whole package chain before its first
task.  Measured on this host with the pyspark daemon's modules preloaded:
the eager package ``__init__`` chain cost ~0.16 s per fork and
``operators/__init__`` another ~0.34 s (pandas).  Deferring those imports
to first *use* removes the cost from forks that never touch them; the
driver pays the same total import cost, just spread to first use.

``lazy_attrs`` builds a PEP 562 ``__getattr__``/``__dir__`` pair for a
package ``__init__`` from a {attr: defining-module} map.  ``LazyModule``
is a pickling-safe import-on-first-attribute proxy for heavyweight
third-party modules (pandas) referenced from operator modules: it holds
only strings, so cloudpickle ships it by value harmlessly, and on first
attribute access it imports the real module and (when the owner module is
importable) rebinds the owner's global alias so later lookups are direct.
"""

from __future__ import annotations

import importlib
import sys


def lazy_attrs(package: str, attr_map: dict[str, str]):
    """Return (``__getattr__``, ``__dir__``) for ``package``'s __init__.

    ``attr_map`` maps exported attribute name → fully qualified module
    that defines it.  Unknown names fall back to submodule import, so
    ``package.submodule`` attribute access keeps working without an
    explicit entry."""

    def __getattr__(name: str):
        mod_name = attr_map.get(name)
        pkg = sys.modules[package]
        if mod_name is not None:
            value = getattr(importlib.import_module(mod_name), name)
            setattr(pkg, name, value)  # cache: next access skips the hook
            return value
        try:
            return importlib.import_module(f"{package}.{name}")
        except ModuleNotFoundError:
            raise AttributeError(
                f"module {package!r} has no attribute {name!r}"
            ) from None

    def __dir__():
        base = sys.modules[package]
        return sorted(set(vars(base)) | set(attr_map))

    return __getattr__, __dir__


class LazyModule:
    """Proxy that imports ``name`` on first attribute access.

    Holds only strings (safe under cloudpickle capture into UDF globals);
    after the first access it rebinds ``alias`` on the importable
    ``owner`` module so subsequent global lookups hit the real module.
    Attribute access before that (including ``typing.get_type_hints``
    evaluating a ``pd.Series`` annotation at ``pandas_udf`` decoration
    time) transparently forwards to the real module."""

    def __init__(self, name: str, owner: str | None = None, alias: str | None = None):
        self._lm_name = name
        self._lm_owner = owner
        self._lm_alias = alias

    def __getattr__(self, attr: str):
        if attr.startswith("_"):
            # keep pickling honest: intercepting __getstate__/__reduce__
            # (or a missing _lm_* during unpickle) must fall through to
            # the default protocol, not forward into the target module
            raise AttributeError(attr)
        mod = importlib.import_module(self._lm_name)
        if self._lm_owner and self._lm_alias:
            owner = sys.modules.get(self._lm_owner)
            if owner is not None:
                setattr(owner, self._lm_alias, mod)
        return getattr(mod, attr)
