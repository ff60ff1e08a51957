"""Row-oriented query result, mirroring the reference's ``Iceberg::Result``.

Reference: ``lib/iceberg/result.rb:2-21`` — ``columns`` (names), ``rows``
(arrays), Enumerable of ``{col => val}`` hashes.  Here a thin wrapper over a
Spark DataFrame: ``columns``/``rows`` materialize via ``collect()``; the
underlying DataFrame stays available as ``.df`` for further (distributed)
composition, and ``to_arrow()`` gives the columnar interchange path
(reference Arrow C-stream export, ``ext/iceberg/src/scan.rs:65-79``).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame


def _pyval(v: Any) -> Any:
    """Row values → plain Python: v3 variant cells come back as
    ``VariantVal`` — surface them as dict/list/scalars, the row-hash
    shape the reference's ``Result`` yields for every other type.
    Recursive: a variant nested inside a struct/array/map column (the
    nested spelling the v3 gates explicitly allow) converts too."""
    try:
        from pyspark.sql.types import Row, VariantVal
    except ImportError:  # pragma: no cover - older Spark
        return v
    if isinstance(v, VariantVal):
        return v.toPython()
    if isinstance(v, dict):
        return {k: _pyval(x) for k, x in v.items()}
    if isinstance(v, Row):
        return {k: _pyval(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_pyval(x) for x in v]
    return v


class Result:
    def __init__(self, df: DataFrame):
        self.df = df
        self._collected: list | None = None

    @property
    def columns(self) -> list[str]:
        return list(self.df.columns)

    def _collect(self) -> list:
        if self._collected is None:
            self._collected = self.df.collect()
        return self._collected

    @property
    def rows(self) -> list[list[Any]]:
        return [[_pyval(v) for v in r] for r in self._collect()]

    def __iter__(self) -> Iterator[dict[str, Any]]:
        for r in self._collect():
            d = r.asDict(recursive=True)
            yield {k: _pyval(v) for k, v in d.items()}

    def to_a(self) -> list[dict[str, Any]]:
        return list(self)

    def to_arrow(self):
        """Columnar interchange (reference ``scan.to_arrow``)."""
        return self.df.toArrow()

    def to_pandas(self):
        return self.df.toPandas()

    @property
    def empty(self) -> bool:
        """Reference ``Result#empty?``."""
        return len(self._collect()) == 0

    def __len__(self) -> int:
        return len(self._collect())

    def __repr__(self) -> str:
        return f"Result(columns={self.columns!r})"
