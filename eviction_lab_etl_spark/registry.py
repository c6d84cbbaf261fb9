"""Query registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers itself here via the ``@query``
decorator: a callable ``(spark, sf_dir) -> DataFrame`` plus (for hash-checked
operators) the equivalent DuckDB-dialect ANSI SQL oracle. The driver runs both
sides at sf=0.01 and compares row-count + schema + order-insensitive value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}
CHECKS: dict[str, str] = {}


def query(name: str, oracle: str | None = None, check: str = "hash"):
    """Register a SURVEY §2 operator.

    ``oracle`` is DuckDB SQL over the pre-registered table views; omit it for
    genuinely non-SQL-expressible operators (the driver then records a weaker
    rows-only check — SURVEY §2 marks those check=rows by design).
    """

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = "\n".join(line.rstrip() for line in oracle.strip().splitlines())
            CHECKS[name] = check
        else:
            CHECKS[name] = "rows"
        fn.__query_name__ = name  # type: ignore[attr-defined]
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so decorators populate the registry."""
    # Imported lazily to avoid import cycles (modules import `query` from here).
    from eviction_lab_etl_spark import operators  # noqa: F401
    from eviction_lab_etl_spark import streaming  # noqa: F401
