"""Named-query registry.

Each registered query is a (PySpark builder, optional DuckDB oracle SQL)
pair. The builder takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is ANSI SQL over the same parquet tables. The driver's correctness
harness runs both at sf0.01 and compares row count + schema +
order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY on both sides;
- floating-point aggregates are rounded on both sides (partial-agg order
  makes raw double sums non-deterministic at ~1e-12 relative — rounding
  makes the hash stable);
- integer sums are cast to BIGINT in the oracle (DuckDB widens to HUGEINT,
  Spark to LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[Builder], Builder]:
    """Decorator: add a named query (and its oracle SQL) to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip(), tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect populates the registry.
    import data_pipeline_with_spark_kafka_spark.queries  # noqa: F401

    return dict(_REGISTRY)
