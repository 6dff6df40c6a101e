"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL that DuckDB runs as the correctness oracle (driver contract in
``/root/repo/__spark_entry__.py``). Specs with ``oracle=None`` are genuinely
non-SQL-expressible (streaming/stateful) and get the driver's rows-only check.

Column-name discipline: the driver compares after sorting columns by name, so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered parquet views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def all_specs() -> list[QuerySpec]:
    # Imported lazily so a syntax error in one domain module surfaces clearly
    # and module import order cannot create cycles.
    from projet_data_infrastructure_spark.plans import (
        advanced,
        events_queries,
        extras,
        llm_queries,
        relational,
    )

    specs: list[QuerySpec] = []
    specs.extend(relational.SPECS)
    specs.extend(events_queries.SPECS)
    specs.extend(llm_queries.SPECS)
    specs.extend(advanced.SPECS)
    specs.extend(extras.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


def queries_map() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql_map() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
