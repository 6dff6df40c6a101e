"""Declarative data-quality validation (SURVEY §2.11).

Great-Expectations-style expectations compiled to ONE Spark aggregation pass
(the reference's GE DAG issued one SQL probe per expectation —
``/root/reference/airflow/dags/data_validation_dag.py:175-364``; at 100 TB
you want a single scan, not E scans).

Supported expectations (superset of the reference's suite):
* ``not_null(col, mostly=1.0)``
* ``between(col, min=, max=, mostly=1.0, ignore_nulls=True)``
* ``unique(col)``
* ``in_set(col, values)``
* ``row_count(min=, max=)``

``validate(df, rules)`` → :class:`Report`; ``raise_on_failure`` mirrors the
reference's fail-the-DAG behavior (data_validation_dag.py:352-361).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str | None = None
    params: dict[str, Any] = field(default_factory=dict)


def not_null(column: str, mostly: float = 1.0) -> Rule:
    return Rule("not_null", column, {"mostly": mostly})


def between(
    column: str,
    min_value: float | None = None,
    max_value: float | None = None,
    mostly: float = 1.0,
    ignore_nulls: bool = True,
) -> Rule:
    return Rule(
        "between",
        column,
        {"min": min_value, "max": max_value, "mostly": mostly, "ignore_nulls": ignore_nulls},
    )


def unique(column: str) -> Rule:
    return Rule("unique", column)


def in_set(column: str, values: list) -> Rule:
    return Rule("in_set", column, {"values": values})


def row_count(min_value: int = 1, max_value: int | None = None) -> Rule:
    return Rule("row_count", None, {"min": min_value, "max": max_value})


@dataclass
class RuleResult:
    rule: Rule
    passed: bool
    observed: dict[str, Any]


@dataclass
class Report:
    results: list[RuleResult]

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    def failures(self) -> list[RuleResult]:
        return [r for r in self.results if not r.passed]


class ValidationError(RuntimeError):
    pass


def ensure_table(
    spark,
    name: str,
    schema: str,
    seed_rows: list | None = None,
) -> bool:
    """Table-existence gate with bootstrap (SURVEY §2.11 last row).

    The reference's validation DAG retried existence checks and created a
    seeded fallback table when missing
    (``/root/reference/airflow/dags/data_validation_dag.py:32-173``). Catalog
    equivalent: check, create-if-missing, optionally seed. Returns True if
    the table already existed.
    """
    if spark.catalog.tableExists(name):
        return True
    if seed_rows:
        spark.createDataFrame(seed_rows, schema).write.saveAsTable(name)
    else:
        empty = spark.createDataFrame([], schema)
        empty.write.saveAsTable(name)
    return False


def validate(df: DataFrame, rules: list[Rule], raise_on_failure: bool = False) -> Report:
    """Evaluate all rules in one aggregation pass over ``df``."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        c = F.col(r.column) if r.column else None
        if r.kind == "not_null":
            aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"_r{i}"))
        elif r.kind == "between":
            lo, hi = r.params["min"], r.params["max"]
            cond = F.lit(False)
            if lo is not None:
                cond = cond | (c < lo)
            if hi is not None:
                cond = cond | (c > hi)
            if r.params["ignore_nulls"]:
                cond = c.isNotNull() & cond
            else:
                cond = cond | c.isNull()
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_r{i}"))
            aggs.append(F.sum(F.when(c.isNotNull(), 1).otherwise(0)).alias(f"_r{i}_base"))
        elif r.kind == "unique":
            aggs.append((F.count(c) - F.countDistinct(c)).alias(f"_r{i}"))
        elif r.kind == "in_set":
            cond = c.isNotNull() & ~c.isin(*r.params["values"])
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_r{i}"))
        elif r.kind == "row_count":
            pass  # uses _n
        else:
            raise ValueError(f"unknown rule kind: {r.kind}")
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["_n"]

    results: list[RuleResult] = []
    for i, r in enumerate(rules):
        if r.kind == "row_count":
            lo, hi = r.params["min"], r.params["max"]
            ok = n >= lo and (hi is None or n <= hi)
            results.append(RuleResult(r, ok, {"row_count": n}))
            continue
        bad = row.get(f"_r{i}", 0) or 0
        if r.kind == "between":
            base = row.get(f"_r{i}_base", n) if r.params["ignore_nulls"] else n
        else:
            base = n
        mostly = r.params.get("mostly", 1.0)
        ratio_ok = 1.0 - (bad / base) if base else 1.0
        ok = ratio_ok >= mostly
        results.append(
            RuleResult(r, ok, {"unexpected": int(bad), "base": int(base), "ratio_ok": ratio_ok})
        )
    report = Report(results)
    if raise_on_failure and not report.passed:
        details = "; ".join(
            f"{res.rule.kind}({res.rule.column}): {res.observed}" for res in report.failures()
        )
        raise ValidationError(f"validation failed: {details}")
    return report
