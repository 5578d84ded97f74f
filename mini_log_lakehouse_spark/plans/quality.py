"""Data-quality gates (SURVEY.md §2.11): the reference's three assertion
layers re-expressed as one-pass Spark checks.

- Q1 non-empty parse (reference etl/ingest_logs.py:55)
- Q2 status domain [100, 599] (reference etl/ingest_logs.py:57,
  dbt test_status_range.sql:1-4)
- Q3 not_null ×9 columns (reference dbt generic.yml:3-26)

dbt-test semantics: a check *fails* iff violating rows exist. Instead of
one scan per check (the dbt execution model — N full table scans), all
checks over a table are folded into a single aggregate pass with
conditional sums, so the whole suite costs one scan per table at any
scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    table: str
    check: str
    violations: int
    passed: bool


#: not_null columns per reference dbt_project/models/tests/generic.yml.
NOT_NULL = {
    "stg_logs": ("ts", "status", "bytes_sent", "endpoint"),
    "fct_requests_hourly": ("date", "hour", "endpoint", "requests", "errors"),
}


def _run_counts(df: DataFrame, exprs: dict[str, F.Column]) -> dict[str, int]:
    """Evaluate all violation counters in ONE aggregate job."""
    row = df.agg(
        F.count(F.lit(1)).alias("__total__"),
        *[v.alias(k) for k, v in exprs.items()],
    ).collect()[0]
    return row.asDict()


def check_table(df: DataFrame, table: str, not_null: tuple[str, ...] = (),
                status_range: bool = False) -> list[CheckResult]:
    exprs: dict[str, F.Column] = {}
    for c in not_null:
        exprs[f"not_null_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    if status_range:
        bad = ~F.col("status").between(100, 599)
        exprs["status_in_100_599"] = F.sum(bad.cast("long"))
    counts = _run_counts(df, exprs)
    results = [
        CheckResult(table, "non_empty", 0, counts["__total__"] > 0)
    ]
    for name in exprs:
        n = int(counts[name] or 0)
        results.append(CheckResult(table, name, n, n == 0))
    return results


def run_quality_checks(tables: dict[str, DataFrame]) -> list[CheckResult]:
    """Run the full reference check suite over built models.

    ``tables`` maps model name -> DataFrame (as built by the pipeline).
    """
    out: list[CheckResult] = []
    for name, df in tables.items():
        out.extend(
            check_table(
                df,
                name,
                not_null=NOT_NULL.get(name, ()),
                status_range=("status" in df.columns),
            )
        )
    return out


def assert_all_passed(results: list[CheckResult]) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        detail = "; ".join(f"{r.table}.{r.check}: {r.violations} rows" for r in failed)
        raise AssertionError(f"quality checks failed: {detail}")
