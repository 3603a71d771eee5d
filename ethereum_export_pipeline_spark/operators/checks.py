"""Data-quality audit operators: declarative rule checks over a
table, the dbt-test / expectations staple a production pipeline runs
before promoting an export or a training corpus.

Three rule families, each returning (rule, n_violations) rows that
union into one audit report:

  * `check_rules` — per-row boolean predicates, ALL evaluated in ONE
    scan as conditional sums (a NULL predicate result counts as a
    violation: unknown is not a pass);
  * `check_unique` — key uniqueness via count(*) − count(DISTINCT …)
    over non-null keys, plus the NULL keys themselves;
  * `check_ref` — referential integrity as an anti-join count
    (orphaned foreign keys), broadcast when the parent key set fits.

Scale notes: `check_rules` is the important one — N rules cost one
pass (map-side conditional aggregation), not N scans; the melt to
long form happens on the single 1-row aggregate via `stack`, which is
driver-free. Uniqueness and referential checks each add one
aggregation/join at the key's natural shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_rules(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate per-row boolean SQL predicates; one scan for all
    rules. Returns (rule, n_violations) — a row violates when the
    predicate is false OR NULL."""
    aggs = [
        F.expr(f"CAST(sum(CASE WHEN ({pred}) THEN 0 ELSE 1 END) AS BIGINT)")
         .alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', `{name}`" for name in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, n_violations)")


def check_unique(df: DataFrame, key: str,
                 rule_name: str | None = None) -> DataFrame:
    """Key-uniqueness check: violations = duplicate non-null keys
    (count − distinct count) + NULL keys (a NULL key can never be a
    valid unique identifier)."""
    name = rule_name or f"unique_{key}"
    return df.agg(
        F.lit(name).alias("rule"),
        F.expr(f"CAST(count({key}) - count(DISTINCT {key}) "
               f"+ sum(CASE WHEN {key} IS NULL THEN 1 ELSE 0 END) "
               f"AS BIGINT)").alias("n_violations"))


def check_ref(child: DataFrame, parent: DataFrame,
              child_key: str, parent_key: str,
              rule_name: str | None = None) -> DataFrame:
    """Referential-integrity check: child rows whose non-null key has
    no parent (orphans), counted via an anti join — broadcast when the
    parent key set fits, a shuffle semi-complement otherwise (the
    planner's call, same as the export DAG's keyed fetches)."""
    name = rule_name or f"ref_{child_key}"
    orphans = (child.where(F.col(child_key).isNotNull())
                    .join(parent.select(F.col(parent_key).alias(child_key))
                                .distinct(),
                          child_key, "left_anti"))
    return orphans.agg(
        F.lit(name).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_violations"))


def audit(parts: list[DataFrame]) -> DataFrame:
    """Union rule-report frames into one (rule, n_violations) audit."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
