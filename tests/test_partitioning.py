"""split_to_batches / partition-plan parity tests (SURVEY §5:
inclusive bounds, ragged last batch, gap-free coverage, %08d naming)."""

import pytest
from hypothesis import given, settings, strategies as st

from ethereum_export_pipeline_spark.partitioning import (
    default_export_plan, pad8, partition_path, range_cols, split_to_batches,
)


def test_split_to_batches_inclusive_ragged():
    assert list(split_to_batches(0, 9, 4)) == [(0, 3), (4, 7), (8, 9)]
    assert list(split_to_batches(5, 5, 10)) == [(5, 5)]
    assert list(split_to_batches(0, 999_999, 1_000_000)) == [(0, 999_999)]


def test_default_plan_matches_reference_layout():
    plan = default_export_plan()
    # 1 + 30 + 100 = 131 partitions covering blocks 0..4,999,999
    assert len(plan) == 131
    assert plan[0] == (0, 999_999)
    assert plan[1] == (1_000_000, 1_099_999)
    assert plan[30] == (3_900_000, 3_999_999)
    assert plan[31] == (4_000_000, 4_009_999)
    assert plan[-1] == (4_990_000, 4_999_999)
    # gap-free, overlap-free
    for (s1, e1), (s2, e2) in zip(plan, plan[1:]):
        assert s2 == e1 + 1


@settings(max_examples=50, deadline=None)
@given(end=st.integers(0, 10_000), width=st.integers(1, 500))
def test_batches_cover_range_exactly(end, width):
    plan = list(split_to_batches(0, end, width))
    assert plan[0][0] == 0 and plan[-1][1] == end
    for (s1, e1), (s2, e2) in zip(plan, plan[1:]):
        assert s2 == e1 + 1 and e1 >= s1


def test_pad8_and_path():
    assert pad8(7) == "00000007"
    assert partition_path("blocks", 4_000_000, 4_009_999, "/out") == \
        "/out/blocks/start_block=04000000/end_block=04009999"


def test_range_cols_assigns_plan_ranges(spark):
    plan = default_export_plan()
    df = spark.range(0, 5_000_000, 499_999).toDF("number")
    s, e = range_cols("number", plan)
    rows = {r["number"]: (r["start_block"], r["end_block"])
            for r in df.select("number", s, e).collect()}
    lookup = {}
    for lo, hi in plan:
        lookup.update({n: (pad8(lo), pad8(hi)) for n in rows if lo <= n <= hi})
    assert rows == lookup
