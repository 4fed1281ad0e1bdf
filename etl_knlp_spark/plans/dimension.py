"""Flagship plan: the reference's dimension-table build (its only real query).

Reference semantics (``/root/reference/dag-knlp.py:65-80``): INSERT INTO a
dimension table the result of ``SELECT DISTINCT`` over a star-shaped pair
of LEFT JOINs off the fact table, with a positional rename of one joined
column. Re-expressed on the driver's testdata star schema
(SURVEY.md §7): ``lineitem ⟕ orders ⟕ customer → SELECT DISTINCT 4 cols``.

100 TB notes: the lineitem⟕orders join shuffles both sides on
``orderkey`` (sort-merge under AQE; bucketing both tables on orderkey
removes the shuffle entirely). ``customer`` stays broadcast-able far
longer; DISTINCT runs as partial hash-aggregate before its shuffle, so
duplicate elimination is map-side first. No driver-side collection
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import query

_ORACLE = """
SELECT DISTINCT
  l.l_orderkey,
  l.l_returnflag,
  o.o_orderstatus AS status,
  c.c_mktsegment  AS segment
FROM lineitem l
LEFT JOIN orders   o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey  = c.c_custkey
"""


@query("q1_dimension_build", oracle=_ORACLE)
def dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-shaped double LEFT JOIN + projection/rename + DISTINCT.

    Mirrors dag-knlp.py:72-79 (korean ⟕ korean_japanese ⟕ korean_hanjya →
    SELECT DISTINCT word_id, korean, text→japanese, hanjya). The rename
    happens via ``alias`` instead of the reference's INSERT column-list
    position. The surrogate ``data_id`` identity column is engine-side
    (see ``with_identity``) and excluded from results — the reference
    never reads it either (SURVEY.md §1.3).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # Partial-distinct pushed BELOW the joins (Catalyst does not move
    # aggregates through joins on its own): the fact side collapses to
    # distinct (orderkey, flag) pairs — a narrower 2-column shuffle —
    # before anything joins, so the joins and the final DISTINCT touch
    # ~4× fewer rows (lineitem's lines-per-order duplication).
    # Correct because the joins are 1:1 per orderkey (orders/customer
    # keys are unique), so duplicate fact rows add nothing the final
    # DISTINCT wouldn't drop anyway. Measured 1.24 → 1.11 s at sf0.1
    # (interleaved min-of-5, identical output); the gap widens with
    # duplication factor at scale.
    li2 = li.select("l_orderkey", "l_returnflag").distinct()
    # FINAL DISTINCT ELIDED (r15 optimization, guide §2.4 "a distinct
    # on data that is already unique" / §8 "use what you know that the
    # optimizer does not"): after the pre-join distinct the
    # (l_orderkey, l_returnflag) pairs are unique, and both left joins
    # are 1:1 per row (o_orderkey / c_custkey are primary keys — the
    # same invariant the pre-join pushdown above already relies on),
    # so the joined rows are already distinct on all four columns and
    # the trailing DISTINCT removed nothing. What it cost: two extra
    # HashAggregate passes over the full result (Catalyst had already
    # elided the second EXCHANGE via subset-clustering reuse — the
    # child is partitioned on (l_orderkey, l_returnflag), a subset of
    # the distinct keys — but the partial+final aggregates still
    # hashed every output row twice; and any plan change that breaks
    # the clustering reuse would silently reintroduce a result-sized
    # exchange at 100 TB). The ORACLE keeps SELECT DISTINCT, so the
    # driver's row-count + hash comparison fails loudly if the
    # uniqueness invariant is ever violated; test_dimension pins the
    # no-duplicate invariant engine-side too.
    # Measured at sf0.1 (interleaved min-of-5): 1.50 → 1.19 s with the
    # row multiset verified identical; plan 17 → 15 nodes (the two
    # trailing HashAggregates gone — plans/r15/q1_dimension_build_*).
    return (
        li2.join(orders, li2.l_orderkey == orders.o_orderkey, "left")
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .select(
            li2.l_orderkey,
            li2.l_returnflag,
            orders.o_orderstatus.alias("status"),
            cust.c_mktsegment.alias("segment"),
        )
    )


def with_identity(df: DataFrame, col_name: str = "data_id") -> DataFrame:
    """Surrogate-key policy for the reference's ``INT IDENTITY(1,1)``.

    ``monotonically_increasing_id`` is unique and partition-parallel but
    non-contiguous; exact 1..N semantics would force a global window.
    Nothing in the reference ever reads ``data_id`` values
    (dag-knlp.py:66-79 never selects it), so uniqueness is the contract.
    Excluded from all correctness hashing (non-deterministic).
    """
    from pyspark.sql import functions as F

    return df.withColumn(col_name, F.monotonically_increasing_id())
