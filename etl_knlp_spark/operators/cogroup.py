"""Cogrouped-map pandas operator (SURVEY.md §2.11's UDF family —
the two-input member: ``groupBy(...).cogroup(...).applyInPandas``).

The reference's per-row Python joins (pandas loops over two frames,
dag-knlp.py:85-188) map onto Spark's cogroup: both sides shuffle once
on the key, and the kernel receives the two per-key pandas frames in
one Arrow exchange. Use it when the per-key combination logic has no
relational form (custom alignment, model scoring over pairs);
this demo intentionally picks a combination that DOES have one —
per-user event totals enriched with the customer's account balance —
so the whole path is hash-verified against the equivalent SQL.

100 TB notes: one shuffle per side, same as the equivalent join; the
kernel sees one key's data at a time so executor memory bounds the
largest key group, not the table. Skewed keys need the same salting
story as any groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, acctbal double"
)


def _enrich_user_totals(events: pd.DataFrame, cust: pd.DataFrame) -> pd.DataFrame:
    """Per-key kernel: aggregate the user's events, attach the (unique)
    customer attribute; keys with no events yield nothing (left-join
    semantics from the events side)."""
    if len(events) == 0:
        return pd.DataFrame(
            {"user_id": [], "n_events": [], "total_value": [], "acctbal": []}
        )
    uid = int(events["user_id"].iloc[0])
    bal = float(cust["c_acctbal"].iloc[0]) if len(cust) else None
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_events": [len(events)],
            "total_value": [float(events["value"].sum())],
            "acctbal": [bal],
        }
    )


def cogroup_enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Cogroup events (by user_id) with customers (by c_custkey) and
    run the pandas kernel per key."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .cogroup(customers.select("c_custkey", "c_acctbal").groupBy("c_custkey"))
        .applyInPandas(_enrich_user_totals, schema=_OUT_SCHEMA)
    )


@query(
    "cogrouped_map_enrich",
    oracle="""
    SELECT e.user_id,
           COUNT(*)             AS n_events,
           ROUND(SUM(e.value), 2) AS total_value,
           MAX(c.c_acctbal)     AS acctbal
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id
    """,
)
def cogrouped_map_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas kernel vs its SQL twin: per-user event count +
    value total enriched with the customer's account balance. The
    engine result is rounded once on the way out (shuffled float sum —
    see registry conventions); counts and the unique balance are
    exact."""
    out = cogroup_enrich(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        "acctbal",
    )
