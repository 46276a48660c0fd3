"""Stream-shaped operators over the `events` table.

The reference has no windows/watermarks (SURVEY §2.8 "streaming-only:
none"); these are the training-pipeline additions expressed the Ray
Data way (ray_guide "Streaming-shaped workloads"): the events table is
an ordered, partitioned log; windows are groupby + in-group pandas.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def _events(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# -- tumbling window aggregate ----------------------------------------------


def q_window_tumbling(sf_dir: str):
    """1-hour tumbling windows per event_type: count + sum(value).
    Window assignment is a vectorized floor inside map_batches; the
    shuffle is the (event_type, window) groupby over pre-windowed rows."""

    def win(t: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": ws,
                "value": t["value"],
            }
        )

    ds = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        win, batch_format="pyarrow"
    )
    out = ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )

    def round_cols(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_value"),
            "sum_value",
            pc.round(t["sum_value"], ndigits=4),
        )

    return out.map_batches(round_cols, batch_format="pyarrow")


SQL_WINDOW_TUMBLING = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


# -- sessionization (gap-based windows per key) ------------------------------

SESSION_GAP_MIN = 30


def q_sessionize(sf_dir: str):
    """Per-user session stats with a 30-minute inactivity gap.

    Ordering assumption (documented): events of one user are processed
    sorted by (ts, event_id); ties on ts share a session regardless of
    order."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        n_sessions = int(gaps.sum()) + 1
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(g)],
                "n_sessions": [n_sessions],
            }
        )

    return (
        _events(sf_dir, ["user_id", "event_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )


SQL_SESSIONIZE = f"""
WITH d AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN prev IS NOT NULL
                          AND ts - prev > INTERVAL {SESSION_GAP_MIN} MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id
"""


# -- top-k by aggregate ------------------------------------------------------


def q_top_users(sf_dir: str):
    """Top-10 users by total event value (sort + limit after a grouped
    aggregate — query-side Q7 shape)."""
    ds = _events(sf_dir, ["user_id", "value"])
    out = ds.groupby("user_id").aggregate(Sum("value", alias_name="total_value"))

    def round_cols(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("total_value"),
            "total_value",
            pc.round(t["total_value"], ndigits=4),
        )

    return (
        out.map_batches(round_cols, batch_format="pyarrow")
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(10)
    )


SQL_TOP_USERS = """
SELECT user_id, round(sum(value), 4) AS total_value
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
"""
