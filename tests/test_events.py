"""Windowed / sessionized event operators (stages/events.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from splink_ray.stages import events


def _events_table():
    base = np.datetime64("2025-03-01T10:00:00", "us")
    m = np.timedelta64(1, "m")
    rows = [
        # user 1: two sessions (gap of 45 min between idx 2 and 3)
        (0, 1, base + 0 * m, "view"),
        (1, 1, base + 5 * m, "click"),
        (2, 1, base + 10 * m, "view"),
        (3, 1, base + 55 * m, "view"),
        (4, 1, base + 57 * m, "click"),
        # user 2: one session, no clicks
        (5, 2, base + 1 * m, "view"),
        (6, 2, base + 2 * m, "view"),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[0]) for r in rows], pa.float64()),
        }
    )


def test_sessionize_gap_breaks(ray_session):
    import ray.data as rd

    out = (
        events.sessionize(rd.from_arrow(_events_table()), "user_id", "ts", "event_id", 30)
        .to_pandas()
        .set_index("event_id")
    )
    assert list(out.loc[[0, 1, 2, 3, 4], "session_seq"]) == [1, 1, 1, 2, 2]
    assert list(out.loc[[5, 6], "session_seq"]) == [1, 1]
    assert out.loc[3, "session_id"] == "1:2"


def test_tumbling_window_agg(ray_session):
    import ray.data as rd

    out = events.tumbling_window_agg(
        rd.from_arrow(_events_table()), "ts", window_minutes=10,
        by="event_type", value_col="value",
    ).to_pandas()
    w0 = pd.Timestamp("2025-03-01T10:00:00")
    row = out[(out.window_start == w0) & (out.event_type == "view")].iloc[0]
    # events 0 (10:00 view) and 5,6 (user 2 views at 10:01/10:02) in window 0
    assert row.n == 3 and row.sum_value == 0 + 5 + 6


def test_last_event_before_as_of(ray_session):
    import ray.data as rd

    out = (
        events.last_event_before(
            rd.from_arrow(_events_table()), "user_id", "ts", "event_id",
            "event_type", "click",
        )
        .to_pandas()
        .set_index("event_id")
    )
    base = pd.Timestamp("2025-03-01T10:00:00")
    # event 0: no prior click; 1: click itself → prior none; 2..4 see 10:05
    assert pd.isna(out.loc[0, "last_ref_ts"])
    assert pd.isna(out.loc[1, "last_ref_ts"])
    assert out.loc[2, "last_ref_ts"] == base + pd.Timedelta(minutes=5)
    assert out.loc[3, "last_ref_ts"] == base + pd.Timedelta(minutes=5)
    assert out.loc[4, "last_ref_ts"] == base + pd.Timedelta(minutes=5)
    # user 2 never clicked — a click from user 1 must NOT leak across users
    assert pd.isna(out.loc[5, "last_ref_ts"]) and pd.isna(out.loc[6, "last_ref_ts"])


def test_funnel_conversions_ties_and_window(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.events import funnel_conversions

    def ts(minute, us=0):
        return pa.scalar(
            (minute * 60 * 1_000_000 + us), pa.timestamp("us")
        ).cast(pa.timestamp("us"))

    rows = [
        # user 1: click@0 -> purchase@10 (in 30m window): converted
        (1, 0, 1, "click"), (2, 10, 1, "purchase"),
        # user 1: click@100 -> purchase@140 (40m > 30m): not converted
        (3, 100, 1, "click"), (4, 140, 1, "purchase"),
        # user 2: purchase at the SAME microsecond as the click: >= counts
        (5, 7, 2, "click"), (6, 7, 2, "purchase"),
        # user 3: purchase strictly before click only: not converted
        (7, 50, 3, "purchase"), (8, 51, 3, "click"),
        # user 4: purchases only -> no output row
        (9, 5, 4, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "ts": pa.array(
                [r[1] * 60 * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
        }
    )
    out = (
        funnel_conversions(
            rd.from_arrow(t), "user_id", "ts", "event_id", "event_type",
            "click", "purchase", within_minutes=30.0,
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert list(out.user_id) == [1, 2, 3]
    assert list(out.n_from) == [2, 1, 1]
    assert list(out.n_converted) == [1, 1, 0]


def test_funnel_conversions_matches_duckdb_random(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.events import funnel_conversions

    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table(
        {
            "event_id": np.arange(n),
            "ts": pa.array(
                rng.integers(0, 3 * 24 * 3600 * 1_000_000, n), pa.timestamp("us")
            ),
            "user_id": rng.integers(0, 200, n),
            "event_type": rng.choice(["click", "purchase", "view"], n),
        }
    )
    out = (
        funnel_conversions(
            rd.from_arrow(t).repartition(5), "user_id", "ts", "event_id",
            "event_type", "click", "purchase", within_minutes=30.0,
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute(
        "WITH f AS (SELECT user_id, ts FROM events WHERE event_type = 'click'), "
        "t AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'), "
        "c AS (SELECT f.user_id, EXISTS(SELECT 1 FROM t WHERE t.user_id = f.user_id "
        "AND t.ts >= f.ts AND t.ts <= f.ts + INTERVAL 30 MINUTE) AS conv FROM f) "
        "SELECT user_id, count(*) AS n_from, "
        "CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted "
        "FROM c GROUP BY user_id ORDER BY user_id"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_event_transitions_hand_computed(ray_session):
    import ray.data as rd

    out = events.event_transitions(
        rd.from_arrow(_events_table()), "user_id", "ts", "event_id", "event_type"
    ).sort_values(["from_type", "to_type"]).reset_index(drop=True)
    # user 1: view->click, click->view, view->view, view->click
    # user 2: view->view
    expect = pd.DataFrame(
        {
            "from_type": ["click", "view", "view"],
            "to_type": ["view", "click", "view"],
            "n": [1, 2, 2],
            "p": [1.0, 0.5, 0.5],
        }
    )
    pd.testing.assert_frame_equal(
        out[["from_type", "to_type", "n", "p"]], expect, check_dtype=False
    )


def test_event_transitions_partitioning_invariant(ray_session):
    """Same result regardless of bucket count (per-user co-location holds)."""
    import ray.data as rd

    ds = rd.from_arrow(_events_table())
    a = events.event_transitions(
        ds, "user_id", "ts", "event_id", "event_type", num_buckets=1
    ).sort_values(["from_type", "to_type"]).reset_index(drop=True)
    b = events.event_transitions(
        ds, "user_id", "ts", "event_id", "event_type", num_buckets=7
    ).sort_values(["from_type", "to_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_rolling_window_stats_hand_computed(ray_session):
    import ray.data as rd

    out = (
        events.rolling_window_stats(
            rd.from_arrow(_events_table()), "user_id", "ts", "event_id", "value", 30.0
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 1 at minutes 0,5,10,55,57; value == event_id as float
    # windows (30 min trailing incl. current):
    #  e0: {0}          e1: {0,1}  e2: {0,1,2}  e3: {3}  e4: {3,4}
    # user 2 at minutes 1,2: e5: {5}, e6: {5,6}
    assert list(out["n_window"]) == [1, 2, 3, 1, 2, 1, 2]
    assert list(out["sum_value"]) == [0.0, 1.0, 3.0, 3.0, 7.0, 5.0, 11.0]


def test_rolling_window_peers_included(ray_session):
    """Equal timestamps are RANGE peers: both rows see both values."""
    import ray.data as rd

    base = np.datetime64("2025-03-01T10:00:00", "us")
    t = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([base, base], pa.timestamp("us")),
            "event_type": pa.array(["a", "a"], pa.string()),
            "value": pa.array([2.0, 3.0], pa.float64()),
        }
    )
    out = (
        events.rolling_window_stats(
            rd.from_arrow(t), "user_id", "ts", "event_id", "value", 30.0
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["n_window"]) == [2, 2]
    assert list(out["sum_value"]) == [5.0, 5.0]


def test_rolling_window_randomized_vs_bruteforce(ray_session):
    """Composite-key searchsorted + reduceat == O(n²) reference on random
    multi-user data with duplicate timestamps."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 400
    base = np.datetime64("2025-06-01T00:00:00", "us")
    users = rng.integers(0, 12, n)
    # coarse minutes so duplicate timestamps happen often
    mins = rng.integers(0, 300, n)
    ts = base + mins.astype("timedelta64[m]").astype("timedelta64[us]")
    vals = np.round(rng.uniform(0, 50, n), 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = (
        events.rolling_window_stats(
            rd.from_arrow(t), "user_id", "ts", "event_id", "value", 30.0,
            num_buckets=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = np.timedelta64(30, "m").astype("timedelta64[us]").astype(np.int64)
    ts_i = ts.astype(np.int64)
    for i in rng.choice(n, 60, replace=False):
        mask = (users == users[i]) & (ts_i >= ts_i[i] - w) & (ts_i <= ts_i[i])
        assert out["n_window"][i] == mask.sum()
        assert abs(out["sum_value"][i] - round(vals[mask].sum(), 6)) < 1e-6


def test_event_transitions_randomized_vs_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 300
    base = np.datetime64("2025-06-01T00:00:00", "us")
    users = rng.integers(0, 8, n)
    ts = base + rng.permutation(n).astype("timedelta64[s]").astype("timedelta64[us]")
    types = rng.choice(["a", "b", "c"], n)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        }
    )
    out = (
        events.event_transitions(
            rd.from_arrow(t), "user_id", "ts", "event_id", "event_type",
            num_buckets=4,
        )
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"u": users, "ts": ts, "ty": types}).sort_values(["u", "ts"])
    df["nxt"] = df.groupby("u")["ty"].shift(-1)
    ref = (
        df.dropna(subset=["nxt"])
        .groupby(["ty", "nxt"])
        .size()
        .reset_index(name="n")
        .rename(columns={"ty": "from_type", "nxt": "to_type"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    ref["p"] = (
        ref["n"] / ref.groupby("from_type")["n"].transform("sum")
    ).round(6)
    pd.testing.assert_frame_equal(
        out[["from_type", "to_type", "n", "p"]], ref, check_dtype=False
    )
