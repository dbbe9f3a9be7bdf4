"""As-of join semantics: inclusive at equal timestamps, NULL when no
prior right row, latest-wins among candidates."""

from __future__ import annotations

import datetime as dt

from tweetaggregates_spark.operators.asof import asof_join


def test_asof_edge_cases(spark):
    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 1, T(10)),  # match r@5
            (2, 1, T(20)),  # match r@20 (inclusive equality)
            (3, 1, T(4)),   # no prior right -> NULL
            (4, 2, T(30)),  # key with no right rows at all -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, T(5), 100),
            (1, T(20), 200),
            (1, T(25), 300),  # later than every left row except none
        ],
        "user_id long, click_ts timestamp, click_event_id long",
    )
    out = {
        r.event_id: (r.matched_click_ts, r.matched_click_event_id)
        for r in asof_join(
            left, right, "user_id", "ts", "click_ts", ["click_event_id"]
        ).collect()
    }
    assert out[1] == (T(5), 100)
    assert out[2] == (T(20), 200)  # inclusive >=
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert len(out) == 4  # left join: every left row present exactly once
