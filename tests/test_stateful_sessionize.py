"""Cross-check the stateful streaming sessionizer against the batch
session-window operator: closed streaming sessions must be exactly the
batch sessions minus each user's final (still-open-in-state) session."""

from __future__ import annotations

from decimal import Decimal

from docling_api_spark.plans import all_queries

QUERIES = all_queries()


def test_streaming_sessions_match_batch_minus_open(spark, sf_dir):
    batch = QUERIES["q32_session_window"].fn(spark, sf_dir).collect()
    stream = QUERIES["q37_streaming_sessionize"].fn(spark, sf_dir).collect()

    def key(r):
        return (r["user_id"], r["session_start_us"])

    # drop each user's last (open) session from the batch result
    last_by_user: dict[int, int] = {}
    for r in batch:
        last_by_user[r["user_id"]] = max(
            last_by_user.get(r["user_id"], 0), r["session_start_us"]
        )
    expected = {
        key(r): (r["n_events"], Decimal(str(r["total_value"])))
        for r in batch
        if r["session_start_us"] != last_by_user[r["user_id"]]
    }
    got = {
        key(r): (r["n_events"], Decimal(str(round(r["total_value"], 6))))
        for r in stream
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], k  # event counts exact
        assert abs(got[k][1] - expected[k][1]) <= Decimal("0.000001"), k
