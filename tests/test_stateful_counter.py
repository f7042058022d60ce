"""transformWithStateInPandas coverage — import-gated.

The Spark-4 stateful-processor API's Python runner requires
google.protobuf, which this container does not ship (`pip install` is
unavailable). Where protobuf exists the operator runs end-to-end against
the batch twin; here the gate documents the constraint the same way the
docling and Pillow paths are gated.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

try:  # find_spec("google.protobuf") itself raises if the namespace pkg is absent
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False


def test_processor_state_math():
    """The StatefulProcessor's per-batch fold is plain integer math —
    pin it without a streaming query (no protobuf needed)."""
    import pandas as pd

    from docling_api_spark.streaming.stateful import _make_counter_processor

    proc = _make_counter_processor()

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeValueState()

    proc.init(FakeHandle())
    out1 = list(
        proc.handleInputRows((7,), iter([pd.DataFrame({"cents": [100, 250]})]), None)
    )
    out2 = list(
        proc.handleInputRows((7,), iter([pd.DataFrame({"cents": [50]})]), None)
    )
    assert out1[0].iloc[0].to_dict() == {"user_id": 7, "n_events": 2, "total_cents": 350}
    assert out2[0].iloc[0].to_dict() == {"user_id": 7, "n_events": 3, "total_cents": 400}


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="google.protobuf absent: TWS Python runner cannot start")
def test_stateful_counter_matches_batch(spark, sf_dir):
    from docling_api_spark.operators.timeseries import stateful_counter
    from docling_api_spark.tables import load_table

    got = {
        (r.user_id, r.n_events, r.total_cents)
        for r in stateful_counter(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.n_events, r.total_cents)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        )
        .collect()
    }
    assert got == want
