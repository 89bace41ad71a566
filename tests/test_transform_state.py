"""transformWithStateInPandas: processor-logic unit tests always run;
the end-to-end streaming run is gated on the protobuf runtime Spark's
TWS state protocol needs (absent in this container — see module
docstring of streaming/transform_state.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from datalake_public_spark.streaming.transform_state import (
    HAVE_PROTOBUF,
    RunningUserStats,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self.state


def test_running_stats_accumulates_across_batches():
    proc = RunningUserStats()
    handle = _FakeHandle()
    proc.init(handle)

    b1 = pd.DataFrame({"value": [1.25, 2.50]})
    (out1,) = list(proc.handleInputRows((7,), iter([b1]), None))
    assert out1.to_dict("records") == [
        {"user_id": 7, "n_events": 2, "sum_value_cents": 375}
    ]

    # second micro-batch folds into existing state
    b2 = pd.DataFrame({"value": [0.25]})
    (out2,) = list(proc.handleInputRows((7,), iter([b2]), None))
    assert out2.to_dict("records") == [
        {"user_id": 7, "n_events": 3, "sum_value_cents": 400}
    ]


def test_cents_conversion_is_exact_on_float_repr():
    # 185.22*100 = 18521.999... in binary; round() must recover 18522
    proc = RunningUserStats()
    proc.init(_FakeHandle())
    b = pd.DataFrame({"value": [185.22, 106.03, 9.64]})
    (out,) = list(proc.handleInputRows((1,), iter([b]), None))
    assert out.sum_value_cents[0] == 18522 + 10603 + 964


@pytest.mark.skipif(not HAVE_PROTOBUF, reason="TWS needs google.protobuf in workers")
def test_transform_with_state_matches_oracle(spark):
    from datalake_public_spark.driver_queries_streaming import (
        STREAM_TWS_SQL,
        streaming_transform_state,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(SF_SMOKE)
    compare(streaming_transform_state(spark, SF_SMOKE), con, STREAM_TWS_SQL, "tws")
