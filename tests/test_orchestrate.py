"""O4/O5 — retry policy, cron schedule, layered config injection.

Pins the Airflow semantics the reference relies on (``dags/dag_bike.py:
27-38``: retries=2, retry_delay=5min, schedule '0 */3 * * *',
catchup=False; ``dags/lib/velib_data_fetcher.py:9-16``: Variable.get
with default_var) against the orchestrator-free reimplementation.
No SparkSession anywhere — orchestration is pure logic.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from datalake_public_spark.config import EngineConfig
from datalake_public_spark.plans.orchestrate import (
    CronSchedule,
    RetryPolicy,
    load_engine_config,
    run_due_ticks,
    run_with_retries,
)

# ---------------------------------------------------------------- retries


def test_retries_2_means_3_attempts_then_reraise():
    calls, delays = [], []
    def task():
        calls.append(1)
        raise RuntimeError("flaky")
    with pytest.raises(RuntimeError, match="flaky"):
        run_with_retries(
            task,
            RetryPolicy(retries=2, retry_delay=timedelta(minutes=5)),
            sleep=delays.append,
        )
    assert len(calls) == 3  # Airflow contract: retries COUNT re-tries
    assert delays == [300.0, 300.0]  # no sleep after the final failure


def test_success_after_failures_returns_result():
    state = {"n": 0}
    def task():
        state["n"] += 1
        if state["n"] < 3:
            raise ValueError("not yet")
        return "ok"
    seen = []
    out = run_with_retries(
        task,
        RetryPolicy(retries=2, retry_delay=timedelta(seconds=1)),
        sleep=lambda s: None,
        on_attempt=lambda n, exc: seen.append((n, type(exc).__name__ if exc else None)),
    )
    assert out == "ok"
    assert seen == [(1, "ValueError"), (2, "ValueError"), (3, None)]


def test_exponential_backoff_delays():
    delays = []
    with pytest.raises(RuntimeError):
        run_with_retries(
            lambda: (_ for _ in ()).throw(RuntimeError()),
            RetryPolicy(retries=3, retry_delay=timedelta(seconds=10), backoff=2.0),
            sleep=delays.append,
        )
    assert delays == [10.0, 20.0, 40.0]


def test_non_retryable_exception_propagates_immediately():
    calls = []
    def task():
        calls.append(1)
        raise KeyError("schema mismatch")
    with pytest.raises(KeyError):
        run_with_retries(
            task,
            RetryPolicy(retries=5, retryable=(ConnectionError,)),
            sleep=lambda s: pytest.fail("must not sleep"),
        )
    assert len(calls) == 1


# ------------------------------------------------------------------- cron


def test_reference_schedule_next_ticks():
    s = CronSchedule("0 */3 * * *")  # dag_bike.py:36
    assert s.next_after(datetime(2024, 5, 1, 1, 23)) == datetime(2024, 5, 1, 3, 0)
    assert s.next_after(datetime(2024, 5, 1, 3, 0)) == datetime(2024, 5, 1, 6, 0)
    assert s.next_after(datetime(2024, 5, 1, 23, 59)) == datetime(2024, 5, 2, 0, 0)


def test_field_forms_literal_list_range_step():
    s = CronSchedule("15,45 9-17/4 1 6 *")
    assert s.minute == frozenset({15, 45})
    assert s.hour == frozenset({9, 13, 17})
    assert s.matches(datetime(2024, 6, 1, 13, 45))
    assert not s.matches(datetime(2024, 6, 2, 13, 45))
    assert not s.matches(datetime(2024, 7, 1, 13, 45))


def test_dow_sunday_is_0_and_7():
    for expr in ("30 6 * * 0", "30 6 * * 7"):
        s = CronSchedule(expr)
        assert s.matches(datetime(2024, 5, 5, 6, 30))  # a Sunday
        assert not s.matches(datetime(2024, 5, 6, 6, 30))  # Monday


def test_vixie_or_rule_when_both_day_fields_restricted():
    # "at 00:00 on the 1st OR on Mondays" — vixie-cron semantics
    s = CronSchedule("0 0 1 * 1")
    assert s.matches(datetime(2024, 5, 1, 0, 0))  # the 1st (a Wednesday)
    assert s.matches(datetime(2024, 5, 6, 0, 0))  # a Monday (the 6th)
    assert not s.matches(datetime(2024, 5, 7, 0, 0))


def test_invalid_exprs_raise():
    for expr in ("0 0 *", "61 * * * *", "* * 0 * *", "*/0 * * * *", "3/2 * * * *"):
        with pytest.raises(ValueError):
            CronSchedule(expr)


def test_catchup_false_collapses_backlog_to_latest_tick():
    s = CronSchedule("0 */3 * * *")
    last = datetime(2024, 5, 1, 3, 0)
    now = datetime(2024, 5, 2, 7, 30)  # 9 ticks missed
    assert s.due_runs(last, now, catchup=False) == [datetime(2024, 5, 2, 6, 0)]
    full = s.due_runs(last, now, catchup=True)
    assert len(full) == 9
    assert full[0] == datetime(2024, 5, 1, 6, 0)
    assert full[-1] == datetime(2024, 5, 2, 6, 0)


def test_due_runs_nothing_due():
    s = CronSchedule("0 */3 * * *")
    assert s.due_runs(datetime(2024, 5, 1, 6, 0), datetime(2024, 5, 1, 8, 59)) == []


def test_run_due_ticks_passes_logical_time_and_retries():
    s = CronSchedule("0 */3 * * *")
    failures = {"left": 2}
    ran = []
    def task(tick):
        if failures["left"]:
            failures["left"] -= 1
            raise ConnectionError("endpoint down")
        ran.append(tick)
        return f"done@{tick:%H:%M}"
    out = run_due_ticks(
        s,
        datetime(2024, 5, 1, 0, 0),
        datetime(2024, 5, 1, 9, 1),
        task,
        policy=RetryPolicy(retries=2, retry_delay=timedelta(minutes=5)),
        sleep=lambda s_: None,
    )
    # catchup=False: 03:00 and 06:00 collapse away; only 09:00 runs
    assert out == [(datetime(2024, 5, 1, 9, 0), "done@09:00")]
    assert ran == [datetime(2024, 5, 1, 9, 0)]


# ----------------------------------------------------------------- config


def test_precedence_overrides_env_file_defaults(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(
        '{"lake_root": "/from/file", "app_name": "file_app", "shuffle_partitions": 8}'
    )
    env = {"DLPS_LAKE_ROOT": "/from/env", "DLPS_TIMEZONE": "UTC"}
    cfg = load_engine_config(p, env=env, lake_root="/from/override")
    assert cfg.lake_root == "/from/override"  # override > env > file
    assert cfg.app_name == "file_app"  # file > default
    assert cfg.shuffle_partitions == 8  # file value, coerced int
    assert cfg.timezone == "UTC"
    # defaults for everything else, with the pinned env (not os.environ)
    assert cfg.master.startswith("local[")


def test_env_layer_beats_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"shuffle_partitions": 8}')
    cfg = load_engine_config(p, env={"DLPS_SHUFFLE_PARTITIONS": "64"})
    assert cfg.shuffle_partitions == 64


def test_unknown_keys_fail_loudly(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"lake_rooot": "/typo"}')
    with pytest.raises(ValueError, match="lake_rooot"):
        load_engine_config(p, env={})
    with pytest.raises(ValueError, match="shufle"):
        load_engine_config(env={}, shufle_partitions=4)


def test_defaults_only_matches_engine_config_contract():
    cfg = load_engine_config(env={})
    assert isinstance(cfg, EngineConfig)
    assert cfg.timezone == "UTC"
    assert cfg.shuffle_partitions == 32
