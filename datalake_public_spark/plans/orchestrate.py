"""Retry policy, cron schedule, and layered config injection (O4/O5).

The reference runs its pipeline under Airflow with ``retries=2,
retry_delay=timedelta(minutes=5), schedule_interval='0 */3 * * *',
catchup=False`` (``dags/dag_bike.py:27-38``) and injects endpoints and
credentials through ``Variable.get(..., default_var=...)`` in every lib
file (``dags/lib/velib_data_fetcher.py:9-16``).  This module reproduces
those SEMANTICS as plain, deterministic, orchestrator-free primitives —
no Airflow imports, every side effect (clock, sleep) injectable, so the
same policies run under cron, a workflow engine, or a unit test:

* :class:`RetryPolicy` / :func:`run_with_retries` — bounded retries with
  a fixed-or-exponential delay, exactly Airflow's task-level contract
  (``retries`` counts RE-tries: 2 retries == up to 3 attempts).
* :class:`CronSchedule` — the 5-field subset the reference (and most
  real DAGs) uses: literals, ``*``, ``*/n``, comma lists, ranges.
  ``due_runs(last_run, now, catchup=False)`` collapses a backlog to the
  single latest tick, Airflow's ``catchup=False`` semantics.
* :func:`load_engine_config` — ``Variable.get(default_var=...)``
  re-expressed as layered precedence: explicit overrides > environment
  > JSON file > dataclass defaults.

Engine-core modules stay pure (SURVEY §2.6): only this plans-layer file
knows about scheduling, and nothing here touches a SparkSession.
"""

from __future__ import annotations

import json
import os
import time as _time
from dataclasses import dataclass, field, fields, replace
from datetime import datetime, timedelta
from typing import Any, Callable, Mapping, TypeVar

from datalake_public_spark.config import EngineConfig

T = TypeVar("T")


# --------------------------------------------------------------------------
# O4a: retry policy
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class RetryPolicy:
    """Airflow-shaped task retry contract (``dag_bike.py:27-33``).

    ``retries`` counts re-tries after the first attempt — ``retries=2``
    allows 3 attempts total.  ``backoff=1.0`` is Airflow's fixed delay;
    >1 gives exponential spacing (delay × backoff^(attempt-1)).
    ``retryable`` bounds WHICH failures are worth repeating — a schema
    mismatch is not, a flaky endpoint is.
    """

    retries: int = 2
    retry_delay: timedelta = timedelta(minutes=5)
    backoff: float = 1.0
    retryable: tuple[type[BaseException], ...] = (Exception,)

    def delay_for(self, attempt: int) -> timedelta:
        """Delay before re-attempt number ``attempt`` (1-based)."""
        return self.retry_delay * (self.backoff ** (attempt - 1))


def run_with_retries(
    task: Callable[[], T],
    policy: RetryPolicy = RetryPolicy(),
    *,
    sleep: Callable[[float], None] = _time.sleep,
    on_attempt: Callable[[int, BaseException | None], None] | None = None,
) -> T:
    """Run ``task`` under ``policy``; return its result or re-raise the
    final failure.  ``sleep`` is injectable so tests assert the exact
    delay sequence without waiting; ``on_attempt(n, exc)`` observes each
    outcome (exc is None on success) for logging/metrics."""
    last: BaseException | None = None
    for attempt in range(1, policy.retries + 2):
        try:
            result = task()
        except policy.retryable as exc:
            last = exc
            if on_attempt is not None:
                on_attempt(attempt, exc)
            if attempt <= policy.retries:
                sleep(policy.delay_for(attempt).total_seconds())
            continue
        if on_attempt is not None:
            on_attempt(attempt, None)
        return result
    assert last is not None
    raise last


# --------------------------------------------------------------------------
# O4b: cron schedule + catchup semantics
# --------------------------------------------------------------------------


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field → the set of matching values.

    Supports the forms real DAGs use (and the reference's ``0 */3``):
    ``*``, ``*/n``, ``a``, ``a-b``, ``a-b/n``, and comma lists thereof.
    """
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >=1: {spec!r}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
            if step != 1:  # "3/2" is not cron; "*/2" or "1-5/2" are
                raise ValueError(f"step needs a range: {spec!r}")
        if not (lo <= a <= b <= hi):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {spec!r}")
        out.update(range(a, b + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    """5-field cron (minute hour day-of-month month day-of-week).

    Day-of-week: 0=Sunday..6=Saturday (cron convention; Python's
    ``weekday()`` is remapped).  Matching follows vixie-cron's rule:
    when BOTH day fields are restricted the date matches if EITHER
    does; otherwise the restricted one must match.
    """

    expr: str
    minute: frozenset[int] = field(init=False)
    hour: frozenset[int] = field(init=False)
    dom: frozenset[int] = field(init=False)
    month: frozenset[int] = field(init=False)
    dow: frozenset[int] = field(init=False)

    def __post_init__(self) -> None:
        parts = self.expr.split()
        if len(parts) != 5:
            raise ValueError(f"cron needs 5 fields: {self.expr!r}")
        object.__setattr__(self, "minute", _parse_field(parts[0], 0, 59))
        object.__setattr__(self, "hour", _parse_field(parts[1], 0, 23))
        object.__setattr__(self, "dom", _parse_field(parts[2], 1, 31))
        object.__setattr__(self, "month", _parse_field(parts[3], 1, 12))
        object.__setattr__(self, "dow", _parse_field(parts[4], 0, 7))
        if 7 in self.dow:  # both 0 and 7 mean Sunday
            object.__setattr__(self, "dow", self.dow | {0})

    def _date_matches(self, dt: datetime) -> bool:
        if dt.month not in self.month:
            return False
        cron_dow = (dt.weekday() + 1) % 7  # Monday=0 → Sunday=0 convention
        dom_any = len(self.dom) == 31
        dow_any = self.dow >= frozenset(range(7))
        dom_ok, dow_ok = dt.day in self.dom, cron_dow in self.dow
        if not dom_any and not dow_any:
            return dom_ok or dow_ok  # vixie-cron OR rule
        return dom_ok and dow_ok

    def matches(self, dt: datetime) -> bool:
        return (
            dt.minute in self.minute
            and dt.hour in self.hour
            and self._date_matches(dt)
        )

    def next_after(self, dt: datetime, *, limit_days: int = 366 * 4) -> datetime:
        """First tick strictly after ``dt`` (minute resolution)."""
        t = dt.replace(second=0, microsecond=0) + timedelta(minutes=1)
        horizon = dt + timedelta(days=limit_days)
        while t <= horizon:
            if not self._date_matches(t):
                # jump to next midnight — date can't match any minute today
                t = (t + timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if t.hour not in self.hour:
                t = (t + timedelta(hours=1)).replace(minute=0)
                continue
            if t.minute in self.minute:
                return t
            t += timedelta(minutes=1)
        raise ValueError(f"no tick within {limit_days} days of {dt}: {self.expr!r}")

    def due_runs(
        self, last_run: datetime | None, now: datetime, *, catchup: bool = False
    ) -> list[datetime]:
        """Ticks that should run, given the last completed tick.

        ``catchup=False`` (the reference's setting, ``dag_bike.py:37``)
        collapses any backlog to the SINGLE latest due tick — a pipeline
        that was down for a day reprocesses once, not 8 times.  True
        returns every missed tick in order.
        """
        start = last_run if last_run is not None else now - timedelta(minutes=1)
        ticks: list[datetime] = []
        t = start
        while True:
            t = self.next_after(t)
            if t > now:
                break
            ticks.append(t)
        if catchup or not ticks:
            return ticks
        return [ticks[-1]]


def run_due_ticks(
    schedule: CronSchedule,
    last_run: datetime | None,
    now: datetime,
    task: Callable[[datetime], T],
    *,
    policy: RetryPolicy = RetryPolicy(),
    catchup: bool = False,
    sleep: Callable[[float], None] = _time.sleep,
) -> list[tuple[datetime, T]]:
    """The reference DAG's whole trigger contract in one call: compute
    due ticks, run each (logical tick time passed in, as Airflow passes
    ``execution_date``) under the retry policy, return (tick, result)
    pairs.  Deterministic: callers own the clock."""
    out: list[tuple[datetime, T]] = []
    for tick in schedule.due_runs(last_run, now, catchup=catchup):
        out.append((tick, run_with_retries(lambda: task(tick), policy, sleep=sleep)))
    return out


# --------------------------------------------------------------------------
# O5: layered config injection
# --------------------------------------------------------------------------

#: env-var name for each EngineConfig field, mirroring the reference's
#: ``Variable.get(name, default_var=...)`` keys (upper-cased, DLPS_ prefix).
_ENV_KEYS = {
    "lake_root": "DLPS_LAKE_ROOT",
    "master": "DLPS_MASTER",
    "app_name": "DLPS_APP_NAME",
    "timezone": "DLPS_TIMEZONE",
    "shuffle_partitions": "DLPS_SHUFFLE_PARTITIONS",
}


def load_engine_config(
    path: str | os.PathLike[str] | None = None,
    *,
    env: Mapping[str, str] | None = None,
    **overrides: Any,
) -> EngineConfig:
    """Build an :class:`EngineConfig` with ``Variable.get`` precedence:
    explicit ``overrides`` > environment > JSON ``path`` > dataclass
    defaults.  Unknown keys in the file or overrides raise — a typo'd
    knob must fail loudly, not silently fall back to a default (the
    failure mode Airflow's ``default_var`` papers over)."""
    env = os.environ if env is None else env
    known = {f.name for f in fields(EngineConfig)}

    layered: dict[str, Any] = {}
    if path is not None:
        with open(path) as fh:
            file_cfg = json.load(fh)
        bad = sorted(set(file_cfg) - known)
        if bad:
            raise ValueError(f"unknown config keys in {path}: {bad}")
        layered.update(file_cfg)
    for name, key in _ENV_KEYS.items():
        if key in env:
            layered[name] = env[key]
    bad = sorted(set(overrides) - known)
    if bad:
        raise ValueError(f"unknown config overrides: {bad}")
    layered.update(overrides)

    if "shuffle_partitions" in layered:
        layered["shuffle_partitions"] = int(layered["shuffle_partitions"])
    if "extra_conf" in layered and not isinstance(layered["extra_conf"], dict):
        raise ValueError("extra_conf must be a mapping")
    # EngineConfig's own field defaults also read env; building from a
    # pinned ``env`` mapping must not let os.environ leak through, so
    # materialize every unset field explicitly.
    base = EngineConfig(
        lake_root=env.get("DLPS_LAKE_ROOT", "/tmp/dlps_lake"),
        master="local[%s]" % env.get("SPARK_GRAFT_CPUS", "*"),
        shuffle_partitions=int(env.get("DLPS_SHUFFLE_PARTITIONS", "32")),
    )
    return replace(base, **layered)
