"""Engine configuration.

Replaces the reference's Airflow Connections/Variables injection
(``dags/dag_bike.py:14-23``, ``dags/lib/velib_data_fetcher.py:9-16``) with a
plain dataclass — no orchestrator imports in the engine core (SURVEY §2.6 O5).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """All knobs for a lake instance.

    The zone layout mirrors the reference's medallion prefixes
    (``raw/ → formatted/ → enriched/ → usage/``; e.g.
    ``dags/lib/velib_data_fetcher.py:11-13``,
    ``dags/lib/k_means_with_spark.py:156``) but on any Hadoop-FS/posix root,
    with Hive-style partition columns instead of hand-built path strings.
    """

    lake_root: str = field(default_factory=lambda: os.environ.get("DLPS_LAKE_ROOT", "/tmp/dlps_lake"))
    # local[N] for tests/bench; yarn/k8s master strings in production.
    master: str = field(default_factory=lambda: "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*"))
    app_name: str = "datalake_public_spark"
    # Pin UTC: from_unixtime/to_timestamp are session-tz dependent (SURVEY §7.4 #2).
    timezone: str = "UTC"
    shuffle_partitions: int = field(
        default_factory=lambda: int(os.environ.get("DLPS_SHUFFLE_PARTITIONS", "32"))
    )
    extra_conf: dict[str, str] = field(default_factory=dict)

    def zone(self, name: str) -> str:
        """Path of a lake zone (``raw``/``formatted``/``enriched``/``usage``)."""
        return f"{self.lake_root.rstrip('/')}/{name}"
