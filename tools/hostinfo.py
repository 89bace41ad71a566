"""Host-state fields recorded NEXT TO the canary in sweep/probe
artifacts (the canary itself — tools/host_canary.py — is frozen).

Why this exists (round 12): the canary's fixed probes measure CPU/JVM
speed, which is the right calibrator for compute-bound drift — but it
is BLIND to page-cache state. The ×1000 rung proved it: the r11 probe
ran minutes after data replication (17 GB corpus fully cache-warm), the
r12 probe ran disk-cold on the same box with a *faster* canary, and
every scan-bound row inflated by roughly its input size / ~115 MB/s
single-disk read rate (q3: +72 s on an 11 GB lineitem scan). Recording
cached bytes at canary time makes that difference a JSON field instead
of a forensic reconstruction.
"""

from __future__ import annotations


def page_cache_gb() -> float | None:
    """GiB currently in the kernel page cache (Cached + Buffers from
    /proc/meminfo) — a scan-bound entry whose input exceeds this at
    probe start is paying disk, not CPU. None off-Linux."""
    try:
        fields = {}
        with open("/proc/meminfo") as f:
            for line in f:
                parts = line.split()
                if parts[0].rstrip(":") in ("Cached", "Buffers"):
                    fields[parts[0].rstrip(":")] = int(parts[1])  # kB
        if not fields:
            return None
        return round(sum(fields.values()) / 1024 / 1024, 1)
    except OSError:
        return None
