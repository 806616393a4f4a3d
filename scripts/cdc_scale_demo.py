"""Scale demonstration for the CDC replay engine: bounded driver memory.

Replays the deterministic change fixture at two event scales (default sf 0.01
and sf 0.5 — 80x the events) in FRESH subprocesses and reports wall time plus
the driver's peak RSS at each scale. The claim under test: the replay path is
a two-stage task exchange whose state lives in the object store and in the
per-partition applier tasks — the driver holds only the manifest, per-epoch
metric dicts and task refs, so peak driver RSS grows far sub-linearly while
events grow 10x (the c360_scale_demo claim, made for the ingest engine).

    python scripts/cdc_scale_demo.py             # run both scales, summarize
    python scripts/cdc_scale_demo.py --one SF    # run one scale (internal)
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(REPO, "scripts", "ray_data_logging.yaml"),
)


def run_one(sf: float) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from dbt_customer360_ray.pipelines.cdc_replay import changes_fixture
    from dbt_customer360_ray.state.engine import CdcLake

    fx = changes_fixture(sf)  # cached on disk; generation cost not measured
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake_dir = tempfile.mkdtemp(prefix=f"cdc-scale-sf{sf}-", dir=shm)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=64)
    events = 0
    for p in fx["paths"]:
        events += lake.apply(p)["events_in"]
    wall = time.perf_counter() - t0
    rows = lake.read().count()  # streamed count, not a driver materialization
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    ray.shutdown()
    import shutil

    shutil.rmtree(lake_dir, ignore_errors=True)
    return {
        "sf": sf,
        "events": events,
        "rows": rows,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(events / wall),
        "peak_rss_mb": round(rss1 / 1024),
        "rss_before_mb": round(rss0 / 1024),
    }


def main() -> int:
    if "--one" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(run_one(sf)))
        return 0
    lo = float(os.environ.get("CDC_SCALE_LO", "0.01"))
    hi = float(os.environ.get("CDC_SCALE_HI", "0.5"))
    out = []
    for sf in (lo, hi):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(sf)],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        out.append(json.loads(r.stdout.strip().splitlines()[-1]))
        print(json.dumps(out[-1]))
    a, b = out
    ev_ratio = b["events"] / a["events"]
    rss_ratio = b["peak_rss_mb"] / a["peak_rss_mb"]
    summary = {
        "events_ratio": round(ev_ratio, 2),
        "peak_rss_ratio": round(rss_ratio, 2),
        "driver_rss_bounded": rss_ratio < ev_ratio / 2,
    }
    print(json.dumps(summary))
    # the claim: 10x the events must NOT cost anywhere near 10x driver RSS
    assert summary["driver_rss_bounded"], summary
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
