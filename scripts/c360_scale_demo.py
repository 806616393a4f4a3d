"""Scale demonstration for the Dataset-native c360 DAG (VERDICT r2 #2).

Runs the full customer360 pipeline from parquet-path inputs at two input
scales (default 60k and 600k people ≈ 108k and 1.08M source rows) in FRESH
subprocesses, writes every output table as partitioned parquet (never
collecting them to the driver), and reports wall time plus the driver's peak
RSS at each scale. The claim under test: driver memory is bounded by the
O(matches) pair tables + broadcasts, not by input row count — so peak RSS
grows far sub-linearly while rows grow 10x.

    python scripts/c360_scale_demo.py            # run both scales, summarize
    python scripts/c360_scale_demo.py --one N    # run one scale (internal)
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

CHUNK = 100_000


def gen_parquet(num_people: int, out_dir: str) -> dict[str, str]:
    """Chunked fixture generation → one parquet per source (bounded memory:
    CHUNK people per chunk, appended via ParquetWriter)."""
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines.c360_fixtures import gen_c360_sources

    os.makedirs(out_dir, exist_ok=True)
    writers: dict[str, pq.ParquetWriter] = {}
    paths: dict[str, str] = {}
    off = 0
    while off < num_people:
        n = min(CHUNK, num_people - off)
        tables, _ = gen_c360_sources(n, seed=1000 + off, id_offset=off)
        if off > 0:
            tables.pop("zendesk_organizations")  # identical every chunk
        for name, tbl in tables.items():
            p = os.path.join(out_dir, f"{name}.parquet")
            if name not in writers:
                writers[name] = pq.ParquetWriter(p, tbl.schema)
                paths[name] = p
            writers[name].write_table(tbl)
        off += n
    for w in writers.values():
        w.close()
    return paths


def run_one(num_people: int) -> dict:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from dbt_customer360_ray.pipelines.c360_fixtures import fixture_config
    from dbt_customer360_ray.pipelines.customer360 import run_customer360

    work = tempfile.mkdtemp(prefix=f"c360-demo-{num_people}-")
    t0 = time.monotonic()
    paths = gen_parquet(num_people, os.path.join(work, "src"))
    gen_sec = time.monotonic() - t0

    t0 = time.monotonic()
    res = run_customer360(paths, fixture_config(), output="datasets")
    rows = {}
    for key in ("mapping", "summary", "customer", "attr_email", "attr_name",
                "attr_organization", "attr_address", "attr_phone", "status",
                "updates", "ip_address"):
        if key not in res:
            continue
        out = os.path.join(work, "out", key)
        m = res[key].materialize()  # one execution: write + count share blocks
        m.write_parquet(out)  # partitioned sink — never driver pandas
        rows[key] = m.count()
    dag_sec = time.monotonic() - t0
    n_matches = len(res["matches"])
    ray.shutdown()
    return {
        "num_people": num_people,
        "source_rows": sum(
            __import__("pyarrow.parquet", fromlist=["x"]).ParquetFile(p).metadata.num_rows
            for n, p in paths.items() if n.endswith(("leads", "overview", "users"))
        ),
        "gen_sec": round(gen_sec, 1),
        "dag_sec": round(dag_sec, 1),
        "driver_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024,
        "n_matches": n_matches,
        "rows": rows,
    }


def main() -> None:
    if "--one" in sys.argv:
        n = int(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(run_one(n)))
        return
    results = []
    for n in (60_000, 600_000):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n)],
            capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        results.append(json.loads(out.strip().splitlines()[-1]))
        print(json.dumps(results[-1]), flush=True)
    lo, hi = results
    print(json.dumps({
        "rows_ratio": round(hi["source_rows"] / lo["source_rows"], 2),
        "rss_ratio": round(hi["driver_peak_rss_mb"] / lo["driver_peak_rss_mb"], 2),
        "matches_ratio": round(hi["n_matches"] / max(lo["n_matches"], 1), 2),
        "verdict": "driver RSS grows sub-linearly vs rows"
        if hi["driver_peak_rss_mb"] / lo["driver_peak_rss_mb"]
        < 0.5 * hi["source_rows"] / lo["source_rows"]
        else "RSS growth too close to linear — investigate",
    }))


if __name__ == "__main__":
    main()
