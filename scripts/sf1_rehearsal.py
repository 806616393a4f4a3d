"""10x scale rehearsal (r4 VERDICT Next #1): run the flagship CDC surfaces at
sf1.5 (20.4M events — 10x the sf0.1 bench fixture's event count) and at sf0.1
in FRESH processes, and report wall-times, events/s, and peak driver RSS for
both, plus three spot oracles at the big scale.

The point is to convert the adaptive-bucket / size-gate scale claims into
measured evidence: every surface here must land at roughly linear (<= ~10x)
wall-time growth with BOUNDED driver RSS growth (driver holds metadata, never
row-scale data).

    python scripts/sf1_rehearsal.py             # orchestrate all three runs
    python scripts/sf1_rehearsal.py bench 1.5   # one bench process (internal)
    python scripts/sf1_rehearsal.py oracle 1.5  # spot oracles (internal)
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def bench(sf: float) -> dict:
    import ray
    import ray.data

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dbt_customer360_ray.pipelines.cdc_replay import (
        changes_fixture,
        watermarked_sessions,
    )
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.views import (
        sync_ann_index,
        sync_dedup_index,
        sync_minhash_index,
        read_dedup_keepers,
    )

    fx = changes_fixture(sf)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out: dict = {"sf": sf, "steps": {}, "rss_mb": {}}

    def step(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out["steps"][name] = round(time.perf_counter() - t0, 3)
        out["rss_mb"][name] = round(_rss_mb(), 1)
        return r

    lake_dir = tempfile.mkdtemp(prefix=f"rehearsal-sf{sf}-", dir=shm)
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=64)
    events = {"n": 0}

    def _replay():
        for p in fx["paths"]:
            events["n"] += lake.apply(p)["events_in"]

    step("replay", _replay)
    out["events"] = events["n"]
    out["events_per_sec"] = round(events["n"] / out["steps"]["replay"])

    step("change_feed", lambda: lake.change_feed(
        from_epoch=0, to_epoch=lake.manifest.last_epoch).count())
    step("assemble_conversations", lambda: lake.assemble_conversations().count())
    step("cluster_zorder", lambda: lake.cluster_zorder())
    step("watermarked_sessions", lambda: watermarked_sessions(sf=sf).count())

    ddir = tempfile.mkdtemp(prefix=f"rehearsal-didx-sf{sf}-", dir=shm)
    didx = CdcLake(os.path.join(ddir, "lake"), num_partitions=64)
    step("sync_dedup_index", lambda: sync_dedup_index(lake, didx))
    step("read_dedup_keepers", lambda: read_dedup_keepers(didx).count())

    mdir = tempfile.mkdtemp(prefix=f"rehearsal-midx-sf{sf}-", dir=shm)
    midx = CdcLake(os.path.join(mdir, "lake"), num_partitions=64)
    step("sync_minhash_index", lambda: sync_minhash_index(lake, midx))

    adir = tempfile.mkdtemp(prefix=f"rehearsal-aidx-sf{sf}-", dir=shm)
    aidx = CdcLake(os.path.join(adir, "lake"), num_partitions=64)
    step("sync_ann_index", lambda: sync_ann_index(lake, aidx))

    from dbt_customer360_ray.pipelines.cdc_replay import (
        _ANN_QUERY,
        ann_search_index,
    )

    step("ann_search", lambda: ann_search_index(aidx, _ANN_QUERY, k=20))

    out["total_sec"] = round(sum(out["steps"].values()), 3)
    out["peak_driver_rss_mb"] = round(_rss_mb(), 1)
    for d in (lake_dir, ddir, mdir, adir):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()
    return out


def oracle(sf: float) -> dict:
    """Three spot oracles at the big scale: converged replay state, the
    dedup-index keeper table, and the ANN-index sketches — each vs an
    independent driver-side recomputation."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dbt_customer360_ray.gen import oracle_lake
    from dbt_customer360_ray.pipelines.cdc_replay import changes_fixture
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.views import (
        _ann_hexsigs,
        sync_ann_index,
        sync_dedup_index,
        read_dedup_keepers,
    )

    fx = changes_fixture(sf)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake_dir = tempfile.mkdtemp(prefix=f"rehearsal-oracle-sf{sf}-", dir=shm)
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=64)
    for p in fx["paths"]:
        lake.apply(p)
    results = {}

    # 1. converged LWW state equals the pandas oracle
    got = (
        lake.read().to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = oracle_lake(*[pq.read_table(p) for p in fx["paths"]])
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    results["replay_state"] = f"OK ({len(got)} rows)"
    del got

    # 2. dedup-index keepers equal scratch GROUP BY md5(text)
    import hashlib

    ddir = tempfile.mkdtemp(prefix=f"rehearsal-o-didx-sf{sf}-", dir=shm)
    didx = CdcLake(os.path.join(ddir, "lake"), num_partitions=64)
    sync_dedup_index(lake, didx)
    keepers = (
        read_dedup_keepers(didx).to_pandas()
        .sort_values("text_md5", kind="stable").reset_index(drop=True)
    )
    st = lake.read(columns=["text"]).to_pandas()
    h = st[st["text"].notna()].copy()
    h["text_md5"] = [
        hashlib.md5(t.encode()).hexdigest() for t in h["text"]
    ]
    h = h.sort_values(["text_md5", "conv_id", "turn_idx"], kind="stable")
    g = h.groupby("text_md5", sort=True, as_index=False)
    want_k = g.first()[["text_md5", "conv_id", "turn_idx"]].rename(
        columns={"conv_id": "keeper_conv", "turn_idx": "keeper_turn"}
    )
    want_k["keeper_turn"] = want_k["keeper_turn"].astype("int64")
    want_k["n_copies"] = g.size()["size"].to_numpy("int64")
    pd.testing.assert_frame_equal(
        keepers[want_k.columns.tolist()], want_k.reset_index(drop=True)
    )
    results["dedup_keepers"] = f"OK ({len(keepers)} rows)"
    del st, h, keepers

    # 3. ANN-index sketches equal scratch over the assembled conversations
    adir = tempfile.mkdtemp(prefix=f"rehearsal-o-aidx-sf{sf}-", dir=shm)
    aidx = CdcLake(os.path.join(adir, "lake"), num_partitions=64)
    sync_ann_index(lake, aidx)
    got_s = (
        aidx.read(columns=["sig_hex"]).to_pandas()[["conv_id", "sig_hex"]]
        .sort_values("conv_id", kind="stable").reset_index(drop=True)
    )
    docs = (
        lake.assemble_conversations().to_pandas()
        .sort_values("conv_id", kind="stable").reset_index(drop=True)
    )
    want_s = pd.DataFrame(
        {
            "conv_id": docs["conv_id"].to_numpy(),
            "sig_hex": _ann_hexsigs(
                docs["sft_text"].to_numpy(),
                {"dim": 64, "out_dim": 8, "seed": 29, "salt": "ann"},
            ),
        }
    )
    pd.testing.assert_frame_equal(got_s, want_s)
    results["ann_sketches"] = f"OK ({len(got_s)} rows)"

    for d in (lake_dir, ddir, adir):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()
    return {"sf": sf, "oracles": results}


def main() -> None:
    if len(sys.argv) > 1:
        mode, sf = sys.argv[1], float(sys.argv[2])
        fn = bench if mode == "bench" else oracle
        print(json.dumps(fn(sf)))
        return
    # orchestrate: fresh process per run so peak driver RSS is attributable
    out = {}
    for mode, sf in (("bench", 0.1), ("bench", 1.5), ("oracle", 1.5)):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode, str(sf)],
            capture_output=True, text=True, cwd=REPO,
        )
        if r.returncode != 0:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            raise SystemExit(f"{mode} sf{sf} failed")
        out[f"{mode}_sf{sf}"] = json.loads(r.stdout.strip().splitlines()[-1])
    lo, hi = out["bench_sf0.1"], out["bench_sf1.5"]
    summary = {
        "events_ratio": round(hi["events"] / lo["events"], 2),
        "step_ratios": {
            k: round(hi["steps"][k] / lo["steps"][k], 2) for k in hi["steps"]
        },
        "total_ratio": round(hi["total_sec"] / lo["total_sec"], 2),
        "rss_ratio": round(
            hi["peak_driver_rss_mb"] / lo["peak_driver_rss_mb"], 2
        ),
    }
    print(json.dumps({"runs": out, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
