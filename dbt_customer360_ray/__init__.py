"""dbt_customer360_ray — a from-scratch Ray-Data-native data-processing engine.

Re-expresses the semantics of the fivetran/dbt_customer360 dbt package (reference
snapshot at /root/reference, 2024-08-07) as idiomatic Ray Data pipelines, and builds
the CDC / incremental-ingest engine described by BASELINE.json's north_rule on top of
the same primitives:

- ``schemas``    — transcript / change-event schemas, additive schema evolution
- ``functions``  — vectorized kernels: last-writer-wins, surrogate keys, edit distance
- ``state``      — partition router, manifest (two-phase commit), epoch applier, engine
- ``stages``     — normalizers (email/phone/name/address), text analysis, dedup,
                   similarity search, windowing, multimodal plumbing
- ``sources``    — parquet readers with column pruning, seed dictionaries
- ``pipelines``  — flagship CDC replay, customer360 identity-resolution demo,
                   analytics queries used by the driver correctness gate

Nothing here calls ``ray.init()``; sessions are owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
