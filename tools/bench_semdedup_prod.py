#!/usr/bin/env python
"""Measure the semantic-dedup PRODUCTION rung against planted ground truth
(VERDICT r10 #3).

The committed q104 number uses the fixture-calibration config — probe
radius 3 at the deliberately loose 0.4 cosine threshold, which admits 36%
of the bucket-pair space BY RULE and (on the fixture's pure-noise
embeddings) a true-pair set that grows ~quadratically, so its decade ratio
needed a per-output-row apology. The production rung is the SemDeDup-grade
config the q104 docstring states: radius 1, threshold 0.95, plane count
grown with log(n) so expected bucket occupancy stays constant. Pure-noise
embeddings have NO true pairs at 0.95, so this tool runs on a fixture
generated with ``gen_scale_fixture.py --plant-neardup`` and scores recall
against the generator's exact ground-truth sidecar (_planted_pairs.json),
not against an all-pairs rerun.

Per config it reports: wall seconds (min of N), candidate-pair count and
its fraction of n·(n-1)/2 (the blocking cost), verified output pairs, and
recall of truth pairs. Config A (calibration: radius 3, thr 0.4, 8 planes)
rides along on the same fixture so the two configs are directly
comparable, like q117's (L, radius) grid.

Usage:
    python tools/gen_scale_fixture.py --sf 0.1 --plant-neardup 0.02 \
        --out .scale/sf0.1-planted
    python tools/bench_semdedup_prod.py --sf-dir .scale/sf0.1-planted \
        --out /tmp/prod_sf0.1.json
Then feed the two outputs to assemble_scale_record.py --prod.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binwatch_spark.session import get_spark  # noqa: E402

TARGET_OCCUPANCY = 32  # expected vectors per bucket under the log-n rule


def planes_for_n(n: int) -> int:
    from binwatch_spark.functions.texthash import N_PLANES

    return max(N_PLANES, math.ceil(math.log2(max(n / TARGET_OCCUPANCY, 2))))


def measure(spark, sf_dir: str, cfg: dict, truth: set, n_runs: int) -> dict:
    from binwatch_spark.functions.texthash import (
        N_PLANES,
        hyperplanes_for,
        lsh_bucket,
        make_lsh_bucket_udf,
    )
    from binwatch_spark.operators.similarity import (
        neardup_pairs_lsh,
        probe_masks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.filter(F.col("embedding").isNotNull()).count()

    runs = []
    pairs_found = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        pairs = neardup_pairs_lsh(
            emb,
            "vec_id",
            "embedding",
            cfg["threshold"],
            radius=cfg["radius"],
            n_planes=cfg["n_planes"],
        )
        pairs_found = pairs.count()
        runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()

    # recall vs planted truth: pairs are (i, j) with i < j, like the sidecar
    pairs = neardup_pairs_lsh(
        emb,
        "vec_id",
        "embedding",
        cfg["threshold"],
        radius=cfg["radius"],
        n_planes=cfg["n_planes"],
    )
    found = {
        (r["i"], r["j"])
        for r in pairs.join(
            F.broadcast(
                spark.createDataFrame(
                    sorted(truth), "i bigint, j bigint"
                )
            ),
            ["i", "j"],
        ).collect()
    }
    recall = len(found) / len(truth) if truth else None

    # blocking cost: candidate pairs BEFORE the exact-cosine verify — same
    # probe/bucket construction as the operator, counted without verify
    base = emb.filter(F.col("embedding").isNotNull())
    if cfg["n_planes"] == N_PLANES:
        base = base.select(
            F.col("vec_id").alias("_id"),
            lsh_bucket(F.col("embedding")).alias("_bucket"),
        )
    else:
        udf = make_lsh_bucket_udf(hyperplanes_for(cfg["n_planes"]))
        base = base.select(
            F.col("vec_id").alias("_id"), udf(F.col("embedding")).alias("_bucket")
        )
    probes = F.array(
        *[
            F.col("_bucket").bitwiseXOR(F.lit(m)).cast("bigint")
            for m in probe_masks(cfg["radius"], cfg["n_planes"])
        ]
    )
    left = base.select(F.col("_id").alias("i"), F.explode(probes).alias("_bucket"))
    right = base.select(F.col("_id").alias("j"), "_bucket")
    cand = (
        left.join(right, "_bucket").filter(F.col("i") < F.col("j")).count()
    )

    all_pairs = n * (n - 1) / 2
    return {
        **cfg,
        "n_vectors": n,
        "wall_s_runs": runs,
        "wall_s_min": min(runs),
        "candidate_pairs": cand,
        "candidate_frac": round(cand / all_pairs, 6) if all_pairs else None,
        "verified_pairs": pairs_found,
        "truth_pairs": len(truth),
        "truth_recovered": len(found),
        "recall": round(recall, 4) if recall is not None else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()

    sidecar = os.path.join(args.sf_dir, "_planted_pairs.json")
    with open(sidecar) as fh:
        planted = json.load(fh)
    # ground truth at the production threshold; pairs within 1e-4 of the
    # boundary are ambiguous under 6-dp recording and excluded from truth
    truth = {
        (i, j)
        for i, j, c in planted["pairs"]
        if c >= 0.95 + 1e-4
    }

    spark = get_spark("bench-semdedup-prod")
    n = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    configs = [
        {
            "name": "calibration",
            "radius": 3,
            "threshold": 0.4,
            "n_planes": 8,
        },
        {
            "name": "production",
            "radius": 1,
            "threshold": 0.95,
            "n_planes": planes_for_n(n),
        },
    ]
    out = {
        "sf_dir": args.sf_dir,
        "target_occupancy": TARGET_OCCUPANCY,
        "configs": [],
    }
    for cfg in configs:
        res = measure(spark, args.sf_dir, cfg, truth, args.n)
        out["configs"].append(res)
        print(json.dumps(res), file=sys.stderr)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({c["name"]: c["wall_s_min"] for c in out["configs"]}))


if __name__ == "__main__":
    main()
