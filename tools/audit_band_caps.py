"""Hot-bucket cap + fold-collision audit over a documents fixture.

Two round-12 asks in one measurement (VERDICT r11 #3 and #7):

1. **Cap-hit counts on a realistic vocabulary.** The BAND_KEY_CAP
   hot-bucket exclusion was motivated and measured on the fixed-vocab
   fixture; this reports, per scale point, how many (band_idx, band_key)
   buckets exceed the cap and how many documents sit in them — the
   numbers a production team needs to judge what the cap is actually
   discarding at each density.

2. **Fold-collision exposure, measured instead of only bounded.** The
   int64 _band_fold's collision risk is documented as a birthday bound
   (operators/dedup.py BAND_KEY_CAP comment: a collision that merges two
   real buckets can push the merged count over the cap and silently
   exclude TRUE candidates). This audit computes both representations —
   the folded int64 key and the UNFOLDED band slice (the 8 raw minhash
   values joined verbatim, collision-free by construction) — and reports:
   - per band: distinct unfolded keys vs distinct folded keys (any gap =
     an observed fold collision),
   - buckets hot under folded counting whose largest TRUE sub-bucket is
     NOT hot (= the exact misclassification event the doc warns about).
   Zero gaps at the measured densities turns the accepted bound into
   observed evidence; a nonzero gap is the signal to move the membership
   count to a collision-free representation.

Usage: python tools/audit_band_caps.py SF_DIR [SF_DIR ...]
Writes $BAND_AUDIT_OUT (default /tmp/band_audit.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binwatch_spark.functions.texthash import (  # noqa: E402
    BAND_ROWS,
    N_BANDS,
    make_minhash_band_udf,
    make_minhash_sig_udf,
)
from binwatch_spark.operators.dedup import BAND_KEY_CAP  # noqa: E402
from binwatch_spark.operators.text import distinct_tokens  # noqa: E402
from binwatch_spark.session import get_spark  # noqa: E402
from binwatch_spark.tables import load  # noqa: E402


def audit(spark, sf_dir: str) -> dict:
    docs = load(spark, sf_dir, "documents")
    sig_udf = make_minhash_sig_udf()
    band_udf = make_minhash_band_udf()
    toks = distinct_tokens(F.col("text"))
    keyed = docs.select(
        "doc_id",
        sig_udf(toks).alias("_sig"),
        band_udf(toks).alias("_bk"),
    )
    # one row per (doc, band): folded int64 key + the unfolded 8-value
    # slice (collision-free reference representation)
    per_band = keyed.select(
        "doc_id",
        F.posexplode("_bk").alias("band_idx", "folded"),
        F.col("_sig"),
    ).select(
        "doc_id",
        "band_idx",
        "folded",
        F.concat_ws(
            "-",
            *[
                F.element_at(
                    "_sig", F.col("band_idx") * BAND_ROWS + r + 1
                ).cast("string")
                for r in range(BAND_ROWS)
            ],
        ).alias("unfolded"),
    )
    per_band.persist()
    n_docs = docs.count()

    # distinct-key gap per band (any gap = observed fold collision)
    key_counts = per_band.groupBy("band_idx").agg(
        F.countDistinct("folded").alias("n_folded"),
        F.countDistinct("unfolded").alias("n_unfolded"),
    )
    gaps = {
        int(r["band_idx"]): {
            "distinct_folded": int(r["n_folded"]),
            "distinct_unfolded": int(r["n_unfolded"]),
            "fold_collisions": int(r["n_unfolded"]) - int(r["n_folded"]),
        }
        for r in key_counts.collect()
    }

    # hot buckets under each representation
    folded_sizes = per_band.groupBy("band_idx", "folded").agg(
        F.count(F.lit(1)).alias("n")
    )
    hot_folded = folded_sizes.filter(F.col("n") > BAND_KEY_CAP)
    hot_folded_stats = hot_folded.agg(
        F.count(F.lit(1)).alias("buckets"), F.sum("n").alias("docs")
    ).first()

    unfolded_sizes = per_band.groupBy("band_idx", "folded", "unfolded").agg(
        F.count(F.lit(1)).alias("n")
    )
    # a folded-hot bucket is MISCLASSIFIED if none of its true (unfolded)
    # sub-buckets is hot on its own — i.e. only the merge crossed the cap
    sub_max = unfolded_sizes.groupBy("band_idx", "folded").agg(
        F.max("n").alias("max_sub"), F.sum("n").alias("total")
    )
    miscls = (
        sub_max.filter(
            (F.col("total") > BAND_KEY_CAP)
            & (F.col("max_sub") <= BAND_KEY_CAP)
        )
        .count()
    )
    hot_unfolded = unfolded_sizes.filter(F.col("n") > BAND_KEY_CAP)
    hot_unfolded_stats = hot_unfolded.agg(
        F.count(F.lit(1)).alias("buckets"), F.sum("n").alias("docs")
    ).first()
    per_band.unpersist()

    total_collisions = sum(g["fold_collisions"] for g in gaps.values())
    return {
        "sf_dir": sf_dir,
        "documents": n_docs,
        "band_key_cap": BAND_KEY_CAP,
        "n_bands": N_BANDS,
        "fold_collisions_total": total_collisions,
        "hot_buckets_folded": int(hot_folded_stats["buckets"] or 0),
        "docs_in_hot_buckets_folded": int(hot_folded_stats["docs"] or 0),
        "hot_buckets_unfolded": int(hot_unfolded_stats["buckets"] or 0),
        "docs_in_hot_buckets_unfolded": int(hot_unfolded_stats["docs"] or 0),
        "cap_misclassified_by_fold": int(miscls),
        "per_band": gaps,
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(
        "band-audit", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for d in dirs:
        t0 = time.monotonic()
        rec = audit(spark, d)
        rec["audit_wall_sec"] = round(time.monotonic() - t0, 1)
        out[d] = rec
        print(
            f"{d}: docs={rec['documents']} fold_collisions="
            f"{rec['fold_collisions_total']} hot_folded="
            f"{rec['hot_buckets_folded']} misclassified="
            f"{rec['cap_misclassified_by_fold']}",
            flush=True,
        )
    path = os.environ.get("BAND_AUDIT_OUT", "/tmp/band_audit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({d: {k: v for k, v in r.items() if k != "per_band"} for d, r in out.items()}))


if __name__ == "__main__":
    main()
