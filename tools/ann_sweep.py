"""ANN multiprobe sweep: the recall/QPS frontier, not a point.

Sweeps Hamming multiprobe radius {0, 1, 2} for the banded sign-LSH
top-k (simsearch.lsh_topk) at 1M vectors (and re-measures the 100k
config the round-3 bench caught mid-storm), with recall@5 against the
exact cosine top-k on the same query set. This is the 100-TB tuning
curve: radius trades broadcast probe volume for recall.

Writes bench_out/ann_sweep.json and prints it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import best_of  # noqa: E402


def sweep_corpus(spark, n_vecs: int, n_q: int, radii=(0, 1, 2)) -> dict:
    from pyspark.sql import functions as F

    from pbf_spark.fixtures.synth import synth_embeddings
    from pbf_spark.operators import simsearch

    emb = synth_embeddings(spark, n_vecs).cache()
    emb.count()
    qs = emb.where(F.col("vec_id") % max(n_vecs // n_q, 1) == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).cache()
    nq = qs.count()
    exact = {
        (r["q_id"], r["vec_id"]) for r in simsearch.cosine_topk(emb, qs, k=5).collect()
    }

    out = {"vectors": n_vecs, "queries": nq}
    # bucket census: the broadcast/shard-size facts a 100-TB deployment
    # partitions by (same construction lsh_topk uses internally)
    planes = simsearch._band_planes(bands=2, n_planes=12, dim=64, seed=42, extra=6)
    bucketed = emb.select(
        F.explode(simsearch._band_bucket_udf(planes, 12)(F.col("embedding"))).alias("_pk")
    ).withColumn("_bucket", F.expr(f"_pk & {simsearch._COARSE_MASK}"))
    census = bucketed.groupBy("_bucket").count().cache()
    stats = census.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket_rows"),
        F.avg("count").alias("avg_bucket_rows"),
        F.sum(F.when(F.col("count") > 4000, 1).otherwise(0)).alias("hot_buckets"),
    ).first()
    vec_bytes = 64 * 4 + 24  # float vector payload + id/key overhead
    out["bucket_census"] = {
        "n_buckets": stats["n_buckets"],
        "hot_buckets_gt_4000": int(stats["hot_buckets"]),
        "max_bucket_rows": int(stats["max_bucket_rows"]),
        "avg_bucket_rows": round(float(stats["avg_bucket_rows"]), 1),
        # per-shard envelope: what one executor holds if it owns the
        # worst bucket (pre-refinement) — the partition-by number for a
        # 100-TB deployment
        "max_bucket_mb": round(int(stats["max_bucket_rows"]) * vec_bytes / 1e6, 2),
    }
    # REFINED census (round-6): the coarse numbers above describe the
    # pre-refinement keys only — what lsh_topk actually joins on is the
    # refined key (hot buckets re-keyed with the reserve sign bits, the
    # exact _with_key construction), so THIS census is the real
    # candidate-list/shard bound at scale
    hot = census.where(F.col("count") > 4000).select("_bucket", F.lit(True).alias("_hot"))
    refined = (
        bucketed.join(F.broadcast(hot), "_bucket", "left")
        .withColumn(
            "_key",
            F.when(F.col("_hot").isNotNull(), F.col("_pk")).otherwise(F.col("_bucket")),
        )
        .groupBy("_key")
        .count()
    )
    rstats = refined.agg(
        F.count("*").alias("n_keys"),
        F.max("count").alias("max_rows"),
        F.sum(F.when(F.col("count") > 4000, 1).otherwise(0)).alias("gt_4000"),
        F.sum(F.when(F.col("count") > 8000, 1).otherwise(0)).alias("gt_8000"),
    ).first()
    out["refined_census"] = {
        "n_keys": rstats["n_keys"],
        "max_bucket_rows": int(rstats["max_rows"]),
        "buckets_gt_4000": int(rstats["gt_4000"]),
        "buckets_gt_8000": int(rstats["gt_8000"]),
        "max_bucket_mb": round(int(rstats["max_rows"]) * vec_bytes / 1e6, 2),
    }
    census.unpersist()
    for radius in radii:
        ann = lambda: simsearch.lsh_topk(
            emb, qs, k=5, dim=64, n_planes=12, bands=2,
            multiprobe=radius, max_bucket=4000,
        )
        t = best_of(lambda: ann().count(), label=f"ann{n_vecs}_r{radius}")
        approx = {(r["q_id"], r["vec_id"]) for r in ann().collect()}
        out[f"radius_{radius}"] = {
            "sec": round(t, 3),
            "qps": round(nq / t, 2),
            "recall_at_5": round(len(exact & approx) / max(len(exact), 1), 4),
        }
        print(f"n={n_vecs} radius={radius}: {out[f'radius_{radius}']}", file=sys.stderr)
    emb.unpersist()
    qs.unpersist()
    return out


def main() -> None:
    import os

    from pbf_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ann-sweep", master=f"local[{cpus}]")
    n_1m = int(os.environ.get("SPARK_GRAFT_BENCH_VECS_1M", "1000000"))
    n_100k = int(os.environ.get("SPARK_GRAFT_BENCH_VECS", "100000"))
    n_4m = int(os.environ.get("SPARK_GRAFT_BENCH_VECS_4M", "4000000"))
    out = {
        "corpus_100k": sweep_corpus(spark, n_100k, 100),
        "corpus_1m": sweep_corpus(spark, n_1m, 50),
    }
    if n_4m:
        # beyond-1M scale point (round-5): radius {0,1} only — the 1M
        # frontier already shows radius 2 trades QPS for no recall gain
        # past radius 1
        out["corpus_4m"] = sweep_corpus(spark, n_4m, 50, radii=(0, 1))
    dest = REPO / "bench_out" / "ann_sweep.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
