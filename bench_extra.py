"""Round-6 engine-phase bench (bench.py is frozen for measurement; this
file exists for noop-sink isolation per the optimization guide §1.4).

Times the same engine phases as bench.py (decode, PIP join, tiles, way
assembly shuffled/bucketed, LSH dedup 1M, ANN 100k/1M) with warmup +
min-of-N, prints one JSON line. Phases can be selected by name.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench import BENCH_FIXTURE, ensure_bench_fixture, force  # noqa: E402  (frozen helpers, reused read-only)


def timed(fn, runs: int = 2) -> float:
    fn()  # warmup
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> None:
    only = set(sys.argv[1:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    manifest = ensure_bench_fixture()

    from pyspark.sql import functions as F

    from pbf_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-r6", master=f"local[{cpus}]")

    from pbf_spark.operators import decode, spatial, tiles
    from pbf_spark.sources import iceberg_lite

    out: dict[str, float] = {}

    def want(name: str) -> bool:
        return not only or name in only

    docs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "media_blobs")

    if want("engine_decode"):
        out["engine_decode"] = timed(lambda: force(decode.decode_documents(docs, blobs)))

    nodes = (
        decode.decode_documents(docs, blobs, columns=frozenset())
        .where("entity_type='node'")
        .select("id", "lat", "lon")
        .cache()
    )
    nodes.count()

    if want("engine_pip_join"):
        polys = spark.read.parquet(str(BENCH_FIXTURE / "polygons.parquet"))
        index = spatial.build_polygon_index(spark, polys, level=None)
        pip_level = max(index.levels)
        out["engine_pip_join"] = timed(
            lambda: spatial.point_in_polygon_join(nodes, index, level=pip_level).count()
        )

    if want("engine_tiles"):
        out["engine_tiles"] = timed(
            lambda: force(tiles.materialize_tiles(nodes, tile_level=10, raster_bits=5))
        )

    if want("engine_way_assembly") or want("engine_way_assembly_bucketed"):
        from pbf_spark.operators import ways as ways_ops

        ways_df = (
            decode.decode_documents(docs, blobs, columns=frozenset({"refs"}), kinds=("way",), slim=True)
            .select("id", "refs")
            .cache()
        )
        ways_df.count()
        if want("engine_way_assembly"):
            out["engine_way_assembly"] = timed(
                lambda: force(ways_ops.assemble_way_geometries(ways_df, nodes))
            )
        if want("engine_way_assembly_bucketed"):
            import shutil

            spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
            for name in ("bx_refs", "bx_nodes"):
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                shutil.rmtree(f"/dev/shm/pbf-spark-warehouse/{name}", ignore_errors=True)
            ways_df.select(
                F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref")
            ).write.bucketBy(32, "ref").sortBy("ref").mode("overwrite").saveAsTable("bx_refs")
            nodes.write.bucketBy(32, "id").sortBy("id").mode("overwrite").saveAsTable("bx_nodes")
            b_refs, b_nodes = spark.table("bx_refs"), spark.table("bx_nodes")
            out["engine_way_assembly_bucketed"] = timed(
                lambda: force(ways_ops.assemble_way_geometries_from_refs(b_refs, b_nodes))
            )
    spark.catalog.clearCache()

    from pbf_spark.fixtures.synth import synth_docs, synth_embeddings
    from pbf_spark.operators import dedup as dedup_ops
    from pbf_spark.operators import simsearch

    if want("engine_lsh_dedup_1m"):
        docs1m = synth_docs(spark, 1_000_000).cache()
        docs1m.count()

        def run_lsh() -> None:
            dedup_ops.minhash_lsh_pairs(docs1m, n_hashes=8, bands=4, threshold=0.5).count()
            spark.catalog.clearCache()
            docs1m.cache().count()  # keep the corpus cached across runs like bench.py

        out["engine_lsh_dedup_1m"] = timed(run_lsh)
        spark.catalog.clearCache()

    if want("engine_ann_100k") or want("engine_ann_1m"):
        for label, n_vecs, n_q in (("engine_ann_100k", 100_000, 100), ("engine_ann_1m", 1_000_000, 50)):
            if not want(label):
                continue
            emb = synth_embeddings(spark, n_vecs).cache()
            emb.count()
            q = emb.where(F.col("vec_id") % max(n_vecs // n_q, 1) == 0).select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
            ).cache()
            q.count()
            out[label] = timed(
                lambda: simsearch.lsh_topk(
                    emb, q, k=5, dim=64, n_planes=12, bands=2, multiprobe=1, max_bucket=4000
                ).count()
            )
            spark.catalog.clearCache()

    print(json.dumps({"engine": out, "fixture_entities": manifest["total_entities"]}))


if __name__ == "__main__":
    main()
