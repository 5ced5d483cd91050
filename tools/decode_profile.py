"""Decode-throughput profile: where does the 100-TB-shape decode spend
its time, and which schema/batching lever moves it?

Two parts:

1. pure-Python component breakdown on ONE worker thread (no Spark):
   decompress+parse vs Arrow batch build vs the 64k-row coalescing
   memcpy — decides whether the SoA-merge rework is worth it;
2. Spark end-to-end variants at local[N] on the bench fixture:
   unified schema (the contract), coalesce-size sweep, slim typed
   node-only, and the three-way typed union.

Writes bench_out/decode_profile.json and prints it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import BENCH_FIXTURE, best_of, ensure_bench_fixture, force  # noqa: E402


def python_component_breakdown(max_blobs: int = 200) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pbf_spark.operators.decode import _entity_batch, decode_blob_payload
    from pbf_spark.wire import frame as wire_frame
    from pbf_spark.wire import osmformat

    files = sorted((BENCH_FIXTURE / "media_blobs" / "data").glob("*.parquet"))
    rows = []
    for p in files:
        t = pq.read_table(p, columns=["blob_type", "codec", "raw_size", "payload"])
        rows.extend(
            (c, r, pl)
            for bt, c, r, pl in zip(
                t.column("blob_type").to_pylist(),
                t.column("codec").to_pylist(),
                t.column("raw_size").to_pylist(),
                t.column("payload").to_pylist(),
            )
            if bt == "OSMData"
        )
        if len(rows) >= max_blobs:
            break
    rows = rows[:max_blobs]

    # phase 1: decompress + wire parse only
    t0 = time.time()
    blocks = [
        osmformat.parse_primitive_block(wire_frame.decompress_payload(c, p, r or 0))
        for c, r, p in rows
    ]
    t_parse = time.time() - t0
    n_entities = sum(len(b.nodes) + len(b.ways) + len(b.relations) for b in blocks)

    # phase 2: Arrow batch build
    t0 = time.time()
    batches = []
    for b in blocks:
        for kind, soa in (("node", b.nodes), ("way", b.ways), ("relation", b.relations)):
            rb = _entity_batch(kind, soa, b, "d", 0, 0)
            if rb is not None:
                batches.append(rb)
    t_build = time.time() - t0

    # phase 3: the coalescing memcpy (what a 64k-row flush costs)
    t0 = time.time()
    pa.Table.from_batches(batches).combine_chunks().to_batches()
    t_combine = time.time() - t0

    # end-to-end single thread (the decode_blob_payload path as shipped)
    t0 = time.time()
    for c, r, p in rows:
        decode_blob_payload(p, c, r or 0, "d", 0, 0)
    t_e2e = time.time() - t0

    return {
        "blobs": len(rows),
        "entities": n_entities,
        "parse_sec": round(t_parse, 3),
        "arrow_build_sec": round(t_build, 3),
        "combine_sec": round(t_combine, 3),
        "e2e_sec": round(t_e2e, 3),
        "single_thread_entities_per_sec": round(n_entities / t_e2e),
    }


def spark_variants(cpus: int) -> dict:
    from pbf_spark.operators import decode
    from pbf_spark.session import get_spark
    from pbf_spark.sources import iceberg_lite

    spark = get_spark(app_name="decode-profile", master=f"local[{cpus}]")
    docs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "media_blobs")
    manifest = json.loads((BENCH_FIXTURE / "fixture_manifest.json").read_text())
    total = manifest["total_entities"]

    out = {"cpus": cpus, "entities": total}

    variants = {
        "unified_64k": lambda: decode.decode_documents(docs, blobs),
        "unified_16k": lambda: decode.decode_blobs(
            _joined(decode, docs, blobs), _parts(spark), coalesce_rows=16384
        ),
        "unified_256k": lambda: decode.decode_blobs(
            _joined(decode, docs, blobs), _parts(spark), coalesce_rows=262144
        ),
        "slim_nodes": lambda: decode.decode_documents(docs, blobs, kinds=("node",), slim=True),
        "slim_nodes_geom_only": lambda: decode.decode_documents(
            docs, blobs, kinds=("node",), slim=True, columns=frozenset()
        ),
        "typed_union_3pass": lambda: _typed_union(decode, docs, blobs),
    }
    for name, mk in variants.items():
        t = best_of(lambda mk=mk: force(mk()), label=name)
        out[name] = {"sec": round(t, 3), "entities_per_sec": round(total / t)}
        print(f"{name}: {out[name]}", file=sys.stderr)
    return out


def _joined(decode, docs, blobs):
    from pyspark.sql import functions as F

    spans = (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span_idx").cast("int").alias("span_idx"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )
    return spans.join(blobs, "media_ref").select(
        "doc_id", "span_idx", "blob_seq", "blob_type", "codec", "raw_size", "payload"
    )


def _parts(spark):
    return spark.sparkContext.defaultParallelism * 2


def _typed_union(decode, docs, blobs):
    # three slim frames; a caller wanting the union selects aligned nulls
    n = decode.decode_documents(docs, blobs, kinds=("node",), slim=True)
    w = decode.decode_documents(docs, blobs, kinds=("way",), slim=True)
    r = decode.decode_documents(docs, blobs, kinds=("relation",), slim=True)
    return n.unionByName(w, allowMissingColumns=True).unionByName(r, allowMissingColumns=True)


def main() -> None:
    import os

    ensure_bench_fixture()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = {"python": python_component_breakdown(), "spark": spark_variants(cpus)}
    dest = REPO / "bench_out" / "decode_profile.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
