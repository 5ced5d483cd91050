"""OSM history / replication-diff reconciliation: latest version wins.

Full-history PBF files and minutely replication diffs both deliver
multiple versions of the same entity; materializing the current
snapshot means keeping, per (entity_type, id), the row with the highest
``info.version`` (ties — which replication replays can produce —
broken by newest ``info.ts``), then dropping rows whose winning version
is a delete (``info.visible = false``; the decoder defaults DenseInfo
visibility to true per the spec — wire/osmformat.py dense info decode).

100-TB shape: one window over the (entity_type, id) hash partitioning —
the same single-shuffle shape as the as-of join (temporal.py); no
driver state, no Python. Applying a diff stream incrementally is the
same operator over ``snapshot.unionByName(diff)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
) -> DataFrame:
    """→ the single first row per key group under ``order`` (a list of
    Column sort expressions, e.g. ``[F.col('ts').desc()]``) — the
    generic snapshot primitive behind :func:`latest_versions`. One
    window = one hash exchange on ``keys``; ties must be broken by the
    caller's ``order`` for deterministic output."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_versions(
    entities: DataFrame,
    drop_deleted: bool = True,
) -> DataFrame:
    """→ the newest version of each (entity_type, id); with
    ``drop_deleted`` (the snapshot semantics) entities whose newest
    version is invisible disappear entirely. Rows lacking ``info`` rank
    below any versioned row (nulls last) — a versionless duplicate
    never shadows real history."""
    latest = latest_by_key(
        entities,
        ["entity_type", "id"],
        [
            F.col("info.version").desc_nulls_last(),
            F.col("info.ts").desc_nulls_last(),
        ],
    )
    if drop_deleted:
        latest = latest.where(
            F.col("info").isNull() | F.coalesce(F.col("info.visible"), F.lit(True))
        )
    return latest


def apply_diff(
    snapshot: DataFrame,
    diff: DataFrame,
    drop_deleted: bool = True,
    snapshot_unique: bool = True,
) -> DataFrame:
    """Apply a replication diff (osmChange-shaped entity rows: creates,
    modifies, and deletes as ``info.visible = false``) to a snapshot —
    the incremental-update operator for minutely/hourly OSM replication.
    Semantically :func:`latest_versions` over the union, so re-applying
    the same diff (or overlapping diffs, which replication replay
    produces) is idempotent.

    Scale shape (``snapshot_unique=True``, the snapshot contract: at
    most one row per (entity_type, id)): the diff's key set is tiny and
    broadcast, so snapshot rows the diff does not touch PASS THROUGH
    with no exchange at all — the only shuffled data is the touched
    subset (O(|diff|) keys) plus the diff itself. A minutely diff
    against a 100-TB snapshot moves megabytes, not the snapshot; this
    strictly dominates pre-bucketing the snapshot (which would still
    shuffle nothing but also still scan-and-window every row, because
    the window sits above the union and a union has no bucketing).
    Equivalence to the union form holds exactly because latest-per-key
    over a single-row group is the identity and the visibility filter
    is row-local (both applied to the pass-through branch).

    ``snapshot_unique=False`` falls back to the full-union window for
    left sides that are NOT snapshots (multiple versions per key)."""
    if not snapshot_unique:
        return latest_versions(
            snapshot.unionByName(diff, allowMissingColumns=True),
            drop_deleted=drop_deleted,
        )
    keys = ["entity_type", "id"]
    changed = diff.select(*keys).distinct()
    untouched = snapshot.join(F.broadcast(changed), keys, "left_anti")
    if drop_deleted:
        untouched = untouched.where(
            F.col("info").isNull() | F.coalesce(F.col("info.visible"), F.lit(True))
        )
    touched = snapshot.join(F.broadcast(changed), keys, "left_semi").unionByName(
        diff, allowMissingColumns=True
    )
    return untouched.unionByName(
        latest_versions(touched, drop_deleted=drop_deleted), allowMissingColumns=True
    )
