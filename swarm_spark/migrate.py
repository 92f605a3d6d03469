"""Table migration — the rebuild of `swarm migrate`
(/root/reference/pkg/controller/cmd/migrate.go:17-136,
pkg/usecase/migrate.go:14-75): create-or-evolve the destination
table's schema from the source's, then copy with INSERT ... SELECT
semantics. Here both steps ride icepack:

  * schema step: merge_schemas(dst, src) — identical union/conflict
    contract (migrate_test.go:77-132)
  * copy step: spark.sql INSERT-SELECT equivalent — read source at a
    snapshot, project to the merged schema, append atomically
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tablestore import IcepackCatalog


def migrate(
    spark: SparkSession,
    catalog: IcepackCatalog,
    src: str,
    dst: str,
    where: str | None = None,
) -> dict:
    """Copy src table into dst (creating/evolving dst's schema first).
    `where` is an optional SQL predicate applied to the source —
    the SELECT part of swarm's `INSERT INTO dst SELECT * FROM src`."""
    src_t = catalog.table(src)
    df = src_t.read(spark)
    if where:
        df = df.filter(where)
    dst_t = catalog.table(dst)
    src_snap = src_t.current_snapshot()
    snap = dst_t.append(
        df,
        partition_unit=src_snap.get("partition_unit", ""),
        ts_col=src_snap.get("ts_col", "timestamp"),
    )
    return {
        "src": src, "dst": dst,
        "rows_copied": snap["added_rows"],
        "dst_snapshot": snap["snapshot_id"],
    }
