"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse→enrich→route→aggregate pipeline
over transcripts derived deterministically from the sf0.001 events
table. `queries()` exposes each implemented operator (SURVEY.md §2)
as (spark, sf_dir) -> DataFrame, and `oracle_sql()` gives DuckDB
equivalents over the same parquet views.

The `transcripts` input (BASELINE.json input_hint) is derived from the
`events` view with SQL-expressible transforms (swarm_spark.datagen.
TRANSCRIPTS_FROM_EVENTS_SQL) so BOTH engines compute it identically —
every pipeline stage is therefore value-checked end to end.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from swarm_spark.datagen import (  # noqa: E402
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)
from swarm_spark.pipeline import IngestPipeline, PipelineConfig  # noqa: E402
from swarm_spark.presets import (  # noqa: E402
    default_event_rules,
    default_schema_rules,
    default_tool_dim,
)

# ---------------------------------------------------------------------------
# shared plan builders
# ---------------------------------------------------------------------------


def _utc(spark: SparkSession) -> SparkSession:
    """Timestamps must hash identically to DuckDB's UTC-naive values;
    session timeZone is runtime-settable, so pin it defensively in
    case the driver's session wasn't built by swarm_spark.session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _pipeline(spark: SparkSession, warehouse: str | None = None) -> IngestPipeline:
    import tempfile

    cfg = PipelineConfig(
        event_rules=default_event_rules(),
        schema_rules=default_schema_rules(),
        warehouse=warehouse or tempfile.mkdtemp(prefix="swarm_wh_"),
        tool_dim=default_tool_dim(spark),
    )
    return IngestPipeline(spark, cfg)


def _routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    return _pipeline(spark).routed(t)


ROUTE_COLS = ["conv_id", "turn_idx", "role", "schema_name", "sink_table",
              "called_tool", "error_code", "actor", "tool_family"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/T1-T3: vectorized regex extraction (JVM regexp_extract)."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    return p.select("conv_id", "turn_idx", "role", "tool",
                    "called_tool", "call_args", "error_code", "actor")


def q_grok_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-vectorized grok path (pandas UDF, compiled pattern
    dictionary) — must produce byte-identical output to the JVM
    regexp path, so it shares parse_extract's oracle."""
    from swarm_spark.functions.extract import with_grok

    t = transcripts_from_events(spark, sf_dir)
    return with_grok(t).select(
        "conv_id", "turn_idx", "role", "tool",
        "called_tool", "call_args", "error_code", "actor",
    )


def q_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sink snapshot lineage: run a FULL exactly-once ingest into
    a fresh temp warehouse and surface each committed snapshot's
    (sink, snapshot_id, added_rows, row_count, partition_unit). On a
    fresh warehouse snapshot_id is deterministically 1 per table and
    added_rows equals the routed-per-sink counts, so the whole lineage
    row set is recomputable from the routing SQL — the resumability
    audit trail is value-verified, not just row-counted."""
    t = transcripts_from_events(spark, sf_dir)
    pipe = _pipeline(spark)
    res = pipe.run(t, batch_id="lineage-demo")
    rows = []
    for sink, sid in sorted(res.snapshot_ids.items()):
        snap = pipe.catalog.table(sink).current_snapshot()
        rows.append((sink, int(sid), int(snap["added_rows"]),
                     int(snap["row_count"]), snap.get("partition_unit") or ""))
    return spark.createDataFrame(
        rows,
        "sink string, snapshot_id bigint, added_rows bigint, "
        "row_count bigint, partition_unit string",
    )


def q_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema JSON ingest end to end, value-checked: a
    CloudTrail-shaped multi-record fixture (Records[] batches,
    mirroring /root/reference/pkg/usecase/load_test.go:54-130 and
    testdata/policy/schema.rego) is derived DETERMINISTICALLY from the
    events table, written as JSON objects, then pushed through the
    full JsonIngest path — event routing, Records explode, nil-strip,
    bounded-sample schema inference + coverage check, rfc3339
    timestamps, id extraction, icepack append — and the landed table
    is compared field-by-field against plain SQL over events."""
    import tempfile

    from swarm_spark.pipeline_json import JsonIngest, JsonSchemaRule
    from swarm_spark.rules import EventRule

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rec = F.struct(
        F.col("event_id").cast("string").alias("eventID"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("eventTime"),
        F.col("event_type").alias("eventName"),
        F.struct(F.col("user_id").alias("userName")).alias("userIdentity"),
        # sometimes-present field: exercises inference coverage; null
        # is dropped by to_json, so ~6/7 of records lack the key
        F.when(F.col("event_id") % 7 == 0, F.col("value")).alias("optValue"),
    )
    docs = (
        ev.select((F.col("event_id") % 16).alias("g"), rec.alias("r"))
        .groupBy("g")
        .agg(F.to_json(F.struct(
            F.sort_array(F.collect_list("r")).alias("Records")
        )).alias("value"))
    )
    fx = tempfile.mkdtemp(prefix="swarm_ct_fx_")
    docs.select("value").coalesce(4).write.mode("overwrite").text(fx)
    ing = JsonIngest(
        spark, tempfile.mkdtemp(prefix="swarm_ct_wh_"),
        [EventRule("ct", "path", "contains", "swarm_ct_fx_", "cloudtrail")],
        [JsonSchemaRule("cloudtrail", sink_table="ct_logs",
                        ts_path="$.eventTime", ts_format="rfc3339",
                        id_path="$.eventID")],
    )
    ing.run(fx, batch_id="ct-demo")
    t = ing.catalog.table("ct_logs").read(spark)
    return t.select(
        "id", "timestamp",
        F.col("data.eventName").alias("event_name"),
        F.col("data.userIdentity.userName").alias("user_name"),
        F.col("data.optValue").alias("opt_value"),
    )


def q_turn_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star ordering window: row_number over (conv_id, turn_idx)."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    return p.select("conv_id", "turn_idx", "turn_seq", "prev_role", "text")


def q_pipeline_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/R1: event-rule fan-out + broadcast schema/tool enrichment."""
    return _routed(spark, sf_dir).select(*ROUTE_COLS)


def q_pipeline_agg_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: counts per (sink, role, tool, hour)."""
    r = _routed(spark, sf_dir)
    return _pipeline(spark).aggregate(r)


def q_routed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: deterministic content-hash id — md5 of the canonical payload
    projection (types.go:27-34). Uses an explicit field list so the
    oracle can rebuild the exact JSON string."""
    t = transcripts_from_events(spark, sf_dir)
    p = _pipeline(spark).parsed(t)
    payload_json = F.to_json(F.struct("conv_id", "turn_idx", "role"))
    return p.select(
        "conv_id", "turn_idx",
        F.md5(payload_json).alias("row_id"),
    )


def q_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-sink log counts (the per-dest IngestLog.LogCount)."""
    r = _routed(spark, sf_dir)
    return r.groupBy(F.col("sink_table").alias("sink")).agg(
        F.count(F.lit(1)).alias("log_count")
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic agg benchmark (pricing summary) on lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: orders ⋈ customer ⋈ nation (dim side tiny)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# training-data operators (documents / embeddings tables)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one surviving row per normalized-content hash."""
    from swarm_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_exact(docs).select("doc_id", "lang", "source")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join,
    scoped to a deterministic block (doc_id < 5000) — the documented
    usage of the exact path (SCALE.md: superlinear beyond ~10k-doc
    blocks; minhash is the corpus-scale operator). The block covers
    the whole corpus at sf<=0.1 and the first block above it."""
    from swarm_spark.operators.dedup import jaccard_pairs_inverted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("doc_id") < 5000)
    return jaccard_pairs_inverted(docs, k=3, threshold=0.2)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, quality score, language id, fingerprint per doc."""
    from swarm_spark.operators.textstats import with_textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_textstats(docs).select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe", "alpha_ratio",
        "punct_ratio", "quality", "lang_pred", "fingerprint",
    )


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 neighbors of vec 0 by integer-quantized dot product
    (quantization makes the score integer-exact in both engines)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = embs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    quant = lambda c: F.transform(c, lambda x: F.round(x.cast("double") * 1024).cast("long"))  # noqa: E731
    dq = F.aggregate(
        F.zip_with(quant(F.col("embedding")), quant(F.col("qv")), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        embs.crossJoin(F.broadcast(qv))
        .select("vec_id", dq.alias("dq"))
        .orderBy(F.desc("dq"), "vec_id")
        .limit(20)
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with EXACT-Jaccard verify at J>=0.8
    (integer threshold math). The oracle recomputes the exact J>=0.8
    pair set in SQL; LSH recall at J>=0.8 with 16 bands x 4 rows is
    1-(1-J^4)^16 >= 0.9998, and on this fixed corpus the candidate set
    is verified complete — so the hash check pins candidate recall AND
    verify arithmetic."""
    from swarm_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_hashes=64, bands=16)
    return (
        pairs.filter(F.col("inter") * 10 >= F.col("union_sz") * 8)
        .select("id_a", "id_b",
                F.expr("(1000000 * inter) div union_sz").alias("j_q"))
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-band near-dup pairs on the md5w60 basis —
    portable token hashes make the signature bit-identical in DuckDB,
    and the pigeonhole banding is EXACT (not probabilistic), so the
    banded result equals the all-pairs oracle. The xxhash64 basis
    remains the production default (pytest-pinned)."""
    from swarm_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, max_hamming=3, hash_fn="md5w60")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 by the integer-quantized
    signed-squared-cosine score (cross-engine exact; float cosine_topk
    stays the production scorer, numpy-parity-pinned in pytest)."""
    from swarm_spark.operators.similarity import cosine_topk_quantized

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk_quantized(embs, query_id=0, k=10)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the full pipeline (deterministic centroids →
    vectorized assign → probe → re-rank) with n_probe = n_lists, so
    the result is EXACTLY the brute-force quantized top-10 and the
    oracle can verify values; probe<all recall is pytest-pinned."""
    from swarm_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_quantized,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(embs, 8)
    assigned = ivf_assign(embs, cents)
    q = [r[0] for r in embs.filter(F.col("vec_id") == 1)
         .select(F.explode("embedding")).collect()]
    return ivf_topk_quantized(assigned, cents, q, k=10, n_probe=8)


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the PERSISTED index (operators/ann_index.py):
    build over the first half of the corpus, extend_ann_index over the
    second (history never re-assigned — append asserted), then query
    with n_probe = n_lists so the answer is EXACTLY brute force and
    shares ann_ivf's oracle verbatim — one oracle, two
    implementations, like bm25/bm25_indexed. The probe reads the
    stored table via read(prune=[("_list","in",probe)]): file
    skipping IS the inverted-file structure."""
    import tempfile

    from swarm_spark.operators.ann_index import (
        ann_topk_from_index,
        build_ann_index,
        extend_ann_index,
    )
    from swarm_spark.tablestore import IcepackCatalog

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mid = embs.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    t = IcepackCatalog(tempfile.mkdtemp(prefix="annidx_wh_")).table("ann")
    build_ann_index(embs.filter(F.col("vec_id") <= mid), t, n_centroids=8)
    dirs_before = len(t.current_snapshot()["data_dirs"])
    extend_ann_index(embs.filter(F.col("vec_id") > mid), t)
    if len(t.current_snapshot()["data_dirs"]) != dirs_before + 1:
        raise AssertionError("extend was not a pure append")
    q = [r[0] for r in embs.filter(F.col("vec_id") == 1)
         .select(F.explode("embedding")).collect()]
    return ann_topk_from_index(spark, t, q, k=10, n_probe=8)


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per nation (window rank over broadcast
    join) — the top-k-per-group OLAP pattern."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "o_orderkey", "o_totalprice")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (30-min gap):
    lag + cumulative sum of gap flags — the standard windowed
    session-id construction. Returns per-session aggregates."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet may carry TIMESTAMP_NTZ; with the session pinned to UTC
    # the LTZ cast is identity, and unix_seconds gives epoch seconds
    secs = F.unix_seconds(F.col("ts").cast("timestamp"))
    gap = F.when(secs - F.lag(secs).over(w) > 1800, 1).otherwise(0)
    sess = ev.withColumn("new_sess", gap).withColumn(
        "session_idx", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


def q_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority style 3-way join + agg + top-N."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") < "1998-01-01")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume style 5-way join through two dims."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q_conv_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation reassembly: ordered concatenation of turn
    texts (the transcript-native groupwise sort-aggregate), through
    the bounded-memory guard (operators/reassembly.py: corpus max is
    99 turns/conversation at sf1; the guard fails loud on pathological
    streams before any executor builds an unbounded buffer)."""
    from swarm_spark.operators.reassembly import reassemble_conversations

    t = transcripts_from_events(spark, sf_dir)
    out = reassemble_conversations(t, max_turns=100_000, on_oversize="raise")
    return out.select(
        "conv_id", "n_turns", F.md5("conv_text").alias("conv_text_md5")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: inverted-index Jaccard pairs →
    iterative connected components (hash-to-min) → (node, component).
    Scoped to the same deterministic block as q_jaccard_pairs (the
    exact path's documented block usage; full corpus at sf<=0.1)."""
    from swarm_spark.operators.components import connected_components
    from swarm_spark.operators.dedup import jaccard_pairs_inverted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("doc_id") < 5000)
    pairs = jaccard_pairs_inverted(docs, k=3, threshold=0.2)
    return connected_components(pairs).select("node", "component")


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers who ordered in 1997 INTERSECT 1998,
    and 1997 EXCEPT 1998, labeled and unioned."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey").distinct()
    both = y97.intersect(y98).withColumn("setop", F.lit("both"))
    only97 = y97.exceptAll(y98).withColumn("setop", F.lit("only_1997"))
    return both.unionByName(only97).select("setop", "o_custkey")


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs via hyperplane LSH + exact
    verify. Planted duplicates (vec_id<10 cloned at +1e6) are
    identical vectors → identical LSH buckets, so recall is exact and
    the id-pair set matches the all-pairs cosine>=0.999 SQL oracle
    (the 0.999 margin is wide enough that float summation order can't
    flip membership)."""
    from swarm_spark.operators.dedup import embedding_dup_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dup = embs.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    both = embs.union(dup)
    return embedding_dup_pairs(both, threshold=0.999, dim=64).select("id_a", "id_b")


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile / median aggregates per group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.min("l_extendedprice"), 4).alias("lo"),
        F.round(F.max("l_extendedprice"), 4).alias("hi"),
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + multi-distinct aggregates per group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_linestatus").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate with grouping indicators."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with an IRREGULAR set list — ((type), (bucket),
    ()) — the multi-level aggregate shape ROLLUP/CUBE can't express
    (completes the q_rollup family). One scan, one expand+aggregate;
    grouping() flags disambiguate rolled-up NULLs from data NULLs in
    both engines. Reference analogue: the windowed count families of
    pkg/usecase/ingest.go, generalized to ad-hoc OLAP levels."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", (F.col("user_id") % 10).alias("bucket"), "event_id")
    view = "gs_events_v"
    ev.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT event_type, bucket,
               count(*) AS n,
               sum(event_id) AS sum_id,
               CAST(grouping(event_type) AS INT) AS g_t,
               CAST(grouping(bucket) AS INT) AS g_b
        FROM {view}
        GROUP BY GROUPING SETS ((event_type), (bucket), ())
    """)


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns per returnflag."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins: per-nation counts of customers with and
    without orders."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    with_o = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without_o = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    a = with_o.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_with")) \
        .withColumnRenamed("c_nationkey", "nk_a")
    b = without_o.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_without")) \
        .withColumnRenamed("c_nationkey", "nk_b")
    return (
        nation.join(F.broadcast(a), nation.n_nationkey == a.nk_a, "left")
        .join(F.broadcast(b), nation.n_nationkey == b.nk_b, "left")
        .select(
            "n_name",
            F.coalesce("n_with", F.lit(0)).alias("n_with"),
            F.coalesce("n_without", F.lit(0)).alias("n_without"),
        )
    )


def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-curation pipeline: exact dedup → near-dup
    removal (MinHash LSH candidates + exact-Jaccard verify at J>=0.8,
    min-id wins) → quality gate — the end-to-end training-data filter.

    The near-dup stage is the CORPUS-SCALE path (r3 change): the exact
    inverted-index join it replaced grows superlinearly with corpus
    size (SCALE.md — 40x wall for 10x docs), while banded LSH moves
    only (id, band, bucket) and verifies candidates exactly. With
    r=3/b=32 the per-pair miss probability at J=0.8 is
    (1-0.8^3)^32 ~ 1e-10, so the output equals the exact J>=0.8 set
    (which is what the oracle recomputes); the integer threshold
    (inter*10 >= union*8) keeps the boundary float-free."""
    from swarm_spark.operators.dedup import dedup_exact, minhash_lsh_pairs
    from swarm_spark.operators.textstats import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # survivors feeds three consumers (pair gen inside minhash, the
    # anti-join, the quality gate) — persist the narrow projection once
    survivors = dedup_exact(docs).persist()
    losers = (
        minhash_lsh_pairs(survivors, num_hashes=96, bands=32)
        .filter(F.col("inter") * 10 >= F.col("union_sz") * 8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    kept = survivors.join(losers, "doc_id", "left_anti")
    return (
        kept.withColumn("quality", quality_score("text"))
        .filter(F.col("quality") >= 0.4)
        .select("doc_id", "lang", "quality")
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union+window construction): attach to every event
    the most recent prior-or-same-time signup event of the same user."""
    from swarm_spark.operators.joins import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.select("user_id", "event_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts").alias("vts"), F.col("event_id").alias("signup_id"))
    )
    out = asof_join(left, right, by="user_id", left_ts="ts", right_ts="vts",
                    value_cols=["signup_id"])
    return out.select("user_id", "event_id", "signup_id")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized point-in-interval range join: click-event values
    falling inside same-user purchase-value bands [v, v+50)."""
    from swarm_spark.operators.joins import range_join_bucketed

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("value").alias("v")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"),
                F.col("value").alias("lo"), (F.col("value") + 50.0).alias("hi"))
    )
    out = range_join_bucketed(left, right, left_point="v", right_lo="lo",
                              right_hi="hi", bucket_width=50.0, by="user_id")
    return out.select("user_id", "click_id", "purchase_id")


def q_asof_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe as-of join (chunked prefix-carry) under a PLANTED hot
    key: user_id % 3 collapses 150 users onto 3 — one key owns a third
    of all rows — and the result must still match DuckDB's ASOF JOIN
    exactly (same oracle construction as asof_join, hot input).

    The right side is deduplicated to ONE signup per (uid, ts) —
    max signup_id — in BOTH engines: with a 3-value key, same-instant
    signups exist at larger sf, and an as-of match against duplicate
    (key, ts) rows is engine-arbitrary; the dedup makes the join
    well-defined (no-op when timestamps are unique per key)."""
    from swarm_spark.operators.joins import asof_join_salted

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "uid", (F.col("user_id") % 3).cast("long")
    )
    left = ev.select("uid", "event_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("uid", F.col("ts").alias("sts"))
        .agg(F.max("event_id").alias("signup_id"))
    )
    out = asof_join_salted(left, right, by="uid", left_ts="ts", right_ts="sts",
                           value_cols=["signup_id"], chunk_seconds=86400)
    return out.select("uid", "event_id", "signup_id")


def q_dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash dedup: the kept-document set after dropping
    the larger id of every verified J>=0.8 pair — the SQL oracle
    recomputes the exact pair set and anti-joins identically."""
    from swarm_spark.operators.dedup import dedup_minhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_minhash(docs, threshold=0.8, num_hashes=64, bands=16) \
        .select("doc_id", "lang", "source")


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth over events: lead/lag, rank families,
    ntile, running sums, moving average — one query, one oracle."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    wm = w.rowsBetween(-2, 0)
    return ev.select(
        "user_id", "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.sum("value").over(wr), 4).alias("running_value"),
        F.round(F.avg("value").over(wm), 4).alias("mavg3"),
        F.rank().over(Window.partitionBy("user_id").orderBy(F.desc("value"))).alias("value_rank"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads → mapInPandas features.
    Media derive deterministically from documents (payload = utf-8
    text bytes), so n_bytes/sha256/frame fan-out are recomputable in
    plain SQL — the full Arrow-batch path is value-verified."""
    from swarm_spark.operators.multimodal import extract_features, media_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_from_documents(docs, limit_ids=100)
    return extract_features(media).select(
        "media_id", "kind", "n_bytes", "sha256", "frame_idx"
    )


def q_repetition_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter + PII scrub, value-checked: per-doc repeated
    3-shingle ratio on the raw text, plus email/IP/phone counts and a
    hash of the redacted output over text with PII planted
    DETERMINISTICALLY from doc_id (both engines build the identical
    input with SQL-expressible concat, so the redaction chain —
    regexp syntax restricted to the Java∩RE2 subset — is verified
    byte-for-byte cross-engine)."""
    from swarm_spark.operators.textstats import (
        pii_counts,
        redact_pii,
        repetition_ratio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = F.concat(
        F.col("text"),
        F.lit(" reach u"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(" or +1555"), F.lpad(F.col("doc_id").cast("string"), 6, "0"),
    )
    counts = pii_counts(planted)
    return docs.select(
        "doc_id",
        repetition_ratio("text").alias("rep3"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ip"),
        counts["phone"].alias("n_phone"),
        F.md5(redact_pii(planted)).alias("redacted_md5"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing any word 8-gram with a
    deterministic benchmark subset (doc_id % 50 == 0) are flagged.
    The benchmark shingle set broadcasts; the corpus side is a
    broadcast LEFT SEMI join on exploded shingles — the big side
    never shuffles (the shape that holds at 100 TB)."""
    from swarm_spark.operators.dedup import flag_contaminated

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return flag_contaminated(docs, bench, k=8)


def q_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style URL/domain filter, value-checked: URLs planted
    deterministically from doc_id, a blocklist derived from the same
    table (hosts site0..site4), and the flag computed by regex
    extraction + broadcast semi-join — the corpus side never
    shuffles."""
    from swarm_spark.operators.textstats import flag_blocked_domains

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com/page"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    blocklist = (
        docs.filter(F.col("doc_id") % 20 < 5)
        .select(F.concat(F.lit("site"), (F.col("doc_id") % 20).cast("string"),
                         F.lit(".example.com")).alias("domain"))
        .distinct()
    )
    return flag_blocked_domains(planted, blocklist)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup: maximal repeated 8-token spans across the
    corpus (suffix-array-family operator, Spark-shaped: shingle
    positions -> partial-agg global frequency -> broadcast left-semi ->
    islands merge). See operators/spans.py for the 100 TB shuffle
    budget."""
    from swarm_spark.operators.spans import duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_spans(docs, k=8, min_freq=2, min_run=1)


def q_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-dedup removal path: every duplicated 8-token span excised
    and the text reassembled in token order; value-checked against a
    DuckDB string_agg oracle (exact clean_text equality per doc)."""
    from swarm_spark.operators.spans import scrub_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return scrub_duplicate_spans(docs, k=8, min_freq=2, min_run=1)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode roundtrip: deterministic PNG/WAV payloads are
    encoded then decoded with the stdlib codecs (media_codecs.py); the
    oracle predicts every decoded value arithmetically from the
    generation formulas — value-checks the actual byte-level decoders,
    not just the plumbing."""
    from swarm_spark.operators.multimodal import (
        decode_media,
        encoded_media_from_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_media(encoded_media_from_documents(docs, limit_ids=100))


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize roundtrip: deterministic gradient PNGs are resized
    5x4 by nearest-neighbor (index arithmetic — engine-reproducible),
    re-encoded, decoded again; the oracle predicts every stat of the
    resized image arithmetically from the generation formulas and the
    gather indices (y*h//4, x*w//5)."""
    from swarm_spark.operators.multimodal import (
        decode_media,
        encoded_media_from_documents,
        resize_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = encoded_media_from_documents(docs, limit_ids=100) \
        .filter(F.col("kind") == "image")
    resized = resize_images(media.select("media_id", "payload"), width=5, height=4)
    dec = decode_media(resized.select("media_id", "payload"))
    return (
        dec.join(resized.select("media_id", "src_width", "src_height"), "media_id")
        .select("media_id", "src_width", "src_height", "n_channels",
                "value_mean", "value_min", "value_max")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly min(8, |stratum|)
    docs per (lang, source) by seeded md5 rank (8 < the largest
    stratum, so the cap genuinely selects) — same sample on any
    cluster/partitioning; value-checked against DuckDB recomputing the
    identical hash ranks."""
    from swarm_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        docs, ["lang", "source"], n_per_stratum=8, seed=7
    ).select("doc_id", "lang", "source")


def q_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-shard training order (seeded md5 rank within
    lang shards; global epoch order = (position, shard) interleave —
    the distributed mode with no global sort)."""
    from swarm_spark.operators.sampling import seeded_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return seeded_shuffle(docs, seed=13, shard_col="lang").select(
        "doc_id", "lang", "position"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing (concat-then-slice, 256-token packs,
    per-lang shards): every (doc, pack) overlap interval value-checked
    against a DuckDB cumsum+range oracle."""
    from swarm_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_sequences(
        docs, max_tokens=256, shard_col="lang", seed=42
    )


def q_pack_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-aware context packing (operators/sampling.
    pack_turns): turns assigned to 128-token training windows at turn
    boundaries only (first-fit-by-offset — deterministic and
    SQL-expressible, unlike stateful greedy packing); one
    conversation-keyed shuffle, windows bounded by conversation
    length. The SFT-data analogue of pack_sequences' doc-level
    concat-then-slice."""
    from swarm_spark.operators.sampling import pack_turns

    t = transcripts_from_events(spark, sf_dir)
    return pack_turns(t, max_tokens=128)


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (token, count, doc_freq), min_count=5 — one
    map-side-combined shuffle on the token."""
    from swarm_spark.operators.textstats import corpus_vocabulary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_vocabulary(docs, min_count=5)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: new docs (doc_id % 5 == 0) paired against
    the existing corpus and each other — old x old never generated.
    Same banding/verify arithmetic as minhash_pairs (recall pinned by
    the same completeness argument); oracle recomputes the exact
    J>=0.8 pair set restricted to pairs touching a new doc."""
    from swarm_spark.operators.dedup import minhash_lsh_pairs_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    pairs = minhash_lsh_pairs_incremental(new, old, num_hashes=64, bands=16)
    return (
        pairs.filter(F.col("inter") * 10 >= F.col("union_sz") * 8)
        .select("id_a", "id_b", "kind",
                F.expr("(1000000 * inter) div union_sz").alias("j_q"))
    )


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profile (exact subset): per-column row counts, null
    counts, native-type min/max rendered as strings — ONE scan, one
    single-row aggregate reshaped long. The HLL distinct estimate is
    tolerance-tested in pytest, not hash-compared."""
    from swarm_spark.operators.analytics import profile_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return profile_table(docs).select(
        "column", "n", "n_null", "min_s", "max_s").orderBy("column")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→signup→purchase per user: one
    entity-keyed aggregation; pure-integer conversion counts."""
    from swarm_spark.operators.analytics import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev, ["view", "click", "signup", "purchase"]) \
        .orderBy("step_idx")


def q_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events; integer day-diff
    offsets, distinct-entity counts."""
    from swarm_spark.operators.analytics import cohort_retention

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cohort_retention(ev, period="week").orderBy("cohort", "period_offset")


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc: ranked on tf/df (IEEE-exact
    double), tf-idf reported rounded; ties broken on token."""
    from swarm_spark.operators.textstats import doc_tfidf_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc_tfidf_topk(docs, k=3).orderBy("doc_id", "rank")


def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-style log template mining: digit-bearing tokens are
    variable slots; one codegen regexp + one skeleton-keyed agg."""
    from swarm_spark.operators.logmine import log_templates

    t = transcripts_from_events(spark, sf_dir)
    out = log_templates(t)
    return out.select("template", "n_lines", "example").orderBy("template")


def q_tool_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact rate-spike detection per (tool, hour): n vs the
    trailing 6 observed hours, spike iff n*cnt > 2*sum (no floats)."""
    from swarm_spark.operators.logmine import hourly_spikes

    t = transcripts_from_events(spark, sf_dir)
    out = hourly_spikes(t, key_col="tool", ts_col="ts",
                        window_hours=6, factor=2, min_history=3)
    return out.select("key", "hour", "n", "trail_sum", "trail_cnt",
                      "is_spike").orderBy("key", "hour")


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation boilerplate-turn detection: turns whose exact
    text recurs in >=5 distinct conversations (canned system prompts /
    acks planted deterministically — the synthetic corpus has no
    natural repeats). Agg shuffles (md5, conv_id) only; flagged set is
    broadcast back."""
    from swarm_spark.operators.dedup import flag_boilerplate_turns

    t = transcripts_from_events(spark, sf_dir)
    planted = t.withColumn(
        "text",
        F.when(
            F.col("turn_idx") == 0,
            F.concat(F.lit("canned system prompt "), F.substring("conv_id", -1, 1)),
        )
        .when((F.col("role") == "user") & (F.col("turn_idx") == 5), F.lit("thanks"))
        .otherwise(F.col("text")),
    )
    out = flag_boilerplate_turns(planted, min_convs=5)
    return out.select(
        "conv_id", "turn_idx", "is_boilerplate",
        F.col("bp_convs").cast("long").alias("bp_convs"),
    ).orderBy("conv_id", "turn_idx")


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing by deterministic fractional repetition: per-lang
    weights {en:2.5, de:1, fr:0.25, es:1.5, zh:0}; the fractional coin
    is an integer compare on md5 bits, exact across engines."""
    from swarm_spark.operators.sampling import mixture_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"en": 2.5, "de": 1.0, "fr": 0.25, "es": 1.5, "zh": 0.0}
    out = mixture_resample(docs, w, group_col="lang", id_col="doc_id", seed=42)
    return out.select("doc_id", "lang", "copy_idx").orderBy("doc_id", "copy_idx")


def q_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-style linear quality classifier over hashed token
    buckets (integer milli-weight logits — exact across engines).
    Pure projection: zero shuffles, model as a map literal."""
    from swarm_spark.operators.quality_model import score_text, synthetic_model

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = synthetic_model(n_buckets=1024, seed=7)
    return score_text(docs, model).select(
        "doc_id", "n_tokens", "logit_milli", "keep"
    ).orderBy("doc_id")


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Lloyd's k-means (k=8, 2 assign→update rounds +
    final assignment) over the 64-dim embeddings — quantized integer
    distances, floor-mean centroid updates, lowest-id init/tiebreaks,
    so the DuckDB oracle (same rounds unrolled as CTEs) reproduces
    every assignment and distance bit-for-bit."""
    from swarm_spark.operators.clustering import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans(emb, k=8, iterations=2)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/dedup.semantic_dedup_keep, Abbas et al.
    2023): integer-exact kmeans partitions the embedding space, then
    every vector cosine-similar (≥0.999, integer signed-squared-cosine
    score) to a lower-id vector in its cluster is dropped. The corpus
    is embeddings + exact copies of the first 10 vectors at offset
    ids — the copies land in the originals' clusters and must all be
    dropped; natural near-dups are engine-agnostic by the integer
    score. The oracle unrolls the same kmeans rounds as CTEs and
    recomputes the same within-cluster pair drop. Candidate pairs are
    cluster-bounded — never all-pairs — the corpus-scale shape."""
    from swarm_spark.operators.dedup import semantic_dedup_keep

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000))
    return semantic_dedup_keep(emb.unionByName(dup), k=8, iterations=2,
                               threshold=0.999)


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_train/pq_encode/
    pq_topk, the PQ half of IVF-PQ — Jégou et al. 2011): 4 subspaces ×
    16 codewords fit with the integer-exact Lloyd's rounds, vectors
    compressed to 4 codes, query answered by ADC (one integer LUT per
    subspace, m lookups per candidate — no float math in the scan).
    Top-10 by exact int64 ADC distance, ties on id; the oracle unrolls
    the entire pipeline as CTEs. At 100 TB PQ is the memory story: a
    64-dim float vector becomes 4 bytes of codes, and the ADC scan
    composes with IVF list pruning (ann_index.py)."""
    from swarm_spark.operators.similarity import pq_encode, pq_topk, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    books = pq_train(emb, dim=64, m=4, k=16, iterations=1)
    codes = pq_encode(emb, books)
    query = list(emb.orderBy("vec_id").first()["embedding"])
    return pq_topk(codes, books, query, k=10)


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ persistent index (ann_index.build_ann_index(pq_m=4) +
    ann_topk_from_index(mode='adc') — the faiss-standard corpus-scale
    layout): codes and codebooks commit atomically with the list
    assignment; an ADC probe scans m-byte codes in the probed lists'
    FILES (stats-pruned — asserted in-query for a narrow probe).
    With a full probe the ADC ranking equals pq_topk over the whole
    corpus, so the oracle is _pq_oracle() VERBATIM — one oracle, two
    implementations, the bm25_indexed pattern applied to ANN."""
    import tempfile

    from swarm_spark.operators.ann_index import (
        ann_topk_from_index, build_ann_index)
    from swarm_spark.tablestore import IcepackCatalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    t = IcepackCatalog(tempfile.mkdtemp(prefix="ivfpq_wh_")).table("ann")
    build_ann_index(emb, t, n_centroids=8, pq_m=4, pq_k=16,
                    pq_iterations=1, target_files=8)
    query = list(emb.orderBy("vec_id").first()["embedding"])
    rep = t.prune_report([("_list", "in", [0, 1])])
    if not rep["files_kept"] < rep["files_total"]:
        raise AssertionError(f"adc probe did not file-skip: {rep}")
    return ann_topk_from_index(spark, t, query, k=10, n_probe=8, mode="adc")


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension maintenance (operators/scd2.py — Kimball
    versioned rows over the dir-scoped merge): customers land as the
    initial version set at t1; a t2 batch CHANGES every key ≡ 0 (mod
    3) (close + open), re-sends every key ≡ 1 (mod 3) UNCHANGED (must
    be a churn-free no-op), and INSERTS fresh keys (offset past max).
    The full history relation is read back; the oracle recomputes the
    same close/open/no-op/insert logic in SQL. Accounting asserted
    in-query: matched == changed keys (no-ops cost nothing), inserted
    == changed + fresh."""
    import tempfile

    from swarm_spark.operators.scd2 import scd2_upsert
    from swarm_spark.tablestore import IcepackCatalog

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_custkey") % 100).alias("bal"))
    mn, mx = cust.agg(F.min("k"), F.max("k")).first()
    t = IcepackCatalog(tempfile.mkdtemp(prefix="scd2_wh_")).table("dim")
    scd2_upsert(spark, t, cust, keys=["k"], attrs=["seg", "bal"],
                ts="2024-01-01 00:00:00")
    changed = cust.filter(F.col("k") % 3 == 0) \
        .withColumn("bal", F.col("bal") + 1000)
    same = cust.filter(F.col("k") % 3 == 1)
    fresh = cust.filter(F.col("k") % 17 == 0).select(
        (F.col("k") + F.lit(mx - mn + 1)).alias("k"),
        "seg", (F.col("bal") + 5).alias("bal"))
    batch = changed.unionByName(same).unionByName(fresh)
    snap = scd2_upsert(spark, t, batch, keys=["k"], attrs=["seg", "bal"],
                       ts="2024-02-01 00:00:00")
    n_changed = changed.count()
    n_fresh = fresh.count()
    if snap["rows_matched"] != n_changed:
        raise AssertionError(
            f"no-op churn: matched {snap['rows_matched']} != {n_changed}")
    if snap["rows_inserted"] != n_changed + n_fresh:
        raise AssertionError(f"insert accounting: {snap}")
    return t.read(spark).select("k", "seg", "bal", "_valid_from", "_valid_to")


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (plans/bucketing.py — the write-once-
    shuffle-never lever for REPEATED large-large joins at 100 TB):
    orders and customer are persisted bucketBy(8, custkey) with
    broadcast disabled, and the join plans with NO Exchange on either
    input (asserted in-query via the physical plan). The oracle is the
    plain SQL join + integer aggregate — bucketing must change the
    plan, never the values. Tables are EXTERNAL (explicit /tmp paths)
    so the session catalog never writes into the repo."""
    import tempfile

    from swarm_spark.plans.bucketing import (
        assert_exchange_free_join, colocated_join)

    root = tempfile.mkdtemp(prefix="bktjoin_wh_")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .withColumnRenamed("c_custkey", "o_custkey")
    spark.sql("CREATE DATABASE IF NOT EXISTS bj_oracle")
    for name, df in (("orders_b", orders), ("cust_b", cust)):
        (df.write.mode("overwrite").format("parquet")
           .option("path", f"{root}/{name}")
           .bucketBy(8, "o_custkey").sortBy("o_custkey")
           .saveAsTable(f"bj_oracle.{name}"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "bj_oracle.orders_b", "bj_oracle.cust_b",
                           "o_custkey")
        assert_exchange_free_join(j)
        return j.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_ok"),
            F.min("o_orderkey").alias("min_ok"),
            F.max("o_orderkey").alias("max_ok"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over events: six rules (two designed
    to FAIL on this corpus — the 'error' event_type and >100 values)
    so pass and violation counting are both value-verified. All row
    rules ride ONE single-pass aggregate; referential is one anti-join
    count against customer keys."""
    from swarm_spark.operators.expectations import validate

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return validate(
        ev,
        [
            ("not_null", "event_id"),
            ("unique", ["event_id"]),
            ("accepted_values", "event_type", ["view", "click", "signup", "purchase"]),
            ("range", "value", 0.0, 100.0),
            ("matches", "event_type", "^[a-z]+$"),
            ("referential", "user_id", cust, "c_custkey"),
        ],
    )


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a PERSISTED icepack postings index (built,
    token-clustered, then queried with read(prune=[("token","in",
    terms)]) so only the files holding the query terms are opened) —
    must hash-match the fresh bm25 computation, so it shares bm25's
    oracle verbatim."""
    import tempfile

    from swarm_spark.operators.retrieval import bm25_from_index, build_search_index
    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = IcepackCatalog(tempfile.mkdtemp(prefix="bm25idx_wh_")).table("postings")
    build_search_index(docs, t)
    return bm25_from_index(spark, t, BM25_QUERIES, k=10)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (3 iterations, d=0.85) over the
    customer↔supplier trade graph: lineitem⋈orders yields weighted
    (customer, supplier) edges (w = lineitems traded), symmetrized so
    mass circulates. Every rank is bigint micro-units with floor
    division, so the DuckDB oracle (same iterations unrolled as CTEs)
    reproduces all ~1.6k node ranks bit-for-bit."""
    from swarm_spark.operators.components import pagerank

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            "w",
        )
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return pagerank(edges, iterations=3, weight="w")


BM25_QUERIES = [
    ("q_hashjoin", ["hash", "join"]),
    ("q_windowed", ["window", "agg", "scan"]),
    ("q_vector", ["vector"]),
]


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over documents (engine-exact rational-idf
    scoring, integer micro-unit totals — operators/retrieval.py). The
    oracle recomputes the identical IEEE expression tree in DuckDB, so
    the top-k SET and the scores hash-match exactly."""
    from swarm_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, BM25_QUERIES, k=10)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (freq ≥ 2% of the token stream) via
    per-partition Misra–Gries candidates + broadcast exact verify —
    the shuffle moves candidate tokens only, never the stream. The
    oracle is the plain HAVING-count SQL the operator must equal."""
    from swarm_spark.operators.retrieval import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heavy_hitters(docs, phi_ppm=20_000)


def q_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style file skipping end to end (filestats.py): events
    land in an icepack table as four event_id-quartile appends (each
    data file then carries tight footer bounds), the table is read
    back with prune=[(event_id BETWEEN mid-half)] — provably-excluded
    files never enter the scan (pytest asserts 2 of 4 dirs skipped;
    here the oracle proves read(prune) ≡ plain SQL filter). Aggregates
    are order-free (counts + integer sums + min/max) so the comparison
    is exact."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mn, mx = ev.agg(F.min("event_id"), F.max("event_id")).first()
    lo = mn + (mx - mn + 1) // 4
    hi = mn + 3 * ((mx - mn + 1) // 4)
    t = IcepackCatalog(tempfile.mkdtemp(prefix="fileskip_wh_")).table("events")
    bounds = [mn, lo, mn + 2 * ((mx - mn + 1) // 4), hi, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(ev.filter((F.col("event_id") >= a) & (F.col("event_id") < b)))
    pruned = t.read(spark, prune=[("event_id", ">=", lo), ("event_id", "<", hi)])
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_id"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def q_cow_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE end to end (tablestore.delete_where):
    documents land in an icepack table as four doc_id-quartile appends
    with a derived NULLABLE quality column; a conjunctive delete
    (doc_id in the middle half AND quality < 30) then (a) rewrites
    ONLY the dirs whose file stats admit a match — the outer quartiles
    carry into the new snapshot untouched (asserted) — and (b) KEEPS
    rows whose predicate evaluates NULL, SQL DELETE semantics the
    oracle recomputes as NOT coalesce(pred, FALSE). The reference's
    BigQuery sinks are append-only (pkg/infra/bq/client.go), so this
    is the lakehouse completion of the K1 commit family, not a port:
    targeted erasure (GDPR, bad batch) that touches a sliver of a
    clustered table instead of rewriting it."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars",
        F.when(F.col("n_chars") % 7 == 0, F.lit(None).cast("bigint"))
         .otherwise(F.col("n_chars") % 100).alias("quality"),
        F.md5("text").alias("text_md5"),
    )
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    q = (mx - mn + 1) // 4
    lo, hi = mn + q, mn + 3 * q
    t = IcepackCatalog(tempfile.mkdtemp(prefix="cowdel_wh_")).table("documents")
    bounds = [mn, lo, mn + 2 * q, hi, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)))
    snap = t.delete_where(spark, [("doc_id", ">=", lo), ("doc_id", "<", hi),
                                  ("quality", "<", 30)])
    if snap["dirs_untouched"] < 2:  # outer quartiles must be stat-pruned
        raise AssertionError(f"dir pruning failed: {snap}")
    return t.read(spark).select("doc_id", "lang", "source", "n_chars",
                                "quality", "text_md5")


def q_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (tablestore.delete_where(mode='mor'), the
    Iceberg v2 delete-file shape): the cow_delete construction and THE
    SAME ORACLE, but the delete is a metadata-only dir-scoped mask —
    asserted: zero data dirs rewritten — that read() applies and
    compact() folds (asserted: post-compact read row-count and content
    hash equal the masked read, deletes list empty). One oracle, two
    DML mechanisms — cow pays the rewrite at delete time, mor at
    compaction; the erasure-queue tradeoff at 100 TB."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars",
        F.when(F.col("n_chars") % 7 == 0, F.lit(None).cast("bigint"))
         .otherwise(F.col("n_chars") % 100).alias("quality"),
        F.md5("text").alias("text_md5"),
    )
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    q = (mx - mn + 1) // 4
    lo, hi = mn + q, mn + 3 * q
    t = IcepackCatalog(tempfile.mkdtemp(prefix="mordel_wh_")).table("documents")
    bounds = [mn, lo, mn + 2 * q, hi, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)))
    before_dirs = list(t.current_snapshot()["data_dirs"])
    snap = t.delete_where(spark, [("doc_id", ">=", lo), ("doc_id", "<", hi),
                                  ("quality", "<", 30)], mode="mor")
    if snap["data_dirs"] != before_dirs or snap["op"] != "mor_delete":
        raise AssertionError(f"mor delete rewrote data: {snap}")
    if snap["dirs_affected"] > 2:  # outer quartiles must be stat-pruned
        raise AssertionError(f"dir scoping failed: {snap}")
    masked = t.read(spark)
    fp = masked.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, quality, text_md5))").alias("h")).first()
    t.compact(spark)
    if t.current_snapshot().get("deletes") != []:
        raise AssertionError("compact did not fold mor masks")
    folded = t.read(spark)
    fp2 = folded.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, quality, text_md5))").alias("h")).first()
    if (fp["n"], fp["h"]) != (fp2["n"], fp2["h"]):
        raise AssertionError(f"fold changed content: {tuple(fp)} vs {tuple(fp2)}")
    return folded.select("doc_id", "lang", "source", "n_chars",
                         "quality", "text_md5")


def q_erase_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete FILE erasure (tablestore.delete_keys, Iceberg
    v2 merge-on-read equality deletes): the per-user erasure queue at
    100 TB — the key set (here: every doc_id with n_chars % 13 == 0)
    is written ONCE as a small parquet object and anti-join-masked at
    read; no data rewrite (asserted). The oracle recomputes the same
    NOT IN over the documents view."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars")
    t = IcepackCatalog(tempfile.mkdtemp(prefix="erasek_wh_")).table("documents")
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (mn + mx) // 2
    t.append(docs.filter(F.col("doc_id") <= mid))
    t.append(docs.filter(F.col("doc_id") > mid))
    before_dirs = list(t.current_snapshot()["data_dirs"])
    keys = docs.filter(F.col("n_chars") % 13 == 0).select("doc_id")
    snap = t.delete_keys(spark, keys, ["doc_id"])
    if snap["data_dirs"] != before_dirs:
        raise AssertionError(f"equality delete rewrote data: {snap}")
    return t.read(spark).select("doc_id", "lang", "source", "n_chars")


def q_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog scan (tablestore.read_changelog, the Iceberg
    changelog-table shape): batch-1 append (doc_id ≤ mid) → mor delete
    (n_chars % 11 = 0, scoped to batch 1 by construction) → batch-2
    append. The feed attributes every row: batch-1 rows insert at
    snapshot 1, the masked rows delete at snapshot 2 (recomputed from
    the recorded predicate against pre-delete data — later appends out
    of scope), batch-2 rows insert at snapshot 3. The oracle recomputes
    the same three-way union; the retraction contract
    (inserts exceptAll deletes == read) is pinned in pytest."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars")
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (mn + mx) // 2
    t = IcepackCatalog(tempfile.mkdtemp(prefix="cdc_wh_")).table("documents")
    t.append(docs.filter(F.col("doc_id") <= mid))
    erase = docs.filter((F.col("doc_id") <= mid)
                        & (F.col("n_chars") % 11 == 0)).select("doc_id")
    t.delete_keys(spark, erase, ["doc_id"])
    t.append(docs.filter(F.col("doc_id") > mid))
    return t.read_changelog(spark, None).select(
        "doc_id", "lang", "source", "n_chars",
        "_change_type", "_commit_snapshot_id")


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level snapshot diff (tablestore.snapshot_diff), the
    recovery path when a cow rewrite breaks changelog attribution:
    append the first three doc_id quartiles → COW-delete (doc_id in
    the middle half AND n_chars < 300 — a rewrite, so read_changelog
    would raise) → append the last quartile. The diff against the
    first snapshot reports exactly the removed rows as deletes and
    the tail batch as inserts, which the oracle recomputes
    set-wise."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars")
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    q = (mx - mn + 1) // 4
    lo, hi = mn + q, mn + 3 * q
    t = IcepackCatalog(tempfile.mkdtemp(prefix="sdiff_wh_")).table("documents")
    base = docs.filter(F.col("doc_id") < hi)
    s1 = t.append(base)
    t.delete_where(spark, [("doc_id", ">=", lo), ("doc_id", "<", hi),
                           ("n_chars", "<", 300)])  # cow rewrite
    t.append(docs.filter(F.col("doc_id") >= hi))
    return t.snapshot_diff(spark, s1["snapshot_id"]).select(
        "doc_id", "lang", "source", "n_chars", "_change_type")


def q_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish gate (swarm_spark/wap.py over tablestore
    stage/publish): the documents batch is STAGED (invisible), audited
    against a fused expectation suite over the staged files, and
    published as a metadata-only adopt — then a poisoned batch
    (duplicate ids, out-of-range quality) is proven to NEVER become
    visible (AuditFailed, snapshot unchanged — asserted). The read
    after both equals the clean batch, which is what the oracle
    recomputes. The reference's per-source validation counters
    (pkg/usecase/ingest.go) made transactional at the table layer."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog
    from swarm_spark.wap import AuditFailed, write_audit_publish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars",
        (F.col("n_chars") % 100).alias("quality"))
    t = IcepackCatalog(tempfile.mkdtemp(prefix="wap_wh_")).table("documents")
    rules = [
        ("not_null", "doc_id"),
        ("unique", ["doc_id"]),
        ("range", "quality", 0, 99),
    ]
    snap = write_audit_publish(spark, t, docs, rules)
    if not all(r["passed"] for r in snap["audit"]):
        raise AssertionError("clean batch must pass the audit")
    sid = t.current_snapshot()["snapshot_id"]
    poisoned = docs.limit(50).withColumn("quality", F.lit(-1))
    try:
        write_audit_publish(spark, t, poisoned, rules)
        raise AssertionError("poisoned batch must fail the audit")
    except AuditFailed:
        pass
    if t.current_snapshot()["snapshot_id"] != sid:
        raise AssertionError("failed audit must leave the table untouched")
    return t.read(spark).select("doc_id", "lang", "source", "n_chars",
                                "quality")


def q_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE end to end (tablestore.update_where), the
    cow_delete construction with SET semantics under test: the same
    quartile-appended table + nullable quality column, then
    SET quality = quality + 1000 WHERE doc_id in the middle half AND
    quality < 30. Pins: expressions see PRE-update values, NULL
    predicates leave rows untouched, non-matching rows byte-identical,
    outer quartiles stat-pruned (asserted)."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars",
        F.when(F.col("n_chars") % 7 == 0, F.lit(None).cast("bigint"))
         .otherwise(F.col("n_chars") % 100).alias("quality"),
    )
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    q = (mx - mn + 1) // 4
    lo, hi = mn + q, mn + 3 * q
    t = IcepackCatalog(tempfile.mkdtemp(prefix="cowupd_wh_")).table("documents")
    bounds = [mn, lo, mn + 2 * q, hi, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)))
    snap = t.update_where(
        spark, [("doc_id", ">=", lo), ("doc_id", "<", hi),
                ("quality", "<", 30)],
        {"quality": F.col("quality") + 1000})
    if snap["dirs_untouched"] < 2:  # outer quartiles must be stat-pruned
        raise AssertionError(f"dir pruning failed: {snap}")
    return t.read(spark).select("doc_id", "lang", "source", "n_chars",
                                "quality")


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dir-scoped copy-on-write MERGE (tablestore.merge_upsert, the
    Iceberg/Delta MERGE INTO shape): documents land as four
    doc_id-quartile appends; the upsert batch UPDATES every 5th doc in
    the middle half (n_chars doubled+1) and INSERTS brand-new docs
    (doc_id offset past max). File stats scope the rewrite to the two
    middle quartiles — the outer quartiles carry into the new snapshot
    untouched (asserted), and the new keys match nothing so they cost
    no rewrite at all. The oracle recomputes the anti-join + union
    MERGE semantics over the same incoming set. The reference's sinks
    are append-only (pkg/infra/bq/client.go) — MERGE is the lakehouse
    completion for mutable dimension tables (latest-state profiles)."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars")
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    q = (mx - mn + 1) // 4
    lo, hi = mn + q, mn + 3 * q
    t = IcepackCatalog(tempfile.mkdtemp(prefix="merge_wh_")).table("documents")
    bounds = [mn, lo, mn + 2 * q, hi, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)))
    incoming = docs.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi) & (F.col("doc_id") % 5 == 0)
    ).withColumn("n_chars", F.col("n_chars") * 2 + 1).unionByName(
        docs.filter(F.col("doc_id") % 17 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(mx - mn + 1)))
    snap = t.merge_upsert(spark, incoming, keys=["doc_id"])
    if snap["dirs_untouched"] < 2:  # outer quartiles must be stat-pruned
        raise AssertionError(f"merge dir scoping failed: {snap}")
    if snap["rows_inserted"] <= 0 or snap["rows_matched"] <= 0:
        raise AssertionError(f"merge accounting failed: {snap}")
    return t.read(spark).select("doc_id", "lang", "source", "n_chars")


def q_meta_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT pushdown (tablestore.count_where, the
    Iceberg manifest-count shape): events land as four event_id-
    quartile appends; three range counts are answered from file stats
    plus boundary-file residual scans (asserted in-query: the full-
    range probe decides EVERY file from metadata; the mid-range probes
    scan at most half the files). The oracle recomputes the same
    counts as plain SQL — COUNT answered from the driver vs scheduled
    scan is the monitoring-query difference at 100 TB."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mn, mx = ev.agg(F.min("event_id"), F.max("event_id")).first()
    q = (mx - mn + 1) // 4
    t = IcepackCatalog(tempfile.mkdtemp(prefix="cnt_wh_")).table("events")
    bounds = [mn, mn + q, mn + 2 * q, mn + 3 * q, mx + 1]
    for a, b in zip(bounds, bounds[1:]):
        t.append(ev.filter((F.col("event_id") >= a) & (F.col("event_id") < b)))
    probes = [
        (0, [("event_id", ">=", mn)]),                              # full
        (1, [("event_id", ">=", mn + q // 2),
             ("event_id", "<", mn + 2 * q)]),                       # mid
        (2, [("event_id", ">=", mn + 3 * q), ("event_id", "<", mn + 3 * q + 7)]),
    ]
    rows = []
    for pid, preds in probes:
        rep = t.count_where(spark, preds, report=True)
        if pid == 0 and rep["residual_files"] != 0:
            raise AssertionError(f"full-range probe scanned files: {rep}")
        if rep["residual_files"] > rep["files_total"] // 2:
            raise AssertionError(f"probe {pid} barely pruned: {rep}")
        rows.append((pid, rep["count"]))
    return spark.createDataFrame(rows, "probe bigint, n bigint")


def q_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom-filter point read (tablestore.build_blooms +
    blooms.py, the parquet split-block-bloom / Iceberg-puffin shape):
    documents are STRIPED into four dirs by doc_id % 4, so every dir's
    [min,max] spans the whole key space and range stats keep at least
    one file per dir for any point probe; per-file blooms then prove
    which files the probed ids were never written to. Asserted
    in-query: the bloom'd prune keeps strictly fewer files than stats
    alone. The oracle recomputes the same IN-list over the documents
    view — the read(prune) ≡ read().filter() contract extended to
    bloom skipping. At 100 TB this is the needle-in-haystack read: one
    conversation out of billions schedules a handful of tasks."""
    import tempfile

    from swarm_spark.tablestore import IcepackCatalog

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars")
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    t = IcepackCatalog(tempfile.mkdtemp(prefix="bloom_wh_")).table("documents")
    for i in range(4):
        t.append(docs.filter(F.col("doc_id") % 4 == i))
    # probes snapped to ONE stripe (≡ 0 mod 4): they were only ever
    # written to dir 0, so blooms can prove absence in the other dirs
    raw = [mn + (k * (mx - mn)) // 7 for k in range(7)]
    ids = sorted({v - v % 4 for v in raw})
    before = t.prune_report([("doc_id", "in", ids)])
    t.build_blooms(spark, ["doc_id"])
    after = t.prune_report([("doc_id", "in", ids)])
    if not after["files_kept"] < before["files_kept"]:
        raise AssertionError(f"blooms did not prune: {before} -> {after}")
    return t.read(spark, prune=[("doc_id", "in", ids)]).select(
        "doc_id", "lang", "source", "n_chars")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_point_read": q_bloom_point_read,
    "meta_count": q_meta_count,
    "merge_upsert": q_merge_upsert,
    "cow_delete": q_cow_delete,
    "mor_delete": q_mor_delete,
    "erase_keys": q_erase_keys,
    "wap_publish": q_wap_publish,
    "changelog": q_changelog,
    "snapshot_diff": q_snapshot_diff,
    "cow_update": q_cow_update,
    "file_skip": q_file_skip,
    "bm25": q_bm25,
    "heavy_hitters": q_heavy_hitters,
    "pagerank": q_pagerank,
    "kmeans": q_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "pq_ann": q_pq_ann,
    "ann_ivf_pq": q_ann_ivf_pq,
    "scd2": q_scd2,
    "bucketed_join": q_bucketed_join,
    "bm25_indexed": q_bm25_indexed,
    "expectations": q_expectations,
    "quality_model": q_quality_model,
    "mixture": q_mixture,
    "boilerplate": q_boilerplate,
    "log_templates": q_log_templates,
    "tool_spikes": q_tool_spikes,
    "tfidf": q_tfidf,
    "funnel": q_funnel,
    "cohorts": q_cohorts,
    "incremental_dedup": q_incremental_dedup,
    "profile": q_profile,
    "span_dedup": q_span_dedup,
    "media_decode": q_media_decode,
    "media_resize": q_media_resize,
    "stratified_sample": q_stratified_sample,
    "seeded_shuffle": q_seeded_shuffle,
    "pack_sequences": q_pack_sequences,
    "pack_turns": q_pack_turns,
    "vocab": q_vocab,
    "span_scrub": q_span_scrub,
    "dedup_exact": q_dedup_exact,
    "repetition_pii": q_repetition_pii,
    "decontaminate": q_decontaminate,
    "domain_filter": q_domain_filter,
    "jaccard_pairs": q_jaccard_pairs,
    "text_stats": q_text_stats,
    "embedding_knn": q_embedding_knn,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "cosine_topk": q_cosine_topk,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_indexed": q_ann_ivf_indexed,
    "media_features": q_media_features,
    "topk_per_group": q_topk_per_group,
    "sessionize": q_sessionize,
    "tpch_q3ish": q_tpch_q3ish,
    "tpch_q5ish": q_tpch_q5ish,
    "percentiles": q_percentiles,
    "distinct_agg": q_distinct_agg,
    "set_ops": q_set_ops,
    "embedding_dups": q_embedding_dups,
    "conv_reassembly": q_conv_reassembly,
    "dedup_clusters": q_dedup_clusters,
    "rollup": q_rollup,
    "grouping_sets": q_grouping_sets,
    "pivot": q_pivot,
    "semi_anti": q_semi_anti,
    "curation": q_curation,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "grok_extract": q_grok_extract,
    "lineage": q_lineage,
    "json_ingest": q_json_ingest,
    "asof_salted": q_asof_salted,
    "dedup_minhash_keep": q_dedup_minhash_keep,
    "window_suite": q_window_suite,
    "parse_extract": q_parse_extract,
    "turn_ordering": q_turn_ordering,
    "pipeline_route": q_pipeline_route,
    "pipeline_agg_hourly": q_pipeline_agg_hourly,
    "routed_ids": q_routed_ids,
    "sink_counts": q_sink_counts,
    "tpch_q1": q_tpch_q1,
    "broadcast_join": q_broadcast_join,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full route+aggregate over sf0.001-derived transcripts."""
    return q_pipeline_agg_hourly(_utc(spark), "/root/testdata/sf0.001")


def _wrap_utc(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_utc(spark), sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _driver_order(names: list[str]) -> list[str]:
    """Rotation policy (COVERAGE.md §driver-gate): the driver verifies
    only the FIRST 50 `queries()` entries per round, and the registry
    has outgrown that cap. Order queries WITHOUT a fully-green row in
    the most recent CORRECTNESS_r*.json artifact first (canonical
    order preserved within each group), so every query earns a green
    driver row within two consecutive rounds no matter how the
    registry grows. Deterministic given the committed artifacts; falls
    back to canonical order when no artifact exists."""
    import glob
    import json as _json
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    arts = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r0*(\d+)", os.path.basename(p)).group(1)),
    )
    covered: set[str] = set()
    if arts:
        try:
            with open(arts[-1]) as fh:
                rows = _json.load(fh)
            covered = {
                k for k, v in rows.items()
                if isinstance(v, dict) and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is True
            }
        except (OSError, ValueError):
            covered = set()
    return [n for n in names if n not in covered] + \
           [n for n in names if n in covered]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _driver_order(list(QUERIES))
    return {name: _wrap_utc(QUERIES[name]) for name in order}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_T = TRANSCRIPTS_FROM_EVENTS_SQL

_PARSED = f"""
transcripts AS ({_T}),
parsed AS (
  SELECT *,
    nullif(regexp_extract(text, 'CALL tool=([a-z0-9_]+)', 1), '') AS called_tool,
    nullif(regexp_extract(text, 'CALL tool=[a-z0-9_]+ args=(\\{{[^}}]*\\}})', 1), '') AS call_args,
    nullif(regexp_extract(text, '(ERR-[0-9]{{4}})', 1), '') AS error_code,
    nullif(regexp_extract(text, 'actor:([a-z0-9_]+)', 1), '') AS actor
  FROM transcripts)
"""

_TOOL_DIM = """
tool_dim AS (
  SELECT * FROM (VALUES
    ('search','retrieval',false),('browser','retrieval',false),
    ('python','execution',true),('bash','execution',true),
    ('sql','execution',true),('calc','compute',false),
    ('mail','comms',true),('files','storage',true),
    ('purchase_svc','commerce',true),('signup_svc','identity',false),
    ('error_reporter','telemetry',false)
  ) AS t(tool, tool_family, is_privileged))
"""

_ROUTED = f"""
{_PARSED},
{_TOOL_DIM.lstrip()},
matched AS (
  SELECT p.*, b.schema_name, b.sink_table
  FROM parsed p
  JOIN (VALUES
    ('error_events','sink_errors'), ('tool_calls','sink_tools'),
    ('assistant_log','sink_assistant'), ('user_log','sink_user')
  ) AS b(schema_name, sink_table)
  ON (b.schema_name = 'error_events' AND p.error_code LIKE 'ERR-%')
   OR (b.schema_name = 'tool_calls' AND p.called_tool IS NOT NULL)
   OR (b.schema_name = 'assistant_log' AND p.role = 'assistant')
   OR (b.schema_name = 'user_log' AND p.role = 'user')),
routed AS (
  SELECT m.*, d.tool_family, d.is_privileged
  FROM matched m LEFT JOIN tool_dim d
  ON coalesce(m.called_tool, m.tool) = d.tool)
"""


# shared oracle CTE fragments for the documents operators
_DOC_TOKS = r"""
doc_toks AS (
  SELECT *,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
         length(text) AS n_chars
  FROM documents)
"""

_STOP_EN = "['the','and','of','to','in','is','that','it','was','for']"
_LANG_LISTS = {
    "en": _STOP_EN,
    "de": "['der','die','und','das','ist','von','mit','den','nicht','ein']",
    "fr": "['le','la','les','et','des','est','dans','que','une','pour']",
    "es": "['el','la','los','de','que','es','en','un','por','con']",
}


def _textstats_oracle() -> str:
    hits = ",\n         ".join(
        f"len(list_intersect(list_distinct(toks), {lst})) AS h_{lang}"
        for lang, lst in _LANG_LISTS.items()
    )
    langs = list(_LANG_LISTS)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} >= 1"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"h_{lang} > h_{other}")
            elif j > i:
                conds.append(f"h_{lang} >= h_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return rf"""
        WITH {_DOC_TOKS.strip()},
        feats AS (
          SELECT doc_id, toks, n_chars,
                 len(toks) AS n_tokens,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                 length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
                 {hits}
          FROM doc_toks),
        scored AS (
          SELECT doc_id,
                 n_tokens AS n_tokens_ws,
                 n_bpe AS n_tokens_bpe,
                 n_alpha / greatest(n_chars, 1) AS alpha_raw,
                 n_punct / greatest(n_chars, 1) AS punct_raw,
                 n_digit / greatest(n_chars, 1) AS digit_raw,
                 (n_chars - (n_tokens - 1)) / n_tokens AS mtl,
                 h_en AS stop_hits,
                 {lang_case} AS lang_pred,
                 md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
          FROM feats)
        SELECT doc_id, n_tokens_ws, n_tokens_bpe,
               round(alpha_raw, 4) AS alpha_ratio,
               round(punct_raw, 4) AS punct_ratio,
               round(0.3 * (CASE WHEN n_tokens_ws BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
                   + 0.2 * (CASE WHEN mtl BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)
                   + 0.2 * (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE 0.0 END)
                   + 0.2 * alpha_raw
                   + 0.1 * (1.0 - least(digit_raw * 4, 1.0)), 4) AS quality,
               lang_pred, fingerprint
        FROM scored
    """


_SHINGLES = r"""
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS shs
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        FROM documents))
"""

# block-scoped variant for the EXACT-path oracles (q_jaccard_pairs /
# q_dedup_clusters use doc_id < 5000 — whole corpus at sf<=0.1)
_SHINGLES_BLOCK = _SHINGLES.replace(
    "FROM documents", "FROM documents WHERE doc_id < 5000"
)


_TOKS = r"""
toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents)
"""


def _cosq_oracle(query_id: int, k: int = 10) -> str:
    """Integer-quantized signed-squared-cosine top-k (see
    similarity.cosine_topk_quantized): all arithmetic is exact 64-bit
    integer math after round(x*128), so the hash matches Spark
    bit-for-bit."""
    return f"""
        WITH qv AS (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
                    FROM embeddings WHERE vec_id = {query_id}),
        ex AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
               FROM embeddings),
        s AS (
          SELECT ex.vec_id,
            CAST(sum(CAST(round(CAST(ex.v AS DOUBLE) * 128) AS BIGINT)
                   * CAST(round(CAST(qv.v AS DOUBLE) * 128) AS BIGINT)) AS BIGINT) AS d,
            CAST(sum(CAST(round(CAST(ex.v AS DOUBLE) * 128) AS BIGINT)
                   * CAST(round(CAST(ex.v AS DOUBLE) * 128) AS BIGINT)) AS BIGINT) AS na,
            CAST(sum(CAST(round(CAST(qv.v AS DOUBLE) * 128) AS BIGINT)
                   * CAST(round(CAST(qv.v AS DOUBLE) * 128) AS BIGINT)) AS BIGINT) AS nq
          FROM ex JOIN qv ON ex.i = qv.i
          GROUP BY ex.vec_id)
        SELECT vec_id,
               CASE WHEN d >= 0 THEN 1 ELSE -1 END
                 * ((1000000 * d * d) // (na * nq)) AS score_q
        FROM s
        ORDER BY score_q DESC, vec_id
        LIMIT {k}
    """


def _simhash_oracle(max_hamming: int = 3) -> str:
    """All-pairs exact simhash on the md5w60 basis: 60 bit-majority
    aggregate terms generated programmatically (the SQL twin of
    dedup.simhash64(hash_fn='md5w60'); banding is pigeonhole-exact so
    Spark's banded set equals this all-pairs set)."""
    bit_terms = " +\n                 ".join(
        f"CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << i}::BIGINT ELSE 0::BIGINT END"
        for i in range(60)
    )
    return f"""
        WITH {_TOKS.strip()},
        tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        th AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT AS BIGINT) AS h
               FROM tok),
        sig AS (SELECT doc_id,
                 {bit_terms} AS s
                FROM th GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
    """


_SPAN_FLAG = """
toks8 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh8 AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
  FROM toks8, LATERAL (SELECT unnest(range(1, greatest(len(t)-6, 1))) AS i)),
dup8 AS (SELECT h FROM sh8 GROUP BY h HAVING count(*) >= 2),
flag8 AS (SELECT doc_id, pos FROM sh8 WHERE h IN (SELECT h FROM dup8)),
spans8 AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
         count(*) AS n_shingles
  FROM (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM flag8)
  GROUP BY doc_id, grp)
"""


def _kmeans_oracle(k: int = 8, iterations: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd's rounds as DuckDB CTEs mirroring
    operators/clustering.py: integer quantized distances (order-free
    hugeint sums), floor(double-division) centroid means, lowest-id
    tie-breaks. Empty clusters keep the previous centroid."""

    def assign(r: int) -> str:
        return f"""
            d{r} AS (
              SELECT v.vec_id, c.cid,
                     sum((v.q[t.i] - c.q[t.i]) * (v.q[t.i] - c.q[t.i])) AS dist
              FROM vecs v, c{r} c, range(1, {dim + 1}) t(i)
              GROUP BY 1, 2),
            a{r} AS (
              SELECT vec_id, cid AS cluster, dist,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, cid) AS rn
              FROM d{r})"""

    def update(r: int) -> str:
        return f"""
            u{r + 1} AS (
              SELECT a.cluster, t.i,
                     CAST(floor(CAST(sum(v.q[t.i]) AS DOUBLE)
                                / CAST(count(*) AS DOUBLE)) AS BIGINT) AS c
              FROM (SELECT vec_id, cluster FROM a{r} WHERE rn = 1) a
              JOIN vecs v USING (vec_id), range(1, {dim + 1}) t(i)
              GROUP BY 1, 2),
            c{r + 1} AS (
              SELECT cluster AS cid, list(c ORDER BY i) AS q
              FROM u{r + 1} GROUP BY 1
              UNION ALL
              SELECT cid, q FROM c{r} WHERE cid NOT IN (
                SELECT DISTINCT cluster FROM u{r + 1}))"""

    rounds = []
    for r in range(iterations):
        rounds.append(assign(r))
        rounds.append(update(r))
    rounds.append(assign(iterations))
    source = "SELECT vec_id, embedding FROM embeddings"
    return f"""
        WITH src AS ({source}),
        vecs AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
          FROM src),
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q
          FROM (SELECT vec_id, q FROM vecs ORDER BY vec_id LIMIT {k})),
        {",".join(rounds)}
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
               CAST(dist AS BIGINT) AS dist
        FROM a{iterations} WHERE rn = 1
    """


def _semdedup_oracle(k: int = 8, iterations: int = 2, dim: int = 64,
                     # same float path as semantic_dedup_keep's
                     # int(1e6·t·t) so engine and oracle share the
                     # exact integer threshold (998000 for t=0.999)
                     threshold_q: int = int(1_000_000 * 0.999 * 0.999),
                     scale: int = 128) -> str:
    """SemDeDup oracle: the unrolled kmeans CTEs (same rounds as
    _kmeans_oracle) over embeddings + offset duplicate copies, then
    the within-cluster integer signed-squared-cosine pair drop —
    mirror of operators/dedup.semantic_dedup_keep."""
    km = _kmeans_oracle(k=k, iterations=iterations, dim=dim)
    # swap the source for the duplicated corpus and retarget the final
    # select into an assignment CTE we can join against
    src = ("SELECT vec_id, embedding FROM embeddings "
           "UNION ALL SELECT vec_id + 1000000, embedding "
           "FROM embeddings WHERE vec_id < 10")
    km = km.replace("SELECT vec_id, embedding FROM embeddings", src, 1)
    head, final = km.rsplit("SELECT vec_id, CAST(cluster AS BIGINT)", 1)
    return f"""{head}
        , asg AS (
          SELECT vec_id, cluster FROM a{iterations} WHERE rn = 1),
        qv AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
          FROM src),
        n2 AS (
          SELECT vec_id, qv,
                 list_sum(list_transform(qv, x -> x * x)) AS n2
          FROM qv),
        pairs AS (
          SELECT bb.vec_id AS dropped,
                 sum(va.qv[t.i] * vb.qv[t.i]) AS d,
                 any_value(va.n2) * any_value(vb.n2) AS nn
          FROM asg aa
          JOIN asg bb ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
          JOIN n2 va ON va.vec_id = aa.vec_id
          JOIN n2 vb ON vb.vec_id = bb.vec_id,
          range(1, {dim + 1}) t(i)
          GROUP BY aa.vec_id, bb.vec_id),
        dropped AS (
          SELECT DISTINCT dropped AS vec_id FROM pairs
          WHERE (CASE WHEN d >= 0 THEN 1 ELSE -1 END)
                * ((1000000 * d * d) // nn) >= {threshold_q})
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
        FROM asg WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """


def _pq_oracle(m: int = 4, k: int = 16, iterations: int = 1,
               dim: int = 64, n_top: int = 10) -> str:
    """Product-quantization ADC oracle mirroring similarity.pq_train /
    pq_encode / pq_topk: per subspace, the SAME unrolled quantized
    Lloyd's rounds as _kmeans_oracle (suffixed CTEs over the
    list_slice'd subvectors), then codes = final argmin assignment,
    LUT = squared distances from the min-id query's subvectors to each
    codeword, ADC = sum of m lookups — all integer, hash-exact."""
    sub = dim // m

    def assign(s: int, r: int) -> str:
        return f"""
            d{r}_{s} AS (
              SELECT v.vec_id, c.cid,
                     sum((v.q[t.i] - c.q[t.i]) * (v.q[t.i] - c.q[t.i])) AS dist
              FROM vs{s} v, c{r}_{s} c, range(1, {sub + 1}) t(i)
              GROUP BY 1, 2),
            a{r}_{s} AS (
              SELECT vec_id, cid AS cluster, dist,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, cid) AS rn
              FROM d{r}_{s})"""

    def update(s: int, r: int) -> str:
        return f"""
            u{r + 1}_{s} AS (
              SELECT a.cluster, t.i,
                     CAST(floor(CAST(sum(v.q[t.i]) AS DOUBLE)
                                / CAST(count(*) AS DOUBLE)) AS BIGINT) AS c
              FROM (SELECT vec_id, cluster FROM a{r}_{s} WHERE rn = 1) a
              JOIN vs{s} v USING (vec_id), range(1, {sub + 1}) t(i)
              GROUP BY 1, 2),
            c{r + 1}_{s} AS (
              SELECT cluster AS cid, list(c ORDER BY i) AS q
              FROM u{r + 1}_{s} GROUP BY 1
              UNION ALL
              SELECT cid, q FROM c{r}_{s} WHERE cid NOT IN (
                SELECT DISTINCT cluster FROM u{r + 1}_{s}))"""

    parts = []
    for s in range(m):
        parts.append(f"""
            vs{s} AS (
              SELECT vec_id, list_slice(q, {s * sub + 1}, {(s + 1) * sub}) AS q
              FROM vecs),
            c0_{s} AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q
              FROM (SELECT vec_id, q FROM vs{s} ORDER BY vec_id LIMIT {k}))""")
        for r in range(iterations):
            parts.append(assign(s, r))
            parts.append(update(s, r))
        parts.append(assign(s, iterations))
        parts.append(f"""
            code{s} AS (
              SELECT vec_id, cluster AS c FROM a{iterations}_{s} WHERE rn = 1),
            lut{s} AS (
              SELECT c.cid,
                     sum((v.q[t.i] - c.q[t.i]) * (v.q[t.i] - c.q[t.i])) AS dist
              FROM vs{s} v, qmin, c{iterations}_{s} c, range(1, {sub + 1}) t(i)
              WHERE v.vec_id = qmin.qid
              GROUP BY c.cid)""")
    joins = " ".join(
        f"JOIN code{s} ON code{s}.vec_id = v.vec_id "
        f"JOIN lut{s} l{s} ON l{s}.cid = code{s}.c"
        for s in range(m))
    total = " + ".join(f"l{s}.dist" for s in range(m))
    return f"""
        WITH vecs AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
          FROM embeddings),
        qmin AS (SELECT min(vec_id) AS qid FROM vecs),
        {",".join(parts)}
        SELECT v.vec_id, CAST({total} AS BIGINT) AS adc
        FROM vecs v {joins}
        ORDER BY adc, v.vec_id
        LIMIT {n_top}
    """


def _pagerank_oracle(iterations: int = 3, damping_ppm: int = 850_000) -> str:
    """Unrolled PageRank iterations as CTEs — floor division (//) on
    integers matches Spark's `div` for the all-positive quantities
    involved, so ranks are bit-identical."""
    base = 1_000_000 - damping_ppm
    iters = []
    for i in range(1, iterations + 1):
        iters.append(f"""
            r{i} AS (
              SELECT n.node,
                     CAST({base} + ({damping_ppm} * coalesce(c.csum, 0)) // 1000000
                          AS BIGINT) AS rank_micro
              FROM nodes n LEFT JOIN (
                SELECT e.dst, sum((r.rank_micro * e.w) // o.out_w) AS csum
                FROM edges e
                JOIN outw o USING (src)
                JOIN r{i - 1} r ON r.node = e.src
                GROUP BY e.dst) c ON c.dst = n.node)""")
    return f"""
        WITH pairs AS (
          SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        edges AS (
          SELECT src, dst, w FROM pairs
          UNION ALL
          SELECT dst AS src, src AS dst, w FROM pairs),
        outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY 1),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
        {",".join(iters)}
        SELECT node, rank_micro FROM r{iterations}
    """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql()
    # the persisted-index path must return EXACTLY what the fresh
    # computation returns — one oracle, two implementations under test
    d["bm25_indexed"] = d["bm25"]
    # same principle for DML: merge-on-read must read identically to
    # copy-on-write for the same predicate
    d["mor_delete"] = d["cow_delete"]
    # and for ANN: the persisted, incrementally-extended IVF index must
    # answer full-probe queries exactly like the per-run pipeline
    d["ann_ivf_indexed"] = d["ann_ivf"]
    return d


def _oracle_sql() -> dict[str, str]:
    return {
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rk
              FROM documents)
            WHERE rk <= 8
        """,
        "seeded_shuffle": """
            SELECT doc_id, lang,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5('13:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) - 1 AS position
            FROM documents
        """,
        "pack_turns": f"""
            WITH transcripts AS ({_T}),
            tok AS (
              SELECT conv_id, turn_idx,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM transcripts),
            c AS (
              SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS tok_start
              FROM tok)
            SELECT conv_id, turn_idx, n_tokens, tok_start,
                   tok_start + n_tokens AS tok_end,
                   tok_start // 128 AS window_idx
            FROM c
        """,
        "pack_sequences": """
            WITH d AS (
              SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
                     md5('42:' || CAST(doc_id AS VARCHAR)) AS k
              FROM documents),
            c AS (
              SELECT doc_id, lang, n_tokens,
                     row_number() OVER w - 1 AS position,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY k, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
              FROM d WINDOW w AS (PARTITION BY lang ORDER BY k, doc_id)),
            s AS (
              SELECT *, tok_end - n_tokens AS tok_start,
                     greatest((tok_end - 1) // 256, (tok_end - n_tokens) // 256)
                       AS last_pack
              FROM c)
            SELECT lang, doc_id, position, tok_start, tok_end,
                   p AS pack_id,
                   greatest(tok_start, p * 256) AS pack_tok_start,
                   least(tok_end, (p + 1) * 256) AS pack_tok_end
            FROM s, LATERAL (SELECT unnest(range(tok_start // 256, last_pack + 1)) AS p)
        """,
        "vocab": r"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
              FROM documents)
            SELECT token, count(*) AS count, count(DISTINCT doc_id) AS doc_freq
            FROM toks WHERE token != ''
            GROUP BY token HAVING count(*) >= 5
        """,
        "media_resize": """
            WITH ids AS (SELECT doc_id AS d FROM documents
                         WHERE doc_id < 100 AND doc_id % 2 = 0),
            dims AS (SELECT d, d % 16 + 4 AS w, d % 8 + 3 AS h,
                            d % 5 + 1 AS step FROM ids),
            px AS (
              SELECT d, w, h,
                     ((((yy * h) // 4) * w + ((xx * w) // 5)) * step) % 256 AS v
              FROM dims,
                   generate_series(0, 3) AS t1(yy),
                   generate_series(0, 4) AS t2(xx)
            )
            SELECT CAST(d AS VARCHAR) AS media_id,
                   CAST(w AS INT) AS src_width, CAST(h AS INT) AS src_height,
                   1 AS n_channels,
                   avg(v) AS value_mean,
                   CAST(min(v) AS INT) AS value_min,
                   CAST(max(v) AS INT) AS value_max
            FROM px GROUP BY d, w, h
        """,
        "media_decode": """
            WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
            png AS (
              SELECT doc_id, doc_id % 16 + 4 AS w, doc_id % 8 + 3 AS h,
                     doc_id % 5 + 1 AS step
              FROM ids WHERE doc_id % 2 = 0),
            pngv AS (
              SELECT doc_id, w, h,
                     avg((i * step) % 256) AS m,
                     min((i * step) % 256) AS mn,
                     max((i * step) % 256) AS mx
              FROM png, LATERAL (SELECT unnest(range(0, w * h)) AS i)
              GROUP BY doc_id, w, h),
            wav AS (
              SELECT doc_id, doc_id % 50 + 20 AS n, doc_id % 7 + 1 AS step
              FROM ids WHERE doc_id % 2 = 1),
            wavv AS (
              SELECT doc_id, n,
                     avg((i * step) % 200 - 100) AS m,
                     min((i * step) % 200 - 100) AS mn,
                     max((i * step) % 200 - 100) AS mx
              FROM wav, LATERAL (SELECT unnest(range(0, n)) AS i)
              GROUP BY doc_id, n)
            SELECT CAST(doc_id AS VARCHAR) AS media_id, 'png' AS fmt,
                   w AS width, h AS height, 1 AS n_channels,
                   NULL AS n_samples, NULL AS framerate, NULL AS duration_ms,
                   m AS value_mean, mn AS value_min, mx AS value_max
            FROM pngv
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'wav',
                   NULL, NULL, 1, n, 8000, n * 1000 // 8000, m, mn, mx
            FROM wavv
        """,
        "span_dedup": f"""
            WITH {_SPAN_FLAG.strip()}
            SELECT doc_id, span_start, span_end, n_shingles FROM spans8
        """,
        "span_scrub": f"""
            WITH {_SPAN_FLAG.strip()},
            covered AS (
              SELECT DISTINCT doc_id, unnest(range(span_start, span_end + 1)) AS pos
              FROM spans8),
            dtoks AS (
              SELECT doc_id, i AS pos, t[i] AS tok
              FROM toks8, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)),
            kept AS (
              SELECT d.doc_id, d.pos, d.tok FROM dtoks d
              WHERE NOT EXISTS (SELECT 1 FROM covered c
                                WHERE c.doc_id = d.doc_id AND c.pos = d.pos)),
            reasm AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_tokens_kept
              FROM kept GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(r.clean_text, '') AS clean_text,
                   len(t.t) AS n_tokens,
                   len(t.t) - coalesce(r.n_tokens_kept, 0) AS n_tokens_removed
            FROM toks8 t LEFT JOIN reasm r ON t.doc_id = r.doc_id
        """,
        "minhash_pairs": rf"""
            WITH {_SHINGLES.strip()},
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   (1000000 * inter) // (na + nb - inter) AS j_q
            FROM pairs
            WHERE 10 * inter >= 8 * (na + nb - inter)
        """,
        "simhash_pairs": _simhash_oracle(3),
        "asof_salted": """
            WITH ev AS (SELECT event_id, ts, user_id % 3 AS uid, event_type
                        FROM events)
            SELECT l.uid, l.event_id, r.signup_id
            FROM ev l
            ASOF LEFT JOIN (
              SELECT uid, ts, max(event_id) AS signup_id
              FROM ev WHERE event_type = 'signup' GROUP BY uid, ts) r
              ON l.uid = r.uid AND l.ts >= r.ts
        """,
        "dedup_minhash_keep": rf"""
            WITH {_SHINGLES.strip()},
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            losers AS (
              SELECT DISTINCT id_b FROM pairs
              WHERE 10 * inter >= 8 * (na + nb - inter))
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id NOT IN (SELECT id_b FROM losers)
        """,
        "window_suite": """
            SELECT user_id, event_id,
                   lag(event_id) OVER w AS prev_event,
                   lead(event_id) OVER w AS next_event,
                   CAST(row_number() OVER w AS INT) AS rn,
                   CAST(ntile(4) OVER w AS INT) AS quartile,
                   round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 4) AS running_value,
                   round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING
                                          AND CURRENT ROW), 4) AS mavg3,
                   CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC)
                        AS INT) AS value_rank
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "json_ingest": """
            SELECT CAST(event_id AS VARCHAR) AS id,
                   ts AS "timestamp",
                   event_type AS event_name,
                   user_id AS user_name,
                   CASE WHEN event_id % 7 = 0 THEN value END AS opt_value
            FROM events
        """,
        "cosine_topk": _cosq_oracle(0, 10),
        "ann_ivf": _cosq_oracle(1, 10),
        "embedding_dups": """
            WITH u AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 10)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.999
        """,
        "media_features": """
            WITH m AS (
              SELECT CAST(doc_id AS VARCHAR) AS media_id,
                     CASE doc_id % 3 WHEN 0 THEN 'image'
                                     WHEN 1 THEN 'audio'
                                     ELSE 'video' END AS kind,
                     text
              FROM documents WHERE doc_id < 100)
            SELECT m.media_id, m.kind,
                   CAST(octet_length(encode(m.text)) AS BIGINT) AS n_bytes,
                   sha256(m.text) AS sha256,
                   CAST(f.frame_idx AS INT) AS frame_idx
            FROM m, (SELECT unnest(range(0, 3)) AS frame_idx) f
            WHERE m.kind = 'video' OR f.frame_idx = 0
        """,
        "pagerank": _pagerank_oracle(),
        "kmeans": _kmeans_oracle(),
        "semantic_dedup": _semdedup_oracle(),
        "pq_ann": _pq_oracle(),
        # IVF-PQ with a full probe ≡ PQ over the whole corpus: same
        # oracle, two implementations (the bm25_indexed pattern)
        "ann_ivf_pq": _pq_oracle(),
        "bucketed_join": """
            SELECT c_mktsegment,
                   count(*) AS n,
                   CAST(sum(o_orderkey) AS BIGINT) AS sum_ok,
                   min(o_orderkey) AS min_ok,
                   max(o_orderkey) AS max_ok
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "scd2": """
            WITH c AS (
              SELECT c_custkey AS k, c_mktsegment AS seg,
                     c_custkey % 100 AS bal
              FROM customer),
            b AS (SELECT min(c_custkey) AS mn, max(c_custkey) AS mx
                  FROM customer),
            t1 AS (SELECT CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS ts),
            t2 AS (SELECT CAST('2024-02-01 00:00:00' AS TIMESTAMP) AS ts)
            -- initial versions: changed keys (k%3=0) close at t2,
            -- everything else stays current
            SELECT k, seg, bal,
                   t1.ts AS _valid_from,
                   CASE WHEN k % 3 = 0 THEN t2.ts END AS _valid_to
            FROM c, t1, t2
            UNION ALL
            -- re-opened versions of the changed keys
            SELECT k, seg, bal + 1000 AS bal,
                   t2.ts AS _valid_from,
                   CAST(NULL AS TIMESTAMP) AS _valid_to
            FROM c, t2 WHERE k % 3 = 0
            UNION ALL
            -- fresh keys inserted at t2
            SELECT k + (b.mx - b.mn + 1) AS k, seg, bal + 5 AS bal,
                   t2.ts AS _valid_from,
                   CAST(NULL AS TIMESTAMP) AS _valid_to
            FROM c, b, t2 WHERE k % 17 = 0
        """,
        "expectations": """
            SELECT rule, target, checked, violations,
                   violations = 0 AS passed
            FROM (
              SELECT 'not_null' AS rule, 'event_id' AS target,
                     CAST(count(*) AS BIGINT) AS checked,
                     CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS violations
              FROM events
              UNION ALL
              SELECT 'unique', 'event_id',
                     CAST(count(event_id) AS BIGINT),
                     CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT)
              FROM events
              UNION ALL
              SELECT 'accepted_values', 'event_type',
                     CAST(count(event_type) AS BIGINT),
                     CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type
                                   NOT IN ('view','click','signup','purchase')
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM events
              UNION ALL
              SELECT 'range', 'value',
                     CAST(count(value) AS BIGINT),
                     CAST(sum(CASE WHEN value IS NOT NULL
                                   AND (value < 0.0 OR value > 100.0)
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM events
              UNION ALL
              SELECT 'matches', 'event_type',
                     CAST(count(event_type) AS BIGINT),
                     CAST(sum(CASE WHEN event_type IS NOT NULL
                                   AND NOT regexp_matches(event_type, '^[a-z]+$')
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM events
              UNION ALL
              SELECT 'referential', 'user_id',
                     CAST(count(e.user_id) AS BIGINT),
                     CAST(sum(CASE WHEN e.user_id IS NOT NULL
                                   AND c.c_custkey IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM events e LEFT JOIN (
                SELECT DISTINCT c_custkey FROM customer) c
                ON e.user_id = c.c_custkey)
            ORDER BY rule, target
        """,
        "bm25": f"""
            WITH dl AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dl
              FROM documents),
            corpus AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
              FROM documents),
            qterms AS (SELECT * FROM (VALUES {", ".join(f"('{qid}','{t}')" for qid, ts in BM25_QUERIES for t in sorted(set(ts)))}) AS q(query_id, token)),
            tf AS (
              SELECT doc_id, token, count(*) AS tf FROM toks
              WHERE token <> '' AND token IN ({", ".join(f"'{t}'" for t in sorted({t for _, ts in BM25_QUERIES for t in ts}))})
              GROUP BY 1, 2),
            dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                CAST(floor(
                  ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                  * (CAST(tf AS DOUBLE) * 2.2
                     / (CAST(tf AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                 / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                  * 1000000.0) AS BIGINT) AS term_micro
              FROM tf
              JOIN dfreq USING (token)
              JOIN qterms q USING (token)
              JOIN dl USING (doc_id), corpus),
            per_doc AS (
              SELECT query_id, doc_id,
                     CAST(sum(term_micro) AS BIGINT) AS score_micro,
                     CAST(count(*) AS BIGINT) AS n_terms_hit
              FROM scored GROUP BY 1, 2),
            ranked AS (
              SELECT *, row_number() OVER (
                       ORDER BY query_id, score_micro DESC, doc_id) AS _rn,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id) AS rank
              FROM per_doc)
            SELECT query_id, doc_id, score_micro, n_terms_hit,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "heavy_hitters": r"""
            WITH toks AS (
              SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
              FROM documents),
            t AS (SELECT token FROM toks WHERE token <> ''),
            tot AS (SELECT count(*) AS n FROM t)
            SELECT token, CAST(count(*) AS BIGINT) AS count
            FROM t, tot
            GROUP BY token, n
            HAVING count(*) * 1000000 >= 20000 * n
        """,
        "meta_count": """
            WITH b AS (
              SELECT min(event_id) AS mn, max(event_id) AS mx,
                     (max(event_id) - min(event_id) + 1) // 4 AS q
              FROM events)
            SELECT CAST(0 AS BIGINT) AS probe, count(*) AS n
            FROM events, b WHERE event_id >= b.mn
            UNION ALL
            SELECT CAST(1 AS BIGINT) AS probe, count(*) AS n
            FROM events, b
            WHERE event_id >= b.mn + b.q // 2 AND event_id < b.mn + 2 * b.q
            UNION ALL
            SELECT CAST(2 AS BIGINT) AS probe, count(*) AS n
            FROM events, b
            WHERE event_id >= b.mn + 3 * b.q AND event_id < b.mn + 3 * b.q + 7
        """,
        "bloom_point_read": """
            WITH b AS (
              SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
            raw AS (
              SELECT b.mn + (t.k * (b.mx - b.mn)) // 7 AS v
              FROM b, (VALUES (0),(1),(2),(3),(4),(5),(6)) AS t(k)),
            probes AS (SELECT v - v % 4 AS pid FROM raw)
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE doc_id IN (SELECT pid FROM probes)
        """,
        "merge_upsert": """
            WITH b AS (
              SELECT min(doc_id) AS mn, max(doc_id) AS mx,
                     (max(doc_id) - min(doc_id) + 1) // 4 AS q
              FROM documents),
            inc AS (
              SELECT doc_id, lang, source, n_chars * 2 + 1 AS n_chars
              FROM documents, b
              WHERE doc_id >= b.mn + b.q AND doc_id < b.mn + 3 * b.q
                AND doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + (b.mx - b.mn + 1) AS doc_id,
                     lang, source, n_chars
              FROM documents, b
              WHERE doc_id % 17 = 0)
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM inc)
            UNION ALL
            SELECT doc_id, lang, source, n_chars FROM inc
        """,
        "cow_delete": """
            WITH d AS (
              SELECT doc_id, lang, source, n_chars,
                     CASE WHEN n_chars % 7 = 0 THEN NULL
                          ELSE n_chars % 100 END AS quality,
                     md5(text) AS text_md5
              FROM documents),
            b AS (
              SELECT min(doc_id) AS mn,
                     (max(doc_id) - min(doc_id) + 1) // 4 AS q
              FROM documents)
            SELECT doc_id, lang, source, n_chars, quality, text_md5
            FROM d, b
            WHERE NOT coalesce(
              doc_id >= b.mn + b.q AND doc_id < b.mn + 3 * b.q
              AND quality < 30, FALSE)
        """,
        "changelog": """
            WITH b AS (
              SELECT (min(doc_id) + max(doc_id)) // 2 AS mid FROM documents)
            SELECT doc_id, lang, source, n_chars,
                   'insert' AS _change_type,
                   CAST(CASE WHEN doc_id <= b.mid THEN 1 ELSE 3 END AS BIGINT)
                     AS _commit_snapshot_id
            FROM documents, b
            UNION ALL
            SELECT doc_id, lang, source, n_chars,
                   'delete' AS _change_type,
                   CAST(2 AS BIGINT) AS _commit_snapshot_id
            FROM documents, b
            WHERE doc_id <= b.mid AND n_chars % 11 = 0
        """,
        "snapshot_diff": """
            WITH b AS (
              SELECT min(doc_id) AS mn,
                     (max(doc_id) - min(doc_id) + 1) // 4 AS q
              FROM documents)
            SELECT doc_id, lang, source, n_chars,
                   'delete' AS _change_type
            FROM documents, b
            WHERE doc_id >= b.mn + b.q AND doc_id < b.mn + 3 * b.q
              AND n_chars < 300
            UNION ALL
            SELECT doc_id, lang, source, n_chars,
                   'insert' AS _change_type
            FROM documents, b
            WHERE doc_id >= b.mn + 3 * b.q
        """,
        "wap_publish": """
            SELECT doc_id, lang, source, n_chars,
                   n_chars % 100 AS quality
            FROM documents
        """,
        "erase_keys": """
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE doc_id NOT IN (
              SELECT doc_id FROM documents WHERE n_chars % 13 = 0)
        """,
        "cow_update": """
            WITH d AS (
              SELECT doc_id, lang, source, n_chars,
                     CASE WHEN n_chars % 7 = 0 THEN NULL
                          ELSE n_chars % 100 END AS quality
              FROM documents),
            b AS (
              SELECT min(doc_id) AS mn,
                     (max(doc_id) - min(doc_id) + 1) // 4 AS q
              FROM documents)
            SELECT doc_id, lang, source, n_chars,
                   CASE WHEN coalesce(
                          doc_id >= b.mn + b.q AND doc_id < b.mn + 3 * b.q
                          AND quality < 30, FALSE)
                        THEN quality + 1000 ELSE quality END AS quality
            FROM d, b
        """,
        "file_skip": """
            WITH b AS (
              SELECT min(event_id) AS mn,
                     (max(event_id) - min(event_id) + 1) // 4 AS q
              FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(event_id) AS BIGINT) AS sum_id,
                   min(user_id) AS min_user, max(user_id) AS max_user,
                   min(ts) AS min_ts, max(ts) AS max_ts
            FROM events, b
            WHERE event_id >= b.mn + b.q AND event_id < b.mn + 3 * b.q
            GROUP BY event_type
        """,
        "lineage": f"""
            WITH {_ROUTED.lstrip()}
            SELECT sink, CAST(1 AS BIGINT) AS snapshot_id,
                   added_rows, added_rows AS row_count,
                   CASE sink WHEN 'sink_errors' THEN 'hour'
                             WHEN '_audit' THEN 'month'
                             WHEN '_agg_hourly' THEN ''
                             ELSE 'day' END AS partition_unit
            FROM (
              SELECT sink_table AS sink, CAST(count(*) AS BIGINT) AS added_rows
              FROM routed GROUP BY 1
              UNION ALL
              SELECT '_agg_hourly', CAST(count(*) AS BIGINT) FROM (
                SELECT DISTINCT sink_table, role, coalesce(called_tool, tool),
                       date_trunc('hour', ts)
                FROM routed)
              UNION ALL
              SELECT '_audit', CAST(1 AS BIGINT))
        """,
        "dedup_exact": r"""
            WITH h AS (
              SELECT doc_id, lang, source,
                     row_number() OVER (
                       PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       ORDER BY doc_id) AS rn
              FROM documents)
            SELECT doc_id, lang, source FROM h WHERE rn = 1
        """,
        "repetition_pii": r"""
            WITH planted AS (
              SELECT doc_id, text,
                     text || ' reach u' || CAST(doc_id AS VARCHAR)
                          || '@example.com at 10.0.0.'
                          || CAST(doc_id % 256 AS VARCHAR)
                          || ' or +1555' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS p
              FROM documents),
            toks AS (
              SELECT doc_id, p,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM planted),
            sh AS (
              SELECT doc_id, p,
                     CASE WHEN len(t) >= 3
                       THEN list_transform(generate_series(1, len(t) - 2),
                                           i -> array_to_string(t[i:i+2], ' '))
                       ELSE [array_to_string(t, ' ')] END AS shs
              FROM toks),
            red AS (
              -- counts mirror the redaction CHAIN: each kind counted
              -- with earlier kinds already replaced (an IPv4 would
              -- otherwise also count as a phone-shaped digit run)
              SELECT doc_id, shs, p,
                     regexp_replace(p,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS r1
              FROM sh),
            red2 AS (
              SELECT doc_id, shs, p, r1,
                     regexp_replace(r1, '\b(\d{1,3}\.){3}\d{1,3}\b',
                                    '<IP>', 'g') AS r2
              FROM red)
            SELECT doc_id,
                   round((len(shs) - len(list_distinct(shs)))
                         / greatest(len(shs), 1), 4) AS rep3,
                   len(regexp_extract_all(p,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(r1,
                       '\b(\d{1,3}\.){3}\d{1,3}\b')) AS n_ip,
                   len(regexp_extract_all(r2,
                       '\+?\d[\d().-]{7,}\d')) AS n_phone,
                   md5(regexp_replace(r2,
                       '\+?\d[\d().-]{7,}\d', '<PHONE>', 'g')) AS redacted_md5
            FROM red2
        """,
        "decontaminate": r"""
            WITH sh AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 8
                       THEN list_distinct(list_transform(
                              generate_series(1, len(t) - 7),
                              i -> array_to_string(t[i:i+7], ' ')))
                       ELSE [array_to_string(t, ' ')] END AS shs
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
                    FROM documents)),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0),
            hits AS (SELECT DISTINCT doc_id FROM ex
                     WHERE s IN (SELECT s FROM bench))
            SELECT d.doc_id,
                   (d.doc_id IN (SELECT doc_id FROM hits)) AS contaminated
            FROM documents d
        """,
        "domain_filter": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                          || '.example.com/page' || CAST(doc_id AS VARCHAR) AS p
              FROM documents),
            doms AS (
              SELECT doc_id, lower(x) AS domain
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(p,
                             'https?://([A-Za-z0-9.-]+)(/[^\s]*)?', 1)) AS x
                    FROM planted)),
            block AS (
              SELECT DISTINCT 'site' || CAST(doc_id % 20 AS VARCHAR)
                           || '.example.com' AS domain
              FROM documents WHERE doc_id % 20 < 5),
            hits AS (SELECT DISTINCT doc_id FROM doms
                     WHERE domain IN (SELECT domain FROM block))
            SELECT d.doc_id,
                   (d.doc_id IN (SELECT doc_id FROM hits)) AS blocked
            FROM documents d
        """,
        "jaccard_pairs": rf"""
            WITH {_SHINGLES_BLOCK.strip()},
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(inter / (na + nb - inter), 4) AS jaccard
            FROM pairs
            WHERE round(inter / (na + nb - inter), 4) >= 0.2
        """,
        "text_stats": _textstats_oracle(),
        "incremental_dedup": rf"""
            WITH {_SHINGLES.strip()},
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            pairs AS (
              SELECT a.doc_id AS x, b.doc_id AS y,
                     count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            f AS (
              SELECT x, y, inter, na, nb,
                     (x % 5 = 0) AS xn, (y % 5 = 0) AS yn
              FROM pairs
              WHERE 10 * inter >= 8 * (na + nb - inter)
                AND ((x % 5 = 0) OR (y % 5 = 0)))
            SELECT CASE WHEN xn THEN x ELSE y END AS id_a,
                   CASE WHEN xn THEN y ELSE x END AS id_b,
                   CASE WHEN xn AND yn THEN 'new_new' ELSE 'new_old' END AS kind,
                   (1000000 * inter) // (na + nb - inter) AS j_q
            FROM f
        """,
        "profile": """
            SELECT * FROM (
              SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                     CAST(min(doc_id) AS VARCHAR) AS min_s, CAST(max(doc_id) AS VARCHAR) AS max_s
              FROM documents
              UNION ALL
              SELECT 'text', CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     min(text), max(text) FROM documents
              UNION ALL
              SELECT 'lang', CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     min(lang), max(lang) FROM documents
              UNION ALL
              SELECT 'source', CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     min(source), max(source) FROM documents
              UNION ALL
              SELECT 'n_chars', CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
              FROM documents
            ) ORDER BY "column"
        """,
        "funnel": """
            WITH per_user AS (
              SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                min(CASE WHEN event_type = 'signup' THEN ts END) AS t2,
                min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
              FROM events GROUP BY user_id
            ),
            c AS (
              SELECT
                CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                          AND t2 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                          AND t2 IS NOT NULL AND t2 > t1
                          AND t3 IS NOT NULL AND t3 > t2 THEN 1 ELSE 0 END) AS BIGINT) AS n3
              FROM per_user
            )
            SELECT * FROM (
              SELECT 0 AS step_idx, 'view' AS step, n0 AS n_entities FROM c
              UNION ALL SELECT 1, 'click', n1 FROM c
              UNION ALL SELECT 2, 'signup', n2 FROM c
              UNION ALL SELECT 3, 'purchase', n3 FROM c
            ) ORDER BY step_idx
        """,
        "cohorts": """
            WITH first AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cohort
              FROM events GROUP BY user_id
            ),
            active AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
            )
            SELECT f.cohort,
                   CAST(datediff('day', f.cohort, a.p) / 7 AS INT) AS period_offset,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_entities
            FROM active a JOIN first f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "tfidf": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                        t -> t <> '')) AS token
              FROM documents
            ),
            tf AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY doc_id, token
            ),
            dfreq AS (
              SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY token
            ),
            nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
                     CAST(tf.tf AS DOUBLE) / dfreq.doc_freq AS score,
                     round(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / dfreq.doc_freq), 4) AS tfidf
              FROM tf JOIN dfreq USING (token) CROSS JOIN nd
            )
            SELECT doc_id, token, tf, doc_freq, score, tfidf,
                   CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, token ASC) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 3
            ORDER BY doc_id, rank
        """,
        "log_templates": "WITH transcripts AS (" + _T + r"""),
            sk AS (
              SELECT regexp_replace(text, '\S*\d\S*', '<*>', 'g') AS template, text
              FROM transcripts
            )
            SELECT template, CAST(count(*) AS BIGINT) AS n_lines,
                   min(text) AS example
            FROM sk GROUP BY template ORDER BY template
        """,
        "tool_spikes": f"""
            WITH transcripts AS ({_T}),
            c AS (
              SELECT tool AS key, date_trunc('hour', ts) AS hour,
                     CAST(count(*) AS BIGINT) AS n
              FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2
            ),
            w AS (
              SELECT key, hour, n,
                CAST(coalesce(sum(n) OVER (PARTITION BY key ORDER BY hour
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail_sum,
                CAST(count(n) OVER (PARTITION BY key ORDER BY hour
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail_cnt
              FROM c
            )
            SELECT key, hour, n, trail_sum, trail_cnt,
                   (trail_cnt >= 3 AND n * trail_cnt > 2 * trail_sum) AS is_spike
            FROM w ORDER BY key, hour
        """,
        "boilerplate": f"""
            WITH transcripts AS ({_T}),
            planted AS (
              SELECT conv_id, turn_idx,
                CASE WHEN turn_idx = 0
                       THEN 'canned system prompt ' || right(conv_id, 1)
                     WHEN role = 'user' AND turn_idx = 5 THEN 'thanks'
                     ELSE text END AS text
              FROM transcripts
            ),
            bp AS (
              SELECT text, count(DISTINCT conv_id) AS n
              FROM planted GROUP BY text
              HAVING count(DISTINCT conv_id) >= 5
            )
            SELECT p.conv_id, p.turn_idx,
                   bp.n IS NOT NULL AS is_boilerplate,
                   CAST(coalesce(bp.n, 0) AS BIGINT) AS bp_convs
            FROM planted p LEFT JOIN bp ON p.text = bp.text
            ORDER BY p.conv_id, p.turn_idx
        """,
        "mixture": """
            WITH p AS (
              SELECT doc_id, lang,
                CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1 WHEN 'fr' THEN 0
                          WHEN 'es' THEN 1 WHEN 'zh' THEN 0 ELSE 1 END AS base,
                CASE lang WHEN 'en' THEN 2251799813685248 WHEN 'de' THEN 0
                          WHEN 'fr' THEN 1125899906842624
                          WHEN 'es' THEN 2251799813685248 WHEN 'zh' THEN 0
                          ELSE 0 END AS thr,
                CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
                     AS BIGINT) AS u52
              FROM documents
            ),
            n AS (
              SELECT doc_id, lang,
                     base + CASE WHEN u52 < thr THEN 1 ELSE 0 END AS n_copies
              FROM p
            )
            SELECT doc_id, lang, CAST(unnest(range(n_copies)) AS INT) AS copy_idx
            FROM n WHERE n_copies > 0
            ORDER BY doc_id, copy_idx
        """,
        "quality_model": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                        t -> t <> '')) AS t
              FROM documents
            ),
            b AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(t), 1, 8))::UBIGINT % 1024 AS BIGINT) AS bucket
              FROM tok
            ),
            sc AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(((bucket * 2654435761 + 7) % 2001) - 1000) AS BIGINT) AS logit_milli
              FROM b GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(sc.n_tokens, 0) AS n_tokens,
                   coalesce(sc.logit_milli, 0) AS logit_milli,
                   coalesce(sc.logit_milli, 0) > 0 AS keep
            FROM documents d LEFT JOIN sc USING (doc_id)
            ORDER BY d.doc_id
        """,
        "embedding_knn": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            ex AS (SELECT vec_id, unnest(embedding) AS v,
                          generate_subscripts(embedding, 1) AS i FROM embeddings),
            eq AS (SELECT unnest(qv) AS v, generate_subscripts(qv, 1) AS i FROM q)
            SELECT ex.vec_id,
                   CAST(sum(CAST(round(CAST(ex.v AS DOUBLE) * 1024) AS BIGINT)
                          * CAST(round(CAST(eq.v AS DOUBLE) * 1024) AS BIGINT)) AS BIGINT) AS dq
            FROM ex JOIN eq ON ex.i = eq.i
            GROUP BY ex.vec_id
            ORDER BY dq DESC, ex.vec_id
            LIMIT 20
        """,
        "parse_extract": f"""
            WITH {_PARSED.lstrip()}
            SELECT conv_id, turn_idx, role, tool, called_tool, call_args,
                   error_code, actor
            FROM parsed
        """,
        "grok_extract": f"""
            WITH {_PARSED.lstrip()}
            SELECT conv_id, turn_idx, role, tool, called_tool, call_args,
                   error_code, actor
            FROM parsed
        """,
        "turn_ordering": f"""
            WITH transcripts AS ({_T})
            SELECT conv_id, turn_idx,
                   CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS turn_seq,
                   lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
                   text
            FROM transcripts
        """,
        "pipeline_route": f"""
            WITH {_ROUTED.lstrip()}
            SELECT conv_id, turn_idx, role, schema_name, sink_table,
                   called_tool, error_code, actor, tool_family
            FROM routed
        """,
        "pipeline_agg_hourly": f"""
            WITH {_ROUTED.lstrip()}
            SELECT sink_table AS sink, role,
                   coalesce(called_tool, tool) AS tool,
                   date_trunc('hour', ts) AS hour,
                   count(*) AS n
            FROM routed
            GROUP BY 1, 2, 3, 4
        """,
        "routed_ids": f"""
            WITH transcripts AS ({_T})
            SELECT conv_id, turn_idx,
                   md5(concat('{{"conv_id":"', conv_id,
                              '","turn_idx":', CAST(turn_idx AS VARCHAR),
                              ',"role":"', role, '"}}')) AS row_id
            FROM transcripts
        """,
        "sink_counts": f"""
            WITH {_ROUTED.lstrip()}
            SELECT sink_table AS sink, count(*) AS log_count
            FROM routed GROUP BY 1
        """,
        "topk_per_group": """
            WITH j AS (
              SELECT n_name, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY n_name
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey)
            SELECT n_name, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
            FROM j WHERE rk <= 3
        """,
        "sessionize": """
            WITH s AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            sess AS (
              SELECT user_id, event_id,
                     CAST(sum(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_idx
              FROM s)
            SELECT user_id, session_idx,
                   count(*) AS n_events,
                   min(event_id) AS first_event,
                   max(event_id) AS last_event
            FROM sess GROUP BY 1, 2
        """,
        "tpch_q3ish": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "tpch_q5ish": """
            SELECT n_name,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "asof_join": """
            SELECT l.user_id, l.event_id, r.event_id AS signup_id
            FROM events l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT l.user_id, l.event_id AS click_id, r.event_id AS purchase_id
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id
             AND l.value >= r.value AND l.value < r.value + 50.0
        """,
        "conv_reassembly": f"""
            WITH transcripts AS ({_T})
            SELECT conv_id,
                   count(*) AS n_turns,
                   md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS conv_text_md5
            FROM transcripts GROUP BY conv_id
        """,
        "dedup_clusters": rf"""
            WITH {_SHINGLES_BLOCK.strip()},
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            p0 AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b FROM p0
              WHERE round(inter / (na + nb - inter), 4) >= 0.2),
            und AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
            rec AS (
              WITH RECURSIVE reach(a, b) AS (
                SELECT a, b FROM und
                UNION
                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
              SELECT * FROM reach)
            SELECT a AS node, least(a, min(b)) AS component
            FROM rec GROUP BY a
        """,
        "set_ops": """
            SELECT 'both' AS setop, o_custkey FROM (
              SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
              INTERSECT
              SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
            UNION ALL
            SELECT 'only_1997' AS setop, o_custkey FROM (
              SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
              EXCEPT
              SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        """,
        "percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
                   round(min(l_extendedprice), 4) AS lo,
                   round(max(l_extendedprice), 4) AS hi
            FROM lineitem GROUP BY l_returnflag
        """,
        "distinct_agg": """
            SELECT l_linestatus,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_linestatus
        """,
        "rollup": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   count(*) AS n,
                   CAST(grouping(l_returnflag) AS INT) AS g_rf,
                   CAST(grouping(l_linestatus) AS INT) AS g_ls
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "grouping_sets": """
            SELECT event_type, user_id % 10 AS bucket,
                   count(*) AS n,
                   CAST(sum(event_id) AS BIGINT) AS sum_id,
                   CAST(grouping(event_type) AS INT) AS g_t,
                   CAST(grouping(user_id % 10) AS INT) AS g_b
            FROM events
            GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """,
        "pivot": """
            SELECT l_returnflag,
                   sum(l_quantity) FILTER (l_linestatus = 'O') AS qty_open,
                   sum(l_quantity) FILTER (l_linestatus = 'F') AS qty_filled
            FROM lineitem GROUP BY l_returnflag
        """,
        "semi_anti": """
            SELECT n_name,
                   count(*) FILTER (has_o) AS n_with,
                   count(*) FILTER (NOT has_o) AS n_without
            FROM (
              SELECT c_nationkey,
                     EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
              FROM customer) c
            JOIN nation ON n_nationkey = c_nationkey
            GROUP BY n_name
        """,
        "curation": r"""
            WITH survivors AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                  ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1),
            toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
              FROM survivors),
            sh AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(t) >= 3
                       THEN list_transform(generate_series(1, len(t) - 2),
                                           i -> array_to_string(t[i:i+2], ' '))
                       ELSE [array_to_string(t, ' ')] END) AS shs
              FROM toks),
            ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
            losers AS (
              SELECT DISTINCT b.doc_id
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.n, b.n
              HAVING count(*) * 10 >= (a.n + b.n - count(*)) * 8),
            kept AS (
              SELECT s.* FROM survivors s
              WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)),
            feats AS (
              SELECT doc_id, lang, text,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
              FROM kept),
            scored AS (
              SELECT doc_id, lang,
                     round(0.3 * (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
                         + 0.2 * (CASE WHEN (n_chars - (len(toks) - 1)) / len(toks) BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)
                         + 0.2 * (CASE WHEN len(list_intersect(list_distinct(toks),
                             ['the','and','of','to','in','is','that','it','was','for'])) >= 2 THEN 1.0 ELSE 0.0 END)
                         + 0.2 * (n_alpha / greatest(n_chars, 1))
                         + 0.1 * (1.0 - least(n_digit / greatest(n_chars, 1) * 4, 1.0)), 4) AS quality
              FROM feats)
            SELECT doc_id, lang, quality FROM scored WHERE quality >= 0.4
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   avg(l_quantity) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "broadcast_join": """
            SELECT n_name, count(*) AS n_orders, sum(o_totalprice) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }
