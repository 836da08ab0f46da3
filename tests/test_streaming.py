"""Structured Streaming correctness via batch-equivalence: the stream
(availableNow over the static fixture) must produce exactly the batch
twin's rows. DuckDB can't oracle a stream; the batch twin is
oracle-checked in test_oracle_parity, closing the loop."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from vector_db_setup_spark import queries as q
from vector_db_setup_spark.streaming.events import (
    run_to_memory,
    sessionized_stream,
    streaming_dedup,
    tumbling_counts_stream,
)
from vector_db_setup_spark.streaming.sources import open_event_stream


def stream_events(spark, sf_dir, max_files_per_trigger=None):
    """Every stream==batch equivalence test routes through the source
    FACTORY with the file transport (VERDICT r5 item 3): the factory
    is the production config surface, the file source is the test
    transport, and the operators under test are transport-agnostic —
    so what these tests certify carries to a kafka config unchanged."""
    opts = {"path": sf_dir}
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = max_files_per_trigger
    return open_event_stream(spark, {"format": "file", "options": opts})


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    stream = tumbling_counts_stream(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "t_tumble", mode="complete")
    got = _sorted_rows(spark.table("t_tumble"))
    want = _sorted_rows(q.events_tumbling(spark, SF_SMOKE))
    assert got == want


def test_session_stream_equals_batch(spark):
    stream = sessionized_stream(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "t_sess", mode="complete")
    got = _sorted_rows(spark.table("t_sess"))
    batch = q.events_session_window(spark, SF_SMOKE)
    # batch twin aggregates per (user, session); stream groups the same
    want = sorted(
        (r["session_start"], r["session_end"], r["user_id"], r["n_events"])
        for r in batch.collect()
    )
    assert got == want


def test_streaming_dedup_bounds(spark):
    events = stream_events(spark, SF_SMOKE)
    deduped = streaming_dedup(events)
    run_to_memory(deduped, "t_dedup", mode="append")
    n = spark.table("t_dedup").count()
    distinct_keys = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    # at least one row per live key, never more than the input
    assert distinct_keys <= n <= total


def test_stateful_running_totals(spark):
    from pyspark.sql import functions as F

    from vector_db_setup_spark.streaming.events import running_user_totals

    stream = running_user_totals(stream_events(spark, SF_SMOKE))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user == batch totals
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table("t_state").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch}
    assert got == want


def test_sliding_stream_equals_batch(spark):
    from vector_db_setup_spark.streaming.events import sliding_counts_stream

    stream = sliding_counts_stream(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "t_slide", mode="complete")
    got = _sorted_rows(spark.table("t_slide"))
    want = sorted(
        (r["window_start"], r["event_type"], r["n"])
        for r in q.events_sliding(spark, SF_SMOKE).collect()
    )
    assert got == want


def test_checkpointed_file_sink_exactly_once(spark, tmp_path):
    """Durability story: append a deduped stream to parquet with a
    checkpoint; re-running the same query over unchanged input must add
    ZERO new rows (offsets committed, nothing reprocessed)."""
    dest = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        s = streaming_dedup(stream_events(spark, SF_SMOKE))
        q = (
            s.writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(dest).count()
    run_once()
    n2 = spark.read.parquet(dest).count()
    assert n1 > 0 and n2 == n1, f"reprocessed rows: {n2 - n1}"


def test_enriched_stream_equals_batch(spark):
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import enriched_counts_stream

    dim = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    stream = enriched_counts_stream(stream_events(spark, SF_SMOKE), dim)
    run_to_memory(stream, "t_enriched", mode="complete")
    got = _sorted_rows(spark.table("t_enriched"))
    want = _sorted_rows(q.events_enriched_tumbling(spark, SF_SMOKE))
    assert got == want


def test_knn_stream_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.knn import batch_knn_join
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import knn_stream_to_parquet

    corpus = load_table(spark, SF_SMOKE, "embeddings")

    def to_queries(df):
        return df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    stream_src = (
        spark.readStream.schema(
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").schema
        )
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(SF_SMOKE)
    )
    out = str(tmp_path / "knn_out")
    q = knn_stream_to_parquet(to_queries(stream_src), corpus, out, k=5)
    q.awaitTermination()

    got = sorted(
        (r["query_id"], r["vec_id"], round(r["distance"], 6))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["query_id"], r["vec_id"], round(r["distance"], 6))
        for r in batch_knn_join(to_queries(corpus), corpus, k=5).collect()
    )
    assert got == want and len(got) == 15


def test_stream_stream_interval_join_equals_batch(spark):
    """Stream-stream attribution join (purchases x prior clicks within
    the horizon) must emit exactly the batch interval join's pairs."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.streaming.events import (
        click_purchase_stream_join,
    )

    ev = stream_events(spark, SF_SMOKE)
    out = click_purchase_stream_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon_seconds=3600,
    )
    run_to_memory(out, "t_ssjoin", mode="append")
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.table("t_ssjoin").collect()
    )

    from vector_db_setup_spark.sources.registry import load_table

    batch = load_table(spark, SF_SMOKE, "events")
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in p.join(c, "user_id")
        .filter(
            (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 3600 SECONDS"))
            & (F.col("click_ts") < F.col("purchase_ts"))
        )
        .collect()
    )
    assert len(want) > 0
    assert got == want


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming corpus ingestion must admit exactly the documents the
    batch band-key logic admits: docs colliding with the static corpus
    index (including every corpus doc itself) are rejected, and within
    the arriving batch only the min-id member of each band-key group
    survives (intra-stream twins admit exactly one)."""
    from vector_db_setup_spark.operators.dedup import minhash_band_keys
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        incremental_dedup_stream,
        stream_documents,
    )

    corpus = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 300")
    out = str(tmp_path / "fresh_docs")
    q = incremental_dedup_stream(
        stream_documents(spark, SF_SMOKE), corpus, out
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    all_docs = load_table(spark, SF_SMOKE, "documents")
    keys = minhash_band_keys(all_docs)
    corpus_keys = minhash_band_keys(corpus).select("band", "band_key").distinct()
    from pyspark.sql import functions as F

    dup_prior = (
        keys.join(corpus_keys, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    key_min = keys.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("__min_id")
    )
    dup_intra = (
        keys.join(key_min, ["band", "band_key"])
        .filter(F.col("doc_id") > F.col("__min_id"))
        .select("doc_id")
        .distinct()
    )
    want = {
        r["doc_id"]
        for r in all_docs.join(
            dup_prior.union(dup_intra).distinct(), "doc_id", "left_anti"
        ).collect()
    }
    assert got == want
    # corpus docs always collide with their own index entries
    assert all(d >= 300 for d in got)


def test_incremental_dedup_rejects_cross_batch_twins(spark, tmp_path):
    """A near-duplicate arriving in a LATER trigger than its twin must be
    rejected via the admitted-keys side table: stream the originals as
    batch 0 and exact-text twins as batch 1 (maxFilesPerTrigger=1); no
    twin pair may survive with both members."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import incremental_dedup_stream

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter("doc_id < 0")  # empty static corpus
    base = docs.filter("doc_id >= 300 and doc_id < 320").select("doc_id", "text")
    twins = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(base.toPandas()), str(src / "f1.parquet")
    )
    pq.write_table(
        pa.Table.from_pandas(twins.toPandas()), str(src / "f2.parquet")
    )
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    q = incremental_dedup_stream(stream, corpus, out)
    q.awaitTermination()
    # maxFilesPerTrigger=1 → the twins arrived in a separate, later batch
    assert len(q.recentProgress) >= 2, "expected two micro-batches"
    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert any(i < 100000 for i in ids)  # some originals admitted
    for i in ids:
        if i >= 100000:
            assert i - 100000 not in ids, f"both twins {i-100000},{i} admitted"


def test_incremental_dedup_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch replays a micro-batch after failure; the per-batch
    dynamic partition overwrite must make the replay a no-op instead of
    appending duplicates."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.dedup import minhash_band_keys
    from vector_db_setup_spark.sources.registry import load_table

    corpus = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 100")
    batch = load_table(spark, SF_SMOKE, "documents").filter(
        "doc_id >= 100 and doc_id < 200"
    )
    out = str(tmp_path / "idem")
    corpus_keys = (
        minhash_band_keys(corpus).select("band", "band_key").distinct()
    )

    def ingest(batch_df, batch_id):
        keys = minhash_band_keys(batch_df)
        dup_ids = (
            keys.join(corpus_keys, ["band", "band_key"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        fresh = batch_df.join(dup_ids, "doc_id", "left_anti")
        (
            fresh.withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(out)
        )

    ingest(batch, 7)
    once = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    ingest(batch, 7)  # replay of the SAME batch id
    twice = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert len(once) > 0
    assert twice == once


def test_funnel_stream_equals_batch(spark):
    """funnel_state_stream (single-batch delivery) must reproduce the
    batch event_funnel per-user firsts exactly."""
    from pyspark.sql import Window, functions as F

    from vector_db_setup_spark.streaming.events import funnel_state_stream

    stream = funnel_state_stream(stream_events(spark, SF_SMOKE))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["view_us"], r["click_us"], r["purchase_us"])
        for r in spark.table("t_funnel").collect()
    }

    from vector_db_setup_spark.sources.registry import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id")
    us = (F.unix_micros(F.col("ts"))).alias("us")
    s1 = ev.select(
        "user_id",
        us,
        "event_type",
        F.unix_micros(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        ).alias("mv"),
    )
    s2 = s1.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") >= F.col("mv")),
                F.col("us"),
            )
        )
        .over(w)
        .alias("mc"),
    )
    s3 = s2.select(
        "user_id",
        "mv",
        "mc",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") >= F.col("mc")),
                F.col("us"),
            )
        )
        .over(w)
        .alias("mp"),
    )
    want = {
        r["user_id"]: (r["mv"], r["mc"], r["mp"])
        for r in s3.groupBy("user_id")
        .agg(
            F.first("mv").alias("mv"),
            F.first("mc").alias("mc"),
            F.first("mp").alias("mp"),
        )
        .collect()
    }
    assert got == want


def test_funnel_stream_tie_break_same_instant(spark, tmp_path):
    """A click at the SAME timestamp as the first view (and a purchase
    at the same timestamp as that click) must qualify — the batch
    query's ts >= mv predicate is order-independent, so the stream's
    in-batch processing order must put view before click before
    purchase at equal ts."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.streaming.events import funnel_state_stream

    t0 = "2024-01-01 00:00:00"
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0, 7, "view", 1.0, "{}"),
        (3, t0, 7, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        funnel_state_stream(stream)
        .writeStream.format("memory")
        .queryName("t_funnel_tie")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table("t_funnel_tie").collect()[-1]
    assert row["view_us"] is not None
    assert row["click_us"] == row["view_us"]
    assert row["purchase_us"] == row["click_us"]


def test_continuous_rollup_equals_batch_and_replay_idempotent(spark, tmp_path):
    """Hypertable-style continuous aggregate: (1) streaming the events
    fixture into the rollup and merging on read must equal the batch
    groupBy; (2) re-delivering a batch (same batch_id) must not change
    the rollup; (3) compaction preserves the merged view exactly."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        compact_rollup,
        continuous_rollup_stream,
        read_rollup,
        rollup_merge_batch,
    )

    path = str(tmp_path / "rollup")
    q = continuous_rollup_stream(stream_events(spark, SF_SMOKE), path)
    q.awaitTermination()

    def merged():
        return sorted(
            (
                str(r["bucket_start"]),
                r["event_type"],
                r["n"],
                round(r["total_value"], 6),
            )
            for r in read_rollup(spark, path).collect()
        )

    ev = load_table(spark, SF_SMOKE, "events")
    want = sorted(
        (
            str(r["bucket_start"]),
            r["event_type"],
            r["n"],
            round(r["total_value"], 6),
        )
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
        .collect()
    )
    first = merged()
    assert first == want

    # replay: re-deliver HALF the events as batch 0 again — the rollup
    # must overwrite, not double-count, and re-merging the FULL fixture
    # as batch 0 must restore the exact original state
    rollup_merge_batch(ev.limit(100), 0, path)
    assert read_rollup(spark, path).count() <= len(first)
    rollup_merge_batch(ev, 0, path)
    assert merged() == want

    # live-stream fencing: folding with keep_batches_from leaves the
    # still-replayable batch's partition intact, so a redelivery after
    # compaction is STILL idempotent
    compact_rollup(spark, path, keep_batches_from=0)
    assert merged() == want
    rollup_merge_batch(ev, 0, path)
    assert merged() == want

    compact_rollup(spark, path)
    assert merged() == want
    batches = (
        spark.read.parquet(path).select("_batch").distinct().collect()
    )
    assert [r["_batch"] for r in batches] == [-1]


def test_compact_rollup_rescues_batch_committed_mid_compaction(
    spark, tmp_path, monkeypatch
):
    """The ADVICE r4 race: a live stream commits a new batch AFTER
    compact_rollup snapshots the partition list but BEFORE the
    directory swap. The old code deleted that batch with the backup
    directory (silent loss — the stream checkpoint already marked it
    committed). The fix pins every read to the snapshot and moves
    late-arriving partitions out of the backup before deleting it.

    The race is made deterministic by wrapping shutil.move: the first
    move (live dir -> backup) first commits batch 2, exactly the
    worst-case interleaving."""
    import shutil

    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        compact_rollup,
        read_rollup,
        rollup_merge_batch,
    )

    path = str(tmp_path / "rollup")
    ev = load_table(spark, SF_SMOKE, "events")
    b0, b1 = ev.filter(F.col("event_id") % 3 == 0), ev.filter(
        F.col("event_id") % 3 == 1
    )
    b2 = ev.filter(F.col("event_id") % 3 == 2)
    rollup_merge_batch(b0, 0, path)
    rollup_merge_batch(b1, 1, path)

    real_move = shutil.move
    fired = {}

    def racing_move(srcp, dstp, *a, **kw):
        if not fired and str(srcp).rstrip("/") == path:
            fired["yes"] = True
            rollup_merge_batch(b2, 2, path)  # live stream commits NOW
        return real_move(srcp, dstp, *a, **kw)

    monkeypatch.setattr(shutil, "move", racing_move)
    compact_rollup(spark, path)
    monkeypatch.undo()
    assert fired, "race injection never fired — test is vacuous"

    def merged(p):
        return sorted(
            (
                str(r["bucket_start"]),
                r["event_type"],
                r["n"],
                round(r["total_value"], 6),
            )
            for r in read_rollup(spark, p).collect()
        )

    # ground truth: all three batches, no compaction involved
    plain = str(tmp_path / "rollup_plain")
    for i, b in enumerate((b0, b1, b2)):
        rollup_merge_batch(b, i, plain)
    assert merged(path) == merged(plain)  # no loss, no double count

    # the rescued batch kept its OWN partition key, so redelivery is
    # still idempotent after the compaction that raced with it
    rollup_merge_batch(b2, 2, path)
    assert merged(path) == merged(plain)
    got = {
        r["_batch"]
        for r in spark.read.parquet(path).select("_batch").distinct().collect()
    }
    assert got == {-1, 2}


def test_hot_tokens_stream_merges_exactly_to_batch(spark, tmp_path):
    """Continuous heavy hitters: per-batch CMS partials merged on read
    must equal the single full-corpus sketch EXACTLY (CMS is a
    distributive aggregate — tables sum), and a replayed batch must
    overwrite its own partial, not double-count."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        cms_merge_batch,
        hot_tokens_stream,
        read_hot_tokens,
        stream_documents,
    )

    terms = ["data", "model", "the", "absent-token"]
    path = str(tmp_path / "cms")

    # stream the fixture (single file -> one batch) through the sink
    q = hot_tokens_stream(stream_documents(spark, SF_SMOKE), path)
    q.awaitTermination()

    # then split the same corpus into two MORE partials by hand — the
    # merged view must equal ONE sketch over everything (stream batch 0
    # + manual batches 1 and 2 = corpus twice... so compare against a
    # doubled corpus built the same way)
    docs = load_table(spark, SF_SMOKE, "documents")
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    cms_merge_batch(h1, 1, path)
    cms_merge_batch(h2, 2, path)

    got = {
        r["token"]: r["est_count"]
        for r in read_hot_tokens(spark, path, terms).collect()
    }

    from pyspark.sql.functions import count_min_sketch

    from vector_db_setup_spark.functions.sketch import read_count_min_sketch

    from vector_db_setup_spark.functions.text import tokens

    doubled = docs.union(docs)
    raw = bytes(
        doubled.select(F.explode(tokens("text")).alias("w"))
        .agg(
            count_min_sketch(
                F.col("w"), F.lit(0.001), F.lit(0.99), F.lit(42)
            ).alias("sk")
        )
        .collect()[0]["sk"]
    )
    want_cms = read_count_min_sketch(raw)
    want = {t: want_cms.estimate_string(t) for t in terms}
    assert got == want, (got, want)

    # replay: re-deliver batch 1 — estimates must be unchanged
    cms_merge_batch(h1, 1, path)
    got2 = {
        r["token"]: r["est_count"]
        for r in read_hot_tokens(spark, path, terms).collect()
    }
    assert got2 == got


def test_ivf_append_stream_equals_batch_index_and_prunes(spark, tmp_path):
    """Streaming IVF maintenance: (1) the streamed index holds exactly
    the batch assignment (same (vec_id, cluster_id) set — frozen
    centroids make assignment deterministic); (2) ivf_search over the
    streamed index returns the same rows as over the batch assignment;
    (3) probes still prune on the cluster_id partition level despite
    the extra _batch sub-partition; (4) a replayed batch rewrites its
    own sub-partitions, not duplicates."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.ann import (
        ivf_assign,
        ivf_search,
        kmeans_centroids,
    )
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        ivf_append_batch,
        ivf_append_stream,
        stream_embeddings,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_centroids(emb, k=8)
    path = str(tmp_path / "ivf_stream")

    q = ivf_append_stream(stream_embeddings(spark, SF_SMOKE), cents, path)
    q.awaitTermination()

    idx = spark.read.parquet(path)
    got = {(r["vec_id"], r["cluster_id"]) for r in idx.collect()}
    want = {
        (r["vec_id"], r["cluster_id"])
        for r in ivf_assign(emb, cents).collect()
    }
    assert got == want

    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    res_stream = [
        (r["vec_id"], round(r["distance"], 6))
        for r in ivf_search(idx, cents, qv, k=5, id_col="vec_id").collect()
    ]
    res_batch = [
        (r["vec_id"], round(r["distance"], 6))
        for r in ivf_search(
            ivf_assign(emb, cents), cents, qv, k=5, id_col="vec_id"
        ).collect()
    ]
    assert res_stream == res_batch

    one = idx.filter("cluster_id = 0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cluster_id" in plan

    # replay batch 0: exactly-once (dynamic overwrite of its own
    # sub-partitions), no duplicate vec_ids
    ivf_append_batch(emb, 0, cents, path)
    idx2 = spark.read.parquet(path)
    assert idx2.count() == len(want)
    assert idx2.select("vec_id").distinct().count() == len(want)


def test_benchmark_filter_stream_equals_batch_build(spark, tmp_path):
    """Continuous Bloom maintenance: (1) streamed per-batch partials
    merged on read equal ONE bloom_build over all the items word-for-
    word (bitwise-OR lattice — exact, not approximate); (2) the merged
    view is directly probe-able with no false negatives; (3) a
    replayed batch overwrites its own partial (bitmap unchanged)."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.bloom import bloom_build, bloom_probe
    from vector_db_setup_spark.operators.dedup import shingle_hashes
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        benchmark_filter_stream,
        bloom_merge_batch,
        read_benchmark_filter,
        stream_documents,
    )

    path = str(tmp_path / "bloom")
    m, k = 1 << 18, 5

    # stream the fixture (single file -> one batch), then two more
    # manual partials over disjoint halves of a second doc slice
    bench = stream_documents(spark, SF_SMOKE).filter(F.col("doc_id") < 10)
    q = benchmark_filter_stream(bench, path, num_bits=m, k=k)
    q.awaitTermination()

    docs = load_table(spark, SF_SMOKE, "documents")
    extra = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    bloom_merge_batch(extra.filter(F.col("doc_id") % 2 == 0), 1, path,
                      num_bits=m, k=k)
    bloom_merge_batch(extra.filter(F.col("doc_id") % 2 == 1), 2, path,
                      num_bits=m, k=k)

    merged = read_benchmark_filter(spark, path)
    all_items = (
        shingle_hashes(docs.filter(F.col("doc_id") < 20))
        .select("s")
        .distinct()
    )
    direct = bloom_build(all_items, "s", num_bits=m, k=k)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    # probe-ability: every inserted shingle must hit
    probed = bloom_probe(all_items, "s", merged, num_bits=m, k=k)
    assert probed.filter(~F.col("maybe_member")).count() == 0

    # replay batch 1 -> partial rewritten, merged bitmap unchanged
    bloom_merge_batch(extra.filter(F.col("doc_id") % 2 == 0), 1, path,
                      num_bits=m, k=k)
    merged2 = read_benchmark_filter(spark, path)
    assert merged2.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged2).count() == 0


def test_decontamination_gate_stream_matches_batch_verdicts(spark, tmp_path):
    """Streaming contamination gate: the per-doc clean/contaminated
    split of the streamed corpus must equal the batch
    benchmark_overlap_bloom verdicts doc-for-doc, and a replayed batch
    must rewrite its own partitions (no duplicate docs)."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.operators.bloom import bloom_build
    from vector_db_setup_spark.operators.dedup import shingle_hashes
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        decontamination_gate_batch,
        decontamination_gate_stream,
        stream_documents,
    )

    m, k = 1 << 22, 5
    path = str(tmp_path / "gate")
    docs = load_table(spark, SF_SMOKE, "documents")
    bench_sh = (
        shingle_hashes(docs.filter(F.col("doc_id") < 20)).select("s").distinct()
    )
    words = bloom_build(bench_sh, "s", num_bits=m, k=k).persist()
    words.count()

    corpus = stream_documents(spark, SF_SMOKE).filter(F.col("doc_id") >= 20)
    qr = decontamination_gate_stream(corpus, words, path, num_bits=m, k=k)
    qr.awaitTermination()

    # _clean is a partition column -> read back as its directory-name
    # string; normalize to bool for the comparison
    got = {
        r["doc_id"]: str(r["_clean"]).lower() == "true"
        for r in spark.read.parquet(path).select("doc_id", "_clean").collect()
    }
    want = {
        r["doc_id"]: not r["contaminated"]
        for r in q.benchmark_overlap_bloom(spark, SF_SMOKE).collect()
    }
    assert got == want

    # replay: re-deliver the whole corpus as batch 0 — same rows, once
    decontamination_gate_batch(
        docs.filter(F.col("doc_id") >= 20), 0, words, path, num_bits=m, k=k
    )
    assert spark.read.parquet(path).count() == len(want)
    words.unpersist()


def test_compact_benchmark_filter_preserves_merged_bitmap(spark, tmp_path):
    """Bloom partial compaction: the merged filter must be word-for-word
    identical before and after folding (bitwise-OR is exact under
    folding), keep_batches_from partitions survive intact, and the
    partials table shrinks to the folded layout."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        bloom_merge_batch,
        compact_benchmark_filter,
        read_benchmark_filter,
    )

    m, k = 1 << 16, 4
    path = str(tmp_path / "bloomc")
    docs = load_table(spark, SF_SMOKE, "documents")
    for bid in range(3):
        bloom_merge_batch(
            docs.filter(F.col("doc_id") % 3 == bid), bid, path,
            num_bits=m, k=k,
        )
    before = read_benchmark_filter(spark, path).collect()

    compact_benchmark_filter(spark, path, keep_batches_from=2)
    import os

    parts = {
        d for d in os.listdir(path) if d.startswith("_batch=")
    }
    assert parts == {"_batch=-1", "_batch=2"}, parts
    mid = read_benchmark_filter(spark, path).collect()
    assert sorted(map(tuple, mid)) == sorted(map(tuple, before))

    compact_benchmark_filter(spark, path)  # full fold
    parts = {d for d in os.listdir(path) if d.startswith("_batch=")}
    assert parts == {"_batch=-1"}, parts
    after = read_benchmark_filter(spark, path).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))


def test_attribution_stream_equals_batch_query(spark):
    """attribution_state_stream (single-batch delivery) aggregated by
    campaign must equal queries.purchase_attribution exactly — same
    window order (ts, event_id), same null-touch semantics, same
    campaign -1 bucket."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.streaming.events import (
        attribution_state_stream,
    )

    stream = attribution_state_stream(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "t_attr", mode="append")
    got = {
        (r["campaign"], r["n_purchases"], r["attributed_revenue"])
        for r in spark.table("t_attr")
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("attributed_revenue"),
        )
        .collect()
    }
    want = {
        (r["campaign"], r["n_purchases"], r["attributed_revenue"])
        for r in q.queries()["purchase_attribution"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want and len(got) > 1


def test_attribution_stream_per_purchase_rows(spark):
    """Each purchase emits exactly one attributed row (event_id is the
    purchase's), and purchases with no prior touch carry campaign -1."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        attribution_state_stream,
    )

    stream = attribution_state_stream(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "t_attr2", mode="append")
    out = spark.table("t_attr2")
    ev = load_table(spark, SF_SMOKE, "events")
    n_purch = ev.filter("event_type = 'purchase'").count()
    assert out.count() == n_purch
    assert out.select("event_id").distinct().count() == n_purch
    # no-prior-touch purchases must land in -1, and the count must
    # equal the batch recompute (purchases preceding every touch)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"),
        F.get_json_object("props", "$.k").cast("int"),
    )
    want_untouched = (
        ev.select(
            "event_type",
            F.last(touch, ignorenulls=True).over(w).alias("c"),
        )
        .filter("event_type = 'purchase' AND c IS NULL")
        .count()
    )
    assert out.filter("campaign = -1").count() == want_untouched


def test_attribution_stream_ignores_late_out_of_order_touch(spark, tmp_path):
    """A touch arriving in a LATER micro-batch with an OLDER event-time
    position must not overwrite the stored newer touch (review-found:
    the state's position slots exist exactly for this guard)."""
    import datetime as dt

    from vector_db_setup_spark.streaming.events import (
        attribution_state_stream,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev_rows(*rows):
        return spark.createDataFrame(
            [
                (eid, t0 + dt.timedelta(seconds=s), 1, et, val, props)
                for (eid, s, et, val, props) in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    # batch 1: click@100s campaign 7
    ev_rows((1, 100, "click", 0.0, '{"k": 7}')).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_available():
        stream = attribution_state_stream(
            spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
        )
        (
            stream.writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_available()
    # batch 2: LATE click@50s campaign 3 (older position); batch 3:
    # purchase@150s — must credit campaign 7, not 3
    ev_rows((2, 50, "click", 0.0, '{"k": 3}')).write.mode(
        "append"
    ).parquet(src)
    ev_rows((3, 150, "purchase", 10.0, "{}")).write.mode(
        "append"
    ).parquet(src)
    run_available()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0]["campaign"] == 7 and rows[0]["value"] == 10.0


def test_quality_model_scores_stream_equals_batch(spark):
    """The learned quality filter is a pure map stage (tokenize + hash
    + dot product), so the SAME fitted model must score a stream
    row-for-row identically to batch — the streaming decontamination
    gate's model-based sibling. MLlib transform applies directly to a
    streaming DataFrame; no stateful operator involved."""
    from vector_db_setup_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        run_to_memory,
        stream_documents,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    model = train_quality_model(docs)
    want = {
        r["doc_id"]: round(r["p_keep"], 6)
        for r in score_quality(model, docs).select("doc_id", "p_keep").collect()
    }
    stream = score_quality(model, stream_documents(spark, SF_SMOKE)).select(
        "doc_id", "p_keep"
    )
    run_to_memory(stream, "qm_stream", mode="append")
    got = {
        r["doc_id"]: round(r["p_keep"], 6)
        for r in spark.table("qm_stream").collect()
    }
    assert got == want


def test_user_cardinality_stream_equals_batch_and_compacts(spark, tmp_path):
    """HLL continuous cardinality: stream partials unioned on read must
    EQUAL the one-shot batch sketch estimate (HLL++ union at equal
    precision is lossless), stay within rigorous error of the exact
    distinct count, and survive compaction unchanged."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        compact_user_cardinality,
        read_user_cardinality,
        user_cardinality_stream,
    )

    path = str(tmp_path / "card")
    q_ = user_cardinality_stream(
        stream_events(spark, SF_SMOKE, max_files_per_trigger=1), path
    )
    q_.awaitTermination()
    got = {
        r["event_type"]: r["est_users"]
        for r in read_user_cardinality(spark, path).collect()
    }
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        r["event_type"]: r["est"]
        for r in batch.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert got == want  # lossless union: EXACT equality, not approx
    exact = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in got.items():
        # lgK=12 -> relative std error ~1.04/sqrt(2^12) ≈ 1.6%; 5 sigma
        assert abs(est - exact[et]) <= max(5, 0.1 * exact[et]), (et, est, exact[et])
    compact_user_cardinality(spark, path)
    got2 = {
        r["event_type"]: r["est_users"]
        for r in read_user_cardinality(spark, path).collect()
    }
    assert got2 == got
    batches = {
        r["_batch"]
        for r in spark.read.parquet(path).select("_batch").distinct().collect()
    }
    assert batches == {-1}


def test_quota_admission_single_batch_caps_per_source(spark, tmp_path):
    """One delivery: at most cap docs admitted per source, chosen in
    ascending doc_id order (the deterministic single-batch contract)."""
    from vector_db_setup_spark.streaming.events import quota_admission_stream

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        quota_admission_stream(stream, cap=4)
        .writeStream.format("memory")
        .queryName("t_quota1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {}
    for r in spark.table("t_quota1").collect():
        got.setdefault(r["source"], []).append(r["doc_id"])
    assert set(got) == {"s0", "s1", "s2"}
    for src, ids in got.items():
        k = int(src[1])
        # the 4 smallest doc_ids of that source
        assert sorted(ids) == [k, k + 3, k + 6, k + 9]


def test_quota_admission_state_persists_across_batches(spark, tmp_path):
    """Quota counts carry across micro-batches: a source that used part
    of its quota in batch 1 admits only the remainder in batch 2."""
    from vector_db_setup_spark.streaming.events import quota_admission_stream

    path = str(tmp_path / "docs")
    # file 1: 3 docs of sA; file 2: 5 more of sA + 2 of sB
    spark.createDataFrame(
        [(i, "sA") for i in range(3)], "doc_id long, source string"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, "sA") for i in range(10, 15)] + [(100, "sB"), (101, "sB")],
        "doc_id long, source string",
    ).coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        quota_admission_stream(stream, cap=5)
        .writeStream.format("memory")
        .queryName("t_quota2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {}
    for r in spark.table("t_quota2").collect():
        got.setdefault(r["source"], []).append(r["doc_id"])
    # sA admitted 5 total across the two batches; sB all 2 (under cap)
    assert len(got["sA"]) == 5
    assert sorted(got["sB"]) == [100, 101]
    # whichever file arrived first, per-batch admissions are id-ordered
    # prefixes, so the union is {first batch's ids} + earliest of second
    assert len(set(got["sA"])) == 5
