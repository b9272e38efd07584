"""Streaming == batch equivalence (SURVEY section 5.3): each streaming
job replayed with trigger availableNow over the same files must produce
the batch formulation's exact result set (contents keyed by
(window, key) — emission order/cadence intentionally differs from the
reference's per-watermark firing, SURVEY section 7a)."""

import pytest
from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark import queries as Q
from flink_user_behavior_analysis_spark.operators import consecutive_events
from flink_user_behavior_analysis_spark.sources import load_table
from flink_user_behavior_analysis_spark.streaming import (
    cap_filter_stateful,
    consecutive_fail_stateful,
    hot_items_counts_stream,
    marketing_by_channel_stream,
    order_timeout_stateful,
    page_views_stream,
    reconcile_stateful,
    run_available_now,
    sessionize_stream,
    run_topn_foreach_batch,
    stream_events,
    tx_interval_join_stream,
    unique_visitors_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _assert_same(stream_df, batch_df, cols):
    assert _rows(stream_df, cols) == _rows(batch_df, cols)


def test_hot_items_counts_stream_equals_batch(spark, sf_dir):
    got = run_available_now(hot_items_counts_stream(spark, sf_dir))
    # batch twin: the count stage of the hot_items query
    from flink_user_behavior_analysis_spark.queries import _events, _with_item
    from flink_user_behavior_analysis_spark.operators import windowed_count

    ev = _with_item(_events(spark, sf_dir).where(F.col("event_type") == "view"))
    want = windowed_count(ev, "ts", ["item_id"], "1 hour", "15 minutes")
    _assert_same(got, want, ["window_end_us", "item_id", "cnt"])


def test_page_views_stream_equals_batch(spark, sf_dir):
    got = run_available_now(page_views_stream(spark, sf_dir))
    want = Q.QUERIES["page_views"](spark, sf_dir)
    _assert_same(got, want, ["window_end_us", "pv"])


def test_unique_visitors_stream_equals_batch(spark, sf_dir):
    got = run_available_now(unique_visitors_stream(spark, sf_dir))
    want = Q.QUERIES["unique_visitors"](spark, sf_dir)
    _assert_same(got, want, ["window_end_us", "uv"])


def test_marketing_by_channel_stream_equals_batch(spark, sf_dir):
    got = run_available_now(marketing_by_channel_stream(spark, sf_dir))
    want = Q.QUERIES["marketing_by_channel"](spark, sf_dir)
    _assert_same(got, want, ["window_end_us", "channel", "behavior", "cnt"])


def test_streaming_topn_equals_batch_hot_items(spark, sf_dir):
    counts = hot_items_counts_stream(spark, sf_dir)
    got = run_topn_foreach_batch(
        counts, 3,
        order_cols=[F.col("cnt").desc(), F.col("item_id").asc()],
    )
    want = Q.QUERIES["hot_items"](spark, sf_dir)
    _assert_same(
        got.select("window_end_us", "item_id", "cnt",
                   F.col("rnk").cast("long").alias("rnk")),
        want,
        ["window_end_us", "item_id", "cnt", "rnk"],
    )


def test_tx_interval_join_stream_equals_batch(spark, sf_dir):
    got = run_available_now(tx_interval_join_stream(spark, sf_dir), "append")
    want = Q.QUERIES["tx_interval_join"](spark, sf_dir)
    _assert_same(got, want, ["user_id", "item_id", "pay_us", "receipt_us"])


def test_consecutive_fail_stateful_equals_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir, watermark="0 seconds")
    got = run_available_now(
        consecutive_fail_stateful(ev, n=2, within_seconds=6 * 3600), "append"
    )
    want = Q.QUERIES["login_fail"](spark, sf_dir)
    _assert_same(got, want, ["user_id", "first_fail_us", "last_fail_us"])


def test_consecutive_fail_transform_with_state_equals_batch(spark, sf_dir):
    """The Spark-4 transformWithStateInPandas twin must reproduce the
    applyInPandasWithState operator's exact output (and therefore the
    batch form's) on the same bounded replay. RocksDB provider is
    required by the new API; skip cleanly if this build lacks it."""
    import pytest

    from flink_user_behavior_analysis_spark.streaming.stateful import (
        consecutive_fail_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        ev = stream_events(spark, sf_dir, watermark="0 seconds")
        try:
            got = run_available_now(
                consecutive_fail_tws(ev, n=2, within_seconds=6 * 3600),
                "append")
        except Exception as exc:  # pragma: no cover - env-dependent
            pytest.skip(f"transformWithStateInPandas unavailable: {exc}")
        want = Q.QUERIES["login_fail"](spark, sf_dir)
        _assert_same(got, want, ["user_id", "first_fail_us", "last_fail_us"])
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def test_cap_filter_stateful_equals_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir, watermark="0 seconds").withColumnRenamed(
        "event_type", "behavior"
    )
    got = run_available_now(cap_filter_stateful(ev, cap=3), "append")
    want = Q.QUERIES["blacklist_warnings"](spark, sf_dir)
    _assert_same(got, want, ["user_id", "behavior", "day", "warning_msg"])


def test_sessionize_stream_equals_batch(spark, sf_dir):
    """Native session_window streaming aggregation == the batch
    lag+cumsum sessionize on the bounded replay."""
    got = run_available_now(sessionize_stream(spark, sf_dir))
    want = Q.QUERIES["sessionize_users"](spark, sf_dir)
    _assert_same(
        got, want,
        ["user_id", "session_start_us", "session_end_us", "n_events"],
    )


def test_reconcile_stateful_equals_batch(spark, sf_dir):
    """J2 streaming twin: matched pairs are watermark-independent
    (emitted the moment the later side arrives) so the matched leg must
    equal the batch reconcile exactly; unmatched legs emit only once
    the watermark passes the deadline, so every emitted unmatched row
    must appear in the batch result (keys with deadlines beyond the
    final watermark may legitimately stay open, like a Flink job
    killed at t sees no timers past t)."""
    ev = stream_events(spark, sf_dir, watermark="0 seconds")
    ev = ev.withColumn(
        "item_id", F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    )
    got = run_available_now(
        reconcile_stateful(ev, -12 * 3600, 12 * 3600), "append"
    )
    want = Q.QUERIES["tx_match"](spark, sf_dir)
    cols = ["kind", "user_id", "item_id", "pay_us", "receipt_us"]
    got_rows = _rows(got, cols)
    want_rows = _rows(want, cols)
    assert set(got_rows) <= set(want_rows)
    got_matched = [r for r in got_rows if r[0] == "matched"]
    want_matched = [r for r in want_rows if r[0] == "matched"]
    assert got_matched == want_matched
    # unmatched rows whose deadline precedes the final watermark fired
    assert any(r[0] != "matched" for r in got_rows), (
        "no unmatched row emitted — timers never fired"
    )


def test_order_timeout_stateful_matches_batch_for_closed_keys(spark, sf_dir):
    """Event-time timers only fire while the watermark advances; keys
    whose deadline lies beyond the final watermark stay open when a
    bounded replay ends (the reference has the same property — a Flink
    job killed at t sees no timers past t). Assert: every emitted row
    matches the batch result exactly, and all immediately-decidable
    (pay-observed) keys are emitted."""
    ev = stream_events(spark, sf_dir, watermark="0 seconds")
    ev = ev.withColumn(
        "item_id", F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    )
    got = run_available_now(
        order_timeout_stateful(ev, timeout_seconds=3 * 24 * 3600), "append"
    )
    want = Q.QUERIES["order_timeout"](spark, sf_dir)
    got_rows = {
        (r.user_id, r.item_id): (r.create_us, r.pay_us, r.result_state)
        for r in got.collect()
    }
    want_rows = {
        (r.user_id, r.item_id): (r.create_us, r.pay_us, r.result_state)
        for r in want.collect()
    }
    assert got_rows, "stateful op emitted nothing"
    mismatches = {
        k: (v, want_rows.get(k)) for k, v in got_rows.items()
        if want_rows.get(k) != v
    }
    assert not mismatches, dict(list(mismatches.items())[:5])
    # all 'payed' decisions are watermark-independent -> must all emit
    payed_want = {k for k, v in want_rows.items() if v[2] == "payed"}
    payed_got = {k for k, v in got_rows.items() if v[2] == "payed"}
    assert payed_want == payed_got


def test_exact_dedup_stream_equals_batch(spark, sf_dir):
    """Streaming fingerprint dedup (complete mode) == the batch
    exact_dedup aggregation on the bounded replay."""
    from flink_user_behavior_analysis_spark.streaming import exact_dedup_stream

    got = run_available_now(exact_dedup_stream(spark, sf_dir))
    want = Q.QUERIES["dedup_exact"](spark, sf_dir)
    _assert_same(got, want, ["fingerprint", "keeper_id", "n_docs"])


def test_streaming_curation_smoke(spark, sf_dir):
    """End-to-end streaming curation (VERDICT r3 item 6): quality
    filter -> exact-dedup stream, drained; the streamed survivor set
    must equal the batch composition, and feeding those survivors
    into the incremental near-dup probe must reproduce the batch
    probe verdicts exactly (kept/dup_corpus/dup_delta)."""
    from flink_user_behavior_analysis_spark.operators.dedup import (
        dedup_incremental,
        normalized_text,
        release_signature_cache,
    )
    from flink_user_behavior_analysis_spark.operators.text import (
        quality_score_col,
    )
    from flink_user_behavior_analysis_spark.streaming import curation_stream

    got = run_available_now(curation_stream(spark, sf_dir))
    docs = load_table(spark, sf_dir, "documents")
    d1 = docs.where(quality_score_col("text") >= 0.6)
    want = (
        d1.select(F.md5(normalized_text("text")).alias("fingerprint"),
                  "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").cast("long").alias("keeper_id"),
             F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    _assert_same(got, want, ["fingerprint", "keeper_id", "n_docs"])
    assert got.count() > 0

    # stage 3: the STREAMED survivors feed the incremental probe —
    # older half as the materialized corpus, newer half as the delta
    surv = docs.join(got.select(F.col("keeper_id").alias("doc_id")),
                     "doc_id")
    cut = surv.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    res_stream = dedup_incremental(
        surv.where(F.col("doc_id") < cut),
        surv.where(F.col("doc_id") >= cut), 0.6)
    bsurv = docs.join(want.select(F.col("keeper_id").alias("doc_id")),
                      "doc_id")
    res_batch = dedup_incremental(
        bsurv.where(F.col("doc_id") < cut),
        bsurv.where(F.col("doc_id") >= cut), 0.6)
    try:
        stream_rows = _rows(res_stream,
                            ["doc_id", "status", "n_corpus_matches"])
        batch_rows = _rows(res_batch,
                           ["doc_id", "status", "n_corpus_matches"])
    finally:
        release_signature_cache()
    assert stream_rows == batch_rows
    # non-vacuous: every delta doc got a verdict and at least one kept
    assert len(stream_rows) == surv.where(F.col("doc_id") >= cut).count()
    assert any(s == "kept" for _, s, _ in stream_rows)


def test_stateless_pipeline_ops_compose_on_streams_unchanged(spark, sf_dir):
    """The DataFrame-unification property: STATELESS pipeline
    operators (text_stats, language_id, quantize_embeddings) apply to
    a streaming frame with zero code changes, and the drained result
    equals the batch run — the reason the batch operator library IS
    the streaming library for every per-row stage."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        quantize_embeddings,
    )
    from flink_user_behavior_analysis_spark.operators.text import (
        language_id,
        text_stats,
    )
    from flink_user_behavior_analysis_spark.sources import (
        file_replay_stream,
    )

    from flink_user_behavior_analysis_spark.operators.text import (
        gopher_rules,
    )

    sdocs = file_replay_stream(spark, sf_dir, "documents")
    bdocs = load_table(spark, sf_dir, "documents")
    for op, key in ((text_stats, "quality_score"),
                    (language_id, "predicted_lang"),
                    (gopher_rules, "keep")):
        got = run_available_now(op(sdocs), output_mode="append")
        want = op(bdocs)
        _assert_same(got, want, ["doc_id", key])

    sembs = file_replay_stream(spark, sf_dir, "embeddings")
    bembs = load_table(spark, sf_dir, "embeddings")
    got = run_available_now(quantize_embeddings(sembs),
                            output_mode="append")
    want = quantize_embeddings(bembs)
    _assert_same(got, want, ["vec_id", "q_sum", "q_min", "q_max"])


def test_drop_duplicates_within_watermark_bounded_state(spark, sf_dir):
    """The production bounded-state form exact_dedup_stream's docstring
    points to: dropDuplicatesWithinWatermark keeps O(watermark window)
    state instead of O(distinct keys). On the bounded replay with a
    watermark covering the full span, it must keep exactly one row per
    fingerprint — the same distinct set as the batch aggregation."""
    from flink_user_behavior_analysis_spark.operators.dedup import (
        normalized_text,
    )
    from flink_user_behavior_analysis_spark.sources import (
        file_replay_stream,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import ensure_utc

    ensure_utc(spark)
    ev = file_replay_stream(spark, sf_dir, "events")
    dd = (
        ev.select("ts", "user_id", "event_type")
        .withWatermark("ts", "10 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    got = run_available_now(dd, output_mode="append")
    want = (load_table(spark, sf_dir, "events")
            .select("user_id", "event_type").distinct())
    assert got.count() == want.count()
    assert (got.select("user_id", "event_type").distinct().count()
            == want.count())


def test_streaming_registry_names_and_builders(spark, sf_dir):
    """Every STREAMING_QUERIES entry builds an unstarted streaming
    DataFrame (isStreaming, no action run)."""
    from flink_user_behavior_analysis_spark.streaming import STREAMING_QUERIES

    assert len(STREAMING_QUERIES) >= 7
    for name, fn in STREAMING_QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.isStreaming, name


def test_cms_stream_accumulation_matches_batch(spark, sf_dir, tmp_path):
    """VERDICT r4 #6: the streaming count-min sketch (per micro-batch
    aggregate + mergeInPlace) must be equivalent to the single batch
    sketch over the same data — CMS cell updates commute and the hash
    functions are seed-determined, so estimates agree exactly and the
    assembled heavy-hitters frame equals heavy_hitters_cms."""
    from flink_user_behavior_analysis_spark.operators.sketches import (
        cms_merge_stream,
        heavy_hitters_cms,
        heavy_hitters_from_sketch,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "item_id",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long"),
    ).where(F.col("item_id").isNotNull()).select("item_id")

    # 3-file replay -> 3 micro-batches, so the merge path is exercised
    replay = str(tmp_path / "cms_replay")
    ev.repartition(3).write.parquet(replay)
    sdf = (spark.readStream.schema(ev.schema)
           .option("maxFilesPerTrigger", "1").parquet(replay))

    cms, n = cms_merge_stream(sdf, "item_id")
    assert n == ev.count()

    batch = heavy_hitters_cms(ev, "item_id", k=10)
    exact_top = (
        ev.groupBy("item_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item_id").asc())
        .limit(10)
    )
    streamed = heavy_hitters_from_sketch(spark, cms, n, exact_top,
                                         "item_id")
    cols = ["item_id", "cnt", "rnk", "est_ok"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert all(r.est_ok == 1 for r in streamed.collect())


def test_error_spike_scoring_composes_on_streamed_counts(spark, sf_dir):
    """error_spikes' production streaming form: the hourly error
    count runs as a streaming aggregation (bounded replay), and the
    scoring stage (median/MAD over the window-granular counts table)
    applies to the drained counts — equal to the batch operator end
    to end."""
    from flink_user_behavior_analysis_spark.operators.funnel import (
        error_spikes,
        score_window_counts,
    )
    from flink_user_behavior_analysis_spark.operators.windows import (
        windowed_agg,
    )
    from flink_user_behavior_analysis_spark.sources import (
        file_replay_stream,
    )

    sev = file_replay_stream(spark, sf_dir, "events")
    counts = windowed_agg(
        sev.where(F.col("event_type") == "error"), "ts", [], "1 hour",
        None, [F.count(F.lit(1)).cast("long").alias("n_errors")],
    )
    drained = run_available_now(counts, output_mode="complete")
    got = score_window_counts(drained)
    want = error_spikes(load_table(spark, sf_dir, "events"), "1 hour")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(got) == key(want)


def test_funnel_composes_on_streamed_step_events(spark, sf_dir):
    """VERDICT r5 #6: the funnel's streaming form — distinct step
    events maintained as stream-dedup state, the k-row funnel
    re-aggregated from the drained table — equals the batch operator
    end to end (first-touch semantics are a function of the distinct
    step-event set, which the stream preserves exactly)."""
    from flink_user_behavior_analysis_spark.operators.funnel import (
        funnel,
    )
    from flink_user_behavior_analysis_spark.queries import (
        FUNNEL_STEPS,
        FUNNEL_WITHIN,
    )
    from flink_user_behavior_analysis_spark.streaming import (
        funnel_step_events_stream,
    )

    drained = run_available_now(
        funnel_step_events_stream(spark, sf_dir, FUNNEL_STEPS),
        output_mode="append")
    got = funnel(drained, list(FUNNEL_STEPS), FUNNEL_WITHIN,
                 type_col="event_type")
    want = funnel(load_table(spark, sf_dir, "events"),
                  list(FUNNEL_STEPS), FUNNEL_WITHIN)
    cols = ["step_idx", "step", "n_users", "conversion"]
    assert _rows(got, cols) == _rows(want, cols)


def test_retention_composes_on_streamed_user_weeks(spark, sf_dir):
    """VERDICT r5 #6: weekly cohort retention's streaming form — the
    distinct (user, week) sufficient statistic as stream-dedup
    state, retention_from_user_weeks over the drained pairs —
    equals the batch operator end to end."""
    from flink_user_behavior_analysis_spark.operators.funnel import (
        retention_cohorts,
        retention_from_user_weeks,
    )
    from flink_user_behavior_analysis_spark.queries import (
        RETENTION_MAX_WEEKS,
    )
    from flink_user_behavior_analysis_spark.streaming import (
        user_week_stream,
    )

    drained = run_available_now(user_week_stream(spark, sf_dir),
                                output_mode="append")
    got = retention_from_user_weeks(drained, RETENTION_MAX_WEEKS)
    want = retention_cohorts(load_table(spark, sf_dir, "events"),
                             max_weeks=RETENTION_MAX_WEEKS)
    cols = ["cohort_week", "week_offset", "n_active", "cohort_size",
            "retention"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dau_composes_on_streamed_user_days(spark, sf_dir):
    """DAU/WAU/stickiness streaming form: distinct (user, day) pairs
    as stream-dedup state, the day-grain report re-aggregated from
    the drained pairs — equals the batch query end to end."""
    from flink_user_behavior_analysis_spark.operators.funnel import (
        dau_stickiness_from_user_days,
    )
    from flink_user_behavior_analysis_spark.streaming import (
        user_day_stream,
    )

    drained = run_available_now(user_day_stream(spark, sf_dir),
                                output_mode="append")
    got = dau_stickiness_from_user_days(drained)
    want = Q.QUERIES["dau_stickiness"](spark, sf_dir)
    cols = ["day", "dau", "wau", "stickiness"]
    assert _rows(got, cols) == _rows(want, cols)


def test_span_ingest_loop_with_additive_count_updates(spark, sf_dir,
                                                      tmp_path):
    """Production streaming-ingest shape for substring dedup: docs
    arrive in micro-batches; each batch probes the ACCUMULATED
    span-count artifact and then merges its own counts in (counts
    are additive — union counts = sum of counts). Per-batch output
    must equal duplicated_spans_incremental(prefix-corpus, batch):
    flag-at-arrival semantics, corpus side never re-fingerprinted."""
    from flink_user_behavior_analysis_spark.operators.chunking import (
        duplicated_spans_incremental,
        span_fp_counts,
    )
    from flink_user_behavior_analysis_spark.operators.sampling import (
        hash_uniform,
    )

    K = 8
    docs = load_table(spark, sf_dir, "documents")
    u = hash_uniform("doc_id", "ingest")
    batches = [docs.where(u < 0.4),
               docs.where((u >= 0.4) & (u < 0.7)),
               docs.where(u >= 0.7)]

    counts_dir = str(tmp_path / "span_counts")
    # seed: empty counts table
    empty = spark.createDataFrame([], "fp string, n_corpus long")
    empty.write.parquet(counts_dir)

    def read_counts():
        return spark.read.parquet(counts_dir)

    got_rows = []
    for batch in batches:
        counts = read_counts()
        out = duplicated_spans_incremental(
            None, batch, K, corpus_counts=counts)
        got_rows.extend(map(tuple, out.collect()))
        merged = (
            counts.unionByName(span_fp_counts(batch, K))
            .groupBy("fp")
            .agg(F.sum("n_corpus").cast("long").alias("n_corpus"))
        )
        # rewrite the artifact (a real pipeline would MERGE INTO)
        merged_rows = merged.collect()
        spark.createDataFrame(merged_rows, merged.schema) \
            .write.mode("overwrite").parquet(counts_dir)

    want_rows = []
    prefix = None
    for batch in batches:
        if prefix is None:
            base = batch.limit(0)
        else:
            base = prefix
        want = duplicated_spans_incremental(base, batch, K)
        want_rows.extend(map(tuple, want.collect()))
        prefix = base.unionByName(batch)

    assert sorted(got_rows) == sorted(want_rows)


def test_props_topk_composes_on_streamed_counts(spark, sf_dir):
    """props_topk's streaming form: the (event_type, k) counts run as
    an unbounded streaming aggregation; the top-5 rank over the
    drained counts equals the batch query end to end."""
    from pyspark.sql import Window

    from flink_user_behavior_analysis_spark.streaming import (
        props_counts_stream,
    )

    drained = run_available_now(props_counts_stream(spark, sf_dir))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("k").asc())
    got = (
        drained.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("event_type", "k", "n",
                F.col("rnk").cast("long").alias("rnk"))
    )
    want = Q.QUERIES["props_topk"](spark, sf_dir)
    cols = ["event_type", "k", "n", "rnk"]
    assert _rows(got, cols) == _rows(want, cols)


def test_semdedup_drift_stream_equals_batch(spark, sf_dir):
    """The drift monitor's streaming state (per-cell count +
    integer micro-unit cosine sum) drains to exactly the batch
    aggregation, and composing the drained stats with the stored
    corpus reproduces the inline drift report row-for-row —
    additivity is what lets the monitor run always-on with one
    state row per cell."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        _semdedup_assigned,
        semdedup_batch_stats,
        semdedup_drift,
        semdedup_drift_from_stats,
        semdedup_store_corpus,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        _embs,
        _semdedup_centroid_path,
        _semdedup_read_centroids,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        run_available_now,
        semdedup_drift_stream,
    )

    cents = _semdedup_read_centroids(_semdedup_centroid_path())
    embs = _embs(spark, sf_dir)

    streamed = run_available_now(
        semdedup_drift_stream(spark, sf_dir, cents),
        output_mode="complete")
    batch_stats = semdedup_batch_stats(
        _semdedup_assigned(embs, cents, "vec_id", "embedding"))
    assert sorted(map(tuple, streamed.collect())) == \
        sorted(map(tuple, batch_stats.collect()))

    prefix = "t_semdd_drift_stream"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")
    semdedup_store_corpus(embs, cents, prefix)
    composed = semdedup_drift_from_stats(spark, prefix, streamed)
    inline = semdedup_drift(spark, prefix, embs, cents)
    assert sorted(map(tuple, composed.collect())) == \
        sorted(map(tuple, inline.collect()))
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")


def test_semdedup_ingest_loop_exactly_once_appends(spark, sf_dir):
    """The full incremental-SemDeDup lifecycle as the foreachBatch
    ingest shape: each arriving micro-batch probes the ACCUMULATED
    corpus, keeps the survivors, and appends them under
    batch_id=epoch — Spark's canonical idempotent-sink pattern
    (epoch_id-keyed writes). Then one epoch is RE-DELIVERED (the
    at-least-once retry) and the corpus must be unchanged. Per-batch
    statuses equal references probed against explicitly stored
    snapshot corpora."""
    from flink_user_behavior_analysis_spark.operators.sampling import (
        hash_uniform,
    )
    from flink_user_behavior_analysis_spark.operators.similarity import (
        semdedup_append_corpus,
        semdedup_probe,
        semdedup_store_corpus,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        SEMDEDUP_EPS,
        _embs,
        _semdedup_read_centroids_or_fit,
    )

    def _cleanup(pfx):
        for t in spark.catalog.listTables():
            if t.name.startswith(pfx):
                spark.sql(f"DROP TABLE {t.name}")

    cents = _semdedup_read_centroids_or_fit(spark)
    embs = _embs(spark, sf_dir).select("vec_id", "embedding")
    u = hash_uniform("vec_id", "semdd_loop")
    corpus0 = embs.where(u < 0.4)
    epochs = [embs.where((u >= 0.4) & (u < 0.7)),
              embs.where(u >= 0.7)]

    prefix = "t_semdd_loop"
    _cleanup(prefix)
    semdedup_store_corpus(corpus0, cents, prefix)

    got, kept_frames = [], []
    for i, batch in enumerate(epochs):
        marked = semdedup_probe(spark, prefix, batch, cents,
                                SEMDEDUP_EPS)
        rows = marked.collect()  # materialize BEFORE the append
        got.append(sorted((r.vec_id, r.status) for r in rows))
        kept_ids = [r.vec_id for r in rows if r.status == "kept"]
        keepers = batch.where(F.col("vec_id").isin(kept_ids))
        kept_frames.append(keepers)
        assert semdedup_append_corpus(spark, prefix, keepers, cents,
                                      batch_id=f"e{i}") == len(kept_ids)

    # at-least-once retry: epoch e0 re-delivered after commit — no-op
    n_total = spark.table(f"{prefix}_cells").count()
    assert semdedup_append_corpus(spark, prefix, kept_frames[0], cents,
                                  batch_id="e0") == 0
    assert spark.table(f"{prefix}_cells").count() == n_total

    # references: probe each epoch against an explicitly stored
    # snapshot of (corpus0 + prior keepers)
    snap = corpus0
    for i, batch in enumerate(epochs):
        ref_pfx = f"t_semdd_snap{i}"
        _cleanup(ref_pfx)
        semdedup_store_corpus(snap, cents, ref_pfx)
        want = sorted(
            (r.vec_id, r.status)
            for r in semdedup_probe(spark, ref_pfx, batch, cents,
                                    SEMDEDUP_EPS).collect())
        assert got[i] == want, f"epoch {i} diverged from snapshot ref"
        snap = snap.unionByName(kept_frames[i])
        _cleanup(ref_pfx)
    _cleanup(prefix)


def test_semdedup_assign_stream_equals_batch(spark, sf_dir):
    """Streaming cluster routing == batch assignment, row for row:
    the SemDeDup argmax projection is stateless, so replaying the
    embeddings as a stream (append mode, availableNow) must assign
    every vector to the same cell with the same cent_sim as the
    batch operator."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        semdedup_assign,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        _embs,
        _semdedup_centroid_path,
        _semdedup_read_centroids,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        run_available_now,
        semdedup_assign_stream,
    )

    cents = _semdedup_read_centroids(_semdedup_centroid_path())
    streamed = run_available_now(
        semdedup_assign_stream(spark, sf_dir, cents), output_mode="append")
    batch = semdedup_assign(_embs(spark, sf_dir), cents)
    assert sorted(map(tuple, streamed.collect())) == \
        sorted(map(tuple, batch.collect()))


def test_semdedup_probe_stream_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r7 #4: the stored-corpus SemDeDup probe as a
    foreachBatch micro-batch stream — the corpus-side verdict
    (dup_corpus / n_corpus_matches) is per-row against the frozen
    cell-partitioned artifact, so draining a 3-micro-batch replay
    must equal the one-shot batch probe row-for-row."""
    from flink_user_behavior_analysis_spark.operators.sampling import (
        hash_uniform,
    )
    from flink_user_behavior_analysis_spark.operators.similarity import (
        semdedup_probe,
        semdedup_store_corpus,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        SEMDEDUP_EPS,
        _embs,
        _semdedup_read_centroids_or_fit,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        semdedup_probe_stream,
    )

    cents = _semdedup_read_centroids_or_fit(spark)
    embs = _embs(spark, sf_dir).select("vec_id", "embedding")
    u = hash_uniform("vec_id", "semdd_probe_stream")
    corpus, delta = embs.where(u < 0.6), embs.where(u >= 0.6)

    prefix = "t_semdd_probe_stream"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")
    semdedup_store_corpus(corpus, cents, prefix)

    # 3-file replay dir -> 3 micro-batches
    stage = tmp_path / "probe_replay"
    delta.repartition(3).write.parquet(str(stage / "embeddings.parquet"))

    streamed = semdedup_probe_stream(spark, str(stage), prefix,
                                     cents, SEMDEDUP_EPS)
    batch = semdedup_probe(spark, prefix, delta, cents, SEMDEDUP_EPS,
                           vs_delta=False)
    cols = ["vec_id", "status", "n_corpus_matches"]
    assert sorted(map(tuple, streamed.select(*cols).collect())) == \
        sorted(map(tuple, batch.select(*cols).collect()))
    assert streamed.count() == delta.count()
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")


def test_dsir_score_stream_equals_inline_weights(spark, sf_dir, tmp_path):
    """DSIR scoring as a foreachBatch micro-batch stream against the
    STORED raw/target LMs: weighting is stateless per document given
    the frozen artifacts, so a 3-micro-batch replay must drain to
    exactly the INLINE dsir_weights result (which refits both LMs
    from the same corpus/target) — stored+streamed ≡ inline in one
    assertion."""
    from pyspark.sql import functions as F

    from flink_user_behavior_analysis_spark.operators.text import (
        dsir_weights,
        lm_store_model,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        dsir_score_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("source").isin("src0", "src1"))
    pr, pt = "t_dsir_str_raw", "t_dsir_str_tgt"
    tables = lm_store_model(docs, pr) + lm_store_model(target, pt)

    # 3-file replay dir -> 3 micro-batches
    stage = tmp_path / "dsir_replay"
    docs.repartition(3).write.parquet(str(stage / "documents.parquet"))
    try:
        streamed = dsir_score_stream(spark, str(stage), pr, pt)
        inline = dsir_weights(docs, target)
        cols = ["doc_id", "n_bigrams", "logw"]
        assert sorted(map(tuple, streamed.select(*cols).collect())) == \
            sorted(map(tuple, inline.select(*cols).collect()))
        assert streamed.count() > 0
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_filtered_probe_stream_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r7 #4: filtered vector search over the stored IVFADC
    index as a foreachBatch micro-batch stream — per-query top-k is
    independent of every other query, so a 3-micro-batch replay of
    the query set must drain to exactly the one-shot batch search,
    and every neighbor must satisfy the pushed metadata predicate."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        ivfpq_store_index,
        ivfpq_topk_filtered_from_index,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import _embs
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        ann_filtered_probe_stream,
    )

    embs = _embs(spark, sf_dir)
    label = embs.select("label").first()[0]
    queries = embs.where(F.col("vec_id") < 12)

    prefix = "t_annf_stream"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")
    ivfpq_store_index(embs, prefix, n_centroids=8, m=4, codes=8,
                      meta_cols=["label"])

    stage = tmp_path / "annf_replay"
    queries.repartition(3).write.parquet(str(stage / "embeddings.parquet"))

    pred = F.col("label") == label
    streamed = ann_filtered_probe_stream(spark, str(stage), prefix,
                                         pred, k=3, nprobe=4)
    batch = ivfpq_topk_filtered_from_index(spark, prefix, queries, 3,
                                           pred, nprobe=4)
    assert sorted(map(tuple, streamed.collect())) == \
        sorted(map(tuple, batch.collect()))
    # predicate honored on the wire: every streamed neighbor carries
    # the filtered label in the corpus
    bad = (streamed.select(F.col("neighbor_id").alias("vec_id"))
           .join(embs.select("vec_id", "label"), "vec_id")
           .where(F.col("label") != label).count())
    assert bad == 0
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")


def test_pii_scrub_stream_equals_batch(spark, sf_dir):
    """Streaming PII redaction == batch scrub row-for-row: the scrub
    is a stateless per-row projection, so an append-mode replay must
    redact identically to the batch pass over the same documents."""
    from flink_user_behavior_analysis_spark.operators.text import (
        pii_scrub,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import _docs
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        pii_scrub_stream,
        run_available_now,
    )

    streamed = run_available_now(pii_scrub_stream(spark, sf_dir),
                                 output_mode="append")
    batch = pii_scrub(_docs(spark, sf_dir))
    cols = ["doc_id", "n_email", "n_phone", "n_ip", "scrubbed"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_media_headers_stream_equals_batch(spark, sf_dir):
    """Streaming header parse == batch parse row-for-row: building
    the PNG/JPEG payloads and parsing their headers are stateless
    per-row operations, so the append-mode replay must recover
    identical (dims, depth, channels) for every document."""
    from flink_user_behavior_analysis_spark import queries as Q
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        media_headers_stream,
        run_available_now,
    )

    streamed = run_available_now(media_headers_stream(spark, sf_dir),
                                 output_mode="append")
    batch = Q.QUERIES["multimodal_headers"](spark, sf_dir)
    cols = ["media_id", "format", "width", "height", "bit_depth",
            "channels"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0


def test_media_ahash_stream_equals_batch(spark, sf_dir):
    """Streaming perceptual-hash pass == batch pass row-for-row
    (stateless per-row Arrow map, the media_headers_stream
    contract)."""
    from flink_user_behavior_analysis_spark.operators.multimodal import (
        documents_as_ppm,
        media_ahash,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import _docs
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        media_ahash_stream,
        run_available_now,
    )

    streamed = run_available_now(media_ahash_stream(spark, sf_dir),
                                 output_mode="append")
    batch = media_ahash(documents_as_ppm(_docs(spark, sf_dir)))
    cols = ["media_id", "phash", "w", "h"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0


def test_asof_stateful_equals_batch_for_decided_lefts(spark, sf_dir):
    """Streaming as-of twin: a left (purchase) is decidable only once
    the watermark passes its timestamp, so every emitted row must
    equal the batch as-of join exactly, and only the stream's very
    tail (lefts at-or-after the final watermark) may stay open —
    the same bounded-replay property the other timer operators pin."""
    from flink_user_behavior_analysis_spark.streaming import asof_stateful

    ev = stream_events(spark, sf_dir, watermark="0 seconds")
    got = run_available_now(
        asof_stateful(ev, "purchase", "view"), "append")
    want = Q.QUERIES["purchase_asof_view"](spark, sf_dir).select(
        "user_id",
        F.col("purchase_id").alias("left_id"),
        F.col("purchase_us").alias("left_us"),
        F.col("view_id").alias("right_id"),
        F.col("view_us").alias("right_us"),
    )
    cols = ["user_id", "left_id", "left_us", "right_id", "right_us"]
    got_rows = _rows(got, cols)
    want_rows = _rows(want, cols)
    assert set(got_rows) <= set(want_rows)
    # near-total coverage: only the final-watermark tail may stay open
    assert len(got_rows) >= 0.9 * len(want_rows) > 0


def test_asof_stateful_late_right_within_delay_wins(spark, tmp_path):
    """Cross-batch lateness: a right event that arrives one micro-batch
    LATER but timestamps between the current best right and a pending
    left must become the left's match — the reason lefts buffer until
    the watermark passes them instead of matching greedily on arrival.
    Batch 1: left@100 plus rights@50 and @105 (max ts 105 -> watermark
    95 for the next batch, so left@100 stays pending). Batch 2: the
    late right@98 (admissible, 98 > 95) plus a far-future row that
    drives the final watermark past 100; the event-time timer then
    finalizes left@100 against right@98 — not @50."""
    from datetime import datetime, timezone

    from flink_user_behavior_analysis_spark.streaming import (
        asof_stateful,
        run_available_now,
    )

    def _ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(
            tzinfo=None)

    schema = "user_id long, ts timestamp, event_type string, event_id long"
    d = str(tmp_path / "asof_late")
    b1 = [(1, _ts(100), "purchase", 10),
          (1, _ts(50), "view", 20),
          (1, _ts(105), "view", 21)]
    b2 = [(1, _ts(98), "view", 22),
          (2, _ts(200), "view", 30)]
    import time as _t

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append").parquet(d)
    _t.sleep(1.2)  # distinct mtimes => deterministic file order
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(d)

    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(d)
          .withWatermark("ts", "10 seconds"))
    got = run_available_now(asof_stateful(ev, "purchase", "view"),
                            "append")
    rows = [(r.user_id, r.left_id, r.right_id, r.right_us)
            for r in got.collect()]
    assert rows == [(1, 10, 22, 98 * 1_000_000)]


def test_asof_stateful_idle_ttl_evicts_without_touching_active_keys(
        spark, tmp_path):
    """VERDICT r11 #5: idle-key TTL. Key 1 receives one right and
    then goes silent — once the watermark passes its activity horizon
    by the TTL, its state (the carried best) is evicted via the
    event-time timer, so a left that RESUMES the key later matches
    null, exactly like a brand-new key. Key 2 stays active across
    the same window (its left arrives before the horizon) and must
    match its right as if no TTL existed."""
    from datetime import datetime, timezone

    from flink_user_behavior_analysis_spark.streaming import (
        asof_stateful,
        run_available_now,
    )

    def _ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(
            tzinfo=None)

    schema = "user_id long, ts timestamp, event_type string, event_id long"
    d = str(tmp_path / "asof_ttl")
    # b1: both keys get a right @50 (max ts 50 -> wm 40 for b2)
    b1 = [(1, _ts(50), "view", 10), (2, _ts(50), "view", 20)]
    # b2: key 2's left @60 arrives while wm=40 < its TTL horizon
    # (50+20=70), so key 2 is active; the far-future row pushes the
    # watermark to 490 for b3, past key 1's horizon
    b2 = [(2, _ts(60), "purchase", 21), (3, _ts(500), "view", 30)]
    # b3: wm=490 -> key 1's TTL timer fires (idle since 50, horizon
    # 70): best evicted, state removed. key 2's decide timer fires
    # too: left@60 matches right@50 (TTL never applied — active).
    b3 = [(3, _ts(600), "view", 31)]
    # b4: key 1 RESUMES with a left @700 (> wm 590); the trailing
    # far-future row drives the final watermark past it
    b4 = [(1, _ts(700), "purchase", 11), (3, _ts(2000), "view", 32)]
    import time as _t

    for batch in (b1, b2, b3, b4):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append").parquet(d)
        _t.sleep(1.2)  # distinct mtimes => deterministic file order

    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(d)
          .withWatermark("ts", "10 seconds"))
    got = run_available_now(
        asof_stateful(ev, "purchase", "view", idle_ttl_sec=20.0),
        "append")
    rows = {(r.user_id, r.left_id): (r.right_id, r.right_us)
            for r in got.collect()}
    # active key: matched through the TTL window untouched
    assert rows[(2, 21)] == (20, 50 * 1_000_000)
    # resumed-after-TTL key: history evicted -> null match
    assert rows[(1, 11)] == (None, None)
    assert len(rows) == 2


def test_snapshot_diff_stream_equals_batch_added_changed(spark, sf_dir):
    """Streaming CDC diff twin: micro-batches of the candidate
    snapshot probe the stored fps artifact; the drained union must
    equal the batch diff's added+changed rows exactly (removed is
    batch-only by design — absence needs the complete snapshot)."""
    from flink_user_behavior_analysis_spark.operators.versioning import (
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        q_snapshot_diff,
    )
    from flink_user_behavior_analysis_spark.sources import load_table
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        snapshot_diff_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).select(
        "doc_id", "text", "source")
    prefix = "t_snapcdc"
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_fps")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_manifest")
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])

    def to_candidate(d):
        return d.where(F.col("doc_id") % 13 != 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text")).alias("text"),
            "source",
        )

    got = snapshot_diff_stream(spark, sf_dir, prefix,
                               ["doc_id"], ["text", "source"],
                               transform=to_candidate)
    want = q_snapshot_diff(spark, sf_dir).where(
        F.col("status") != "removed")
    cols = ["doc_id", "status", "old_fp", "new_fp"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_fps")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_manifest")


def test_snapshot_cdc_ingest_plus_compact_equals_one_shot_diff(
        spark, sf_dir, tmp_path):
    """VERDICT r11 #6 end-to-end: the production CDC loop — streaming
    slice probes (added/changed) + the periodic compaction that runs
    the full diff for removals and cuts the next version — must
    reproduce the one-shot snapshot diff EXACTLY, removals included,
    under the exactly-once ledger."""
    from flink_user_behavior_analysis_spark.operators.versioning import (
        fingerprint_snapshot,
        snapshot_diff,
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.queries_pipeline import (
        q_snapshot_diff,
    )
    from flink_user_behavior_analysis_spark.sources import load_table
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        run_snapshot_cdc_ingest,
        snapshot_cdc_compact,
        snapshot_cdc_ingest_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).select(
        "doc_id", "text", "source")
    candidate = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text")).alias("text"),
        "source",
    )
    prefix = "t_snapcdc2"
    for t in ("fps", "manifest", "appends"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])

    # the candidate snapshot arrives as 3 key-disjoint slices
    cand_dir = str(tmp_path / "cand")
    candidate.repartition(3).write.parquet(cand_dir)
    stream = (spark.readStream.schema(candidate.schema)
              .option("maxFilesPerTrigger", "1").parquet(cand_dir))
    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "verdicts")
    run_snapshot_cdc_ingest(stream, prefix, staging,
                            str(tmp_path / "ckpt"),
                            ["doc_id"], ["text", "source"],
                            verdict_sink=sink)

    streamed = spark.read.parquet(sink).select(
        "doc_id", "status", "old_fp", "new_fp")

    # exactly-once WITHIN the cycle: a re-delivered committed epoch is
    # a ledger hit — no re-probe, no re-stage (0 verdicts reported).
    # The default job_id derives from the staging dir's QUALIFIED URI
    # (ADVICE r12/r13) — spelling the path differently (trailing
    # slash, unqualified) must derive the SAME id, or a crash-restart
    # would replay committed epochs under fresh batch ids
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        cdc_default_job_id,
    )

    cyc1_id = cdc_default_job_id(spark, staging)
    assert cdc_default_job_id(spark, staging + "/") == cyc1_id
    assert cdc_default_job_id(spark, "file:" + staging) == cyc1_id
    assert snapshot_cdc_ingest_batch(
        spark, prefix, staging, candidate.limit(5), f"{cyc1_id}-0",
        ["doc_id"], ["text", "source"]) == 0

    removed = snapshot_cdc_compact(spark, prefix, staging, ["doc_id"])
    want = q_snapshot_diff(spark, sf_dir)
    cols = ["doc_id", "status", "old_fp", "new_fp"]
    assert _rows(streamed.unionByName(removed), cols) == _rows(want, cols)
    assert removed.count() > 0 and streamed.count() > 0

    # the compaction cut the next version: the stored fps now ARE the
    # candidate snapshot's fingerprints (content never reread)...
    assert _rows(spark.table(f"{prefix}_fps"), ["doc_id", "fp"]) == \
        _rows(fingerprint_snapshot(candidate, ["doc_id"],
                                   ["text", "source"]),
              ["doc_id", "fp"])
    # ...and the cut cleared the append ledger (ADVICE r12): the new
    # version absorbed every staged batch, so the ids are waived —
    # not quarantined — and the next cycle starts with a clean ledger
    assert not spark.catalog.tableExists(f"{prefix}_appends")
    assert not spark.catalog.tableExists(f"{prefix}_cleared")

    # CYCLE 2 (ADVICE r12 regression): rotated staging/checkpoint
    # restart epoch ids at 0 — run it under cycle 1's EXACT job_id so
    # every batch id collides with cycle 1's; before the fix the stale
    # ledger skipped every slice as a "replay" (zero verdicts, every
    # key spuriously 'removed'). The compact's ledger clear makes the
    # colliding ids fresh again.
    candidate2 = candidate.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" [rev3]")))
        .otherwise(F.col("text")).alias("text"),
        "source",
    )
    cand2_dir = str(tmp_path / "cand2")
    candidate2.repartition(3).write.parquet(cand2_dir)
    stream2 = (spark.readStream.schema(candidate2.schema)
               .option("maxFilesPerTrigger", "1").parquet(cand2_dir))
    staging2 = str(tmp_path / "staging2")
    sink2 = str(tmp_path / "verdicts2")
    run_snapshot_cdc_ingest(stream2, prefix, staging2,
                            str(tmp_path / "ckpt2"),
                            ["doc_id"], ["text", "source"],
                            verdict_sink=sink2, job_id=cyc1_id)
    streamed2 = spark.read.parquet(sink2).select(
        "doc_id", "status", "old_fp", "new_fp")
    removed2 = snapshot_cdc_compact(spark, prefix, staging2, ["doc_id"])
    want2 = snapshot_diff(candidate, candidate2, ["doc_id"],
                          ["text", "source"])
    assert _rows(streamed2.unionByName(removed2), cols) == \
        _rows(want2, cols)
    assert streamed2.count() > 0 and removed2.count() > 0
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_snapshot_cdc_compact_with_zero_removals(spark, tmp_path):
    """ADVICE r12 regression guard for the parquet-sidecar
    materialization: a cycle whose candidate covers every stored key
    has NO removals, and the compact must still round-trip the empty
    removed set through the sidecar (empty parquet write + read with
    the full schema), cut the version, and clear the ledger."""
    from flink_user_behavior_analysis_spark.operators.versioning import (
        fingerprint_snapshot,
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        snapshot_cdc_compact,
        snapshot_cdc_ingest_batch,
    )

    prefix = "t_snapcdc_zero"
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s")],
        "doc_id long, text string, source string")
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    # candidate = old + one new row: adds, changes nothing, removes
    # nothing
    cand = old.unionByName(spark.createDataFrame(
        [(3, "c", "s")], old.schema))
    staging = str(tmp_path / "staging")
    n = snapshot_cdc_ingest_batch(
        spark, prefix, staging, cand, "zr-0",
        ["doc_id"], ["text", "source"])
    assert n == 1  # the added row
    removed = snapshot_cdc_compact(spark, prefix, staging, ["doc_id"])
    assert removed.count() == 0
    assert [f.name for f in removed.schema.fields] == [
        "doc_id", "status", "old_fp", "new_fp"]
    # version cut + ledger cleared despite the empty removal set
    assert {r.doc_id for r in spark.table(f"{prefix}_fps")
            .select("doc_id").collect()} == {1, 2, 3}
    assert not spark.catalog.tableExists(f"{prefix}_appends")
    got = {tuple(r) for r in spark.table(f"{prefix}_fps").collect()}
    want = {tuple(r) for r in fingerprint_snapshot(
        cand, ["doc_id"], ["text", "source"]).collect()}
    assert got == want

    # the compact CLOSED the cycle (r13): staging another slice into
    # the same landing zone, or compacting it again, must refuse —
    # either would corrupt the next removal sweep
    import pytest

    with pytest.raises(ValueError, match="already compacted"):
        snapshot_cdc_ingest_batch(
            spark, prefix, staging, cand, "zr-1",
            ["doc_id"], ["text", "source"])
    with pytest.raises(ValueError, match="already compacted"):
        snapshot_cdc_compact(spark, prefix, staging, ["doc_id"])
    # compacting a cycle that never staged anything must refuse too
    # (it would report every stored key as removed)
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_cdc_compact(spark, prefix,
                             str(tmp_path / "nope"), ["doc_id"])
    for t in ("fps", "manifest", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_snapshot_cdc_compact_torn_state_recovery(spark, tmp_path):
    """ADVICE r13 (medium): a crash AFTER snapshot_cut_version but
    BEFORE the _compacted marker used to make the re-run recompute
    removals against the already-cut fps table (now equal to staged →
    zero removals) and overwrite the correct sidecar — losing the
    cycle's removal verdicts in exactly the recovery path the marker
    protocol exists to harden. The _cut_pending marker must make the
    re-run reuse the sidecar, finish the idempotent cut + ledger
    clear + close, and return the ORIGINAL removed set."""
    import pytest

    from flink_user_behavior_analysis_spark.operators.versioning import (
        _diff_fps,
        fingerprint_snapshot,
        snapshot_cut_version,
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        _hadoop_path_exists,
        _hadoop_touch,
        snapshot_cdc_compact,
        snapshot_cdc_ingest_batch,
    )

    prefix = "t_snapcdc_torn"
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")],
        "doc_id long, text string, source string")
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    # candidate drops doc_id=3 → exactly one removal this cycle
    cand = old.where(F.col("doc_id") != 3)
    staging = str(tmp_path / "staging")
    snapshot_cdc_ingest_batch(spark, prefix, staging, cand, "tr-0",
                              ["doc_id"], ["text", "source"])

    # simulate the compact crashing INSIDE the cut window: sidecar
    # written, _cut_pending touched, version cut — then "crash"
    # before ledger clear and _compacted (the exact torn state)
    staged = spark.read.parquet(staging).select("doc_id", "fp")
    removed_df = (_diff_fps(spark.table(f"{prefix}_fps"),
                            staged, ["doc_id"])
                  .where(F.col("status") == "removed"))
    removed_df.write.mode("overwrite").parquet(f"{staging}/_removed")
    _hadoop_touch(spark, f"{staging}/_cut_pending")
    snapshot_cut_version(spark, prefix, staged, ["doc_id"])
    # fps now EQUALS staged: a naive recompute would find 0 removals

    # the in-flight cycle is closed to new slices (staging one now
    # would be invisible to the materialized removed set)
    with pytest.raises(ValueError, match="_cut_pending"):
        snapshot_cdc_ingest_batch(spark, prefix, staging, cand, "tr-1",
                                  ["doc_id"], ["text", "source"])

    # recovery re-run: must return the ORIGINAL removed set, not the
    # empty recompute, and finish the cycle (ledger clear + close)
    removed = snapshot_cdc_compact(spark, prefix, staging, ["doc_id"])
    assert [(r.doc_id, r.status) for r in removed.collect()] == \
        [(3, "removed")]
    assert not spark.catalog.tableExists(f"{prefix}_appends")
    assert _hadoop_path_exists(spark, f"{staging}/_compacted")
    got = {tuple(r) for r in spark.table(f"{prefix}_fps").collect()}
    want = {tuple(r) for r in fingerprint_snapshot(
        cand, ["doc_id"], ["text", "source"]).collect()}
    assert got == want

    # a tampered zone (_cut_pending without the sidecar) must refuse
    staging2 = str(tmp_path / "staging2")
    snapshot_cdc_ingest_batch(spark, prefix, staging2, cand, "tr-2",
                              ["doc_id"], ["text", "source"])
    _hadoop_touch(spark, f"{staging2}/_cut_pending")
    with pytest.raises(ValueError, match="no\\s+_removed sidecar|tampered"):
        snapshot_cdc_compact(spark, prefix, staging2, ["doc_id"])
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_snapshot_cdc_reclaim_deletes_only_old_closed_cycles(
        spark, tmp_path):
    """VERDICT r13 stretch #7: closed CDC cycles accumulate staging
    trees nothing reclaims. The janitor must delete only CLOSED
    cycles beyond the keep_last audit window — never the open
    (active) cycle, never an in-flight (_cut_pending) one whose
    sidecar is the sole copy of its removals — and dry_run must
    classify without deleting."""
    import os
    import time as _time

    import pytest

    from flink_user_behavior_analysis_spark.streaming.jobs import (
        _hadoop_path_exists,
        _hadoop_touch,
        snapshot_cdc_reclaim,
    )

    root = tmp_path / "zones"
    root.mkdir()

    def mk(name, *markers):
        d = root / name
        d.mkdir()
        (d / "ingest_batch=b-0").mkdir()
        (d / "ingest_batch=b-0" / "part-0.parquet").write_bytes(b"x")
        for m in markers:
            _hadoop_touch(spark, f"{d}/{m}")
            _time.sleep(0.02)  # distinct marker mtimes -> stable order
        return str(d)

    c1 = mk("cycle1", "_cut_pending", "_compacted")  # oldest closed
    c2 = mk("cycle2", "_cut_pending", "_compacted")
    c3 = mk("cycle3", "_cut_pending", "_compacted")  # newest closed
    fl = mk("cycle4", "_cut_pending")                # in-flight
    op = mk("cycle5")                                # open/active

    got = snapshot_cdc_reclaim(spark, str(root), keep_last=1,
                               dry_run=True)
    assert [os.path.basename(u) for u in got["reclaimed"]] == \
        ["cycle1", "cycle2"]
    assert [os.path.basename(u) for u in got["kept"]] == ["cycle3"]
    assert [os.path.basename(u) for u in got["in_flight"]] == ["cycle4"]
    assert [os.path.basename(u) for u in got["open"]] == ["cycle5"]
    # dry run deleted nothing
    for d in (c1, c2, c3, fl, op):
        assert _hadoop_path_exists(spark, d)

    got = snapshot_cdc_reclaim(spark, str(root), keep_last=1)
    assert [os.path.basename(u) for u in got["reclaimed"]] == \
        ["cycle1", "cycle2"]
    assert not _hadoop_path_exists(spark, c1)
    assert not _hadoop_path_exists(spark, c2)
    # the audit window, the in-flight cycle, and the active cycle
    # all survive — including their contents
    for d in (c3, fl, op):
        assert _hadoop_path_exists(spark, f"{d}/ingest_batch=b-0")

    # keep_last=0 reclaims every closed cycle; non-closed still safe
    got = snapshot_cdc_reclaim(spark, str(root), keep_last=0)
    assert [os.path.basename(u) for u in got["reclaimed"]] == ["cycle3"]
    assert _hadoop_path_exists(spark, fl)
    assert _hadoop_path_exists(spark, op)

    with pytest.raises(ValueError, match="keep_last"):
        snapshot_cdc_reclaim(spark, str(root), keep_last=-1)
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_cdc_reclaim(spark, str(tmp_path / "nope"))
