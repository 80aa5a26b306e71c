"""Structured Streaming: incremental extraction with exactly-once file
tracking, and watermarked windowed aggregation matching its batch analog."""

import pyspark.sql.functions as F

from docprompt_spark import pipeline, streaming


def _spans_map(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_stream_extraction_incremental(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    docs = pipeline.corpus_df(spark, 10, seed=3, skew_every=0)
    docs.persist().count()
    golden = _spans_map(docs.select("doc_id", "spans"))

    first = docs.filter(F.col("doc_id") < "doc-3-00000006")
    first.write.mode("append").parquet(in_dir)
    q = streaming.stream_extraction(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    got1 = _spans_map(spark.read.parquet(out_dir).select("doc_id", "spans"))
    assert set(got1) == {f"doc-3-{i:08d}" for i in range(6)}

    # second batch of files: only the new documents are processed
    docs.filter(F.col("doc_id") >= "doc-3-00000006").write.mode("append").parquet(in_dir)
    q2 = streaming.stream_extraction(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    got = _spans_map(out.select("doc_id", "spans"))
    assert got == golden  # all docs, each exactly once, spans exact
    assert out.count() == 10
    # exactly-once: doc 0 was not reprocessed in batch 2
    batches = {r["doc_id"]: r["batch_id"] for r in out.select("doc_id", "batch_id").collect()}
    assert batches["doc-3-00000000"] == 0


def test_windowed_counts_match_batch(spark, tmp_path):
    import shutil

    ckpt = str(tmp_path / "ckpt2")
    ev_dir = tmp_path / "events_in"
    ev_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", ev_dir / "part-0.parquet")
    q = streaming.stream_event_counts(
        spark, str(ev_dir), ckpt, query_name="evt_test"
    )
    q.awaitTermination(300)
    streamed = spark.sql("select * from evt_test")

    batch = streaming.windowed_event_counts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    a = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stateful_sessionize_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: a session OPEN at the end of
    micro-batch 1 must close with batch-2 events (state carries), and the
    emitted boundaries must equal the batch kernel's semantics."""
    inp = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt_sess")
    # file 1 (batch 1): user 1 events at t=0,10 (one open session);
    #                   user 2 event at t=5
    spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (2, 5.0)], ["user_id", "ts"]
    ).coalesce(1).write.mode("append").parquet(inp)
    # file 2 (batch 2): user 1 at t=100 (gap 90 > 30 -> closes session
    #                   [0,10] with 2 events); user 2 at t=20 (same session)
    spark.createDataFrame(
        [(1, 100.0), (2, 20.0)], ["user_id", "ts"]
    ).coalesce(1).write.mode("append").parquet(inp)

    from docprompt_spark import streaming

    # two source "files" -> with maxFilesPerTrigger=1, >= 2 micro-batches
    q = streaming.stream_sessionize(spark, inp, ckpt, query_name="sess_t")
    q.awaitTermination(120)
    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_t").collect()
    }
    # only user 1's first session closed; user 2's session and user 1's
    # t=100 session are still open (in state, not emitted)
    assert rows == {(1, 0.0, 10.0, 2)}, rows


def test_sessionize_fn_orders_across_chunks():
    """The stateful kernel must sort the WHOLE micro-batch, not per Arrow
    chunk: a later chunk with earlier timestamps previously merged into the
    open session and moved session_end backwards."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.val = v

    fn = streaming._sessionize_fn(gap_seconds=30.0)
    # chunk 2 is EARLIER than chunk 1; global order has a 100s gap between
    # [5,10,20] and [200,210]
    chunks = [pd.DataFrame({"ts": [200.0, 210.0]}), pd.DataFrame({"ts": [5.0, 10.0, 20.0]})]
    st = FakeState()
    out = list(fn((7,), iter(chunks), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["session_start"], row["session_end"], row["n_events"]) == (5.0, 20.0, 3)
    assert st.val == (200.0, 210.0, 2)  # open session left in state


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Ingest-time exact dedup: a doc re-delivered in a LATER micro-batch
    (within the watermark) is dropped — per-key state survives across
    batches through the checkpoint; distinct docs all pass."""
    import pandas as pd

    in_dir, out_dir, ckpt = (
        str(tmp_path / "din"),
        str(tmp_path / "dout"),
        str(tmp_path / "dckpt"),
    )
    b1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta", "gamma delta", "alpha beta"],
            "ingest_ts": ["2026-01-01 10:00:00"] * 3,
        }
    )
    spark.createDataFrame(b1).write.mode("append").parquet(in_dir)
    q = streaming.stream_dedup_documents(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    out1 = spark.read.parquet(out_dir).toPandas()
    assert sorted(out1["text"]) == ["alpha beta", "gamma delta"]

    # batch 2: one true duplicate of batch 1, one new doc
    b2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": ["gamma delta", "epsilon zeta"],
            "ingest_ts": ["2026-01-01 10:30:00"] * 2,
        }
    )
    spark.createDataFrame(b2).write.mode("append").parquet(in_dir)
    q2 = streaming.stream_dedup_documents(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(300)
    out = spark.read.parquet(out_dir).toPandas()
    assert sorted(out["text"]) == ["alpha beta", "epsilon zeta", "gamma delta"]
    assert len(out) == 3  # the re-delivered 'gamma delta' was dropped
