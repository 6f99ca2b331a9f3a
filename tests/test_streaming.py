"""Structured Streaming twins: availableNow replay over the static events
table must reproduce the batch rollup exactly; the stateful sessionizer
must emit plausible gap sessions."""

import pytest

from pyspark.sql import functions as F


def test_hourly_rollup_matches_batch(spark, sf_dir, tmp_path):
    from shapefile_rs_spark.streaming.events import (
        hourly_rollup,
        read_event_stream,
        run_available_now,
    )

    events_dir = f"{sf_dir}/events.parquet"
    stream = read_event_stream(spark, events_dir)
    result = run_available_now(
        hourly_rollup(stream), "hourly_stream_test", str(tmp_path / "ckpt")
    )
    def keyify(df):
        return {
            (r["event_type"], r["h"], r["n_events"], r["sum_value"])
            for r in df.withColumn(
                "h", F.date_format(F.col("hour_start").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
            ).collect()
        }

    got = keyify(result)
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )
    want = keyify(batch)
    assert got and got == want


def test_sessionize_stream_runs(spark, sf_dir, tmp_path):
    from shapefile_rs_spark.streaming.events import read_event_stream, sessionize_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sessions_test").collect()
    # closed sessions only appear when a gap/timeout fires inside the replay;
    # at minimum the query must run and every emitted session must be sane
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1


def test_stream_pip_tiles_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static spatial join: availableNow replay of the page stream
    joined to the static polygon dim equals the batch PIP+tile rollup."""
    from shapefile_rs_spark import demo
    from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
    from shapefile_rs_spark.pages import geotag_pages, pages_from_documents
    from shapefile_rs_spark.streaming.events import run_available_now
    from shapefile_rs_spark.streaming.geostream import read_page_stream, stream_pip_tiles

    pages = pages_from_documents(spark, sf_dir)
    pdir = str(tmp_path / "pages_pq")
    pages.write.parquet(pdir)
    polys = demo.oracle_polygons_df(spark)

    sdf = stream_pip_tiles(read_page_stream(spark, pdir), polys, z=6)
    got = {
        (r["polygon_id"], r["tile_x"], r["tile_y"], r["n_pages"])
        for r in run_available_now(sdf, "pip_stream_test", str(tmp_path / "ck")).collect()
    }

    joined = point_in_polygon_join(
        geotag_pages(spark.read.parquet(pdir)).select("url", "lon", "lat"),
        polys,
        point_cols=["url", "lon", "lat"],
        polygon_cols=["polygon_id"],
    )
    batch = (
        joined.withColumn(
            "tile_x", F.floor((F.col("lon") + 180.0) / 360.0 * 64).cast("long")
        )
        .withColumn("tile_y", F.floor((90.0 - F.col("lat")) / 180.0 * 64).cast("long"))
        .groupBy("polygon_id", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    want = {
        (r["polygon_id"], r["tile_x"], r["tile_y"], r["n_pages"]) for r in batch.collect()
    }
    assert got and got == want


def test_dedup_stream_drops_recrawled_copies(spark, sf_dir, tmp_path):
    """Ingest-time dedup: the same corpus landing twice (recrawl) must emit
    each distinct text once — in both state regimes (global dropDuplicates
    and watermark-bounded dropDuplicatesWithinWatermark)."""
    import shutil

    from shapefile_rs_spark.streaming.dedup import dedup_stream
    from shapefile_rs_spark.streaming.events import run_available_now

    src = f"{sf_dir}/documents.parquet"
    land = tmp_path / "landing"
    land.mkdir()
    shutil.copy(src, land / "crawl_a.parquet")
    shutil.copy(src, land / "crawl_b.parquet")  # byte-identical recrawl

    schema = spark.read.parquet(src).schema
    want = spark.read.parquet(src).select("text").distinct().count()

    stream = spark.readStream.schema(schema).parquet(str(land))
    got = run_available_now(
        dedup_stream(stream), "dedup_stream_global", str(tmp_path / "ck1")
    )
    assert got.count() == want

    # +1 day: ts=0 sits exactly ON the initial watermark and is filtered as
    # late before dedup ever sees it (boundary artifact of synthetic time)
    stream2 = spark.readStream.schema(schema).parquet(str(land)).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") + 86400)
    )
    got2 = run_available_now(
        dedup_stream(stream2, ts_col="ts"), "dedup_stream_wm", str(tmp_path / "ck2")
    )
    assert got2.count() == want


def test_maintain_signature_stage_tracks_ingestion(spark, sf_dir, tmp_path):
    """The committed corpus signature stage follows recrawl ingestion:
    wave 1 commits signatures for the first docs; wave 2 (new docs PLUS a
    byte-identical replay of wave 1) appends ONLY the unseen ids; and the
    incremental near-dup join reads the maintained stage with the corpus
    text structurally absent — the full streaming recrawl story."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.dedup import minhash_lsh_join
    from shapefile_rs_spark.streaming.dedup import maintain_signature_stage

    src = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(src).select("doc_id", "text")
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(100)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1).limit(50)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema

    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")
        # INTRA-batch duplicate: the same ids twice within one drain (two
        # mirrors) — append_delta's anti-join only filters against the
        # committed stage, so the operator must dedup inside the batch
        shutil.copy(f, land / "batch_a_mirror.parquet")

    stream = spark.readStream.schema(schema).parquet(str(land))
    sigs = maintain_signature_stage(stream, root, str(ck / "1"))
    n1 = wave1.count()
    assert sigs.count() == n1 and sigs.columns == ["_id", "_sig"]

    # wave 2 lands alongside a byte-identical REPLAY of wave 1
    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, land / "batch_b.parquet")
    shutil.copy(land / "batch_a.parquet", land / "batch_a_replay.parquet")

    stream = spark.readStream.schema(schema).parquet(str(land))
    sigs = maintain_signature_stage(stream, root, str(ck / "2"))
    assert sigs.count() == n1 + wave2.count()  # replay appended NOTHING
    assert sigs.select("_id").distinct().count() == n1 + wave2.count()

    # a recrawl batch joins against the maintained stage — no corpus text
    batch = wave1.limit(20).select(
        "doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text")
    )
    hits = minhash_lsh_join(batch, corpus_sigs=sigs, id_col="doc_id")
    assert hits.filter(F.col("new_id") == F.col("corpus_id")).count() > 0


def test_maintain_signature_stage_with_bands(spark, sf_dir, tmp_path):
    """bands= maintains the committed BAND stage in the same foreachBatch:
    replays append nothing to either stage, the maintained band rows are
    bit-identical to re-banding the signature stage, and the incremental
    join consumes them with no corpus-side banding in its plan."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.dedup import (
        minhash_band_rows,
        minhash_lsh_join,
    )
    from shapefile_rs_spark.streaming.dedup import maintain_signature_stage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(80)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema
    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")

    stream = spark.readStream.schema(schema).parquet(str(land))
    sigs, bands = maintain_signature_stage(stream, root, str(ck / "1"), bands=4)
    n1 = wave1.count()
    assert sigs.count() == n1
    assert bands.columns == ["_id", "band", "band_key"] and bands.count() == 4 * n1

    # a replay drains through BOTH stages without appending
    shutil.copy(land / "batch_a.parquet", land / "batch_a_replay.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    sigs, bands = maintain_signature_stage(stream, root, str(ck / "2"), bands=4)
    assert sigs.count() == n1 and bands.count() == 4 * n1

    # maintained band rows == re-banding the committed signature stage
    want = sorted(tuple(r) for r in minhash_band_rows(sigs, 12, 4).collect())
    got = sorted(tuple(r) for r in bands.collect())
    assert got == want

    # the recrawl join over BOTH stages: corpus banding absent from the plan
    batch = wave1.limit(15).select(
        "doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text")
    )
    hits = minhash_lsh_join(batch, corpus_sigs=sigs, corpus_bands=bands, id_col="doc_id")
    assert hits.filter(F.col("new_id") == F.col("corpus_id")).count() > 0
    logical = hits._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Generate explode") == 1


def test_maintain_para_registry_tracks_ingestion(spark, sf_dir, tmp_path):
    """The committed paragraph registry follows ingestion: wave 1 commits
    its distinct eligible paragraphs; wave 2 plus a byte-identical replay
    of wave 1 appends only unseen paragraphs; the maintained registry
    equals the from-scratch registry of both waves; and the incremental
    paragraph dedup reads the maintained stage directly."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.dedup import (
        chunk_words,
        para_dedup_incremental,
        para_registry,
    )
    from shapefile_rs_spark.streaming.dedup import maintain_para_registry

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", chunk_words(F.col("text"), 8).alias("text"))
    )
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(60)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1).limit(30)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema

    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")

    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_para_registry(stream, root, str(ck / "1"))
    n1 = para_registry(wave1).count()
    assert reg.count() == n1 and reg.columns == ["para"]

    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, land / "batch_b.parquet")
    shutil.copy(land / "batch_a.parquet", land / "batch_a_replay.parquet")

    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_para_registry(stream, root, str(ck / "2"))
    scratch = para_registry(wave1.unionByName(wave2))
    assert reg.count() == scratch.count()  # replay appended NOTHING
    assert {r["para"] for r in reg.collect()} == {
        r["para"] for r in scratch.collect()
    }

    # a recrawl variant dedups against the maintained registry: its copied
    # chunks vanish, only the unique suffix chunk (a trailing partial
    # chunk merged with the marker) can survive
    batch = wave1.limit(10).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" unseen recrawl marker")).alias("text"),
    )
    cleaned, new_paras = para_dedup_incremental(batch, reg)
    assert cleaned.filter(F.col("n_kept") >= F.col("n_paras")).count() == 0
    assert new_paras.count() > 0


def test_maintain_line_registry_content_idempotent(spark, sf_dir, tmp_path):
    """The committed line-frequency registry follows ingestion at DOC
    grain: wave 1 commits its (line, doc) pairs; wave 2 plus a
    byte-identical RE-SENT copy of wave 1 appends only wave 2's pairs —
    counts never double — and the maintained registry equals the
    from-scratch registry of both waves; the incremental prune reads it
    directly."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.dedup import (
        chunk_words,
        line_prune_incremental,
        line_registry,
    )
    from shapefile_rs_spark.streaming.dedup import maintain_line_registry

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", chunk_words(F.col("text"), 8).alias("text")
    )
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(40)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema

    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_line_registry(stream, root, str(ck / "1"))
    scratch1 = {(r["line"], r["n_docs"]) for r in line_registry(wave1).collect()}
    assert {(r["line"], r["n_docs"]) for r in reg.collect()} == scratch1

    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, land / "batch_b.parquet")
    # content-level replay: same bytes, NEW file, NEW batch id — the pair
    # anti-join must still append nothing for it
    shutil.copy(land / "batch_a.parquet", land / "batch_a_resend.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_line_registry(stream, root, str(ck / "2"))
    scratch = {
        (r["line"], r["n_docs"])
        for r in line_registry(wave1.unionByName(wave2)).collect()
    }
    assert {(r["line"], r["n_docs"]) for r in reg.collect()} == scratch

    # the incremental prune consumes the maintained registry: a batch doc
    # repeating a committed chunk loses it
    sample = wave1.limit(5).select(
        (F.col("doc_id") + 10**9).alias("doc_id"), "text"
    )
    cleaned, _delta = line_prune_incremental(sample, reg, max_docs=2)
    assert cleaned.filter(F.col("n_kept") < F.col("n_lines")).count() > 0


def test_maintain_dsir_registry_content_idempotent(spark, sf_dir, tmp_path):
    """The committed DSIR stats registry follows ingestion at DOC grain:
    wave 1 commits its per-(doc, bucket) counts; wave 2 plus a
    byte-identical RE-SENT copy of wave 1 appends only wave 2's rows —
    counts never double — and the aggregated registry equals the
    from-scratch registry of both waves; incremental weighting reads it
    directly and matches full-corpus dsir on the new batch."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.curation import (
        dsir_registry,
        dsir_weights,
        dsir_weights_incremental,
    )
    from shapefile_rs_spark.streaming.dedup import maintain_dsir_registry

    pred = F.col("lang") == "en"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(40)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema

    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_dsir_registry(stream, root, str(ck / "1"), pred, n_buckets=32)
    s1 = {
        (r["f"], r["t"], r["q"])
        for r in dsir_registry(wave1, pred, n_buckets=32).collect()
    }
    assert {(r["f"], r["t"], r["q"]) for r in reg.collect()} == s1

    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, land / "batch_b.parquet")
    shutil.copy(land / "batch_a.parquet", land / "batch_a_resend.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    reg = maintain_dsir_registry(stream, root, str(ck / "2"), pred, n_buckets=32)
    both = wave1.unionByName(wave2)
    scratch = {
        (r["f"], r["t"], r["q"])
        for r in dsir_registry(both, pred, n_buckets=32).collect()
    }
    assert {(r["f"], r["t"], r["q"]) for r in reg.collect()} == scratch

    # incremental weighting against the MAINTAINED registry == full dsir
    batch = docs.subtract(both).limit(10)
    weights, _ = dsir_weights_incremental(batch, reg, pred, n_buckets=32)
    inc = {r["doc_id"]: r["w_micro"] for r in weights.collect()}
    bids = set(inc)
    full = {
        r["doc_id"]: r["w_micro"]
        for r in dsir_weights(
            both.unionByName(batch), pred, n_buckets=32
        ).collect()
        if r["doc_id"] in bids
    }
    assert inc == full and len(inc) == 10


def test_maintain_lm_registry_content_idempotent(spark, sf_dir, tmp_path):
    """Both halves of the committed LM count registry follow ingestion at
    DOC grain: wave 1 commits its per-doc unigram/bigram rows; wave 2
    plus a byte-identical RE-SENT copy of wave 1 appends only wave 2's
    rows — counts never double — and the aggregated registries equal the
    from-scratch counts of both waves; incremental scoring reads them
    directly and matches full-corpus lm_score on the new batch."""
    import shutil

    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.lm import (
        lm_bigram_counts,
        lm_score,
        lm_score_incremental,
        lm_unigram_counts,
    )
    from shapefile_rs_spark.streaming.dedup import maintain_lm_registry

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    wave1 = docs.filter(F.col("doc_id") % 2 == 0).limit(40)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    land = tmp_path / "landing"
    land.mkdir()
    root = str(tmp_path / "pipe")
    ck = tmp_path / "ck"
    schema = wave1.schema

    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, land / "batch_a.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    uni, big = maintain_lm_registry(stream, root, str(ck / "1"))
    assert {tuple(r) for r in uni.collect()} == {
        tuple(r) for r in lm_unigram_counts(wave1).collect()
    }
    assert {tuple(r) for r in big.collect()} == {
        tuple(r) for r in lm_bigram_counts(wave1).collect()
    }

    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, land / "batch_b.parquet")
    shutil.copy(land / "batch_a.parquet", land / "batch_a_resend.parquet")
    stream = spark.readStream.schema(schema).parquet(str(land))
    uni, big = maintain_lm_registry(stream, root, str(ck / "2"))
    both = wave1.unionByName(wave2)
    assert {tuple(r) for r in uni.collect()} == {
        tuple(r) for r in lm_unigram_counts(both).collect()
    }
    assert {tuple(r) for r in big.collect()} == {
        tuple(r) for r in lm_bigram_counts(both).collect()
    }

    # incremental scoring against the MAINTAINED registries == full
    # lm_score over corpus ∪ batch restricted to the batch
    batch = docs.subtract(both).limit(10)
    scores, _, _ = lm_score_incremental(batch, uni, big)
    inc = {r["doc_id"]: (r["n_bigrams"], r["lm_micro"]) for r in scores.collect()}
    bids = set(inc)
    full = {
        r["doc_id"]: (r["n_bigrams"], r["lm_micro"])
        for r in lm_score(both.unionByName(batch)).collect()
        if r["doc_id"] in bids
    }
    assert inc == full and len(inc) == 10
