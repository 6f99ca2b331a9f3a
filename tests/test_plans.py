"""Physical-plan assertions: the optimizer properties the engine relies on
at 100 TB must hold, not be hoped for — column pruning reaches the parquet
scan, filters push down, the PIP broadcast phase really broadcasts, and the
hot paths stay inside whole-stage codegen."""

from pyspark.sql import functions as F

from shapefile_rs_spark.plans import executed_plan as _plan


def test_documents_scan_prunes_columns(spark, sf_dir):
    """text_quality touches only (doc_id, text) — the scan must not read
    lang/source/n_chars."""
    from shapefile_rs_spark.operators.textstats import quality_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(quality_metrics(docs))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_parquet_filter_pushdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("lang") == "en"
    )
    plan = _plan(docs.select("doc_id"))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "EqualTo(lang,en)" in pushed


def test_pip_broadcast_phase_is_broadcast(spark, sf_dir):
    """The small-polygon phase must be a broadcast hash join of the point
    scan — no shuffle of the page table, no sort-merge join."""
    from shapefile_rs_spark import demo
    from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
    from shapefile_rs_spark.pages import geotag_pages, pages_from_documents

    pages = geotag_pages(pages_from_documents(spark, sf_dir)).select(
        "doc_id", "lon", "lat"
    )
    joined = point_in_polygon_join(
        pages,
        demo.oracle_polygons_df(spark),
        point_cols=["doc_id"],
        polygon_cols=["polygon_id"],
        broadcast_polygons=True,
    )
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_page_synthesis_stays_in_codegen(spark, sf_dir):
    """html build + geotag parse + cell index: one codegen'd map stage, no
    Python (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    from shapefile_rs_spark.operators.spatial_join import with_cells
    from shapefile_rs_spark.pages import geotag_pages, synth_pages_from_ids

    ids = spark.range(100).withColumnRenamed("id", "page_id")
    pts = with_cells(
        geotag_pages(synth_pages_from_ids(ids)).select("doc_id", "lon", "lat"), [8]
    )
    plan = _plan(pts)
    assert plan.lstrip().startswith("*(")  # whole-stage-codegen'd map stage
    assert "EvalPython" not in plan  # no row- or Arrow-batch Python stages
