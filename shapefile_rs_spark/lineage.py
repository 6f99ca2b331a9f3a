"""Checkpoint / per-partition lineage / resume (C1, SURVEY §2.3).

Iceberg-style snapshot semantics emulated over Parquet + JSON manifests (no
Iceberg runtime jar in the sandbox; the adapter surface — snapshot log,
atomic commit, stage data paths — matches what an Iceberg catalog provides,
so a real catalog drops in by reimplementing ``_commit``/``_load``).

Layout under ``root``::

    _manifest.json                 # snapshot log: append-only list of commits
    stages/<stage>/data/*.parquet  # committed stage output
    stages/<stage>/lineage.json    # per-partition rows:
                                   #   (stage, partition_id, output_rows, wall_ms)

Commit protocol: stage data is written to a staging dir, lineage is gathered
with a single pass (``spark_partition_id`` group-count over the written
files), then the manifest is atomically replaced (POSIX rename) — a killed
job never exposes a half-written stage, and a rerun resumes from the last
manifest (completed stages load from their committed parquet; nothing is
recomputed).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "stages"), exist_ok=True)
        self.manifest_path = os.path.join(root, "_manifest.json")

    # -- manifest -----------------------------------------------------------

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                return json.load(fh)
        return {"snapshots": [], "stages": {}}

    def _commit(self, stage: str, entry: dict, files: Optional[List[str]] = None) -> None:
        manifest = self._load()
        snapshot = {
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": manifest["snapshots"][-1]["snapshot_id"] if manifest["snapshots"] else None,
            "ts": time.time(),
            "stage": stage,
            # Iceberg-style file manifest: the exact data files this
            # snapshot comprises — the basis of time travel (appends only
            # ADD files, so older snapshots read an older file subset)
            "files": sorted(files or []),
        }
        manifest["snapshots"].append(snapshot)
        manifest["stages"][stage] = {**entry, "snapshot_id": snapshot["snapshot_id"]}
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit

    def _stage_files(self, stage: str) -> List[str]:
        data_dir = self.stage_path(stage)
        out: List[str] = []
        for base, _, names in os.walk(data_dir):
            out.extend(os.path.join(base, n) for n in names if n.endswith(".parquet"))
        return out

    def read_snapshot(self, stage: str, snapshot_id: Optional[str] = None) -> DataFrame:
        """Time travel: read the stage AS OF ``snapshot_id`` (default: its
        latest snapshot) — exactly the files that snapshot's manifest
        lists, so appends made later are invisible.

        Note: recomputing a stage (:meth:`run_stage` on a non-committed
        stage) REPLACES the stage's data files, so snapshots recorded before
        the recompute can no longer be read (their manifests list files that
        are gone) — time travel spans appends, not overwrites."""
        manifest = self._load()
        snaps = [s for s in manifest["snapshots"] if s["stage"] == stage]
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["snapshot_id"] == snapshot_id]
        if not snaps:
            raise KeyError(f"no snapshot for stage {stage!r} (id={snapshot_id!r})")
        files = snaps[-1].get("files")
        if not files:
            raise ValueError(
                f"snapshot {snaps[-1].get('snapshot_id')!r} of stage {stage!r} "
                "predates file-level manifests (or was recorded empty) — "
                "cannot time travel to it"
            )
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"snapshot {snaps[-1].get('snapshot_id')!r} of stage {stage!r} "
                f"lists {len(missing)} missing file(s) (a later rerun/overwrite "
                f"removed them), e.g. {missing[0]!r}"
            )
        return self.spark.read.parquet(*files)

    def snapshots(self, stage: Optional[str] = None) -> List[dict]:
        return [
            s
            for s in self._load()["snapshots"]
            if stage is None or s["stage"] == stage
        ]

    def completed(self, stage: str) -> bool:
        return stage in self._load()["stages"]

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.root, "stages", stage, "data")

    def lineage(self, stage: Optional[str] = None) -> List[dict]:
        rows: List[dict] = []
        for name in self._load()["stages"]:
            if stage and name != stage:
                continue
            p = os.path.join(self.root, "stages", name, "lineage.json")
            if os.path.exists(p):
                with open(p) as fh:
                    rows.extend(json.load(fh))
        return rows

    # -- stage execution ----------------------------------------------------

    def run_stage(
        self,
        stage: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[List[str]] = None,
    ) -> DataFrame:
        """Compute-or-load a stage.  On compute: write parquet, record
        per-partition lineage, commit atomically.  On resume: read the
        committed parquet without recomputation."""
        if self.completed(stage):
            return self.spark.read.parquet(self.stage_path(stage))

        data_dir = self.stage_path(stage)
        # crash-orphan GC (Iceberg's orphan-file cleanup analog): a job
        # killed inside the staging-write→manifest-commit window leaves a
        # data.staging.<uuid> sibling behind.  It can never leak into a
        # snapshot (_stage_files walks the committed data dir only), but a
        # restart must not accrete dead copies of the stage on disk.
        # Single-writer assumption, same as the manifest replace itself.
        stage_dir = os.path.dirname(data_dir)
        if os.path.isdir(stage_dir):
            base = os.path.basename(data_dir)
            for name in os.listdir(stage_dir):
                if name.startswith(base + ".staging."):
                    shutil.rmtree(os.path.join(stage_dir, name), ignore_errors=True)

        t0 = time.time()
        df = build()
        staging = data_dir + f".staging.{uuid.uuid4().hex}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        wall_ms = int((time.time() - t0) * 1000)

        committed = self.spark.read.parquet(staging)
        per_part = (
            committed.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .count()
            .collect()
        )
        lineage_rows = [
            {
                "stage": stage,
                "partition_id": int(r["_pid"]),
                "output_rows": int(r["count"]),
                "wall_ms": wall_ms,
            }
            for r in sorted(per_part, key=lambda r: r["_pid"])
        ]
        os.makedirs(os.path.dirname(data_dir), exist_ok=True)
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        os.replace(staging, data_dir)
        with open(os.path.join(self.root, "stages", stage, "lineage.json"), "w") as fh:
            json.dump(lineage_rows, fh, indent=1)
        self._commit(
            stage,
            {
                "path": data_dir,
                "rows": int(sum(r["output_rows"] for r in lineage_rows)),
                "partitions": len(lineage_rows),
                "wall_ms": wall_ms,
            },
            files=self._stage_files(stage),
        )
        return self.spark.read.parquet(data_dir)

    def append_delta(
        self,
        stage: str,
        new_df: DataFrame,
        key_cols: List[str],
    ) -> DataFrame:
        """Incremental append: anti-join the new batch's keys against the
        committed stage (resume-delta = ``left_anti`` on lineage keys,
        SURVEY §2.2 set-ops row) and commit only the unseen rows as a new
        snapshot of the same stage.

        Crash safety (single-writer, like the manifest replace itself):
        a retry after ANY kill — even with a DIFFERENT batch — never
        publishes a torn append.  A delta staging dir whose write
        completed (``_SUCCESS`` present) is ADOPTED whole during GC: its
        unmoved files move into the data dir, so a kill mid-move leaves
        the FULL anti-joined batch on disk for the reconcile commit
        below, never half of it.  An incomplete write (no ``_SUCCESS``)
        is deleted."""
        if not self.completed(stage):
            return self.run_stage(stage, lambda: new_df)
        # delta-orphan GC, the append-path twin of run_stage's staging GC:
        # a job killed between the delta staging write and the file moves
        # leaves data.delta.<uuid> behind, and a completed stage never
        # reaches run_stage's cleanup (it early-returns) — collect here.
        data_dir = self.stage_path(stage)
        stage_dir = os.path.dirname(data_dir)
        base = os.path.basename(data_dir)
        for name in os.listdir(stage_dir):
            if name.startswith(base + ".delta."):
                orphan = os.path.join(stage_dir, name)
                if os.path.exists(os.path.join(orphan, "_SUCCESS")):
                    # completed write → the batch was a valid anti-joined
                    # delta; finish its interrupted move so the reconcile
                    # commit publishes the whole batch (deleting instead
                    # would tear a half-moved append)
                    for fname in os.listdir(orphan):
                        if fname.endswith(".parquet"):
                            os.replace(
                                os.path.join(orphan, fname),
                                os.path.join(
                                    data_dir, f"delta-{uuid.uuid4().hex}-{fname}"
                                ),
                            )
                shutil.rmtree(orphan, ignore_errors=True)
        # crash-RECONCILE for the post-move window: a kill AFTER the file
        # moves but BEFORE the commit leaves data files in the stage dir
        # that no snapshot lists — and the retry's empty-delta early
        # return below would skip the commit forever (the rows are
        # already on disk, so the anti-join finds nothing new).  Re-commit
        # the directory as a recovery snapshot first, so the manifest and
        # the directory agree before any delta math.
        manifest = self._load()
        listed: set = set()
        for snap in reversed(manifest["snapshots"]):
            if snap["stage"] == stage:
                listed = set(snap.get("files") or [])
                break
        on_disk = set(self._stage_files(stage))
        if on_disk - listed:
            rows = self.spark.read.parquet(data_dir).count()
            self._commit(
                stage,
                {
                    "path": data_dir,
                    "rows": rows,
                    # rows were recounted from disk but the writing job's
                    # partitioning is gone — recording the PREVIOUS entry's
                    # count here would be stale (the delta files were
                    # added); unknown is the only honest value
                    "partitions": None,
                    "wall_ms": 0,  # recovery commit, no compute of its own
                },
                files=sorted(on_disk),
            )
        existing = self.spark.read.parquet(self.stage_path(stage))
        delta = new_df.join(existing.select(*key_cols), on=key_cols, how="left_anti")
        if delta.isEmpty():
            return existing
        t0 = time.time()
        staging = self.stage_path(stage) + f".delta.{uuid.uuid4().hex}"
        delta.write.mode("overwrite").parquet(staging)
        n_new = self.spark.read.parquet(staging).count()
        # append the delta files into the stage dir (Iceberg: new manifest
        # referencing old + new data files; here: move files in, re-commit)
        data_dir = self.stage_path(stage)
        for fname in os.listdir(staging):
            if fname.endswith(".parquet"):
                os.replace(
                    os.path.join(staging, fname),
                    os.path.join(data_dir, f"delta-{uuid.uuid4().hex}-{fname}"),
                )
        shutil.rmtree(staging)
        prev = self._load()["stages"][stage]
        self._commit(
            stage,
            {
                "path": data_dir,
                "rows": prev["rows"] + n_new,
                "partitions": prev["partitions"],
                "wall_ms": int((time.time() - t0) * 1000),
            },
            files=self._stage_files(stage),
        )
        return self.spark.read.parquet(data_dir)
