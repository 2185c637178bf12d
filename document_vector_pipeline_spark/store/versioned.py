"""Snapshot-versioned parquet table with a manifest log (time travel).

The plain VectorStore mutates partitions in place — correct for the
reference's semantics (CosmosDB upsert, CosmosDBClientWrapper.cs:36-70)
but a reader that overlaps a writer sees a torn store, and yesterday's
state is gone.  This module adds the Delta/Iceberg transaction-log idea
in its minimal form:

    <path>/data/v{N}/part-*.parquet   immutable per-commit data dirs
    <path>/_log/v{N}.json             manifest: the FULL list of live
                                      data dirs for version N + stats

Every commit writes ONLY new files and one new manifest; version N's
snapshot is exactly the directories its manifest names.  Readers
resolve a version (default: latest) from the log and read those
directories — never a listing of ``data/`` — so appends, upserts, and
``vacuum`` never disturb a reader pinned to a snapshot, and any
historical version stays readable until vacuumed.  Writers are
single-writer (one driver owns the log), the same assumption the
reference's one-function-per-blob design makes.

Scale notes: the manifest holds directory PATHS (thousands of entries
at most), not data — snapshot resolution is a tiny driver-side JSON
read; data motion is ordinary partitioned parquet IO.  Upsert rewrites
only the union of prior live dirs it must merge with (here: all live
dirs — a bucketed layout underneath, as in VectorStore, would narrow
that; the log layer is orthogonal).  All manifest/vacuum IO goes
through the session's Hadoop FileSystem, so the layout works unchanged
on s3a/abfs, not just local mounts.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # ---- Hadoop FS plumbing (object-store-safe driver IO) -----------------

    def _fs(self):
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(conf), jvm

    def _jpath(self, rel: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(
            f"{self.path}/{rel}")

    def _write_text(self, rel: str, text: str) -> None:
        fs, _ = self._fs()
        out = fs.create(self._jpath(rel), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def _read_text(self, rel: str) -> str:
        fs, jvm = self._fs()
        inp = fs.open(self._jpath(rel))
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(
                inp, "UTF-8")
        finally:
            inp.close()

    # ---- log --------------------------------------------------------------

    def versions(self) -> list[int]:
        fs, _ = self._fs()
        log = self._jpath("_log")
        if not fs.exists(log):
            return []
        out = []
        for st in fs.listStatus(log):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        return json.loads(self._read_text(f"_log/v{version:012d}.json"))

    def _commit(self, df: DataFrame, op: str,
                carry_dirs: list[str]) -> int:
        v = (self.latest() + 1) if self.versions() else 0
        new_dir = f"data/v{v:012d}"
        full = f"{self.path}/{new_dir}"
        df.write.mode("overwrite").parquet(full)
        dirs = list(carry_dirs) + [new_dir]
        n_rows = self.spark.read.parquet(
            *[f"{self.path}/{d}" for d in dirs]).count()
        manifest = {"version": v, "op": op, "dirs": dirs,
                    "n_rows": n_rows}
        self._write_text(f"_log/v{v:012d}.json", json.dumps(manifest))
        return v

    # ---- operations -------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.latest()
            if version is None:
                raise ValueError(f"no versions at {self.path}")
        if version not in self.versions():
            raise ValueError(
                f"version {version} not in log (vacuumed or never "
                f"written); available: {self.versions()}")
        m = self._manifest(version)
        return self.spark.read.parquet(
            *[f"{self.path}/{d}" for d in m["dirs"]])

    def commit_append(self, df: DataFrame) -> int:
        prev = (self._manifest(self.latest())["dirs"]
                if self.versions() else [])
        return self._commit(df, "append", prev)

    def commit_overwrite(self, df: DataFrame) -> int:
        return self._commit(df, "overwrite", [])

    def upsert(self, df: DataFrame, keys: list[str]) -> int:
        """Merge-on-key: incoming rows replace matching keys; the merged
        snapshot is written as a fresh commit (old files untouched, so
        every earlier version keeps reading its own bytes)."""
        if not self.versions():
            return self._commit(df, "upsert", [])
        cur = self.read()
        kept = cur.join(df.select(*keys).distinct(), keys, "left_anti")
        return self._commit(kept.unionByName(df), "upsert", [])

    def delete_where(self, cond) -> int:
        """Snapshot delete: survivors written as a fresh overwrite
        commit (the engine-level delete — no file mutation)."""
        return self._commit(self.read().filter(~cond), "delete", [])

    def history(self) -> DataFrame:
        rows = [(m["version"], m["op"], len(m["dirs"]), m["n_rows"])
                for m in (self._manifest(v) for v in self.versions())]
        return self.spark.createDataFrame(
            rows, "version int, op string, n_dirs int, n_rows long")

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions: delete their
        manifests, then every data dir no kept manifest references.
        Returns the dropped version numbers.  All deletes go through the
        Hadoop FileSystem — object-store-safe."""
        vs = self.versions()
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        live = {d for v in keep for d in self._manifest(v)["dirs"]}
        dead = {d for v in drop for d in self._manifest(v)["dirs"]} - live
        fs, _ = self._fs()
        for v in drop:
            fs.delete(self._jpath(f"_log/v{v:012d}.json"), False)
        for d in dead:
            fs.delete(self._jpath(d), True)
        return drop


def snapshot_totals(vt: VersionedTable,
                    id_col: str, val_col: str) -> DataFrame:
    """(version, n_rows, sum_id, sum_val): one summary row per readable
    snapshot — the time-travel audit query (what did the table hold at
    every version).  Reads each snapshot through its manifest."""
    out = None
    for v in vt.versions():
        r = (vt.read(v)
             .agg(F.count("*").cast("long").alias("n_rows"),
                  F.sum(F.col(id_col)).cast("long").alias("sum_id"),
                  F.sum(F.col(val_col)).cast("long").alias("sum_val"))
             .withColumn("version", F.lit(v).cast("int")))
        out = r if out is None else out.unionByName(r)
    return out.select("version", "n_rows", "sum_id", "sum_val")
