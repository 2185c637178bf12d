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
historical version stays readable until vacuumed.

Writers use OPTIMISTIC CONCURRENCY (round 13 — Delta's commit
protocol): every commit writes its data under a writer-unique dir
name, then publishes the manifest with a PUT-IF-ABSENT log write
(``fs.create(path, overwrite=False)`` — atomic on HDFS/ABFS, the same
primitive Delta requires of its log store).  A writer that loses the
race re-reads the new latest and either REBASES (recomputes carried
dirs/row arithmetic and retries — safe exactly when the concurrent
commits are commutative: blind overwrites, appends, and bucket-level
merges whose touched buckets are disjoint and whose schema is
unchanged) or raises ``ConcurrentCommitError`` (Delta's
ConcurrentModificationException: key/bucket overlap, schema change,
or a vacuumed base — the caller re-reads and re-derives).  Lost
commits are impossible either way: a version number is owned by
exactly the writer whose put-if-absent won it, and a failed writer's
orphaned data dirs are unreferenced by any manifest, so ``vacuum``
reclaims them.

Scale notes: the manifest holds directory PATHS (thousands of entries
at most), not data — snapshot resolution is a tiny driver-side JSON
read; data motion is ordinary partitioned parquet IO.  Upsert rewrites
only the union of prior live dirs it must merge with (here: all live
dirs; ``BucketedVersionedTable`` below IS the narrowed variant — its
commits rewrite only the incoming keys' hash buckets and carry every
untouched bucket's dir by reference).  All manifest/vacuum IO goes
through the session's Hadoop FileSystem, so the layout works unchanged
on s3a/abfs, not just local mounts.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def constraint_violations(df: DataFrame, not_null: list[str] = (),
                          unique: list[list[str]] = (),
                          checks: dict | None = None) -> DataFrame:
    """Long-form violation census for a batch against declared table
    constraints (Delta's CHECK/NOT NULL, plus key uniqueness): one row
    per constraint — (constraint, n_violations) — ALL constraints
    reported even when clean (n_violations = 0), so the output doubles
    as the table's constraint catalog.

    ``not_null``: column names that must be non-null.  ``unique``:
    key-column lists that must identify at most one batch row each.
    ``checks``: {name: Column predicate} — a row VIOLATES when the
    predicate is false or null (Delta CHECK semantics: null fails).

    Plan: one batch-sized aggregation per constraint class (null
    counts fold into ONE pass; uniqueness is a keys-sized groupBy),
    unioned into a constraints-sized frame — nothing scales beyond
    the batch."""
    spark = df.sparkSession
    schema = "constraint string, n_violations long"
    parts = []
    agg_cols = [F.sum(F.col(c).isNull().cast("long")).cast("long")
                .alias(f"nn_{i}") for i, c in enumerate(not_null)]
    agg_cols += [F.sum((~F.coalesce(pred, F.lit(False))).cast("long"))
                 .cast("long").alias(f"ck_{i}")
                 for i, (_nm, pred) in
                 enumerate(sorted((checks or {}).items()))]
    if agg_cols:
        one = df.agg(*agg_cols)
        names = ([f"not_null({c})" for c in not_null]
                 + [f"check({nm})" for nm in sorted(checks or {})])
        cols = ([f"nn_{i}" for i in range(len(not_null))]
                + [f"ck_{i}" for i in range(len(checks or {}))])
        # constraint names are DATA, not SQL: a column or check name
        # carrying a quote/backslash must not break (or worse, rewrite)
        # the stack() expression at the commit gate
        def _q(nm: str) -> str:
            return "'" + nm.replace("\\", "\\\\").replace("'", "\\'") + "'"

        stacked = one.selectExpr(
            "stack({n}, {args}) as (constraint, n_violations)".format(
                n=len(cols),
                args=", ".join(f"{_q(nm)}, coalesce({c}, 0)"
                               for nm, c in zip(names, cols))))
        parts.append(stacked)
    for keys in unique:
        dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > 1)
               .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
                    .cast("long").alias("n_violations"))
               .select(F.lit(f"unique({', '.join(keys)})")
                       .alias("constraint"), "n_violations"))
        parts.append(dup)
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class ConstraintViolation(ValueError):
    """A commit was refused because its batch violates a declared
    constraint; carries the violation census for the error message."""


class ConcurrentCommitError(RuntimeError):
    """Delta's ConcurrentModificationException: a concurrent commit
    changed state this commit read, and the change is not provably
    commutative — touched buckets overlap, the schema evolved under
    us, or the base version was vacuumed mid-flight.  The caller
    re-reads the table and re-derives its commit; nothing was
    written to the log by the failed attempt."""


class _ManifestExists(Exception):
    """Internal: the put-if-absent manifest write lost the race for
    its version number (another writer owns it)."""


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

    def _resolve(self, d: str) -> str:
        """Manifest dirs are normally RELATIVE to the table root; a dir
        written by ``clone_from`` is ABSOLUTE (it lives under the
        SOURCE table) and passes through untouched."""
        return d if (d.startswith("/") or "://" in d) \
            else f"{self.path}/{d}"

    def _is_foreign(self, d: str) -> bool:
        """True for a dir that does not live under this table's root —
        clone-borrowed data this table must never delete."""
        return not self._resolve(d).startswith(f"{self.path}/")

    def _jpath(self, rel: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(
            self._resolve(rel))

    def _write_text(self, rel: str, text: str,
                    overwrite: bool = True) -> None:
        """``overwrite=False`` is the put-if-absent commit primitive.

        Local paths publish via write-temp + ``os.link`` — the hard
        link is atomic-exclusive at the kernel (EEXIST on a lost
        race) AND the winning manifest appears fully written, so no
        reader can observe a torn JSON.  Non-local stores go through
        ``fs.create(path, false)``, atomic on HDFS/ABFS — the same
        per-store delegation Delta's LogStore makes.  A lost race
        surfaces as ``_ManifestExists`` so the committer can rebase."""
        target = self._resolve(rel)
        if not overwrite and "://" not in target \
                and not target.startswith("file:"):
            import os
            import tempfile

            d = os.path.dirname(target)
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, prefix="._commit_")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(text.encode("utf-8"))
                try:
                    os.link(tmp, target)
                except FileExistsError:
                    raise _ManifestExists(rel) from None
            finally:
                os.unlink(tmp)
            return
        from py4j.protocol import Py4JJavaError

        fs, _ = self._fs()
        try:
            out = fs.create(self._jpath(rel), overwrite)
        except Py4JJavaError as e:
            if not overwrite and ("xists" in str(e)):
                raise _ManifestExists(rel) from None
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    @staticmethod
    def _commit_token() -> str:
        """Writer-unique suffix for data/sidecar dir names: two racing
        writers at the same anticipated version must never address the
        same physical path, or the loser's parquet write would clobber
        files the winner's manifest already references."""
        import uuid

        return uuid.uuid4().hex[:8]

    def _put_manifest(self, v: int, manifest: dict) -> None:
        """Publish version ``v`` put-if-absent; raises _ManifestExists
        when another writer owns ``v``.  On success, every Nth commit
        refreshes the log checkpoint (``_last_checkpoint`` parity) so
        version listing stays O(tail) at any log length."""
        self._write_text(f"_log/v{v:012d}.json", json.dumps(manifest),
                         overwrite=False)
        if v > 0 and v % self.checkpoint_interval == 0:
            try:
                self._write_checkpoint()
            except Exception:
                # the checkpoint is derivable metadata — a failed
                # refresh (e.g. a racing writer) never fails the commit
                pass

    def _read_text(self, rel: str) -> str:
        fs, jvm = self._fs()
        inp = fs.open(self._jpath(rel))
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(
                inp, "UTF-8")
        finally:
            inp.close()

    # ---- log --------------------------------------------------------------
    #
    # Log resolution is CHECKPOINTED (round 13 — Delta's
    # `_last_checkpoint` parity): every `checkpoint_interval` commits,
    # `_log/_last_checkpoint.json` records the version list and the
    # history rows up to that version.  `versions()` then resolves as
    # checkpoint + EXISTENCE PROBES for the tail (v+1, v+2, ... until
    # the first missing manifest) instead of a full `_log/` listing —
    # O(tail) point reads per operation at any log length, where a
    # 10k-commit log would otherwise pay a 10k-entry (paginated, on
    # object stores) listing per read/commit.  Tail probing is sound
    # because put-if-absent allocates versions contiguously; the only
    # gap-maker is `vacuum`, which rewrites the checkpoint.

    checkpoint_interval = 20

    def _list_log_versions(self) -> list[int]:
        """Full `_log/` listing — the uncheckpointed fallback and the
        checkpoint writer's ground truth."""
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

    def _read_checkpoint(self) -> dict | None:
        fs, _ = self._fs()
        if not fs.exists(self._jpath("_log/_last_checkpoint.json")):
            return None
        return json.loads(self._read_text("_log/_last_checkpoint.json"))

    def _write_checkpoint(self) -> None:
        """Refresh `_log/_last_checkpoint.json` from the prior
        checkpoint plus the tail (O(tail) manifest reads in the steady
        state; a full listing only when no checkpoint exists yet or
        after vacuum).  Overwrite-racy by design: concurrent refreshes
        both write a valid checkpoint (the lists only ever extend
        between vacuums) and probing absorbs either winner."""
        ck = self._read_checkpoint()
        if ck is None:
            vs = self._list_log_versions()
            hist = []
        else:
            vs = list(ck["versions"])
            hist = [list(r) for r in ck["history"]]
            top = vs[-1] if vs else -1
            while True:
                fs, _ = self._fs()
                nxt = top + 1
                if not fs.exists(self._jpath(f"_log/v{nxt:012d}.json")):
                    break
                vs.append(nxt)
                top = nxt
        known = {r[0] for r in hist}
        for v in vs:
            if v not in known:
                m = self._manifest(v)
                hist.append([m["version"], m["op"], len(m["dirs"]),
                             m["n_rows"]])
        hist.sort()
        self._write_text("_log/_last_checkpoint.json", json.dumps(
            {"version": vs[-1] if vs else -1, "versions": vs,
             "history": hist}))

    def versions(self) -> list[int]:
        ck = self._read_checkpoint()
        if ck is None:
            return self._list_log_versions()
        fs, _ = self._fs()
        out = list(ck["versions"])
        nxt = (out[-1] if out else ck["version"]) + 1
        while fs.exists(self._jpath(f"_log/v{nxt:012d}.json")):
            out.append(nxt)
            nxt += 1
        return out

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        return json.loads(self._read_text(f"_log/v{version:012d}.json"))

    def _schema_of(self, version: int) -> StructType | None:
        """The snapshot's schema as committed in its manifest (Delta
        keeps schema in the log for the same reason): readers never
        infer from data files, so a snapshot whose older files predate
        an ADDED column still reads uniformly — parquet fills the
        missing column with nulls.  None for pre-schema manifests."""
        sj = self._manifest(version).get("schema")
        return StructType.fromJson(json.loads(sj)) if sj else None

    def _merged_schema_json(self, df: DataFrame) -> str:
        """Prior manifest schema extended by ``df``'s NEW fields (by
        name, appended in df order) — additive schema evolution: an
        append/upsert may add columns; existing columns keep their
        committed type, dropped-from-batch columns stay in the table
        (the batch's rows read as null there)."""
        if not self.versions():
            return df.schema.json()
        prior = self._schema_of(self.latest())
        if prior is None:
            return df.schema.json()
        have = {f.name for f in prior.fields}
        fields = list(prior.fields) + [f for f in df.schema.fields
                                       if f.name not in have]
        return StructType(fields).json()

    def _commit(self, df: DataFrame, op: str,
                carry_dirs: list[str], carry_rows: int = 0,
                schema_json: str | None = None,
                conflict: str = "fail",
                base_version: int | None = None) -> int:
        """Row accounting is arithmetic — ``carry_rows`` (the carried
        dirs' count, known from the prior manifest) plus a footer-only
        count of the NEWLY written dir — so a commit's cost is bounded
        by its batch even when the manifest carries a 100 TB tail.

        ``conflict`` is the Delta conflict policy when the put-if-
        absent manifest write loses its race: 'blind' (overwrite reads
        nothing — retry at the new head), 'append' (commutative —
        rebase carried dirs/rows onto the new head and retry), 'fail'
        (read-modify-write over the whole snapshot — raise
        ConcurrentCommitError, the caller re-derives).

        ``base_version`` is the version the caller READ its carried
        state from; non-blind commits publish at exactly base+1 (OCC
        pinning — publishing at latest()+1 would let a stale writer
        land at a fresh number without ever colliding)."""
        if conflict == "blind":
            v = (self.latest() + 1) if self.versions() else 0
        else:
            v = 0 if base_version is None else base_version + 1
        new_dir = f"data/v{v:012d}-{self._commit_token()}"
        full = f"{self.path}/{new_dir}"
        df.write.mode("overwrite").parquet(full)
        batch_rows = self.spark.read.parquet(full).count()
        dirs = list(carry_dirs) + [new_dir]
        n_rows = int(carry_rows) + batch_rows
        while True:
            manifest = {"version": v, "op": op, "dirs": dirs,
                        "n_rows": n_rows, "schema": schema_json
                        if schema_json is not None else df.schema.json()}
            try:
                self._put_manifest(v, manifest)
                return v
            except _ManifestExists:
                if conflict == "blind":
                    v = self.latest() + 1
                elif conflict == "append":
                    # rebase onto the new head: carry ITS dirs/rows and
                    # re-merge the schema against ITS committed schema
                    # (additive evolution composes — appends commute)
                    m = self._manifest(self.latest())
                    dirs = list(m["dirs"]) + [new_dir]
                    n_rows = int(m["n_rows"]) + batch_rows
                    schema_json = self._merged_schema_json(df)
                    v = m["version"] + 1
                else:
                    raise ConcurrentCommitError(
                        f"{op} against {self.path} lost its commit "
                        f"race for v{v} to a concurrent writer; "
                        "re-read and re-derive") from None

    # ---- operations -------------------------------------------------------

    def read(self, version: int | None = None,
             tag: str | None = None) -> DataFrame:
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            t = self.tags()
            if tag not in t:
                raise ValueError(f"unknown tag {tag!r}; have {sorted(t)}")
            version = t[tag]
        if version is None:
            version = self.latest()
            if version is None:
                raise ValueError(f"no versions at {self.path}")
        if version not in self.versions():
            raise ValueError(
                f"version {version} not in log (vacuumed or never "
                f"written); available: {self.versions()}")
        m = self._manifest(version)
        reader = self.spark.read
        st = self._schema_of(version)
        if st is not None:
            reader = reader.schema(st)
        return reader.parquet(*[self._resolve(d) for d in m["dirs"]])

    def commit_append(self, df: DataFrame) -> int:
        if self.versions():
            m = self._manifest(self.latest())
            prev, prev_rows, base = m["dirs"], m["n_rows"], m["version"]
        else:
            prev, prev_rows, base = [], 0, None
        return self._commit(df, "append", prev, prev_rows,
                            schema_json=self._merged_schema_json(df),
                            conflict="append", base_version=base)

    def commit_overwrite(self, df: DataFrame) -> int:
        return self._commit(df, "overwrite", [], conflict="blind")

    def upsert(self, df: DataFrame, keys: list[str]) -> int:
        """Merge-on-key: incoming rows replace matching keys; the merged
        snapshot is written as a fresh commit (old files untouched, so
        every earlier version keeps reading its own bytes)."""
        if not self.versions():
            return self._commit(df, "upsert", [])
        base = self.latest()
        cur = self.read(base)
        kept = cur.join(df.select(*keys).distinct(), keys, "left_anti")
        return self._commit(
            kept.unionByName(df, allowMissingColumns=True), "upsert", [],
            base_version=base)

    def delete_where(self, cond) -> int:
        """Snapshot delete: survivors written as a fresh overwrite
        commit (the engine-level delete — no file mutation)."""
        base = self.latest()
        return self._commit(self.read(base).filter(~cond), "delete", [],
                            base_version=base)

    def history(self) -> DataFrame:
        """Commit audit rows — EXACT at any log length, but resolved
        from the checkpoint's pre-aggregated rows plus tail-manifest
        reads (O(tail) point reads) when a checkpoint exists."""
        vs = self.versions()
        ck = self._read_checkpoint()
        pre = {r[0]: r for r in (ck or {}).get("history", [])}
        rows = [tuple(pre[v]) if v in pre else
                (lambda m: (m["version"], m["op"], len(m["dirs"]),
                            m["n_rows"]))(self._manifest(v))
                for v in vs]
        from document_vector_pipeline_spark.functions.localrel import (
            local_df,
        )
        return local_df(
            self.spark,
            rows, "version int, op string, n_dirs int, n_rows long")

    def clone_from(self, src: "VersionedTable",
                   version: int | None = None) -> int:
        """Zero-copy SHALLOW CLONE (Delta's CLONE ... SHALLOW): publish
        the SOURCE table's version-N snapshot as this table's next
        commit by writing one manifest whose dirs are the source dirs'
        ABSOLUTE paths — no data bytes move at any table size.  The
        clone then evolves independently: its own commits write local
        dirs, and bucket-incremental upserts rewrite borrowed buckets
        into local dirs on first touch (copy-on-write at bucket
        grain).  Safety: this table's ``vacuum`` never deletes a
        foreign (source-owned) dir; conversely the SOURCE's vacuum
        does not know about clones — keep the cloned version alive in
        the source (or never vacuum it) for as long as the clone
        borrows it, exactly Delta's shallow-clone contract."""
        m = src._manifest(version if version is not None
                          else src.latest())
        dirs = [src._resolve(d) for d in m["dirs"]]
        v = (self.latest() + 1) if self.versions() else 0
        manifest = {"op": "clone", "dirs": dirs,
                    "n_rows": m["n_rows"], "schema": m.get("schema")}
        # deletion vectors ride along, keys and sidecar paths
        # absolutized to the source like the data dirs (round 12:
        # cloning a DV snapshot must not resurrect its deleted rows);
        # per-dir stats carry under the same absolutized keys
        if m.get("dv"):
            manifest["dv"] = {
                src._resolve(d): [src._resolve(e) for e in es]
                for d, es in m["dv"].items()}
        if m.get("stats"):
            manifest["stats"] = {src._resolve(d): st
                                 for d, st in m["stats"].items()}
        # the stats-column DECLARATION travels with the clone too —
        # without it the clone's first commit would find stats_columns()
        # empty and silently drop every carried stats entry
        sfs, _ = src._fs()
        if sfs.exists(src._jpath("_log/stats_cols.json")):
            self._write_text("_log/stats_cols.json",
                             src._read_text("_log/stats_cols.json"))
        while True:
            manifest["version"] = v
            try:
                # blind retry: a clone publishes an external snapshot
                # and reads nothing from the head it lands on
                self._put_manifest(v, manifest)
                return v
            except _ManifestExists:
                v = self.latest() + 1

    # ---- tags ---------------------------------------------------------

    def tag(self, name: str, version: int | None = None) -> int:
        """Named snapshot pin (Delta/Iceberg tags): ``read(tag=name)``
        resolves through it forever, and ``vacuum`` NEVER drops a
        tagged version — the lineage pin a training run takes on its
        input table ('prod', 'eval-2026-08') so retention policy can't
        pull the data out from under a reproducibility claim.  One
        driver-side JSON write; re-tagging a name moves it."""
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9._-]+", name or ""):
            raise ValueError(f"invalid tag name {name!r}")
        v = self.latest() if version is None else version
        if v not in self.versions():
            raise ValueError(
                f"version {v} not in log; available: {self.versions()}")
        self._write_text(f"_tags/{name}.json", json.dumps({"version": v}))
        return v

    def tags(self) -> dict[str, int]:
        fs, _ = self._fs()
        p = self._jpath("_tags")
        if not fs.exists(p):
            return {}
        out = {}
        for st in fs.listStatus(p):
            n = st.getPath().getName()
            if n.endswith(".json"):
                out[n[:-5]] = json.loads(
                    self._read_text(f"_tags/{n}"))["version"]
        return out

    def delete_tag(self, name: str) -> None:
        fs, _ = self._fs()
        fs.delete(self._jpath(f"_tags/{name}.json"), False)

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: re-publish ``version``'s snapshot as a
        NEW commit by carrying that manifest's dirs by reference — one
        driver-side JSON write, ZERO bytes moved at any table size.
        Rollback is itself an auditable commit (history keeps the bad
        versions), later commits continue from the restored state, and
        ``vacuum`` keeps the restored dirs live because the newest
        manifest references them.  Works unchanged on the bucketed
        subclass: carried dirs keep their bucket names, so subsequent
        bucket-incremental upserts match them."""
        if version not in self.versions():
            raise ValueError(
                f"version {version} not in log (vacuumed or never "
                f"written); available: {self.versions()}")
        m = self._manifest(version)
        v = self.latest() + 1
        while True:
            manifest = {"version": v, "op": "restore",
                        "dirs": m["dirs"], "n_rows": m["n_rows"],
                        "schema": m.get("schema")}
            # deletion vectors and column stats are PART of the
            # snapshot: restoring without them would resurrect DV'd
            # rows / lose the skipping index (round 12)
            for extra in ("dv", "stats"):
                if m.get(extra):
                    manifest[extra] = m[extra]
            try:
                # blind retry on a lost race: "make the head equal
                # snapshot X" reads nothing from the head it replaces
                self._put_manifest(v, manifest)
                return v
            except _ManifestExists:
                v = self.latest() + 1

    def vacuum(self, keep_last: int = 1,
               orphan_grace_ms: int = 3_600_000) -> list[int]:
        """Drop all but the newest ``keep_last`` versions: delete their
        manifests, then every data dir no kept manifest references.
        TAGGED versions are always kept (retention cannot break a
        lineage pin — delete the tag first to release it).  Returns the
        dropped version numbers.  All deletes go through the Hadoop
        FileSystem — object-store-safe.

        Orphan reclaim (round 13): data/dv dirs referenced by NO
        manifest — a conflict-loser's write, or a crash between data
        write and manifest put — are deleted too, but only when older
        than ``orphan_grace_ms``: an IN-FLIGHT writer's dir looks
        identical to an orphan until its manifest publishes, so the
        grace window is what keeps vacuum safe to run beside live
        writers (Delta's retention-check discipline, applied to
        unpublished files)."""
        vs = self.versions()
        tagged = set(self.tags().values())
        drop = [v for v in vs[:-keep_last] if v not in tagged]
        keep = [v for v in vs if v in tagged or v in vs[-keep_last:]]
        def refs(v):
            m = self._manifest(v)
            out = set(m["dirs"])
            for es in m.get("dv", {}).values():
                out |= set(es)
            return out

        live = {d for v in keep for d in refs(v)}
        dead = {d for v in drop for d in refs(v)} - live
        fs, _ = self._fs()
        for v in drop:
            fs.delete(self._jpath(f"_log/v{v:012d}.json"), False)
        for d in dead:
            if self._is_foreign(d):
                continue          # clone-borrowed: the source owns it
            fs.delete(self._jpath(d), True)
        # reclaim ORPHANED data dirs: a writer that lost its commit race
        # (ConcurrentCommitError) wrote dirs no manifest ever published —
        # referenced by neither kept (live) nor dropped (dead) manifests
        import time as _time

        referenced = {self._resolve(d) for d in live | dead}
        now_ms = int(_time.time() * 1000)
        for sub in ("data", "dv"):
            if not fs.exists(self._jpath(sub)):
                continue
            for st in fs.listStatus(self._jpath(sub)):
                p = f"{sub}/{st.getPath().getName()}"
                if not st.isDirectory():
                    continue
                if now_ms - st.getModificationTime() < orphan_grace_ms:
                    continue      # possibly an in-flight writer's dir
                # a bucketed manifest references LEAF dirs
                # (data/vN-tok/__pb=B) — a parent is orphaned only
                # when it is not referenced itself AND none of its
                # leaves is
                pref = self._resolve(p)
                if pref not in referenced and not any(
                        x.startswith(pref + "/") for x in referenced):
                    fs.delete(self._jpath(p), True)
        # the checkpoint's version list must not claim vacuumed
        # versions, and tail probing must restart from a surviving
        # contiguity point — rebuild it from the post-vacuum listing
        if self._read_checkpoint() is not None:
            fs.delete(self._jpath("_log/_last_checkpoint.json"), False)
            self._write_checkpoint()
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


class BucketedVersionedTable(VersionedTable):
    """VersionedTable whose rows carry a hash-bucket column and whose
    commits are BUCKET-INCREMENTAL — the Delta/Iceberg file-level merge
    the base class's docstring calls out as the missing narrowing:

    - the initial commit writes ``data/v0`` partitioned by the bucket
      column, and the manifest lists one dir PER BUCKET
      (``data/v0/bucket=B``);
    - ``upsert``/``delete_rows`` read and rewrite ONLY the buckets the
      batch's keys hash into; every untouched bucket's dir is CARRIED
      BY REFERENCE into the new manifest — zero bytes moved for 1-1/N
      of a 100 TB table on a one-document commit;
    - ``read``/``history``/``vacuum`` are inherited unchanged: a
      manifest is still just a list of live dirs, so snapshot
      isolation, time travel, and dead-dir vacuuming work identically.

    Row counts are maintained arithmetically (prior − replaced +
    incoming) instead of the base class's count-the-world scan — a
    commit's cost is bounded by its affected buckets at any scale."""

    def __init__(self, spark: SparkSession, path: str,
                 bucket_col: str = "bucket", codec: str | None = None):
        super().__init__(spark, path)
        self.bucket_col = bucket_col
        # per-table parquet codec override for data-dir writes (None =
        # session default).  The embedding-carrying vector store passes
        # "snappy": 1536-dim float arrays dominate its bytes and zstd
        # spends ~2x the encode CPU for a few MB saved — the same
        # tradeoff VectorStore._overwrite_buckets documents.  Readers
        # are codec-agnostic (parquet footer metadata), so results are
        # unchanged.
        self.codec = codec

    @staticmethod
    def _bucket_of(d: str) -> str:
        return d.rsplit("=", 1)[-1]          # '.../__pb=B' -> 'B'

    def _commit_dirs(self, op: str, dirs: list[str], n_rows: int,
                     schema_json: str | None = None,
                     dv: dict | None = None,
                     rebase: dict | None = None) -> int:
        """``schema_json`` defaults to the PRIOR manifest's schema —
        correct for every dir-algebra op (drop/restore/optimize/
        delete); commits that can EVOLVE the schema (overwrite/append/
        upsert) pass the batch-merged schema explicitly.

        When stats columns are declared (``set_stats_columns``), the
        manifest also records per-dir min/max for them — carried dirs
        reuse the prior manifest's entries (zero reads), new dirs are
        profiled in ONE grouped aggregation over the commit's batch
        (Delta/Iceberg file statistics; the read-side consumer is
        ``read(predicate=...)``).

        The manifest publishes PUT-IF-ABSENT (round 13).  ``rebase``
        is the commit's Delta conflict policy for a lost race:

        - ``None`` — raise ConcurrentCommitError (read-modify-write
          over state the commit cannot prove untouched: whole-table
          delete, optimize, schema evolution);
        - ``{"blind": True}`` — retry at the new head unchanged
          (overwrite reads nothing);
        - ``{"base_version", "affected", "new_dirs", "new_rows",
          "removed_rows", "keep_affected"?, "dv_touched"?}`` — bucket-
          level rebase: verify every concurrent commit since
          ``base_version`` left the ``affected`` buckets AND the schema
          untouched, then recompute carried dirs / row arithmetic /
          deletion vectors against the new head and retry.  Appends
          pass ``affected=∅`` (commute with everything but schema
          changes); merges/upserts pass their touched bucket set —
          disjoint writers all land, overlapping writers fail with
          the Delta ConcurrentModification semantics."""
        if schema_json is None and self.versions():
            schema_json = self._manifest(self.latest()).get("schema")
        # OCC version pinning: a commit that READ base version B may
        # only publish as B+1 — publishing at latest()+1 would let a
        # stale writer land at a fresh number without ever colliding
        # (silent lost update).  Blind commits and legacy callers
        # without a base target the current head and rely on the
        # put-if-absent loop alone.
        pinned = (rebase is not None and not rebase.get("blind")
                  and "base_version" in rebase)
        while True:
            if pinned:
                b = rebase["base_version"]
                v = 0 if b is None else b + 1
            else:
                v = (self.latest() + 1) if self.versions() else 0
            manifest = {"version": v, "op": op, "dirs": sorted(dirs),
                        "n_rows": int(n_rows), "schema": schema_json}
            stats = self._stats_for_commit(dirs)
            if stats:
                manifest["stats"] = stats
            eff_dv = dv
            if eff_dv is None and self.versions():
                # default deletion-vector carry: prior entries
                # restricted to dirs still present (a rewritten dir
                # sheds its DVs — the rewrite materialized them)
                prior_dv = self._manifest(self.latest()).get("dv", {})
                keep = set(dirs)
                eff_dv = {d: e for d, e in prior_dv.items()
                          if d in keep and e}
            if eff_dv:
                manifest["dv"] = eff_dv
            try:
                self._put_manifest(v, manifest)
                return v
            except _ManifestExists:
                if rebase is not None and rebase.get("blind"):
                    continue     # only the version number moves
                dirs, n_rows, dv, head = self._rebase_commit(op, rebase)
                rebase = dict(rebase, base_version=head)

    def _changed_buckets(self, m_prev: dict, m_next: dict) -> set:
        """Bucket names whose live content differs between two
        adjacent manifests: dirs in the symmetric difference, plus
        carried dirs whose deletion-vector set changed."""
        d0, d1 = set(m_prev["dirs"]), set(m_next["dirs"])
        dv0 = m_prev.get("dv", {})
        dv1 = m_next.get("dv", {})
        ch = d0 ^ d1
        ch |= {d for d in (d0 & d1)
               if dv0.get(d, []) != dv1.get(d, [])}
        return {self._bucket_of(d) for d in ch}

    def _rebase_commit(self, op: str, rebase: dict | None):
        """Recompute (dirs, n_rows, dv) against the new head after a
        lost manifest race, or raise ConcurrentCommitError when the
        concurrent commits are not provably commutative with ours —
        see ``_commit_dirs`` for the policy table."""
        if rebase is None:
            raise ConcurrentCommitError(
                f"{op} against {self.path} lost its commit race and "
                "reads state it cannot prove untouched; re-read and "
                "re-derive")
        base = rebase.get("base_version")
        if base is None:
            raise ConcurrentCommitError(
                f"{op} against {self.path}: first-commit race "
                "(another writer initialized the table)")
        if rebase.get("affected") is None:
            # base known but no commutativity info: the op read state
            # it cannot prove untouched (optimize, whole-table delete)
            raise ConcurrentCommitError(
                f"{op} against {self.path} lost its commit race for "
                f"v{base + 1}; re-read and re-derive")
        vs = self.versions()
        if base not in vs:
            raise ConcurrentCommitError(
                f"{op} against {self.path}: base version {base} was "
                "vacuumed mid-flight")
        affected = {str(b) for b in rebase["affected"]}
        base_schema = self._manifest(base).get("schema")
        prev_m = self._manifest(base)
        for w in [x for x in vs if x > base]:
            mw = self._manifest(w)
            if mw.get("schema") != base_schema:
                raise ConcurrentCommitError(
                    f"{op} against {self.path}: concurrent commit "
                    f"v{w} changed the schema")
            overlap = self._changed_buckets(prev_m, mw) & affected
            if overlap:
                raise ConcurrentCommitError(
                    f"{op} against {self.path}: concurrent commit "
                    f"v{w} touched buckets {sorted(overlap)} this "
                    "commit also touches")
            prev_m = mw
        m_head = prev_m
        if rebase.get("keep_affected"):
            carried = list(m_head["dirs"])
        else:
            carried = [d for d in m_head["dirs"]
                       if self._bucket_of(d) not in affected]
        dirs = carried + list(rebase["new_dirs"])
        n_rows = (int(m_head["n_rows"])
                  - int(rebase.get("removed_rows") or 0)
                  + int(rebase.get("new_rows") or 0))
        dv = None
        if rebase.get("dv_touched") is not None:
            keep = set(dirs)
            dv = {d: e for d, e in m_head.get("dv", {}).items()
                  if d in keep and e}
            dv.update(rebase["dv_touched"])
        return dirs, n_rows, dv, m_head["version"]

    # ---- manifest column stats + data skipping (round 12) -----------------
    #
    # The Delta/Iceberg file-skipping layer: per-dir min/max for DECLARED
    # columns live in the manifest, so a predicate read drops whole dirs
    # from the listing before any parquet footer is opened — the pruning
    # level ABOVE parquet row-group stats (which z-order clustering
    # tightens WITHIN a dir; the two compose).  At 100 TB a manifest is
    # a few KB per thousand dirs and the skip decision is driver-side
    # arithmetic, never a scan.

    def set_stats_columns(self, cols: list[str]) -> None:
        """Declare the columns whose per-dir min/max every FUTURE commit
        records (Delta's dataSkippingNumIndexedCols, explicit).  Dirs
        committed before the declaration have no stats and are never
        skipped — the honest migration semantics (OPTIMIZE rewrites
        them under stats)."""
        self._write_text("_log/stats_cols.json", json.dumps(sorted(cols)))

    def stats_columns(self) -> list[str]:
        fs, _ = self._fs()
        if not fs.exists(self._jpath("_log/stats_cols.json")):
            return []
        return json.loads(self._read_text("_log/stats_cols.json"))

    @staticmethod
    def _stat_val(x):
        if x is None or isinstance(x, (int, float, str, bool)):
            return x
        return str(x)            # dates/timestamps: ISO strings sort right

    def _stats_for_commit(self, dirs: list[str]) -> dict:
        cols = self.stats_columns()
        if not cols:
            return {}
        pm = self._manifest(self.latest()) if self.versions() else {}
        prior = pm.get("stats", {})
        prior_dirs = set(pm.get("dirs", []))
        out = {d: prior[d] for d in dirs if d in prior}
        # profile ONLY dirs this commit wrote: a carried dir without
        # stats (written before set_stats_columns) stays stats-less —
        # re-profiling it here would make one commit read the whole
        # carried tail, which is exactly the O(table) cost the manifest
        # design forbids.  OPTIMIZE rewrites such dirs under stats.
        new = [d for d in dirs if d not in prior and d not in prior_dirs]
        if not new:
            return out
        # every new dir of one commit shares the version prefix and
        # differs only by bucket — ONE groupBy(bucket) aggregation
        # profiles them all (the bucket column survives inside files)
        by_prefix: dict[str, list[str]] = {}
        for d in new:
            by_prefix.setdefault(d.rsplit("/", 1)[0], []).append(d)
        for prefix, ds in by_prefix.items():
            # plain schema-inferring read: these dirs were written by
            # THIS commit, and the prior manifest's schema (_read_dirs)
            # would hide a declared column the batch just added via
            # schema evolution — it would then never get stats at all
            df = self.spark.read.parquet(*[self._resolve(d) for d in ds])
            have = [c for c in cols if c in df.columns]
            if not have:
                continue
            aggs = []
            for c in have:
                aggs += [F.min(c).alias(f"__mn_{c}"),
                         F.max(c).alias(f"__mx_{c}")]
            rows = df.groupBy(F.col(self.bucket_col).alias("__b")) \
                     .agg(*aggs).collect()
            by_bucket = {str(r["__b"]): r for r in rows}
            for d in ds:
                r = by_bucket.get(self._bucket_of(d))
                if r is None:
                    continue
                out[d] = {c: [self._stat_val(r[f"__mn_{c}"]),
                              self._stat_val(r[f"__mx_{c}"])]
                          for c in have}
        return out

    @staticmethod
    def _dir_survives(st: dict | None, conjuncts) -> bool:
        """False only when the dir's stats PROVE it disjoint with every
        row the predicate admits; missing stats (undeclared column,
        pre-declaration dir, all-null min/max) always keep the dir."""
        if st is None:
            return True
        for col, op, val in conjuncts:
            mm = st.get(col)
            if mm is None or mm[0] is None or mm[1] is None:
                continue
            mn, mx = mm
            try:
                if op == ">=" and not (mx >= val):
                    return False
                if op == ">" and not (mx > val):
                    return False
                if op == "<=" and not (mn <= val):
                    return False
                if op == "<" and not (mn < val):
                    return False
                if op == "=" and not (mn <= val <= mx):
                    return False
                if op == "between" and not (mn <= val[1]
                                            and mx >= val[0]):
                    return False
            except TypeError:
                # stats stored via _stat_val stringification vs a
                # non-string predicate value (e.g. datetime): skipping
                # is an OPTIMIZATION — degrade to keeping the dir, the
                # row filter stays correct
                continue
        return True

    def prune_dirs(self, predicate, version: int | None = None
                   ) -> tuple[list[str], list[str]]:
        """(kept_dirs, skipped_dirs) for a conjunctive predicate
        [(col, op, value), ...], ops in <, <=, >, >=, =, between
        (value=(lo, hi)) — the skip decision alone, exposed so tests
        and operators can PROVE dirs were dropped, not trust it."""
        v = self.latest() if version is None else version
        m = self._manifest(v)
        stats = m.get("stats", {})
        kept, skipped = [], []
        for d in m["dirs"]:
            (kept if self._dir_survives(stats.get(d), predicate)
             else skipped).append(d)
        return kept, skipped

    @staticmethod
    def _predicate_expr(conjuncts):
        e = F.lit(True)
        for col, op, val in conjuncts:
            c = F.col(col)
            if op == "between":
                e = e & (c >= val[0]) & (c <= val[1])
            elif op == "<":
                e = e & (c < val)
            elif op == "<=":
                e = e & (c <= val)
            elif op == ">":
                e = e & (c > val)
            elif op == ">=":
                e = e & (c >= val)
            elif op == "=":
                e = e & (c == val)
            else:
                raise ValueError(f"unsupported predicate op {op!r}")
        return e

    def read(self, version: int | None = None, tag: str | None = None,
             predicate=None) -> DataFrame:
        """``predicate`` (conjunct list, see ``prune_dirs``) turns the
        snapshot read into a SKIPPING read: dirs whose manifest stats
        prove them disjoint are dropped BEFORE listing, the survivors
        are read under the snapshot schema, and the predicate is still
        applied as a row filter (skipping is an optimization, never the
        correctness boundary — exactly Delta's contract)."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            t = self.tags()
            if tag not in t:
                raise ValueError(f"unknown tag {tag!r}; have {sorted(t)}")
            version = t[tag]
        if version is None:
            version = self.latest()
            if version is None:
                raise ValueError(f"no versions at {self.path}")
        if version not in self.versions():
            raise ValueError(
                f"version {version} not in log (vacuumed or never "
                f"written); available: {self.versions()}")
        m = self._manifest(version)
        if predicate is None:
            if not m.get("dv"):
                return super().read(version)
            return self._read_live(m["dirs"], version=version, m=m)
        kept, _ = self.prune_dirs(predicate, version=version)
        flt = self._predicate_expr(predicate)
        if not kept:
            st = self._schema_of(version)
            return self.spark.createDataFrame([], st)
        return self._read_live(kept, version=version, m=m).filter(flt)

    # ---- deletion vectors (round 12) ---------------------------------------
    #
    # Delta deletion-vector semantics at this store's natural
    # granularity, the KEY: a merge_dv commit appends its live rows as
    # fresh dirs and records the batch's keys in a small sidecar
    # (``dv/v{N}``), mapped in the manifest to the prior dirs of the
    # affected buckets.  NO data file is read-for-rewrite: delete/update
    # cost is O(batch) + a key-column-pruned accounting scan, and the
    # physical rewrite is deferred to OPTIMIZE, which materializes the
    # DVs and sheds them.  Readers subtract DV keys with a broadcast
    # anti join scoped to exactly the dirs each DV covers, so a key
    # re-inserted AFTER its deletion (living in a newer dir the DV does
    # not cover) survives correctly.

    def _read_live(self, dirs: list[str], version: int | None = None,
                   m: dict | None = None) -> DataFrame:
        """DV-aware read of ``dirs`` under manifest ``m`` (default: the
        version's): dirs are grouped by their deletion-vector set and
        each group anti-joins its DV keys (broadcast — DVs are
        batch-sized); DV-free groups read straight through."""
        if m is None:
            m = self._manifest(self.latest() if version is None
                               else version)
        if not dirs:
            # zero live dirs (empty table): the schema'd reader returns
            # the typed-empty frame _read_dirs always has — frames[0]
            # below would IndexError (round-12 full-sweep regression)
            return self._read_dirs(dirs, version)
        dv = m.get("dv", {})
        groups: dict[tuple, list[str]] = {}
        for d in dirs:
            groups.setdefault(tuple(sorted(dv.get(d, []))), []).append(d)
        frames = []
        for dvset in sorted(groups):
            df = self._read_dirs(groups[dvset], version)
            if dvset:
                dvdf = self.spark.read.parquet(
                    *[self._resolve(x) for x in dvset]).distinct()
                df = df.join(F.broadcast(dvdf), on=list(dvdf.columns),
                             how="left_anti")
            frames.append(df)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def _live_count(self, dirs: list[str], m: dict) -> int:
        """Row count of ``dirs`` net of deletion vectors — footer-only
        when no DV covers them (the common case), a key-column scan
        otherwise."""
        if not dirs:
            return 0
        if not any(m.get("dv", {}).get(d) for d in dirs):
            return self._count_dirs(dirs)
        return self._read_live(dirs, m=m).count()

    def merge_dv(self, src: DataFrame, keys: list[str],
                 delete_col: str = "_deleted", op: str = "merge_dv",
                 constraints: dict | None = None) -> int:
        """MERGE with deletion vectors: same contract and final
        snapshot as ``merge`` (one atomic version; source rows with
        ``delete_col`` delete, others upsert; dup keys raise;
        constraints gate the commit) but ZERO data-file rewrite — the
        touched buckets' prior dirs are carried BYTE-IDENTICALLY, the
        batch's keys land in a ``dv/v{N}`` sidecar mapped onto those
        dirs, and the live rows append as fresh dirs.  Cost is the
        appended batch plus one key-column-pruned scan of the touched
        buckets (row accounting); ``merge`` pays a full rewrite of
        every touched bucket.  OPTIMIZE later materializes the DVs
        (Delta's purge).  The trade: reads of DV'd buckets pay a
        broadcast anti join until then — the standard
        write-amplification-vs-read-amplification dial."""
        if delete_col not in src.columns:
            raise ValueError(f"merge source must carry '{delete_col}'")
        self._require_bucket(src)
        src = src.localCheckpoint(eager=True)
        dups = (src.groupBy(*keys).count()
                .filter(F.col("count") > 1).limit(1).collect())
        if dups:
            raise ValueError(
                f"merge source carries duplicate keys (e.g. "
                f"{tuple(dups[0][k] for k in keys)}) — collapse to one "
                f"row per key upstream")
        live = src.filter(~F.coalesce(F.col(delete_col), F.lit(False)))\
            .drop(delete_col)
        if constraints:
            bad = [(r["constraint"], r["n_violations"]) for r in
                   constraint_violations(live, **constraints)
                   .filter(F.col("n_violations") > 0).collect()]
            if bad:
                raise ConstraintViolation(
                    "merge refused — batch violates declared "
                    f"constraints: {bad}")
        if not self.versions():
            dirs = self._write_buckets(live, 0)
            return self._commit_dirs(op, dirs, self._count_dirs(dirs),
                                     schema_json=live.schema.json(),
                                     rebase={"base_version": None,
                                             "affected": None})
        m = self._manifest(self.latest())
        affected = {str(r[0]) for r in
                    src.select(self.bucket_col).distinct().collect()}
        prior_dirs = [d for d in m["dirs"]
                      if self._bucket_of(d) in affected]
        v = self.latest() + 1
        # accounting scan BEFORE the DV lands: how many currently-live
        # rows does this batch kill (updates + deletes)?  Key columns
        # only — parquet column pruning keeps this metadata-cheap.
        n_killed = 0
        if prior_dirs:
            n_killed = (self._read_live(prior_dirs, m=m)
                        .select(*keys)
                        .join(F.broadcast(src.select(*keys).distinct()),
                              keys, "left_semi").count())
        prior_dv = m.get("dv", {})
        dv = {d: e for d, e in prior_dv.items() if d in set(m["dirs"])}
        if prior_dirs:
            # insert-only batches (no prior dirs in the affected
            # buckets) write NO sidecar — an unmapped dv dir would be
            # unreferenced garbage vacuum could never reclaim
            dv_dir = f"dv/v{v:012d}-{self._commit_token()}"
            (src.select(*keys).distinct().coalesce(1)
             .write.mode("overwrite").parquet(self._resolve(dv_dir)))
            for d in prior_dirs:
                dv[d] = dv.get(d, []) + [dv_dir]
        new_dirs = self._write_buckets(live, v) if live.take(1) else []
        new_rows = self._count_dirs(new_dirs)
        n_rows = m["n_rows"] - n_killed + new_rows
        return self._commit_dirs(
            op, m["dirs"] + new_dirs, n_rows,
            schema_json=self._merged_schema_json(live), dv=dv,
            rebase={"base_version": m["version"], "affected": affected,
                    "new_dirs": new_dirs, "new_rows": new_rows,
                    "removed_rows": n_killed,
                    # prior affected dirs are CARRIED (the DV covers
                    # them), so the rebase keeps the whole head and
                    # overlays this commit's sidecar mappings
                    "keep_affected": True,
                    "dv_touched": {d: dv[d] for d in prior_dirs}})

    def _write_buckets(self, df: DataFrame, v: int,
                       sort_key=None) -> list[str]:
        # partition on a DUPLICATE of the bucket column: partitionBy
        # strips its column from the data files, but readers open leaf
        # dirs directly (no partition inference), so the real bucket
        # column must survive inside the files.
        # ``sort_key`` (a Column) range-clusters rows WITHIN each bucket
        # on write (optimize's ZORDER/HILBERT path): rows are sorted by
        # (bucket, key) inside each task, so parquet row groups cover
        # narrow key ranges and footer min/max stats prune scans on the
        # clustered dimensions — content identical either way.
        # writer-unique token: racing writers at the same anticipated
        # version must never address the same physical path (the
        # version prefix is advisory — manifests address dirs by name)
        new_dir = f"data/v{v:012d}-{self._commit_token()}"
        w = df.withColumn("__pb", F.col(self.bucket_col)) \
              .repartition(self.bucket_col)
        if sort_key is not None:
            w = (w.withColumn("__ck", sort_key)
                 .sortWithinPartitions("__pb", "__ck").drop("__ck"))
        writer = w.write
        if self.codec is not None:
            writer = writer.option("compression", self.codec)
        (writer
         .partitionBy("__pb").mode("overwrite")
         .parquet(f"{self.path}/{new_dir}"))
        fs, _ = self._fs()
        out = []
        for st in fs.listStatus(self._jpath(new_dir)):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("__pb="):
                out.append(f"{new_dir}/{name}")
        return out

    def _read_dirs(self, dirs: list[str],
                   version: int | None = None) -> DataFrame:
        """``version`` selects which manifest's committed schema reads
        the dirs (default: latest) — after additive evolution, older
        files lack the new columns and must be read under the
        snapshot's schema so parquet null-fills them uniformly."""
        reader = self.spark.read
        if self.versions():
            st = self._schema_of(self.latest() if version is None
                                 else version)
            if st is not None:
                reader = reader.schema(st)
        return reader.parquet(*[self._resolve(d) for d in dirs])

    def _count_dirs(self, dirs: list[str]) -> int:
        # unfiltered count over parquet dirs is answered from row-group
        # footers (metadata-only) — row accounting never scans data
        if not dirs:
            return 0
        return self._read_dirs(dirs).count()

    def _require_bucket(self, df: DataFrame) -> None:
        if self.bucket_col not in df.columns:
            raise ValueError(
                f"BucketedVersionedTable commits require the "
                f"'{self.bucket_col}' column on every row")

    # The inherited commit methods would write plain 'data/vN' dirs with
    # no '__pb=' suffix — dirs _bucket_of can never match, so a later
    # bucketed upsert would silently carry them and keep stale rows for
    # keys it was supposed to replace.  All three are re-routed through
    # the bucketed writer so EVERY manifest dir carries its bucket name.

    def commit_overwrite(self, df: DataFrame) -> int:
        self._require_bucket(df)
        v = (self.latest() + 1) if self.versions() else 0
        dirs = self._write_buckets(df, v)
        return self._commit_dirs("overwrite", dirs, self._count_dirs(dirs),
                                 schema_json=df.schema.json(),
                                 rebase={"blind": True})

    def commit_append(self, df: DataFrame) -> int:
        self._require_bucket(df)
        # prior dirs are carried: a bucket may then be backed by several
        # dirs, which upsert/delete_rows handle (they match bucket NAMES,
        # reading/rewriting every dir of an affected bucket)
        if self.versions():
            m = self._manifest(self.latest())
            prev, prev_rows, v = m["dirs"], m["n_rows"], m["version"] + 1
            base = m["version"]
        else:
            prev, prev_rows, v = [], 0, 0
            base = None
        new_dirs = self._write_buckets(df, v)
        new_rows = self._count_dirs(new_dirs)
        # appends commute with everything but schema change:
        # affected=∅ + keep_affected carries the WHOLE new head
        return self._commit_dirs("append", prev + new_dirs,
                                 prev_rows + new_rows,
                                 schema_json=self._merged_schema_json(df),
                                 rebase={"base_version": base,
                                         "affected": set(),
                                         "new_dirs": new_dirs,
                                         "new_rows": new_rows,
                                         "removed_rows": 0,
                                         "keep_affected": True})

    def delete_where(self, cond) -> int:
        """Unrestricted-predicate delete: every bucket is affected, so
        survivors of ALL dirs are rewritten through the bucketed writer
        (``delete_rows`` is the narrowed variant when the caller knows
        the keys' buckets)."""
        if not self.versions():
            raise ValueError(f"no versions to delete from at {self.path}")
        m = self._manifest(self.latest())
        surv = self._read_live(m["dirs"], m=m).filter(~cond)
        v = self.latest() + 1
        new_dirs = self._write_buckets(surv, v)
        return self._commit_dirs("delete", new_dirs,
                                 self._count_dirs(new_dirs),
                                 rebase={"base_version": m["version"],
                                         "affected": None})

    def upsert(self, df: DataFrame, keys: list[str]) -> int:
        """Merge-on-key touching only the incoming rows' buckets; the
        merged result is written straight to the NEW version dir (never
        a self-overwrite, so no checkpoint), and all row accounting is
        metadata-only footer counts."""
        self._require_bucket(df)
        if not self.versions():
            # initial commit: the batch has exactly ONE consumer (the
            # bucket write) — a checkpoint here would materialize the
            # rows twice for nothing (row accounting is footer counts,
            # schema_json is metadata)
            dirs = self._write_buckets(df, 0)
            return self._commit_dirs("upsert", dirs, self._count_dirs(dirs),
                                     schema_json=df.schema.json(),
                                     rebase={"base_version": None,
                                             "affected": None})
        df = df.localCheckpoint(eager=True)   # embeddings computed once
        m = self._manifest(self.latest())
        affected = {str(r[0]) for r in
                    df.select(self.bucket_col).distinct().collect()}
        carried = [d for d in m["dirs"]
                   if self._bucket_of(d) not in affected]
        touched = [d for d in m["dirs"] if self._bucket_of(d) in affected]
        if touched:
            cur = self._read_live(touched, m=m)   # net of deletion vectors
            merged = (cur.join(df.select(*keys).distinct(), keys,
                               "left_anti")
                      .unionByName(df, allowMissingColumns=True))
        else:
            merged = df
        v = self.latest() + 1
        new_dirs = self._write_buckets(merged, v)
        removed = self._live_count(touched, m)
        new_rows = self._count_dirs(new_dirs)
        n_rows = m["n_rows"] - removed + new_rows
        return self._commit_dirs("upsert", carried + new_dirs, n_rows,
                                 schema_json=self._merged_schema_json(df),
                                 rebase={"base_version": m["version"],
                                         "affected": affected,
                                         "new_dirs": new_dirs,
                                         "new_rows": new_rows,
                                         "removed_rows": removed})

    def merge(self, src: DataFrame, keys: list[str],
              delete_col: str = "_deleted", op: str = "merge",
              constraints: dict | None = None) -> int:
        """Delta-style MERGE INTO as ONE commit: a source row with
        ``delete_col`` true deletes its matching target rows; every
        other source row updates its match or inserts (``upsert``
        semantics).  A single manifest version captures the whole
        batch, so no reader can observe the half-applied state that
        separate delete+upsert commits expose between versions — the
        atomicity a CDC-apply job needs.

        Cost model is ``upsert``'s: only the source keys' buckets are
        read and rewritten, every untouched bucket's dir is carried by
        reference, and row accounting is metadata-only footer counts —
        a one-document merge against a 100 TB table moves one bucket.

        The source must carry each key ONCE (a delete and an upsert of
        the same key in one batch is order-ambiguous — collapse
        upstream, e.g. streaming/ingest's seq_col latest-wins); dup
        keys raise.  ``delete_col`` is stripped before writing and
        never evolves the schema.  ``op`` labels the manifest commit
        (streaming callers stamp it with the batch id for replay
        detection).  ``constraints`` (kwargs for
        ``constraint_violations``: not_null/unique/checks) are
        enforced on the batch's live rows BEFORE any write — a
        violating batch raises ConstraintViolation with the census
        and leaves no version behind (Delta CHECK/NOT NULL
        semantics at the commit gate).  Reference contrast: the mutate-in-
        place store (CosmosDBClientWrapper.cs:36-70) applies each
        document separately with no batch atomicity at all."""
        if delete_col not in src.columns:
            raise ValueError(f"merge source must carry '{delete_col}'")
        self._require_bucket(src)
        src = src.localCheckpoint(eager=True)   # computed once, used 3x
        dups = (src.groupBy(*keys).count()
                .filter(F.col("count") > 1).limit(1).collect())
        if dups:
            raise ValueError(
                f"merge source carries duplicate keys (e.g. "
                f"{tuple(dups[0][k] for k in keys)}) — collapse to one "
                f"row per key upstream")
        live = src.filter(~F.coalesce(F.col(delete_col), F.lit(False)))\
            .drop(delete_col)
        if constraints:
            # validate the batch's LIVE rows (deletes carry no payload
            # obligations) BEFORE any write — a refused merge leaves no
            # version behind.  The census collect is constraints-sized.
            bad = [(r["constraint"], r["n_violations"]) for r in
                   constraint_violations(live, **constraints)
                   .filter(F.col("n_violations") > 0).collect()]
            if bad:
                raise ConstraintViolation(
                    "merge refused — batch violates declared "
                    f"constraints: {bad}")
        if not self.versions():
            dirs = self._write_buckets(live, 0)
            return self._commit_dirs(op, dirs, self._count_dirs(dirs),
                                     schema_json=live.schema.json(),
                                     rebase={"base_version": None,
                                             "affected": None})
        m = self._manifest(self.latest())
        affected = {str(r[0]) for r in
                    src.select(self.bucket_col).distinct().collect()}
        carried = [d for d in m["dirs"]
                   if self._bucket_of(d) not in affected]
        touched = [d for d in m["dirs"] if self._bucket_of(d) in affected]
        if touched:
            cur = self._read_live(touched, m=m)   # net of deletion vectors
            merged = (cur.join(src.select(*keys).distinct(), keys,
                               "left_anti")
                      .unionByName(live, allowMissingColumns=True))
        else:
            merged = live
        v = self.latest() + 1
        new_dirs = self._write_buckets(merged, v)
        removed = self._live_count(touched, m)
        new_rows = self._count_dirs(new_dirs)
        n_rows = m["n_rows"] - removed + new_rows
        # disjoint-bucket merges are the commutative case Delta
        # rebases; overlapping writers fail in _rebase_commit
        return self._commit_dirs(op, carried + new_dirs, n_rows,
                                 schema_json=self._merged_schema_json(live),
                                 rebase={"base_version": m["version"],
                                         "affected": affected,
                                         "new_dirs": new_dirs,
                                         "new_rows": new_rows,
                                         "removed_rows": removed})

    def _touched_dirs(self, v_a: int, v_b: int) -> tuple[list, list]:
        """Each version's dirs restricted to buckets in the two
        manifests' symmetric difference — the only buckets whose rows
        can differ (a carried dir is the same immutable path in both
        versions).  Metadata-only: two driver-side JSON reads."""
        ma, mb = self._manifest(v_a), self._manifest(v_b)
        da, db = set(ma["dirs"]), set(mb["dirs"])
        touched = {self._bucket_of(d) for d in da.symmetric_difference(db)}
        # deletion vectors mutate a dir's LIVE content without changing
        # its path — a dir whose DV set differs between the manifests is
        # touched even though it is carried byte-identically
        dva, dvb = ma.get("dv", {}), mb.get("dv", {})
        touched |= {self._bucket_of(d) for d in (da & db)
                    if dva.get(d, []) != dvb.get(d, [])}
        ra = [d for d in ma["dirs"] if self._bucket_of(d) in touched]
        rb = [d for d in mb["dirs"] if self._bucket_of(d) in touched]
        return ra, rb

    def _typed_empty(self, version: int, keys: list[str] | None) -> DataFrame:
        """Empty change-set frame with the REAL committed column types
        (from the snapshot's manifest schema, or a limit(0) read of its
        dirs when the manifest predates schema tracking) so a caller
        that unions a no-change transition's diff with typed frames
        from other transitions never hits NUM_COLUMNS_MISMATCH or an
        incompatible-type union.  ``keys=None`` → all table columns
        (diff_rows payload shape); otherwise just the key columns."""
        st = self._schema_of(version)
        if st is None:
            m = self._manifest(version)
            if m["dirs"]:
                st = self._read_dirs(m["dirs"]).schema
        fields = [StructField("status", StringType())]
        if st is not None:
            pick = (list(st.fields) if keys is None
                    else [f for c in keys for f in st.fields if f.name == c])
            fields += pick
        elif keys is not None:
            fields += [StructField(c, StringType()) for c in keys]
        return self.spark.createDataFrame([], StructType(fields))

    def diff(self, v_a: int, v_b: int, keys: list[str],
             digest) -> DataFrame:
        """Key-level change set between two snapshots — (status, *keys)
        with status in {added, removed, changed} — computed
        BUCKET-INCREMENTALLY: a dir carried by reference between the
        two manifests is the SAME immutable path, so its rows are
        bit-identical in both versions and (keys hashing to buckets)
        cannot differ anywhere else — only buckets owning a dir in the
        manifests' symmetric difference are read, from BOTH sides.
        This is the CDC-between-commits query Delta calls
        table_changes: diffing adjacent versions of a 100 TB table
        costs the touched buckets, not two table scans.

        ``digest`` is a long Column over the row (content fingerprint,
        e.g. md5 of the concatenated payload); per-key digests are
        SUMMED so duplicate keys from ``commit_append`` fold
        order-freely, and 'changed' means the summed fingerprints
        differ.  Unchanged keys inside a rewritten bucket drop out."""
        ra, rb = self._touched_dirs(v_a, v_b)

        def side(dirs, out, v):
            if not dirs:
                return None
            return (self._read_live(dirs, m=self._manifest(v))
                    .groupBy(*keys)
                    .agg(F.sum(digest).cast("long").alias(out)))

        a, b = side(ra, "__da", v_a), side(rb, "__db", v_b)
        if a is None and b is None:
            return self._typed_empty(v_b, keys)
        if a is None:
            return b.select(F.lit("added").alias("status"), *keys)
        if b is None:
            return a.select(F.lit("removed").alias("status"), *keys)
        j = a.join(b, keys, "full_outer")
        status = (F.when(F.col("__da").isNull(), "added")
                  .when(F.col("__db").isNull(), "removed")
                  .when(F.col("__da") != F.col("__db"), "changed"))
        return (j.withColumn("status", status)
                .filter(F.col("status").isNotNull())
                .select("status", *keys))

    def optimize(self, cluster_by: tuple | None = None,
                 curve: str = "zorder", bits: int = 16) -> int:
        """Bucket compaction (Delta OPTIMIZE): after N appends a bucket
        is backed by N dirs and every read of it opens N file sets —
        rewrite ONLY the buckets backed by MORE THAN ONE dir into a
        single fresh dir each, carrying every single-dir bucket by
        reference.  The snapshot is content-identical (row accounting
        unchanged); cost is bounded by the FRAGMENTED buckets, not the
        table — the maintenance op an append-heavy 100 TB table runs
        on a schedule.  No-op (no commit) when nothing is fragmented;
        returns the resulting latest version either way.

        ``cluster_by=(col_a, col_b)`` is Delta/Iceberg's
        OPTIMIZE ... ZORDER BY: compaction also range-clusters rows
        WITHIN each bucket on the interleaved key of the two columns
        (``curve`` = 'zorder' | 'hilbert', plans/layout.py), so
        parquet footer min/max stats prune scans filtered on EITHER
        column inside a bucket — the second pruning level under the
        bucket partition.  Clustering rewrites EVERY bucket (the point
        is the layout, not just the dir count), still one
        content-identical commit."""
        if not self.versions():
            raise ValueError(f"no versions to optimize at {self.path}")
        m = self._manifest(self.latest())
        dv = m.get("dv", {})
        per_bucket: dict[str, list[str]] = {}
        for d in m["dirs"]:
            per_bucket.setdefault(self._bucket_of(d), []).append(d)
        if cluster_by is not None:
            from document_vector_pipeline_spark.plans import layout

            idx = {"zorder": layout.zorder_index,
                   "hilbert": layout.hilbert_index}[curve]
            key = idx(F.col(cluster_by[0]), F.col(cluster_by[1]), bits)
            v = self.latest() + 1
            new_dirs = self._write_buckets(
                self._read_live(m["dirs"], m=m), v, sort_key=key)
            return self._commit_dirs(f"optimize_{curve}", new_dirs,
                                     m["n_rows"], dv={},
                                     rebase={"base_version": m["version"],
                                             "affected": None})
        # a bucket is fragmented when backed by >1 dir OR any of its
        # dirs carries a deletion vector — OPTIMIZE is where DVs get
        # MATERIALIZED (Delta's purge): the rewrite drops dead rows and
        # the new manifest sheds the DV entries
        frag = [d for ds in per_bucket.values()
                if len(ds) > 1 or any(dv.get(x) for x in ds)
                for d in ds]
        if not frag:
            return self.latest()
        carried = [ds[0] for ds in per_bucket.values()
                   if len(ds) == 1 and not dv.get(ds[0])]
        v = self.latest() + 1
        new_dirs = self._write_buckets(self._read_live(frag, m=m), v)
        return self._commit_dirs("optimize", carried + new_dirs,
                                 m["n_rows"],
                                 rebase={"base_version": m["version"],
                                         "affected": None})

    def drop_buckets(self, buckets: list) -> int:
        """Whole-partition retention drop (DROP PARTITION / Timescale
        drop_chunks): the new manifest carries every dir whose bucket
        is NOT in ``buckets`` — a METADATA-ONLY commit; zero data
        bytes are read or written regardless of table size, because a
        bucket is dropped by omitting its dirs, and row accounting
        subtracts the dropped dirs' footer-only counts.  The dropped
        bytes stay on disk for older versions (time travel across the
        sweep) until ``vacuum`` reclaims them.  With a time-derived
        bucket column this IS the retention sweep a 100 TB event
        store runs nightly."""
        if not self.versions():
            raise ValueError(f"no versions to drop from at {self.path}")
        victims = {str(b) for b in buckets}
        m = self._manifest(self.latest())
        dropped = [d for d in m["dirs"] if self._bucket_of(d) in victims]
        kept = [d for d in m["dirs"] if self._bucket_of(d) not in victims]
        removed = self._live_count(dropped, m)
        return self._commit_dirs("drop", kept, m["n_rows"] - removed,
                                 rebase={"base_version": m["version"],
                                         "affected": victims,
                                         "new_dirs": [], "new_rows": 0,
                                         "removed_rows": removed})

    def diff_rows(self, v_a: int, v_b: int, keys: list[str],
                  digest) -> DataFrame:
        """The CDC PAYLOAD (Delta table_changes): ``diff``'s change set
        joined back to row content — 'removed' keys carry version
        ``v_a``'s rows, 'added'/'changed' carry ``v_b``'s (the
        after-image a downstream consumer applies).  Output: (status,
        <table columns...>); a multi-row key (commit_append) yields one
        payload row per physical row.  Reads the SAME touched buckets
        the key diff reads — the change set of adjacent commits on a
        100 TB table ships for the cost of its buckets."""
        d = (self.diff(v_a, v_b, keys, digest)
             .localCheckpoint(eager=True))
        ra, rb = self._touched_dirs(v_a, v_b)

        def side(dirs, part):
            if not dirs or part.isEmpty():
                return None
            rows = self._read_dirs(dirs)
            return rows.join(part, keys).select("status", *rows.columns)

        out_a = side(ra, d.filter(F.col("status") == "removed"))
        out_b = side(rb, d.filter(F.col("status") != "removed"))
        if out_a is None and out_b is None:
            return self._typed_empty(v_b, None)
        if out_a is None:
            return out_b
        if out_b is None:
            return out_a
        return out_a.unionByName(out_b)

    def delete_rows(self, cond, affected_buckets: list) -> int:
        """Snapshot delete bounded to ``affected_buckets`` (the caller
        derives them from the delete predicate's keys): survivors of
        those buckets are rewritten, every other dir is carried."""
        if not self.versions():
            raise ValueError(f"no versions to delete from at {self.path}")
        m = self._manifest(self.latest())
        names = {str(b) for b in affected_buckets}
        carried = [d for d in m["dirs"] if self._bucket_of(d) not in names]
        touched = [d for d in m["dirs"] if self._bucket_of(d) in names]
        if not touched:
            return self._commit_dirs(
                "delete", carried, m["n_rows"],
                rebase={"base_version": m["version"], "affected": names,
                        "new_dirs": [], "new_rows": 0,
                        "removed_rows": 0})
        surv = self._read_live(touched, m=m).filter(~cond)
        v = self.latest() + 1
        new_dirs = self._write_buckets(surv, v)
        removed = self._live_count(touched, m)
        new_rows = self._count_dirs(new_dirs)
        return self._commit_dirs(
            "delete", carried + new_dirs, m["n_rows"] - removed + new_rows,
            rebase={"base_version": m["version"], "affected": names,
                    "new_dirs": new_dirs, "new_rows": new_rows,
                    "removed_rows": removed})
