"""Snapshot / time-travel table layer over plain parquet — the Iceberg
metadata ideas (immutable snapshots, a manifest as the single source of truth,
time travel, logical rollback) implemented on a directory, so the concepts the
schema-evolution engine targets (reference: iceberg-evolve operates on Iceberg
tables' snapshot metadata) are runnable here without a table-format jar.

Layout::

    table_dir/
      v00001/           # immutable parquet data dirs, never rewritten
      v00002/
      d00001/           # delete files (Iceberg v2 merge-on-read row deletes)
      _snapshots.json   # ordered manifest: the ONLY mutable file

Disciplines (the same ones real table formats automate):

* **Data dirs are immutable.** A new snapshot writes a NEW ``vNNNNN`` dir;
  nothing ever rewrites an existing one, so concurrent readers of any pinned
  version are never disturbed.
* **The manifest is the commit point.** Data is written first to a ``.tmp``
  dir, renamed to its final name, and only then does the manifest gain the
  entry — installed atomically via write-temp + ``os.replace``. A crash at any
  step leaves either the old manifest (data dir is an unreferenced orphan,
  harmless — Iceberg calls these orphan files; the next write of that version
  number reclaims it) or the new one (commit complete). No torn state is
  observable. Single-writer protocol: concurrent committers need an external
  lock, as with table formats lacking a catalog's compare-and-swap.
* **Rollback is logical.** Rolling back appends a new manifest entry pointing
  at the old version's data dir — history is preserved and the rollback is
  itself a snapshot, exactly like Iceberg's ``rollback_to_snapshot``.

At 100 TB the only thing that changes is WHERE the bytes live (object store;
rename becomes copy, so the data-dir rename step is replaced by writing
directly to the final unique prefix — uniqueness makes it safe) — the manifest
commit protocol is identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshots.json"

#: Delete files at/below this on-disk size are force-broadcast in the
#: merge-on-read anti-joins (KB-scale CDC deletes: keeps the scan a single
#: pass with no shuffle). Bigger delete files — the mass-delete/retention
#: shape — leave the join strategy to AQE, which picks sort-merge or its own
#: runtime broadcast from MEASURED sizes. An unconditional broadcast here is
#: the same class of scale bug as the r7 bigram-surprisal score table
#: (measured 13.4× at 10× data before that fix); Iceberg's own reader guards
#: its delete-file broadcasts the same way.
BROADCAST_DELETE_MAX_BYTES = 32 << 20

#: Helper column names the merge-on-read reader adds to carry parquet row
#: positions. User tables may not use them (the positional anti-join keys on
#: them; a collision would silently join on the wrong column).
_RESERVED_COLS = ("_file", "_pos", "_seq")


def _dir_bytes(path: str) -> int:
    """Total file bytes under ``path`` (driver-side; delete dirs are small
    relative to data, and this is one listdir per delete file set)."""
    total = 0
    for root, _dirs, names in os.walk(path):
        for fn in names:
            if not fn.startswith("_") and not fn.startswith("."):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _parquet_dir_rows(path: str) -> int:
    """Row count of a written parquet dir from footers only (no Spark job,
    no re-read): one KB-scale footer read per part file, driver-side."""
    import pyarrow.parquet as pq

    n = 0
    for root, _dirs, names in os.walk(path):
        for fn in names:
            if fn.endswith(".parquet") and not fn.startswith("_"):
                n += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return n


class SnapshotTable:
    """A versioned parquet table rooted at ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def versions(self) -> list[dict]:
        """Ordered snapshot entries: ``{version, data_dir, ts, note}``."""
        try:
            with open(self._manifest_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return []

    def _commit(self, entries: list[dict]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    # -- write path --------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        note: str | None = None,
        ts: float | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write ``df`` as the next snapshot; returns the new version number.

        The data lands in a fresh immutable dir; the manifest append is the
        commit point (see module docstring for the crash analysis).
        ``partition_by`` writes a key=value partitioned layout inside the
        data dir (a partition spec for this snapshot) — reads, metadata
        tables, footer pruning, and merge-on-read deletes all walk it."""
        entries = self.versions()
        version = (entries[-1]["version"] + 1) if entries else 1
        data_dir = f"v{version:05d}"
        final = os.path.join(self.path, data_dir)
        # A crash AFTER the data-dir rename but BEFORE the manifest commit
        # leaves this name as an unreferenced orphan; a retry recomputes the
        # same version number, so clear the orphan or the rename below fails
        # forever. Safe by construction: this name is v{last_version + 1} and
        # every manifest entry (rollbacks included) references a strictly
        # older version's dir, so an existing dir here CANNOT be committed
        # data. Single-writer protocol, like table formats without an
        # external lock service — concurrent writers need a commit lock.
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        tmp = final + ".tmp"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        os.rename(tmp, final)
        new_entry = {
                "version": version,
                "data_dir": data_dir,
                # data files written here carry no per-file sequence marker;
                # they are the lineage BASE and inherit this sequence number
                # (Iceberg's data sequence number, used so later equality
                # deletes apply only to strictly older data — see append())
                "base_seq": version,
                "ts": time.time() if ts is None else ts,
                "note": note,
        }
        if partition_by:
            new_entry["partition_by"] = list(partition_by)
        entries.append(new_entry)
        self._commit(entries)
        return version

    def append(
        self,
        df: DataFrame,
        note: str | None = None,
        ts: float | None = None,
    ) -> int:
        """FAST APPEND: commit ``df``'s rows as NEW data files added to the
        current snapshot — O(rows appended), the table is never rewritten.
        This is the streaming commit primitive (Iceberg's fast-append +
        data-sequence-number semantics): appended files are named with this
        commit's sequence number (``s{version}-...``), and equality deletes
        apply only to data files with a STRICTLY OLDER sequence — so the
        CDC upsert shape (eq-delete the key, append the new row, possibly in
        adjacent commits) keeps the new row live while retiring the old one.

        The new snapshot's data dir reuses the previous snapshot's immutable
        data files via hard links (no data copy — the manifest-reuse
        discipline, materialized in the filesystem), so history and
        time travel keep working file-granular. Carried delete files stay
        attached and still apply to the files they were committed against."""
        entries = self.versions()
        if not entries:
            return self.write(df, note=note or "append (bootstrap)", ts=ts)
        cur = entries[-1]
        version = cur["version"] + 1
        data_dir = f"v{version:05d}"
        final = os.path.join(self.path, data_dir)
        if os.path.isdir(final):  # crash orphan (see write())
            import shutil

            shutil.rmtree(final)
        tmp = final + ".tmp"
        stage = final + ".stage"
        writer = df.write.mode("overwrite")
        if cur.get("partition_by"):
            # appended files must land inside the same key=value layout or
            # Spark rejects the mixed directory structure on read
            writer = writer.partitionBy(*cur["partition_by"])
        writer.parquet(stage)
        import shutil

        if _parquet_dir_rows(stage) == 0:
            # no empty commits (matching delete_where/delete_by_key) —
            # counted from footers, Spark writes a 0-row part file
            shutil.rmtree(stage, ignore_errors=True)
            return cur["version"]
        os.makedirs(tmp, exist_ok=True)
        # appended files: flat move with an s{seq}- name prefix (a subdir
        # would either be mis-read as a partition column or need
        # recursiveFileLookup, which breaks partitioned layouts)
        for root, _dirs, names in os.walk(stage):
            rel = os.path.relpath(root, stage)
            for fn in names:
                if not fn.endswith(".parquet") or fn.startswith("_"):
                    continue
                dst_dir = tmp if rel == "." else os.path.join(tmp, rel)
                os.makedirs(dst_dir, exist_ok=True)
                os.rename(
                    os.path.join(root, fn),
                    os.path.join(dst_dir, f"s{version:05d}-{fn}"),
                )
        shutil.rmtree(stage, ignore_errors=True)
        # previous snapshot's files: hard-link into the new dir at their
        # RELATIVE paths (delete files address rows by data_dir-relative
        # path, so positions stay valid across appends); names are unique
        # within a lineage (Spark part-file UUIDs + the s-prefix)
        prev = os.path.join(self.path, cur["data_dir"])
        for root, _dirs, names in os.walk(prev):
            rel = os.path.relpath(root, prev)
            for fn in names:
                if not fn.endswith(".parquet") or fn.startswith("_"):
                    continue
                dst_dir = tmp if rel == "." else os.path.join(tmp, rel)
                os.makedirs(dst_dir, exist_ok=True)
                os.link(os.path.join(root, fn), os.path.join(dst_dir, fn))
        os.rename(tmp, final)
        new_entry = {
            "version": version,
            "data_dir": data_dir,
            "base_seq": cur.get("base_seq", cur["version"]),
            # marks the lineage as multi-sequence: readers must compare
            # per-file sequence numbers against delete sequences (append-free
            # lineages keep the cheaper plain anti-join)
            "has_appends": True,
            "ts": time.time() if ts is None else ts,
            "note": note or "append",
        }
        if cur.get("partition_by"):
            new_entry["partition_by"] = list(cur["partition_by"])
        if cur.get("deletes"):
            new_entry["deletes"] = list(cur["deletes"])
        entries.append(new_entry)
        self._commit(entries)
        return version

    def rollback(self, version: int, note: str | None = None, ts: float | None = None) -> int:
        """Make ``version``'s data current again by appending a NEW snapshot
        entry that points at the old data dir (history preserved). The
        target's delete files (if any) are carried along — rolling back to a
        merge-on-read snapshot restores its row-level deletes too."""
        entries = self.versions()
        target = self._entry_for(entries, version)
        new_version = entries[-1]["version"] + 1
        new_entry = {
            "version": new_version,
            "data_dir": target["data_dir"],
            "base_seq": target.get("base_seq", target["version"]),
            "ts": time.time() if ts is None else ts,
            "note": note or f"rollback to v{version}",
        }
        if target.get("has_appends"):
            new_entry["has_appends"] = True
        if target.get("partition_by"):
            new_entry["partition_by"] = list(target["partition_by"])
        if target.get("deletes"):
            new_entry["deletes"] = list(target["deletes"])
        entries.append(new_entry)
        self._commit(entries)
        return new_version

    # -- row-level deletes (Iceberg v2 merge-on-read) -----------------------
    #
    # A delete does NOT rewrite the (immutable) data dir. It writes a small
    # DELETE FILE and appends a manifest entry referencing the SAME data dir
    # plus the accumulated delete-file list — exactly Iceberg v2's
    # merge-on-read: writes stay O(rows deleted), reads subtract the delete
    # files, and compaction (:meth:`rewrite_data_files`) folds them back into
    # a clean data dir when read amplification warrants it. Two delete-file
    # kinds, as in the Iceberg spec:
    #
    # * **positional** (`kind="pos"`): rows ``(_file, _pos)`` naming exact row
    #   positions inside named data files — produced from a predicate by
    #   scanning once with the parquet reader's ``_metadata.file_path`` /
    #   ``_metadata.row_index`` columns (stable because data dirs never
    #   change).
    # * **equality** (`kind="eq"`): rows of key-column values; every data row
    #   matching a key is deleted (what a CDC stream's deletes compile to —
    #   no read of the data at write time at all).
    #
    # Read-side application is an anti-join per kind: positional deletes join
    # on (file, position), equality deletes on the key columns. Delete files
    # are KBs-to-MBs against TBs of data, so both anti-joins broadcast the
    # delete side — the scan stays a single pass with no extra shuffle.

    def _next_delete_dir(self, entries: list[dict]) -> str:
        # max over manifest references AND disk names, +1: a count-based
        # scheme can SHRINK after expire_snapshots drops entries and then
        # collide with a live delete dir; the disk scan additionally skips
        # over crash orphans (written, never committed)
        mx = 0
        for e in entries:
            for d in e.get("deletes", []):
                mx = max(mx, int(d["dir"][1:]))
        for name in os.listdir(self.path):
            if name[:1] == "d" and name[1:].isdigit():
                mx = max(mx, int(name[1:]))
        return f"d{mx + 1:05d}"

    def _append_delete_entry(
        self,
        entries: list[dict],
        delete: dict,
        note: str | None,
        ts: float | None,
    ) -> int:
        cur = entries[-1]
        new_version = cur["version"] + 1
        # data-sequence stamp: this delete applies only to data files with a
        # strictly older sequence (rows appended AFTER it must survive it)
        delete = {**delete, "seq": new_version}
        entries.append(
            {
                "version": new_version,
                "data_dir": cur["data_dir"],
                "base_seq": cur.get("base_seq", cur["version"]),
                **({"has_appends": True} if cur.get("has_appends") else {}),
                **({"partition_by": list(cur["partition_by"])} if cur.get("partition_by") else {}),
                "deletes": list(cur.get("deletes", [])) + [delete],
                "ts": time.time() if ts is None else ts,
                "note": note,
            }
        )
        self._commit(entries)
        return new_version

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        note: str | None = None,
        ts: float | None = None,
    ) -> int:
        """Row-level delete by predicate via a POSITIONAL delete file.

        Scans the current snapshot once (existing deletes applied, so already-
        deleted rows are not re-listed), writes matching rows' (file, position)
        pairs as a delete file, and commits a new snapshot referencing the
        unchanged data dir. Returns the new version — or the current one
        unchanged if nothing matched (no empty commits, as Iceberg). The scan
        is the cost of a filtered read; the write is O(rows deleted)."""
        entries = self.versions()
        if not entries:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        live = self._read_with_pos(spark, entries[-1])
        matched = live.filter(condition).select("_file", "_pos")
        dd = self._next_delete_dir(entries)
        final = os.path.join(self.path, dd)
        tmp = final + ".tmp"
        # No coalesce: the filtered snapshot scan must parallelize (coalesce
        # is a narrow dependency, so coalesce(1) would pull the WHOLE
        # read→filter pipeline onto one task — a serial full-table scan at
        # scale). A delete "file" is a DIRECTORY of part files; readers take
        # the dir, so multi-file is free, and small deletes still land in few
        # files because AQE's partition coalescing has already shrunk the
        # scan's output partitioning where the data is small.
        matched.write.mode("overwrite").parquet(tmp)
        # empty delete => no commit (the dir becomes an orphan, reclaimed by
        # expire_snapshots' sweep); counted from the written footers —
        # KB-scale driver reads, no second Spark job over the data
        n = _parquet_dir_rows(tmp)
        if n == 0:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            return entries[-1]["version"]
        os.rename(tmp, final)
        return self._append_delete_entry(
            entries, {"dir": dd, "kind": "pos"}, note or "delete_where", ts
        )

    def delete_by_key(
        self,
        keys: DataFrame,
        cols: list[str],
        note: str | None = None,
        ts: float | None = None,
    ) -> int:
        """Row-level delete by key via an EQUALITY delete file: every current
        data row whose ``cols`` values appear in ``keys`` is deleted on read.
        Writes only the distinct key rows — the data is never scanned at
        write time (the CDC-delete shape). NULL keys are rejected: equality
        deletes match with plain equality, and a NULL key would silently
        match nothing. Empty keys are a no-op returning the current version
        unchanged (no empty commits, matching :meth:`delete_where`)."""
        entries = self.versions()
        if not entries:
            raise FileNotFoundError(f"no snapshots at {self.path}")

        key_rows = keys.select(*cols).distinct()
        bad = key_rows.filter(
            " OR ".join(f"({c} IS NULL)" for c in cols)
        ).limit(1).count()
        if bad:
            raise ValueError(f"equality-delete keys contain NULLs in {cols}")
        dd = self._next_delete_dir(entries)
        final = os.path.join(self.path, dd)
        tmp = final + ".tmp"
        # distinct() already shuffled, so the write parallelism is the
        # post-shuffle partitioning — AQE-coalesced to few files when the key
        # set is small, parallel when a mass delete is genuinely large.
        key_rows.write.mode("overwrite").parquet(tmp)
        if _parquet_dir_rows(tmp) == 0:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            return entries[-1]["version"]
        os.rename(tmp, final)
        return self._append_delete_entry(
            entries,
            {"dir": dd, "kind": "eq", "cols": list(cols)},
            note or f"delete_by_key {cols}",
            ts,
        )

    def _read_with_pos(
        self,
        spark: SparkSession,
        entry: dict,
        files: list[str] | None = None,
    ) -> DataFrame:
        """Current rows of ``entry`` with ``_file``/``_pos`` helper columns,
        all registered delete files subtracted by anti-joins. Small delete
        files are broadcast (size-guarded by ``BROADCAST_DELETE_MAX_BYTES``);
        past the guard the strategy is left to AQE so a mass delete cannot
        force an oversized broadcast. ``files`` narrows the scan to a pruned
        file subset (scan planning); positional deletes still apply — their
        recorded paths match per file regardless of how many files the scan
        reads."""
        from pyspark.sql import functions as F

        data_dir = os.path.join(self.path, entry["data_dir"])
        if files is not None:
            # basePath keeps key=value partition columns discoverable when
            # scanning a pruned FILE LIST instead of the whole dir
            df = spark.read.option("basePath", data_dir).parquet(*files)
        else:
            df = spark.read.parquet(data_dir)
        clash = [c for c in _RESERVED_COLS if c in df.columns]
        if clash:
            raise ValueError(
                f"table columns {clash} collide with merge-on-read helper "
                "columns; rename them before using row-level deletes"
            )
        # _file is the path RELATIVE to the snapshot's data dir: appends
        # re-expose previous files via hard links under a NEW data dir, so
        # absolute paths change per snapshot while relative paths (and
        # therefore recorded positional deletes) stay valid. Names are
        # unique within a lineage (Spark part-file UUIDs), and a fresh
        # write() starts a clean lineage with no carried deletes.
        df = df.select(
            *df.columns,
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^.*/v\d{5}/", ""
            ).alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        # data sequence number per file: appended files carry it in their
        # s{seq}- name prefix; base files inherit the lineage base sequence.
        # Append-free lineages (the common case) skip the per-row regexp —
        # every file is base — and keep the plain anti-join below.
        base_seq = int(entry.get("base_seq", 0))
        multi_seq = bool(entry.get("has_appends"))
        if multi_seq:
            seq_str = F.regexp_extract(
                F.col("_file"), r"(?:^|/)s(\d{5})-[^/]*$", 1
            )
            df = df.withColumn(
                "_seq",
                F.when(seq_str == "", F.lit(base_seq)).otherwise(
                    seq_str.cast("long")
                ),
            )
        else:
            df = df.withColumn("_seq", F.lit(base_seq))
        table_cols = [c for c in df.columns if c not in _RESERVED_COLS]
        for i, d in enumerate(entry.get("deletes", [])):
            dfile = spark.read.parquet(os.path.join(self.path, d["dir"]))
            small = _dir_bytes(os.path.join(self.path, d["dir"])) <= (
                BROADCAST_DELETE_MAX_BYTES
            )
            if d["kind"] == "pos":
                right = F.broadcast(dfile) if small else dfile
                df = df.join(right, on=["_file", "_pos"], how="anti")
            elif d["kind"] == "eq":
                dseq = d.get("seq")
                if dseq is None or not multi_seq:
                    # legacy manifest, or an append-free lineage where every
                    # data file predates every delete: plain anti-join
                    right = F.broadcast(dfile) if small else dfile
                    df = df.join(right, on=list(d["cols"]), how="anti")
                    continue
                # sequence-aware: delete a row only if its key matches AND
                # its data file predates the delete commit — rows appended
                # after the delete survive (Iceberg data-sequence rule).
                # Left join + filter instead of anti so the _seq comparison
                # can see both sides; the delete side is still distinct keys.
                hit = f"_del_hit_{i}"
                marked = dfile.select(*d["cols"]).withColumn(hit, F.lit(True))
                right = F.broadcast(marked) if small else marked
                df = df.join(right, on=list(d["cols"]), how="left").filter(
                    ~(
                        F.coalesce(F.col(hit), F.lit(False))
                        & (F.col("_seq") < F.lit(int(dseq)))
                    )
                ).drop(hit)
            else:  # pragma: no cover - manifest corruption
                raise ValueError(f"unknown delete kind {d['kind']!r}")
        # joins put their keys first — restore the table's column order
        return df.select(*table_cols, "_file", "_pos", "_seq")

    def rewrite_data_files(
        self, spark: SparkSession, note: str | None = None, ts: float | None = None
    ) -> int:
        """Compaction: materialize the current merge-on-read view into a fresh
        data dir and commit a snapshot with NO delete files (Iceberg's
        ``rewrite_data_files`` + ``rewrite_position_delete_files``). Old
        snapshots still time-travel through their own delete stacks; retention
        eventually reclaims the superseded delete files. The lineage's
        partition spec carries through the rewrite."""
        entries = self.versions()
        spec = entries[-1].get("partition_by") if entries else None
        cur = self.read(spark)
        return self.write(
            cur,
            note=note or "rewrite_data_files (compaction)",
            ts=ts,
            partition_by=spec,
        )

    def maintain(
        self,
        spark: SparkSession,
        max_delete_files: int = 8,
        max_commits: int = 32,
        note: str | None = None,
        ts: float | None = None,
    ) -> int | None:
        """AMORTIZED COMPACTION POLICY: fold the merge-on-read stack when
        read amplification warrants it — the maintenance loop every
        streaming MOR pipeline needs (each micro-batch adds one delete file
        and one append's worth of small files; unbounded, every read pays
        one anti-join per delete file). Compacts via
        :meth:`rewrite_data_files` when the current snapshot carries at
        least ``max_delete_files`` delete files OR ``max_commits`` commits of
        any kind since the last base write; otherwise does nothing. Returns
        the new version, or None when no action was taken. Cost when it
        fires is one full rewrite — amortized O(1/N) per commit by the
        thresholds; manifest-only to decide (no data read)."""
        entries = self.versions()
        if not entries:
            return None
        cur = entries[-1]
        n_deletes = len(cur.get("deletes", ()))
        n_commits = cur["version"] - cur.get("base_seq", cur["version"])
        if n_deletes < max_delete_files and n_commits < max_commits:
            return None
        return self.rewrite_data_files(
            spark,
            note=note
            or f"maintain: fold {n_deletes} delete files / "
            f"{n_commits} commits since base",
            ts=ts,
        )

    # -- read path ---------------------------------------------------------
    @staticmethod
    def _entry_for(entries: list[dict], version: int) -> dict:
        for e in entries:
            if e["version"] == version:
                return e
        raise LookupError(
            f"no snapshot version {version}; have {[e['version'] for e in entries]}"
        )

    def _resolve(self, version: int | None, as_of: float | None) -> dict:
        entries = self.versions()
        if not entries:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        if version is not None:
            return self._entry_for(entries, version)
        if as_of is not None:
            eligible = [e for e in entries if e["ts"] <= as_of]
            if not eligible:
                raise LookupError(f"no snapshot at or before ts={as_of}")
            return eligible[-1]
        return entries[-1]

    # -- named refs (Iceberg tags) ------------------------------------------
    def _refs_path(self) -> str:
        return os.path.join(self.path, "_refs.json")

    def tags(self) -> dict[str, int]:
        """Named snapshot refs: ``{tag name: version}`` (Iceberg's tags —
        immutable pointers used for audited releases / reproducible reads)."""
        try:
            with open(self._refs_path()) as fh:
                return json.load(fh).get("tags", {})
        except FileNotFoundError:
            return {}

    def tag(self, name: str, version: int | None = None) -> int:
        """Tag ``version`` (default: current) with ``name``. Tags are
        immutable: re-tagging an existing name raises (drop it first) —
        a tag that silently moves defeats its reproducibility purpose.
        Tagged versions survive :meth:`expire_snapshots` regardless of
        ``keep_last``, exactly as Iceberg retention honors refs."""
        entries = self.versions()
        if not entries:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        v = entries[-1]["version"] if version is None else version
        self._entry_for(entries, v)  # raises on unknown version
        tags = self.tags()
        if name in tags:
            raise ValueError(
                f"tag {name!r} already points at v{tags[name]} — "
                "drop_tag() first; tags do not move"
            )
        tags[name] = int(v)
        tmp = self._refs_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"tags": tags}, fh, indent=1)
        os.replace(tmp, self._refs_path())
        return int(v)

    def drop_tag(self, name: str) -> None:
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"no tag {name!r}")
        del tags[name]
        tmp = self._refs_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"tags": tags}, fh, indent=1)
        os.replace(tmp, self._refs_path())

    def read_ref(self, spark: SparkSession, name: str) -> DataFrame:
        """Read the snapshot a tag points at (``VERSION AS OF`` by name)."""
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"no tag {name!r}")
        return self.read(spark, version=tags[name])

    # -- write-audit-publish (Iceberg WAP) -----------------------------------
    def stage(
        self,
        df: DataFrame,
        stage_id: str,
        partition_by: list[str] | None = None,
    ) -> str:
        """WRITE step of write-audit-publish: land ``df`` in a staging dir
        INVISIBLE to every reader (not in the manifest — normal reads resolve
        data dirs through it — and retention's sweep only reclaims
        ``v``/``d`` dirs, never ``stage_*``). Audit it with :meth:`read_staged` (run
        DQ expectations, row counts, reconciliations), then either
        :meth:`publish` — an O(1) rename + manifest commit, no rewrite — or
        :meth:`discard_staged`. This is Iceberg's WAP pattern
        (``spark.wap.id``): bad data never becomes a visible snapshot.
        ``stage_id`` must be caller-unique (the batch/run id); restaging an
        id replaces its previous staging atomically-enough for the
        single-writer protocol."""
        if not stage_id or "/" in stage_id:
            raise ValueError("stage_id must be a non-empty path-safe token")
        final = os.path.join(self.path, f"stage_{stage_id}")
        tmp = final + ".tmp"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        if partition_by:
            with open(os.path.join(final, "_partition_by.json"), "w") as fh:
                json.dump(list(partition_by), fh)
        return stage_id

    def read_staged(self, spark: SparkSession, stage_id: str) -> DataFrame:
        """AUDIT step: the staged data as a DataFrame (readable only by id —
        normal reads cannot see it)."""
        final = os.path.join(self.path, f"stage_{stage_id}")
        if not os.path.isdir(final):
            raise FileNotFoundError(f"no staged write {stage_id!r}")
        return spark.read.parquet(final)

    def publish(
        self,
        stage_id: str,
        note: str | None = None,
        ts: float | None = None,
    ) -> int:
        """PUBLISH step: promote the staged dir to the next snapshot —
        an O(1) directory rename plus the manifest commit; the data is not
        rewritten and was already validated in place."""
        staged = os.path.join(self.path, f"stage_{stage_id}")
        if not os.path.isdir(staged):
            raise FileNotFoundError(f"no staged write {stage_id!r}")
        part_meta = os.path.join(staged, "_partition_by.json")
        partition_by = None
        if os.path.exists(part_meta):
            with open(part_meta) as fh:
                partition_by = json.load(fh)
            os.remove(part_meta)
        entries = self.versions()
        version = (entries[-1]["version"] + 1) if entries else 1
        data_dir = f"v{version:05d}"
        final = os.path.join(self.path, data_dir)
        if os.path.isdir(final):  # crash orphan, see write()
            import shutil

            shutil.rmtree(final)
        os.rename(staged, final)
        new_entry = {
            "version": version,
            "data_dir": data_dir,
            "base_seq": version,
            "ts": time.time() if ts is None else ts,
            "note": note or f"publish {stage_id}",
        }
        if partition_by:
            new_entry["partition_by"] = list(partition_by)
        entries.append(new_entry)
        self._commit(entries)
        return version

    def discard_staged(self, stage_id: str) -> None:
        import shutil

        staged = os.path.join(self.path, f"stage_{stage_id}")
        if not os.path.isdir(staged):
            raise FileNotFoundError(f"no staged write {stage_id!r}")
        shutil.rmtree(staged)

    def plan_scan(
        self,
        version: int | None = None,
        as_of: float | None = None,
        where: dict[str, tuple[object, object]] | None = None,
    ) -> tuple[list[str], int]:
        """Scan PLANNING for one snapshot: (data files a ``where`` range scan
        must read, total data files). Iceberg prunes manifests before
        applying deletes; here the manifest's stats are the parquet footers
        (`footer_stats.prune_files_multi` — conservative: a file without
        provable non-overlap is kept). ``where`` maps column → (lo, hi),
        either bound None for open-ended."""
        from iceberg_evolve_spark.sources.footer_stats import prune_files_multi

        entry = self._resolve(version, as_of)
        data_path = os.path.join(self.path, entry["data_dir"])
        if not where:
            from iceberg_evolve_spark.sources.footer_stats import _files

            files = _files(data_path)
            return files, len(files)
        return prune_files_multi(data_path, where)

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: float | None = None,
        where: dict[str, tuple[object, object]] | None = None,
    ) -> DataFrame:
        """Read the latest snapshot, a pinned ``version``, or the snapshot
        current ``as_of`` a timestamp (time travel). Snapshots carrying
        row-level delete files are merge-on-read: the delete files are
        subtracted by anti-joins in the same scan (size-guarded broadcast).

        ``where`` ({column: (lo, hi)}) turns the read into a PLANNED range
        scan: data files are pruned by footer stats FIRST (so the delete
        anti-joins run over the pruned subset, as Iceberg prunes manifests
        before applying deletes), and the residual range predicate is applied
        for in-file rows outside the range — pruning keeps files on overlap,
        so results are identical to the unpruned scan, just fewer files
        read."""
        from pyspark.sql import functions as F

        entry = self._resolve(version, as_of)
        files: list[str] | None = None
        if where:
            files, _total = self.plan_scan(
                version=entry["version"], where=where
            )
            if not files:
                # schema-stable empty relation: scan plan proves no file can
                # contain in-range rows
                base = spark.read.parquet(
                    os.path.join(self.path, entry["data_dir"])
                )
                return base.filter(F.lit(False))
        if entry.get("deletes"):
            df = self._read_with_pos(spark, entry, files=files)
            df = df.drop("_file", "_pos", "_seq")
        elif files is not None:
            df = spark.read.option(
                "basePath", os.path.join(self.path, entry["data_dir"])
            ).parquet(*files)
        else:
            df = spark.read.parquet(os.path.join(self.path, entry["data_dir"]))
        if where:
            for c, (lo, hi) in where.items():
                if lo is not None:
                    df = df.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(c) <= F.lit(hi))
        return df


    # -- metadata tables (Iceberg's table.snapshots / table.files) ----------

    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        """The snapshot history as a queryable DataFrame — Iceberg's
        ``SELECT * FROM tbl.snapshots``. One row per manifest entry:
        (version, data_dir, ts, note, n_delete_files). Metadata-sized at any
        data volume (rows = snapshots, not files or records)."""
        entries = self.versions()
        rows = [
            (
                int(e["version"]),
                e["data_dir"],
                float(e["ts"]),
                e.get("note"),
                len(e.get("deletes", [])),
            )
            for e in entries
        ]
        return spark.createDataFrame(
            rows,
            "version int, data_dir string, ts double, note string, "
            "n_delete_files int",
        )

    def files_df(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: float | None = None,
        stats_cols: list[str] | None = None,
    ) -> DataFrame:
        """Per-file metadata of one snapshot — Iceberg's ``tbl.files``: data
        files AND delete files, each with its footer row count, byte size,
        and (for ``stats_cols``) per-file min/max BOUNDS rendered as strings
        (Iceberg stores bounds as serialized bytes; string rendering keeps
        one schema across column types — bounds, not exact values, is also
        the honest contract for possibly-truncated BYTE_ARRAY stats, same
        discipline as ``footer_stats.prune_files``).

        Cost: one footer read per file, driver-side — the planning-layer
        price, never a data scan. This is the relation a scan planner joins
        against (file skipping = a filter on these bounds)."""
        import pyarrow.parquet as pq

        entry = self._resolve(version, as_of)
        stats_cols = stats_cols or []
        base_seq = int(entry.get("base_seq", entry["version"]))

        def _file_rows(
            dirname: str, content: str, dir_seq: int | None = None
        ) -> list[tuple]:
            # recursive walk: a snapshot written with partitioned layout
            # (sources/partitions.py) nests key=value subdirs
            out = []
            full_dir = os.path.join(self.path, dirname)
            rel_files = []
            for root, _dirs, names in os.walk(full_dir):
                for fn in names:
                    if fn.endswith(".parquet") and not fn.startswith("_"):
                        rel_files.append(
                            os.path.relpath(os.path.join(root, fn), self.path)
                        )
            import re as _re

            for rel in sorted(rel_files):
                fp = os.path.join(self.path, rel)
                # data sequence number (Iceberg files-table
                # data_sequence_number): appended files carry it in the
                # s{seq}- name prefix, base files inherit the lineage base;
                # delete files report their commit sequence
                if dir_seq is not None:
                    seq = dir_seq
                else:
                    m = _re.search(r"(?:^|/)s(\d{5})-[^/]*$", rel)
                    seq = int(m.group(1)) if m else base_seq
                meta = pq.ParquetFile(fp).metadata
                idx = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }
                bounds = []
                for c in stats_cols:
                    lo = hi = None
                    if c in idx:
                        for rg in range(meta.num_row_groups):
                            st = meta.row_group(rg).column(idx[c]).statistics
                            if st is None or not st.has_min_max:
                                continue
                            lo = st.min if lo is None else min(lo, st.min)
                            hi = st.max if hi is None else max(hi, st.max)
                    bounds.extend(
                        [
                            None if lo is None else str(lo),
                            None if hi is None else str(hi),
                        ]
                    )
                out.append(
                    (
                        content,
                        rel,
                        int(meta.num_rows),
                        int(os.path.getsize(fp)),
                        int(seq),
                        *bounds,
                    )
                )
            return out

        rows = _file_rows(entry["data_dir"], "data")
        for d in entry.get("deletes", []):
            rows.extend(
                _file_rows(d["dir"], f"{d['kind']}-delete", d.get("seq"))
            )
        bound_schema = "".join(
            f", {c}_lower string, {c}_upper string" for c in stats_cols
        )
        return spark.createDataFrame(
            rows,
            "content string, file string, n_rows bigint, size_bytes bigint, "
            "seq bigint" + bound_schema,
        )

    def changes_between(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
    ) -> DataFrame:
        """CHANGELOG SCAN (Iceberg's ``create_changelog_view``): the NET
        row-level changes between two snapshots of one lineage, as the
        table's rows plus a ``_change_type`` column ('insert' / 'delete').
        Computed from the MANIFEST, never a value-level diff of two full
        reads:

        * **inserts** — rows of the ``to`` snapshot whose data file carries
          a sequence number > ``from_version`` (appended after ``from`` and
          still live at ``to``; rows both appended and deleted inside the
          range never appear);
        * **deletes** — rows live at ``from`` hit by a delete file committed
          in ``(from, to]`` (a semi-join of the ``from`` read against ONLY
          the NEW delete files — every new delete's sequence exceeds every
          ``from``-live row's, so the sequence rule reduces to membership).
          A row hit by several new delete files is emitted once (identity =
          its (file, position)).

        Cost: the ``to`` read (which an incremental consumer wants anyway)
        + one semi-join per NEW delete file over the ``from`` read — O(new
        changes + one scan), independent of how many older snapshots exist.
        Raises across a compaction/rollback boundary (different lineages or
        a shrunken delete stack have no per-file change attribution)."""
        from pyspark.sql import functions as F

        if from_version > to_version:
            raise ValueError("from_version must be <= to_version")
        entries = self.versions()
        efrom = self._entry_for(entries, from_version)
        eto = self._entry_for(entries, to_version)
        if eto.get("base_seq") != efrom.get("base_seq"):
            raise ValueError(
                "changelog across a rewrite/compaction boundary is not "
                "attributable file-wise — diff the reads instead"
            )
        old = {json.dumps(d, sort_keys=True) for d in efrom.get("deletes", [])}
        new_deletes = [
            d
            for d in eto.get("deletes", [])
            if json.dumps(d, sort_keys=True) not in old
        ]
        if len(old) > len(eto.get("deletes", [])):
            raise ValueError(
                "to-snapshot carries fewer delete files than from-snapshot "
                "(rollback in range) — changelog unsupported"
            )
        live_to = self._read_with_pos(spark, eto)
        inserts = (
            live_to.filter(F.col("_seq") > int(from_version))
            .drop(*_RESERVED_COLS)
            .withColumn("_change_type", F.lit("insert"))
        )
        if not new_deletes:
            return inserts
        live_from = self._read_with_pos(spark, efrom)
        hit = None
        for d in new_deletes:
            dfile = spark.read.parquet(os.path.join(self.path, d["dir"]))
            small = _dir_bytes(os.path.join(self.path, d["dir"])) <= (
                BROADCAST_DELETE_MAX_BYTES
            )
            right = F.broadcast(dfile) if small else dfile
            on = ["_file", "_pos"] if d["kind"] == "pos" else list(d["cols"])
            h = live_from.join(right.select(*on).distinct(), on=on, how="semi")
            hit = h if hit is None else hit.unionByName(h)
        deletes = (
            hit.dropDuplicates(["_file", "_pos"])
            .drop(*_RESERVED_COLS)
            .withColumn("_change_type", F.lit("delete"))
        )
        return inserts.unionByName(deletes)

    # -- maintenance -------------------------------------------------------
    def expire_snapshots(
        self, keep_last: int, min_ts: float | None = None
    ) -> tuple[list[int], list[str]]:
        """Retention: expire manifest entries beyond the newest ``keep_last``
        (optionally also keeping everything at/after ``min_ts``), then delete
        data dirs no surviving entry references — Iceberg's
        ``expire_snapshots`` + orphan cleanup on this layer.

        Commit-order discipline mirrors the write path in reverse: the
        MANIFEST shrinks first (atomic replace — after this, no reader can
        resolve an expired version), and only then are now-unreferenced data
        dirs removed. A crash between the two steps leaves unreferenced
        orphan dirs — invisible to readers, reclaimed by the next call —
        never a referenced-but-deleted dir. Rollback entries keep their
        target alive: retention counts ENTRIES, and a dir survives while ANY
        surviving entry (including a rollback pointer) references it.

        Returns (expired version numbers, removed data dirs)."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        entries = self.versions()
        if not entries:
            return [], []
        keep = entries[-keep_last:]
        if min_ts is not None:
            keep = [
                e
                for e in entries
                if e["ts"] >= min_ts or e in keep
            ]
        tagged = set(self.tags().values())
        if tagged:
            # named refs pin their snapshots (Iceberg retention honors
            # tags): a tagged version never expires, whatever keep_last says
            keep = [
                e for e in entries if e["version"] in tagged or e in keep
            ]
        expired = [e for e in entries if e not in keep]
        if expired:
            # commit point: expired versions unresolvable from here on
            self._commit(keep)
        live_dirs = {e["data_dir"] for e in keep}
        for e in keep:
            live_dirs.update(d["dir"] for d in e.get("deletes", []))
        removed = []
        # Sweep EVERY unreferenced data dir, not just the ones this call
        # expired — a crash between a previous retention's manifest commit
        # and its dir cleanup leaves orphans whose entries are already gone,
        # so "remove what I expired" would strand them forever. Part of the
        # single-writer protocol (a concurrent writer's renamed-but-
        # uncommitted dir would look like an orphan; table formats guard
        # this with the catalog's commit lock).
        for name in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, name)
            stem = name
            for suffix in (".tmp", ".stage"):
                # crashed write/append staging dirs are orphans too
                if stem.endswith(suffix):
                    stem = stem[: -len(suffix)]
            if (
                os.path.isdir(full)
                and stem[:1] in ("v", "d")
                and stem[1:].isdigit()
                and name not in live_dirs
            ):
                shutil.rmtree(full)
                removed.append(name)
        return [e["version"] for e in expired], sorted(set(removed))
