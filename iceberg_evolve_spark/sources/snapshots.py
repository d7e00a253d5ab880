"""Snapshot / time-travel table layer over plain parquet — the Iceberg
metadata ideas (immutable snapshots, a manifest as the single source of truth,
time travel, logical rollback) implemented on a directory, so the concepts the
schema-evolution engine targets (reference: iceberg-evolve operates on Iceberg
tables' snapshot metadata) are runnable here without a table-format jar.

Layout::

    table_dir/
      v00001/           # immutable parquet data dirs, never rewritten
      v00002/
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
    def write(self, df: DataFrame, note: str | None = None, ts: float | None = None) -> int:
        """Write ``df`` as the next snapshot; returns the new version number.

        The data lands in a fresh immutable dir; the manifest append is the
        commit point (see module docstring for the crash analysis)."""
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
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)
        entries.append(
            {
                "version": version,
                "data_dir": data_dir,
                "ts": time.time() if ts is None else ts,
                "note": note,
            }
        )
        self._commit(entries)
        return version

    def rollback(self, version: int, note: str | None = None, ts: float | None = None) -> int:
        """Make ``version``'s data current again by appending a NEW snapshot
        entry that points at the old data dir (history preserved)."""
        entries = self.versions()
        target = self._entry_for(entries, version)
        new_version = entries[-1]["version"] + 1
        entries.append(
            {
                "version": new_version,
                "data_dir": target["data_dir"],
                "ts": time.time() if ts is None else ts,
                "note": note or f"rollback to v{version}",
            }
        )
        self._commit(entries)
        return new_version

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

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: float | None = None,
    ) -> DataFrame:
        """Read the latest snapshot, a pinned ``version``, or the snapshot
        current ``as_of`` a timestamp (time travel)."""
        entry = self._resolve(version, as_of)
        return spark.read.parquet(os.path.join(self.path, entry["data_dir"]))


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
        expired = [e for e in entries if e not in keep]
        if expired:
            # commit point: expired versions unresolvable from here on
            self._commit(keep)
        live_dirs = {e["data_dir"] for e in keep}
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
            if (
                os.path.isdir(full)
                and name.startswith("v")
                and name[1:].isdigit()
                and name not in live_dirs
            ):
                shutil.rmtree(full)
                removed.append(name)
        return [e["version"] for e in expired], sorted(set(removed))
