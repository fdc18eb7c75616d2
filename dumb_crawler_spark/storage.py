"""Snapshot-versioned table storage (SURVEY.md §2.1 S7-S12, §4 round-commit).

The reference keeps all state in one SQLite file with an implicit single
writer (SQLiteConnection.java:54-60) plus gzip/WARC page files rotated at
50 MB (WarcStorageManager.java:91-147). The Spark-native equivalent at the
10^10-row design point is **Iceberg**: the frontier is an Iceberg table
partitioned by ``bucket(P, part)`` with MERGE INTO for upserts, page/metric
tables are plain appends, and a crash-consistent "round" is a set of table
snapshots recorded in a lineage table.

The sandbox container has no Iceberg runtime jar, so this module provides the
same contract on bare Parquet:

- **full-state tables** (``frontier``): one immutable snapshot directory per
  round, ``snap-{round:08d}``, written to a temp dir and atomically renamed —
  the local analog of an Iceberg snapshot commit. (Iceberg's merge-on-read
  avoids the full rewrite at scale; the interface is identical.)
- **append-only tables** (``pages``, ``metrics``, ``errors``, ``rounds``):
  one ``delta-{round:08d}`` directory per round; a read unions the deltas of
  committed rounds only. File rotation (reference: 50 MB WARC) falls out of
  Parquet part-file sizing / Iceberg ``write.target-file-size-bytes``.
- **round commit** (C1/C2 crash consistency): a round is visible iff
  ``_round-{round:08d}.json`` exists in ``_commits/``. The marker is written
  last; on restart everything newer than the last marker is invisible and
  garbage-collected — which IS the reference's orphan recovery
  (URLStore.java:54-58: PROCESSING → QUEUED on resume), because uncommitted
  status transitions simply never happened.
- **termination marker** (S12): ``_TERMINATED.json``, reference
  CrawlingSessionContext.java:203-218.
"""

from __future__ import annotations

import json
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _footer_rows(parquet_dir: Path) -> int:
    """Row count from parquet footer metadata — no Spark job, no data read."""
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows for f in parquet_dir.glob("*.parquet")
    )


class Warehouse:
    """One crawl session's tables + round lineage under a root directory.

    ``max_records_per_file`` is the S8 file-rotation analog
    (WarcStorageManager.java:91-147 rotates WARC output at 50 MB): every
    parquet write is bounded via the DataFrameWriter ``maxRecordsPerFile``
    option, the local stand-in for Iceberg's ``write.target-file-size-bytes``.
    """

    def __init__(
        self, spark: SparkSession, root: str | Path, max_records_per_file: int | None = None
    ):
        self.spark = spark
        self.root = Path(root)
        self.max_records_per_file = max_records_per_file
        (self.root / "_commits").mkdir(parents=True, exist_ok=True)

    # -- atomic writes -------------------------------------------------------
    def _atomic_write(self, df: DataFrame, dest: Path, keep_empty: bool = True) -> int:
        """Write-to-temp + atomic rename; returns the row count read back
        from the parquet FOOTERS (driver-side metadata, microseconds) so
        callers never launch a count job over data they just wrote. With
        ``keep_empty=False`` a zero-row result leaves NO directory — readers
        that glob delta dirs then never see schema-only or file-less dirs."""
        tmp = dest.parent / f".tmp-{uuid.uuid4().hex}"
        w = df.write.mode("overwrite")
        if self.max_records_per_file:
            w = w.option("maxRecordsPerFile", str(self.max_records_per_file))
        w.parquet(str(tmp))
        n = _footer_rows(tmp)
        if n == 0 and not keep_empty:
            shutil.rmtree(tmp)
            # overwrite semantics must hold for the empty case too: a stale
            # non-empty dest would otherwise silently survive
            if dest.exists():
                shutil.rmtree(dest)
            return 0
        if dest.exists():
            shutil.rmtree(dest)
        tmp.rename(dest)
        return n

    # -- full-state tables (frontier) -----------------------------------------
    def write_snapshot(self, table: str, round_no: int, df: DataFrame) -> int:
        return self._atomic_write(df, self.root / table / f"snap-{round_no:08d}")

    def read_snapshot(self, table: str, round_no: int) -> DataFrame:
        return self.spark.read.parquet(str(self.root / table / f"snap-{round_no:08d}"))

    # -- append-only tables ----------------------------------------------------
    def append_delta(
        self, table: str, round_no: int, df: DataFrame, keep_empty: bool = True
    ) -> int:
        return self._atomic_write(
            df, self.root / table / f"delta-{round_no:08d}", keep_empty=keep_empty
        )

    def drop_delta(self, table: str, round_no: int) -> None:
        """Reclaim a per-round scratch artifact (the `fetch` table: consumed
        only within its round — spans live on in pages/errors)."""
        d = self.root / table / f"delta-{round_no:08d}"
        if d.exists():
            shutil.rmtree(d)

    def append_delta_rows(self, table: str, round_no: int, arrow_table) -> None:
        """Driver-side parquet write for TINY deltas (a few counter rows per
        round): a Spark job just to persist 20 rows costs ~seconds of plan +
        schedule per round; pyarrow writes the same file in microseconds.
        Readers can't tell the difference."""
        import pyarrow.parquet as pq

        dest = self.root / table / f"delta-{round_no:08d}"
        tmp = dest.parent / f".tmp-{uuid.uuid4().hex}"
        tmp.mkdir(parents=True)
        pq.write_table(arrow_table, tmp / "part-00000.parquet")
        if dest.exists():
            shutil.rmtree(dest)
        tmp.rename(dest)

    def read_delta(self, table: str, round_no: int) -> DataFrame:
        """One round's delta dir (e.g. the per-round `fetch` artifact)."""
        return self.spark.read.parquet(str(self.root / table / f"delta-{round_no:08d}"))

    def read_deltas(self, table: str, upto_round: int | None = None) -> DataFrame | None:
        """Union of committed delta dirs (≤ upto_round if given); None if empty.
        Parquet dir-level listing keeps this a metadata operation; column
        pruning applies per delta (e.g. J5 reads only pages.url_id)."""
        tdir = self.root / table
        if not tdir.exists():
            return None
        last = self.last_committed_round() if upto_round is None else upto_round
        dirs = sorted(
            str(d) for d in tdir.glob("delta-*")
            if last is not None and int(d.name.split("-")[1]) <= last
        )
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # -- round lineage / crash consistency -------------------------------------
    def commit_round(self, round_no: int, info: dict) -> None:
        """Marker write = the commit point (single driver ⇒ single committer,
        like the reference's single SQLite writer; no conflict handling)."""
        marker = self.root / "_commits" / f"_round-{round_no:08d}.json"
        tmp = marker.with_suffix(".tmp")
        tmp.write_text(json.dumps({"round": round_no, **info}, default=str))
        tmp.rename(marker)

    def committed_rounds(self) -> list[int]:
        return sorted(
            int(p.stem.split("-")[1]) for p in (self.root / "_commits").glob("_round-*.json")
        )

    def last_committed_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def rollback_uncommitted(self) -> None:
        """C2 orphan recovery: drop snapshot/delta dirs newer than the last
        committed round (they are invisible anyway; this reclaims space and
        mirrors Iceberg's snapshot expiry/rollback)."""
        last = self.last_committed_round()
        for tdir in self.root.iterdir():
            if not tdir.is_dir() or tdir.name.startswith("_"):
                continue
            for d in tdir.glob("*-*"):
                try:
                    rnd = int(d.name.split("-")[1])
                except ValueError:
                    continue
                if last is None or rnd > last:
                    shutil.rmtree(d)

    # -- termination marker (S12) ----------------------------------------------
    def write_terminated(self, info: dict) -> None:
        (self.root / "_TERMINATED.json").write_text(json.dumps(info, default=str))

    def is_terminated(self) -> bool:
        return (self.root / "_TERMINATED.json").exists()

    # -- frontier merge-on-read (frontier.py compose/queued docs) ---------------
    def _frontier_pieces(self, round_no: int):
        """(base snapshot DF, inserts DF|None, updates DF|None) as of round_no:
        the latest snap ≤ round_no plus the ins-/upd- delta dirs in
        (snap_round, round_no]. Dir listing only — no data read."""
        tdir = self.root / "frontier"
        snaps = sorted(
            int(d.name.split("-")[1])
            for d in tdir.glob("snap-*")
            if int(d.name.split("-")[1]) <= round_no
        )
        if not snaps:
            raise FileNotFoundError(f"no frontier snapshot ≤ round {round_no}")
        s = snaps[-1]
        base = self.read_snapshot("frontier", s)

        def deltas(prefix: str) -> DataFrame | None:
            dirs = sorted(
                str(d) for d in tdir.glob(f"{prefix}-*")
                if s < int(d.name.split("-")[1]) <= round_no
            )
            return self.spark.read.parquet(*dirs) if dirs else None

        return base, deltas("ins"), deltas("upd")

    def write_frontier_updates(self, round_no: int, df: DataFrame) -> int:
        return self._atomic_write(df, self.root / "frontier" / f"upd-{round_no:08d}")

    def write_frontier_inserts(self, round_no: int, df: DataFrame) -> int:
        """Zero-insert rounds leave no ins- dir at all (keep_empty=False):
        _frontier_pieces globs only existing dirs, so readers never depend on
        Spark writing schema-only files for empty results."""
        return self._atomic_write(
            df, self.root / "frontier" / f"ins-{round_no:08d}", keep_empty=False
        )

    def read_frontier_inserts(self, round_no: int) -> DataFrame | None:
        d = self.root / "frontier" / f"ins-{round_no:08d}"
        return self.spark.read.parquet(str(d)) if d.exists() else None

    # -- convenience -----------------------------------------------------------
    def read_frontier(self, round_no: int | None = None) -> DataFrame:
        """Reconciled frontier state as of round_no (MoR compose)."""
        from . import frontier as FR

        rnd = self.last_committed_round() if round_no is None else round_no
        if rnd is None:
            raise FileNotFoundError("no committed frontier snapshot")
        return FR.compose_frontier(*self._frontier_pieces(rnd))

    def read_frontier_queued(self, round_no: int | None = None) -> DataFrame:
        """Dequeue-eligible rows only — pushdown-friendly (frontier.queued_view)."""
        from . import frontier as FR

        rnd = self.last_committed_round() if round_no is None else round_no
        if rnd is None:
            raise FileNotFoundError("no committed frontier snapshot")
        return FR.queued_view(*self._frontier_pieces(rnd))

    def read_frontier_seen_ids(self, round_no: int) -> DataFrame:
        """The exact URL-seen set (J3 probe side): url_id column of
        base ∪ inserts — column-pruned scans, no update join needed (updates
        never add ids)."""
        base, ins, _ = self._frontier_pieces(round_no)
        ids = base.select("url_id", "part")
        return ids if ins is None else ids.unionByName(ins.select("url_id", "part"))
