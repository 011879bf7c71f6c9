"""Iceberg-style table IO over plain Parquet (SURVEY §7.0).

No Iceberg runtime jar exists in this sandbox, so this module implements
the subset of Iceberg semantics the engine relies on, behind one seam:

- **snapshot commit**: data files are written first; a ``_manifest.json``
  is written LAST via atomic rename — the analog of the reference writing
  the B+tree root node last (idx.py:260-261). A table without a manifest
  is invisible to readers.
- **manifest file stats**: per-data-file min/max for declared stats
  columns (harvested from Parquet footers via pyarrow) — the analog of
  the reference's internal ``paths`` nodes holding child first-keys
  (idx.py:225-226). ``read_pruned`` uses them for file-level skipping;
  Parquet row-group stats then skip within files.

When a real Iceberg catalog is configured (``spark.sql.catalog.*`` +
runtime jar), ``Catalog`` can be swapped for ``df.writeTo(...)`` /
``spark.read.table(...)`` without touching callers — the seam is this
class's five methods.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

# Row-group cap for tables serving point reads (the B+tree leaf size).
# Sorted data + per-row-group min/max stats let a point probe decode one
# ~0.5 MB group instead of Spark's 128 MB default row group; both the
# pyarrow warm tier and Spark's parquet reader prune on these stats.
LEAF_ROW_GROUP_BYTES = 512 * 1024


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # warm-path caches (the interactive no-Spark-job tier): parsed
        # manifests keyed by file mtime, pyarrow datasets + per-file
        # fragments keyed by snapshot id. Fragments memoize their parquet
        # footer after first use, so repeat warm queries skip ALL
        # metadata IO — this is what closes the gap to the reference's
        # 15 ms warm class. Invalidation is by snapshot/mtime, so
        # appends/replaces are picked up automatically.
        self._man_cache: dict[str, tuple[int, dict]] = {}
        self._ds_cache: dict[str, tuple[str, Any, dict[str, Any]]] = {}

    # -- paths -----------------------------------------------------------

    def table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.table_dir(name), "_manifest.json")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    # -- write / commit ----------------------------------------------------

    def _data_dir_name(self, name: str) -> str:
        """Current committed data directory (manifest pointer; pre-pointer
        manifests default to ``data``)."""
        if self.exists(name):
            return self.manifest(name).get("data_dir", "data")
        return "data"

    def write(
        self,
        df: DataFrame,
        name: str,
        stats_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        props: dict[str, Any] | None = None,
        mode: str = "overwrite",
        row_group_bytes: int | None = None,
    ) -> dict:
        """Write data files, then commit by writing the manifest last.

        ``append`` writes into the COMMITTED data dir (new files only
        become visible at the manifest replace); ``overwrite`` of a live
        table is not crash-atomic — use :meth:`replace` for that.

        ``row_group_bytes`` caps the Parquet row-group size. Tables that
        serve POINT reads (index blocks, docmap, covering indexes) want
        small row groups — they are the B+tree leaf size: sorted data +
        per-row-group min/max stats mean a point probe decodes one small
        group instead of a whole 128 MB default group. Scan-heavy tables
        keep the default."""
        data_dir = self._data_dir_name(name) if mode == "append" else "data"
        if mode == "append" and props is None:
            # append semantics: table props are UNCHANGED unless the
            # caller passes new ones — without this, appending to a
            # table whose manifest carries props (docmeta's meta_cols)
            # would silently wipe them at the manifest rewrite
            try:
                props = self.manifest(name).get("props") or None
            except FileNotFoundError:
                pass
        ddir = os.path.join(self.table_dir(name), data_dir)
        w = df.write.mode(mode).option("compression", "zstd")
        if row_group_bytes:
            w = w.option("parquet.block.size", str(int(row_group_bytes)))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(ddir)
        return self.commit(
            name, stats_cols=stats_cols, props=props, data_dir=data_dir
        )

    def replace(
        self,
        df: DataFrame,
        name: str,
        stats_cols: list[str] | None = None,
        props: dict[str, Any] | None = None,
        row_group_bytes: int | None = None,
    ) -> dict:
        """CRASH-ATOMIC table rewrite: data files land in a fresh
        generation directory, the manifest pointer swaps to it in one
        ``os.replace`` (the commit point), then older generations are
        GC'd. A crash before the swap leaves the old snapshot fully
        intact; a crash after leaves only orphan files (harmless — no
        manifest references them)."""
        import shutil
        import uuid as _uuid

        gen = f"data-{_uuid.uuid4().hex[:8]}"
        ddir = os.path.join(self.table_dir(name), gen)
        # the generation being superseded: keep it through THIS swap so
        # readers pinned to the old snapshot (cached Spark plans, pyarrow
        # fragments, in-flight queries) finish against intact files; it
        # is GC'd by the NEXT replace (deferred one-generation GC)
        try:
            prev = self.manifest(name).get("data_dir", "data")
        except FileNotFoundError:
            prev = None
        w = df.write.mode("overwrite").option("compression", "zstd")
        if row_group_bytes:
            w = w.option("parquet.block.size", str(int(row_group_bytes)))
        w.parquet(ddir)
        man = self.commit(name, stats_cols=stats_cols, props=props,
                          data_dir=gen)
        for d in os.listdir(self.table_dir(name)):
            if d not in (gen, prev) and (d == "data"
                                         or d.startswith("data-")):
                shutil.rmtree(os.path.join(self.table_dir(name), d),
                              ignore_errors=True)
        return man

    def commit(
        self,
        name: str,
        stats_cols: list[str] | None = None,
        props: dict[str, Any] | None = None,
        data_dir: str = "data",
    ) -> dict:
        """Harvest footer stats for existing data files and atomically
        publish the manifest (the snapshot commit point)."""
        ddir = os.path.join(self.table_dir(name), data_dir)
        paths = []
        for dirpath, _dirs, fnames in os.walk(ddir):
            for fn in sorted(fnames):
                if fn.endswith(".parquet"):
                    paths.append(os.path.join(dirpath, fn))

        def harvest(path: str) -> dict[str, Any]:
            entry: dict[str, Any] = {
                "path": os.path.relpath(path, self.table_dir(name)),
            }
            meta = pq.ParquetFile(path).metadata
            entry["rows"] = meta.num_rows
            if stats_cols:
                names = [meta.schema.column(i).name
                         for i in range(meta.num_columns)]
                for col in stats_cols:
                    ci = names.index(col)
                    lo, hi = None, None
                    for rg in range(meta.num_row_groups):
                        st = meta.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            continue
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    entry[f"min_{col}"] = lo
                    entry[f"max_{col}"] = hi
            return entry

        # footer reads are independent → thread pool (a serial loop here
        # is driver-side fixed cost that would cap scaling efficiency)
        from concurrent.futures import ThreadPoolExecutor

        if len(paths) > 4:
            with ThreadPoolExecutor(max_workers=16) as ex:
                files = list(ex.map(harvest, paths))
        else:
            files = [harvest(p) for p in paths]
        manifest = {
            "snapshot_id": uuid.uuid4().hex,
            "committed_at": time.time(),
            "format": "parquet-iceberg-style",
            "data_dir": data_dir,
            "stats_cols": stats_cols or [],
            "props": props or {},
            "files": files,
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        return manifest

    # -- read --------------------------------------------------------------

    def manifest(self, name: str) -> dict:
        path = self._manifest_path(name)
        mtime = os.stat(path).st_mtime_ns
        hit = self._man_cache.get(name)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        with open(path) as f:
            man = json.load(f)
        self._man_cache[name] = (mtime, man)
        return man

    def _fragments(self, name: str):
        """(dataset, {abs_path: fragment}) for the committed snapshot,
        cached — fragment objects keep their parsed footer, so repeat
        driver-side reads of the same files do zero metadata IO."""
        import pyarrow.dataset as ds

        man = self.manifest(name)
        snap = man["snapshot_id"]
        hit = self._ds_cache.get(name)
        if hit is not None and hit[0] == snap:
            return hit[1], hit[2]
        paths = [
            os.path.join(self.table_dir(name), e["path"])
            for e in man["files"]
        ]
        dataset = ds.dataset(paths, format="parquet") if paths else None
        frags = (
            {f.path: f for f in dataset.get_fragments()} if dataset else {}
        )
        self._ds_cache[name] = (snap, dataset, frags)
        return dataset, frags

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return self.spark.read.parquet(
            os.path.join(self.table_dir(name), self._data_dir_name(name))
        )

    def pruned_file_paths(
        self,
        name: str,
        col: str,
        values: list[Any] | None = None,
        lo: Any = None,
        hi: Any = None,
    ) -> list[str] | None:
        """Manifest-pruned data-file list for a point (``values``) or an
        inclusive-range (``lo``/``hi``) predicate on ``col``. Returns None
        when stats are absent (caller must fall back to a full read);
        returns [] when nothing can match."""
        man = self.manifest(name)
        if col not in man["stats_cols"] or (not values and lo is None and hi is None):
            return None
        keep = []
        for entry in man["files"]:
            flo, fhi = entry.get(f"min_{col}"), entry.get(f"max_{col}")
            if flo is None or fhi is None:
                keep.append(entry)
            elif values is not None and any(flo <= v <= fhi for v in values):
                keep.append(entry)
            elif values is None and not (
                (hi is not None and flo > hi) or (lo is not None and fhi < lo)
            ):
                keep.append(entry)
        return [os.path.join(self.table_dir(name), e["path"]) for e in keep]

    def read_pruned(
        self,
        name: str,
        col: str,
        values: list[Any] | None = None,
        lo: Any = None,
        hi: Any = None,
    ) -> DataFrame:
        """File-level skipping: read only data files whose [min,max] range
        for ``col`` can contain one of ``values`` / overlap [lo, hi]
        (B+tree-descent analog, prs.py:57-77). Falls back to the full
        table when stats are absent."""
        paths = self.pruned_file_paths(name, col, values, lo, hi)
        if paths is None:
            return self.read(name)
        if not paths:
            return self.read(name).limit(0)
        return self.spark.read.parquet(*paths)

    def read_arrow(self, name: str, columns: list[str] | None = None):
        """Unfiltered driver-side read → pyarrow Table (tiny relations:
        stats, per-query metadata). Zero Spark jobs."""
        dataset, _ = self._fragments(name)
        if dataset is None:
            import pyarrow as pa

            return pa.table({c: pa.nulls(0) for c in (columns or [])})
        return dataset.to_table(columns=columns)

    def read_pruned_arrow(
        self,
        name: str,
        col: str,
        values: list[Any] | None = None,
        lo: Any = None,
        hi: Any = None,
        columns: list[str] | None = None,
    ):
        """Driver-side pruned read → pyarrow Table, ZERO Spark jobs.

        The warm query path: manifest file pruning + parquet row-group
        predicate pushdown, for metadata relations (terms, block meta)
        and interactive point lookups where job-scheduling latency would
        dominate (the reference's 0.015 s warm ``eq``, README.md:43)."""
        import pyarrow.dataset as ds

        full, frags = self._fragments(name)
        if full is None:
            # committed-but-empty table (e.g. an index over an empty
            # base): no footer to borrow a schema from — synthesize an
            # empty table over the requested columns (null-typed; callers
            # only length-check / filter empty frames on this path)
            import pyarrow as pa

            cols = columns if columns is not None else [col]
            return pa.table({c: pa.nulls(0) for c in cols})
        paths = self.pruned_file_paths(name, col, values, lo, hi)
        if paths is not None and not paths:
            # provably empty: schema-only, no IO
            tbl = full.schema.empty_table()
            return tbl.select(columns) if columns is not None else tbl
        if paths is None or len(paths) == len(frags):
            dataset = full
        else:
            # subset of the CACHED fragments — no dataset re-discovery,
            # no footer re-reads (fragments memoize their metadata)
            sel = [frags.get(p) for p in paths]
            if all(f is not None for f in sel):
                dataset = ds.FileSystemDataset(
                    [f for f in sel if f is not None],
                    schema=full.schema,
                    format=full.format,
                    filesystem=full.filesystem,
                )
            else:  # path-normalization mismatch: plain per-call dataset
                dataset = ds.dataset(paths, format="parquet")
        filt = None
        if values is not None:
            filt = ds.field(col).isin(values)
        else:
            if lo is not None:
                filt = ds.field(col) >= lo
            if hi is not None:
                f2 = ds.field(col) <= hi
                filt = f2 if filt is None else (filt & f2)
        return dataset.to_table(columns=columns, filter=filt)

    def drop(self, name: str) -> None:
        import shutil

        shutil.rmtree(self.table_dir(name), ignore_errors=True)
