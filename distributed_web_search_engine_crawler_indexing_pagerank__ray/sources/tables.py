"""Table catalog: the durable-table layer (reference KVS `pt-` tables).

The reference persists durable tables as one-file-per-row KVS
directories (``src/kvs/Worker.java:32-77``) and implements
``saveAsTable`` as an in-place rename (``src/kvs/Worker.java:348-405``).
Here a table is a partitioned parquet DIRECTORY under a catalog root
(the Lance-shaped layout of the north rule — ``write_lance`` is the
drop-in swap once the package is available; parquet directories keep
the same discipline: one dir per table, atomic rename via a temp dir +
``os.replace``, partition subdirectories for resumability).
"""

from __future__ import annotations

import math
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

# Size-derived read parallelism: Ray's default block count has a floor
# of ~2 tasks per cluster CPU, which turns a 5k-row dimension table
# into 64 near-empty blocks — and every downstream shuffle then pays
# 64 map + 64 reduce task launches to move kilobytes.  The rule below
# only ever LOWERS the block count below that CPU floor (never forces
# a count on a big table, whose bytes-based splitting Ray already does
# right), so at 100 TB the read plan is exactly Ray's native one and
# at test scale small tables stop drowning in scheduling overhead.
READ_ROWS_PER_BLOCK = int(os.environ.get("GRAFT_READ_ROWS_PER_BLOCK", 25_000))
READ_BYTES_PER_BLOCK = int(
    os.environ.get("GRAFT_READ_BYTES_PER_BLOCK", 262_144)
)


def _derived_read_blocks(path: str):
    """Block count for a SMALL parquet file, or None to keep Ray's
    default (big files, directories, any metadata failure)."""
    if os.environ.get("GRAFT_READ_BLOCKS_DISABLE"):
        return None
    try:
        rows = pq.ParquetFile(path).metadata.num_rows  # footer only
        size = os.path.getsize(path)
    except Exception:
        return None  # directory input etc.
    rule = max(
        1,
        math.ceil(rows / READ_ROWS_PER_BLOCK),
        math.ceil(size / READ_BYTES_PER_BLOCK),
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or (
            os.cpu_count() or 8
        )
    except Exception:
        cpus = os.cpu_count() or 8
    floor = 2 * cpus  # Ray's own minimum-parallelism heuristic
    return rule if rule < floor else None


def read_parquet_clean(path: str, columns=None, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with the file-level pandas metadata
    stripped from the schema.  Parquet written by pandas embeds a
    metadata dict that makes ``pa.Schema`` unhashable, so Ray Data's
    ``unify_schemas`` schema-dedup fails and logs ``Failed to hash the
    schemas`` on every stage of every pipeline.  Passing an explicit
    metadata-free schema keeps blocks hashable end to end.

    Small files also get a size-derived ``override_num_blocks`` (see
    ``_derived_read_blocks``); pass ``override_num_blocks`` explicitly
    to take precedence (e.g. a stage that needs map-side parallelism
    disproportionate to its input bytes)."""
    try:
        schema = pq.read_schema(path).remove_metadata()
        if columns is not None:  # schema must match the projection
            schema = pa.schema([schema.field(c) for c in columns])
    except Exception:
        schema = None  # directory input etc. — let Ray infer
    if "override_num_blocks" not in kwargs:
        blocks = _derived_read_blocks(path)
        if blocks is not None:
            kwargs["override_num_blocks"] = blocks
    return ray.data.read_parquet(path, schema=schema, columns=columns, **kwargs)


try:  # north-rule sink: Lance when the package exists (re-verified
    import lance as _lance  # each round: not in this container)

    LANCE_AVAILABLE = True
except ImportError:
    _lance = None
    LANCE_AVAILABLE = False


class _ArrowIPCDatasink:
    """Lazy-constructed ``BlockBasedFileDatasink`` writing one Arrow
    IPC (Feather v2) file per output block — the distributed write path
    of ``TableCatalog(fmt="arrow")``."""

    def __new__(cls, path: str):
        from ray.data.datasource import BlockBasedFileDatasink

        class _Sink(BlockBasedFileDatasink):
            def __init__(self, p):
                super().__init__(p, file_format="arrow")

            def write_block_to_file(self, block, file):
                tbl = block.to_arrow().replace_schema_metadata(None)
                with pa.ipc.new_file(file, tbl.schema) as w:
                    w.write_table(tbl)

        return _Sink(path)


class TableCatalog:
    """Named durable tables rooted at one directory.

    ``fmt="lance"`` activates the north rule's Lance layout when the
    ``lance`` package is importable (it is not in this container —
    checked at import above); the default parquet directory keeps the
    identical catalog discipline (atomic rename, partition dirs, pruned
    reads), so the storage format is a per-catalog switch, not a code
    path.  ``fmt="jsonl"`` / ``fmt="csv"`` are the interchange formats
    (export-to / import-from the rest of an LLM-data stack): same
    atomic directory discipline, one file per output block, lazy
    ``ray.data`` reads — but no column pruning at the read (row-based
    formats parse before projecting) and weaker type fidelity
    (timestamps round-trip as strings), so parquet/lance stay the
    durable internal layout.  ``fmt="arrow"`` is the Arrow IPC file
    format (= Feather v2): full arrow type fidelity (lists,
    timestamps) and column-selective reads via the IPC footer, one
    ``.arrow`` file per output block through a ``BlockBasedFileDatasink``
    — the zero-parse handoff format for other arrow-native engines;
    parquet keeps row-group statistics pruning, which IPC lacks."""

    FORMATS = ("parquet", "lance", "jsonl", "csv", "arrow")

    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt == "lance" and not LANCE_AVAILABLE:
            raise RuntimeError(
                "lance requested but the package is not installed"
            )
        if fmt not in self.FORMATS:
            raise ValueError(f"unknown table format: {fmt!r}")
        self.fmt = fmt
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad table name: {name!r}")
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    # -- write (atomic: temp dir then rename) --------------------------------

    def write(self, name: str, data, mode: str = "overwrite") -> str:
        """data: Dataset or Arrow table.  Atomic overwrite via temp dir
        (the engine's version of KVS rename semantics)."""
        final = self.path(name)
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if self.fmt == "lance":
            tbl = data if isinstance(data, pa.Table) else pa.concat_tables(
                list(data.iter_batches(batch_format="pyarrow", batch_size=None))
            )
            _lance.write_dataset(tbl, tmp)
        elif isinstance(data, pa.Table):
            os.makedirs(tmp, exist_ok=True)
            if self.fmt == "jsonl":
                data.to_pandas().to_json(
                    os.path.join(tmp, "part-0.json"),
                    orient="records", lines=True,
                )
            elif self.fmt == "csv":
                import pyarrow.csv as pacsv

                pacsv.write_csv(data, os.path.join(tmp, "part-0.csv"))
            elif self.fmt == "arrow":
                with pa.OSFile(os.path.join(tmp, "part-0.arrow"), "wb") as f:
                    with pa.ipc.new_file(f, data.schema) as w:
                        w.write_table(data)
            else:
                pq.write_table(data, os.path.join(tmp, "part-0.parquet"))
        elif self.fmt == "jsonl":
            data.write_json(tmp)
        elif self.fmt == "csv":
            data.write_csv(tmp)
        elif self.fmt == "arrow":
            data.write_datasink(_ArrowIPCDatasink(tmp))
        else:
            data.write_parquet(tmp)
        if mode == "overwrite" and os.path.isdir(final):
            old = final + ".old"
            if os.path.isdir(old):  # stale from a crash mid-swap:
                shutil.rmtree(old)  # os.replace can't replace a non-empty dir
            os.replace(final, old)
            os.replace(tmp, final)
            shutil.rmtree(old)
        else:
            os.replace(tmp, final)
        return final

    def rename(self, src: str, dst: str) -> None:
        """``kvs.rename`` / ``saveAsTable`` (#18): atomic directory swap."""
        dst_path = self.path(dst)
        if os.path.isdir(dst_path):
            shutil.rmtree(dst_path)
        os.replace(self.path(src), dst_path)

    def delete(self, name: str) -> None:
        if self.exists(name):
            shutil.rmtree(self.path(name))

    # -- read ---------------------------------------------------------------

    def read(self, name: str, columns: list[str] | None = None):
        """Lazy Dataset over the table directory (column-pruned read where
        the format has column metadata; jsonl/csv project after parse)."""
        if self.fmt == "lance":
            return ray.data.read_lance(self.path(name), columns=columns)
        if self.fmt == "jsonl":
            ds = ray.data.read_json(self.path(name))
            return ds.select_columns(columns) if columns else ds
        if self.fmt == "csv":
            ds = ray.data.read_csv(self.path(name))
            return ds.select_columns(columns) if columns else ds
        if self.fmt == "arrow":
            files = self._files(name, ".arrow")
            if not files:
                return ray.data.from_arrow(pa.table({}))

            def parse(t: pa.Table) -> pa.Table:
                import pyarrow.feather as feather

                tabs = [
                    feather.read_table(p, columns=columns)
                    for p in t["item"].to_pylist()
                ]
                return pa.concat_tables(tabs)

            # one task per IPC file; the footer-level column selection
            # in feather.read_table keeps the read pruned like parquet
            return ray.data.from_items(
                files, override_num_blocks=len(files)
            ).map_batches(parse, batch_format="pyarrow")
        return ray.data.read_parquet(self.path(name), columns=columns)

    def _files(self, name: str, suffix: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(self.path(name)):
            out += [os.path.join(dirpath, f) for f in files
                    if f.endswith(suffix)]
        return sorted(out)

    def read_arrow(self, name: str) -> pa.Table:
        if self.fmt == "lance":
            ds = _lance.dataset(self.path(name))
            return ds.to_table()
        if self.fmt == "jsonl":
            import pyarrow.json as pajson

            return pa.concat_tables(
                [pajson.read_json(f) for f in self._files(name, ".json")]
            )
        if self.fmt == "csv":
            import pyarrow.csv as pacsv

            return pa.concat_tables(
                [pacsv.read_csv(f) for f in self._files(name, ".csv")]
            )
        if self.fmt == "arrow":
            import pyarrow.feather as feather

            return pa.concat_tables(
                [feather.read_table(f) for f in self._files(name, ".arrow")]
            )
        return pq.read_table(self.path(name))

    def count(self, name: str) -> int:
        """``kvs.count`` — from parquet metadata (no data read) where the
        format has it; jsonl counts lines; csv falls back to a parse."""
        if self.fmt == "parquet":
            total = 0
            for f in self._files(name, ".parquet"):
                total += pq.ParquetFile(f).metadata.num_rows
            return total
        if self.fmt == "jsonl":  # 1 row per line by construction
            total = 0
            for f in self._files(name, ".json"):
                with open(f, "rb") as fh:
                    total += sum(1 for _ in fh)
            return total
        return self.read_arrow(name).num_rows


class JobContext:
    """The user-extension surface (SURVEY §2.8): the reference accepts
    any class with ``public static run(FlameContext, String[])`` via JAR
    submit (``src/flame/Coordinator.java:94-110``); here a job is any
    callable ``run(ctx, args)`` where ``ctx`` wraps the table catalog +
    the flame-compat operator set + raw ``ray.data``."""

    def __init__(self, catalog: TableCatalog):
        self.catalog = catalog
        from ..pipelines import flame_compat

        self.ops = flame_compat
        self.data = ray.data
        self.output_lines: list[str] = []

    def output(self, line: str) -> None:  # FlameContext.output
        self.output_lines.append(line)


def run_job(job, catalog_root: str, args: list[str] | None = None):
    """Submit-and-run: ``job`` is a callable or a module with ``run``.
    (``ray job submit`` wraps a script that calls this.)"""
    fn = job.run if hasattr(job, "run") else job
    ctx = JobContext(TableCatalog(catalog_root))
    result = fn(ctx, args or [])
    return ctx, result
