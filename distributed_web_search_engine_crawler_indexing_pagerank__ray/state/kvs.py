"""Sharded point-access KVS — the reference's row/column store API.

The engine's bulk pipelines express the reference's KVS *scans* as
Dataset reads and its ``appendCapped`` accumulator as a groupby (see
``pipelines/index.py``), but user job code also uses the KVS as a
SHARED MUTABLE STORE through point primitives: ``get/getRow/put/putRow/
existsRow/deleteRow/rename/count/scan`` and the conditional put
``ifcolumn=&equals=`` (``src/kvs/KVSClient.java:259-281,439-550``,
``src/kvs/Worker.java:311-345``).  That is exactly the "shared mutable
index" case where raw Ray actors are the right tool: each
:class:`KVSShard` actor owns the rows hashing to it, so every
row-level operation — including the conditional put — is serialized by
its shard's single-threaded actor loop and therefore atomic, which is
STRONGER than the reference (its per-JVM locks let cross-worker
conditional puts race; SURVEY.md §2.1 note).

Semantics matched to ``Worker.java:311-345``:

- unconditional ``put`` creates table/row/column as needed; every
  successful put bumps the row's version (``getNextVersion``).
- ``put_if(..., ifcolumn, equals)`` succeeds ONLY if the row already
  exists and its ``ifcolumn`` value equals ``equals`` (missing row,
  missing column, or mismatch → FAIL, nothing written).
- ``scan`` returns rows in ascending row-key order across shards
  (``KVSClient.scan`` iterates workers in ring order; hash-sharding
  makes per-shard order interleave, so the façade merge-sorts).

Row keys are distributed by the same SHA-1-derived 64-bit key the
crawl shards use (``ref_hash_and_key64``) — one partitioning function
for every keyed state in the engine.
"""

from __future__ import annotations

import ray

from .actors import ref_hash_and_key64


@ray.remote
class KVSShard:
    """One shard: tables → rows → columns (bytes), plus row versions."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.tables: dict[str, dict[str, dict[str, bytes]]] = {}
        self.versions: dict[tuple[str, str], int] = {}

    def _bump(self, table: str, row: str) -> int:
        v = self.versions.get((table, row), 0) + 1
        self.versions[(table, row)] = v
        return v

    def put(self, table: str, row: str, column: str, value: bytes) -> int:
        t = self.tables.setdefault(table, {})
        t.setdefault(row, {})[column] = bytes(value)
        return self._bump(table, row)

    def put_if(
        self,
        table: str,
        row: str,
        column: str,
        value: bytes,
        ifcolumn: str,
        equals: bytes,
    ) -> int:
        """Conditional put (Worker.java:311-345): atomic within the
        shard actor.  Returns the new version, or -1 = FAIL."""
        r = self.tables.get(table, {}).get(row)
        if r is None:
            return -1
        existing = r.get(ifcolumn)
        if existing is None or existing != bytes(equals):
            return -1
        r[column] = bytes(value)
        return self._bump(table, row)

    def put_row(self, table: str, row: str, columns: dict[str, bytes]) -> int:
        t = self.tables.setdefault(table, {})
        t[row] = {c: bytes(v) for c, v in columns.items()}
        return self._bump(table, row)

    def get(self, table: str, row: str, column: str) -> bytes | None:
        return self.tables.get(table, {}).get(row, {}).get(column)

    def get_row(self, table: str, row: str) -> dict[str, bytes] | None:
        r = self.tables.get(table, {}).get(row)
        return dict(r) if r is not None else None

    def exists_row(self, table: str, row: str) -> bool:
        return row in self.tables.get(table, {})

    def delete_row(self, table: str, row: str) -> bool:
        t = self.tables.get(table, {})
        if row in t:
            del t[row]
            self.versions.pop((table, row), None)
            return True
        return False

    def delete_table(self, table: str) -> None:
        self.tables.pop(table, None)
        self.versions = {
            k: v for k, v in self.versions.items() if k[0] != table
        }

    def rename_table(self, old: str, new: str) -> None:
        if old in self.tables:
            self.tables[new] = self.tables.pop(old)
            self.versions = {
                ((new if k[0] == old else k[0]), k[1]): v
                for k, v in self.versions.items()
            }

    def count(self, table: str) -> int:
        return len(self.tables.get(table, {}))

    def scan(self, table: str) -> list[tuple[str, dict[str, bytes]]]:
        t = self.tables.get(table, {})
        return [(k, dict(t[k])) for k in sorted(t)]


class KVSClient:
    """Driver-side façade over the shard ring (``KVSClient.java``'s
    worker-index-for-key routing, with the engine's shared key64)."""

    def __init__(self, n_shards: int = 4):
        self.shards = [KVSShard.remote(i) for i in range(n_shards)]
        self.n = n_shards

    def _shard(self, row: str):
        return self.shards[ref_hash_and_key64(row)[1] % self.n]

    def put(self, table: str, row: str, column: str, value: bytes) -> int:
        return ray.get(self._shard(row).put.remote(table, row, column, value))

    def put_if(
        self,
        table: str,
        row: str,
        column: str,
        value: bytes,
        ifcolumn: str,
        equals: bytes,
    ) -> bool:
        """True = condition held and the write committed (atomic)."""
        return (
            ray.get(
                self._shard(row).put_if.remote(
                    table, row, column, value, ifcolumn, equals
                )
            )
            >= 0
        )

    def put_row(self, table: str, row: str, columns: dict[str, bytes]) -> int:
        return ray.get(self._shard(row).put_row.remote(table, row, columns))

    def get(self, table: str, row: str, column: str) -> bytes | None:
        return ray.get(self._shard(row).get.remote(table, row, column))

    def get_row(self, table: str, row: str) -> dict[str, bytes] | None:
        return ray.get(self._shard(row).get_row.remote(table, row))

    def exists_row(self, table: str, row: str) -> bool:
        return ray.get(self._shard(row).exists_row.remote(table, row))

    def delete_row(self, table: str, row: str) -> bool:
        return ray.get(self._shard(row).delete_row.remote(table, row))

    def delete_table(self, table: str) -> None:
        ray.get([s.delete_table.remote(table) for s in self.shards])

    def rename(self, old: str, new: str) -> None:
        ray.get([s.rename_table.remote(old, new) for s in self.shards])

    def count(self, table: str) -> int:
        return sum(ray.get([s.count.remote(table) for s in self.shards]))

    def scan(self, table: str) -> list[tuple[str, dict[str, bytes]]]:
        parts = ray.get([s.scan.remote(table) for s in self.shards])
        out = [kv for p in parts for kv in p]
        out.sort(key=lambda kv: kv[0])
        return out


__all__ = ["KVSShard", "KVSClient"]
