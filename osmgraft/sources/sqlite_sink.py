"""S20: SQLite sink (osmio src/bin/osmio-changeset-tags-to-sqlite.rs).

The reference ships a single-node binary that streams changeset tags into one
sqlite file (``changeset_tags(id INTEGER PRIMARY KEY, other_tags TEXT)``,
refusing to overwrite an existing file). SQLite is single-writer by design,
so the Spark-first split is:

* :func:`write_sqlite` — EGRESS sink for small/aggregated outputs: streams
  the DataFrame through ``toLocalIterator`` (one partition materialized at a
  time — bounded driver memory) into one sqlite file via the stdlib
  ``sqlite3`` module, batched ``executemany`` in a single transaction.
* :func:`write_sqlite_sharded` — the 100 TB shape: every partition writes its
  own shard file from the executor (``mapInPandas``), no driver funnel; a
  consumer ATTACHes or unions the shards.
* :func:`changeset_tags_to_sqlite` — the reference binary's exact table
  contract (id + JSON tag map) on top of :func:`write_sqlite`.

No JDBC driver jar is needed (none ships in this environment) — the sink
talks sqlite natively from Python.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SQLITE_TYPES = {
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "boolean": "INTEGER",
    "float": "REAL",
    "double": "REAL",
    "string": "TEXT",
    "binary": "BLOB",
    "date": "TEXT",
    "timestamp": "TEXT",
}


def _q(ident: str) -> str:
    """Double-quote an SQL identifier (escape embedded quotes) — Spark schemas
    legally contain spaces/keywords/hyphens, and caller-supplied table names
    must not be injectable."""
    return '"' + ident.replace('"', '""') + '"'


def _ddl(df: DataFrame, table: str, primary_key: str | None) -> str:
    cols = []
    for f in df.schema.fields:
        t = _SQLITE_TYPES.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"column {f.name}: {f.dataType.simpleString()} has no sqlite "
                "mapping — serialize it first (e.g. tags → JSON text)"
            )
        pk = " PRIMARY KEY" if f.name == primary_key else ""
        cols.append(f"{_q(f.name)} {t}{pk}")
    return f"CREATE TABLE {_q(table)} ({', '.join(cols)})"


def _normalize(v):
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    if hasattr(v, "isoformat"):  # date / datetime
        return v.isoformat()
    return v


def write_sqlite(
    df: DataFrame,
    path: str,
    table: str = "rows",
    mode: str = "error",
    primary_key: str | None = None,
    batch_size: int = 10_000,
) -> int:
    """Write ``df`` into one sqlite file; returns the row count. ``mode``:
    'error' refuses an existing file (the reference's ``ensure!``),
    'overwrite' replaces it."""
    if os.path.exists(path):
        if mode != "overwrite":
            raise FileExistsError(f"sqlite file {path} already exists")
        os.remove(path)
    conn = sqlite3.connect(path)
    n = 0
    try:
        conn.execute(_ddl(df, table, primary_key))
        ins = f"INSERT INTO {_q(table)} VALUES ({','.join('?' * len(df.columns))})"
        batch: list[tuple] = []
        with conn:  # one transaction, like the reference
            for row in df.toLocalIterator(prefetchPartitions=True):
                batch.append(tuple(_normalize(v) for v in row))
                if len(batch) >= batch_size:
                    conn.executemany(ins, batch)
                    n += len(batch)
                    batch.clear()
            if batch:
                conn.executemany(ins, batch)
                n += len(batch)
    finally:
        conn.close()
    return n


def write_sqlite_sharded(
    df: DataFrame, directory: str, table: str = "rows", primary_key: str | None = None
) -> DataFrame:
    """Distributed variant: each partition writes ``shard-NNNNN.sqlite`` in
    ``directory`` from its executor. Returns a (shard, rows) DataFrame (an
    action on it performs the write). Scale shape: no driver funnel, no
    single-writer bottleneck; shard count = partition count."""
    os.makedirs(directory, exist_ok=True)
    ddl = _ddl(df, table, primary_key)
    table_q = _q(table)
    ncols = len(df.columns)

    def sink(pdf_iter):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = os.path.join(directory, f"shard-{pid:05d}.sqlite")
        if os.path.exists(shard):
            os.remove(shard)
        conn = sqlite3.connect(shard)
        n = 0
        try:
            conn.execute(ddl)
            ins = f"INSERT INTO {table_q} VALUES ({','.join('?' * ncols)})"
            with conn:
                for pdf in pdf_iter:
                    rows = [
                        tuple(_normalize(v) for v in t)
                        for t in pdf.itertuples(index=False)
                    ]
                    conn.executemany(ins, rows)
                    n += len(rows)
        finally:
            conn.close()
        yield pd.DataFrame({"shard": [shard], "rows": [n]})

    return df.mapInPandas(sink, schema="shard string, rows long")


def changeset_tags_to_sqlite(changesets: DataFrame, path: str, mode: str = "error") -> int:
    """The reference binary's table: ``changeset_tags(id INTEGER PRIMARY KEY,
    other_tags TEXT NOT NULL)`` with tags as a JSON object (sorted keys so the
    file is deterministic across partitionings)."""
    rows = changesets.select(
        F.col("id").cast("long").alias("id"),
        F.to_json(
            F.map_from_entries(F.array_sort(F.map_entries(F.col("tags"))))
        ).alias("other_tags"),
    )
    return write_sqlite(rows, path, table="changeset_tags", mode=mode, primary_key="id")


def read_sqlite(spark: SparkSession, path: str, table: str = "rows") -> DataFrame:
    """Read a (small) sqlite table back — interop/testing helper, driver-side."""
    conn = sqlite3.connect(path)
    try:
        cur = conn.execute(f"SELECT * FROM {_q(table)}")
        cols = [d[0] for d in cur.description]
        data = cur.fetchall()
    finally:
        conn.close()
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(data, columns=cols))
