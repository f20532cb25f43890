"""REAL-PostgreSQL round-trip for JdbcUpsertSink.

The reference's actual sink is CKAN's datastore — PostgreSQL over HTTP
(reference datapump.py:560-612); every other sink test here runs against
sqlite. This module boots a throwaway Postgres (initdb + pg_ctl into
tmp, unix-socket only, trust auth) and drives the sink's generated
``INSERT … ON CONFLICT`` statements through a real Postgres parser and
executor via ``psql``.

No Python Postgres driver ships in this container, so the DB-API
connection the sink needs is a thin shim that renders the sink's
parameterized statements to SQL literals and pipes them through psql
(``ON_ERROR_STOP=1`` — a dialect error fails the test). To run against
an existing server instead, point ``JdbcUpsertSink`` at a real driver::

    from functools import partial
    import psycopg2
    sink = JdbcUpsertSink(partial(psycopg2.connect, dsn), dialect="postgres")

Marked slow: server boot ~3 s; the dialect text itself is shape-pinned
in-default by test_jdbc_sink.test_upsert_sql_postgres_shape.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from datapump_spark.sinks.psql_dbapi import (
    PsqlConnectionFactory,
    run_psql,
)
from datapump_spark.sinks.upsert import JdbcUpsertSink

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql")),
        reason="postgres server binaries not available"),
]

_PG_PORT = 54329  # only names the unix socket; TCP is disabled


def _psql(sockdir: str, sql: str) -> str:
    return run_psql(sockdir, _PG_PORT, "pgtest", "postgres", sql)


def _server_cmd(args: list[str]) -> list[str]:
    """Postgres server binaries refuse to run as root; in a root
    container, drop to nobody (the data dir is chowned to match). The
    psql CLIENT still runs as-is — it only touches the socket."""
    import os

    if os.geteuid() == 0:
        return ["runuser", "-u", "nobody", "--"] + args
    return args


@pytest.fixture(scope="module")
def pg():
    import os
    import shutil as _shutil
    import tempfile
    from pathlib import Path

    # NOT tmp_path_factory: pytest's root tmp is 0700 root-owned, which
    # the nobody-run server can't traverse. A world-readable dir
    # directly under /tmp, chowned to nobody, works in both root and
    # unprivileged containers.
    base = Path(tempfile.mkdtemp(prefix="pgsink_", dir="/tmp"))
    data, sock = str(base / "data"), str(base / "sock")
    (base / "sock").mkdir()
    if os.geteuid() == 0:
        os.chmod(base, 0o755)
        for p in (base, base / "sock"):
            os.chown(p, 65534, 65534)  # nobody
    run_kw = {"check": True, "capture_output": True, "cwd": sock}
    subprocess.run(
        _server_cmd(["initdb", "-D", data, "-U", "pgtest", "-A", "trust"]),
        **run_kw)
    subprocess.run(
        _server_cmd(["pg_ctl", "-D", data, "-w", "-o",
                     f"-k {sock} -c listen_addresses='' -p {_PG_PORT}",
                     "-l", str(base / "pg.log"), "start"]),
        **run_kw)
    try:
        yield sock
    finally:
        subprocess.run(
            _server_cmd(["pg_ctl", "-D", data, "-m", "immediate", "stop"]),
            capture_output=True, cwd=sock)
        _shutil.rmtree(base, ignore_errors=True)


def test_postgres_roundtrip_upsert(spark, pg):
    """create → insert → conflicting re-upsert against a real Postgres:
    the second batch must UPDATE in place via ON CONFLICT, not duplicate
    or error — validating the exact dialect the CKAN datastore speaks."""
    _psql(pg, 'CREATE TABLE "m" ("k" BIGINT PRIMARY KEY, "v" TEXT)')
    sink = JdbcUpsertSink(PsqlConnectionFactory(pg, port=_PG_PORT, user="pgtest"), dialect="postgres")

    df1 = spark.createDataFrame([(1, "a"), (2, "b")],
                                "k long, v string").coalesce(1)
    sink.upsert(df1, "m", ["k"])
    df2 = spark.createDataFrame([(2, "B"), (3, "it's")],
                                "k long, v string").coalesce(1)
    sink.upsert(df2, "m", ["k"])

    rows = sorted(tuple(ln.split("|")) for ln in
                  _psql(pg, 'SELECT "k", "v" FROM "m"').splitlines())
    assert rows == [("1", "a"), ("2", "B"), ("3", "it's")]


def test_postgres_duplicate_pk_single_statement_raises(pg):
    """Document WHY dedupe_batch_by_pk exists: a single INSERT … ON
    CONFLICT statement touching one PK twice raises in real Postgres."""
    _psql(pg, 'CREATE TABLE "d" ("k" BIGINT PRIMARY KEY, "v" TEXT)')
    with pytest.raises(RuntimeError, match="second time"):
        _psql(pg, 'INSERT INTO "d" ("k", "v") VALUES (1, \'x\'), (1, \'y\') '
                  'ON CONFLICT ("k") DO UPDATE SET "v" = excluded."v"')


def test_literal_rendering_covers_awkward_types():
    from datapump_spark.sinks.psql_dbapi import sql_literal

    assert sql_literal(float("nan")) == "'NaN'::float8"
    assert sql_literal(float("inf")) == "'Infinity'::float8"
    assert sql_literal(float("-inf")) == "'-Infinity'::float8"
    assert sql_literal(b"\x00\xff") == r"'\x00ff'::bytea"
    assert sql_literal(bytearray(b"\x01")) == r"'\x01'::bytea"
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal("it's") == "'it''s'"


def test_postgres_nan_and_bytea_roundtrip(spark, pg):
    """NaN doubles and binary payloads survive the psql shim against a
    real server (bare `nan` would abort the whole batch)."""
    _psql(pg, 'CREATE TABLE "t2" ("k" BIGINT PRIMARY KEY, "x" FLOAT8, '
              '"p" BYTEA)')
    sink = JdbcUpsertSink(
        PsqlConnectionFactory(pg, port=_PG_PORT, user="pgtest"),
        dialect="postgres")
    df = spark.createDataFrame(
        [(1, float("nan"), bytearray(b"\x00\xff")),
         (2, 2.5, bytearray(b"ok"))],
        "k long, x double, p binary").coalesce(1)
    sink.upsert(df, "t2", ["k"])
    rows = sorted(_psql(
        pg, "SELECT \"k\", \"x\"::text, encode(\"p\", 'hex') FROM \"t2\""
    ).splitlines())
    assert rows == ["1|NaN|00ff", "2|2.5|6f6b"]


def test_postgres_duplicate_pk_in_one_batch(spark, pg):
    """The sink's in-batch PK dedupe (last wins) keeps a dirty batch
    loadable against real Postgres."""
    _psql(pg, 'CREATE TABLE "b" ("k" BIGINT PRIMARY KEY, "v" TEXT)')
    sink = JdbcUpsertSink(PsqlConnectionFactory(pg, port=_PG_PORT, user="pgtest"), dialect="postgres")
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "b")],
                               "k long, v string").coalesce(1)
    sink.upsert(df, "b", ["k"])
    rows = sorted(tuple(ln.split("|")) for ln in
                  _psql(pg, 'SELECT "k", "v" FROM "b"').splitlines())
    assert rows == [("1", "y"), ("2", "b")]
