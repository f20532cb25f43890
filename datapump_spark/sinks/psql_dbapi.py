"""Zero-dependency DB-API-ish Postgres connection over the psql CLI.

``JdbcUpsertSink`` needs a picklable zero-arg factory returning a DB-API
connection (cursor/executemany/commit/close). In environments with a
Postgres server but no Python driver (this container; minimal CI
images), :class:`PsqlConnectionFactory` fills the gap: it renders the
sink's ``%s``-parameterized statements to literal SQL and executes them
through ``psql -v ON_ERROR_STOP=1`` inside one BEGIN/COMMIT, on the
executor that owns the partition.

Scope: a correctness/integration path, not a production pole — literal
rendering covers None/bool/int/float/str (with quote doubling), and one
psql process per commit is the wrong shape for high-frequency upserts.
With a real driver installed, prefer
``JdbcUpsertSink(partial(psycopg2.connect, dsn), dialect="postgres")``
— the sink contract is identical.

Used by tests/test_postgres_sink.py to drive the sink's generated
``INSERT … ON CONFLICT`` through a REAL Postgres parser/executor (the
dialect the reference's CKAN datastore speaks, datapump.py:560-612).
"""

from __future__ import annotations

import subprocess


def sql_literal(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # bare nan/inf are not valid Postgres numeric literals
        if math.isnan(v):
            return "'NaN'::float8"
        if math.isinf(v):
            return f"'{'-' if v < 0 else ''}Infinity'::float8"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return r"'\x" + bytes(v).hex() + "'::bytea"
    return "'" + str(v).replace("'", "''") + "'"


def run_psql(sockdir: str, port: int, user: str, dbname: str,
             sql: str) -> str:
    out = subprocess.run(
        ["psql", "-h", sockdir, "-p", str(port), "-U", user, "-d", dbname,
         "-v", "ON_ERROR_STOP=1", "-qAt", "-c", sql],
        capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"psql failed: {out.stderr}")
    return out.stdout


class PsqlConnection:
    """Minimal DB-API surface the sink touches: statements accumulate at
    ``executemany`` and execute atomically at ``commit``."""

    def __init__(self, sockdir: str, port: int, user: str, dbname: str):
        self.sockdir = sockdir
        self.port = port
        self.user = user
        self.dbname = dbname
        self._stmts: list[str] = []

    def cursor(self):
        return self

    def executemany(self, sql: str, rows) -> None:
        # Placeholder substitution splits on the literal '%s', so a '%s'
        # inside a quoted string constant in the template would be treated
        # as a parameter slot. The sink's generated SQL never does that;
        # guard loudly against a template/row arity mismatch rather than
        # rendering a silently shifted statement.
        frags = sql.split("%s")
        for row in rows:
            if len(frags) - 1 != len(row):
                raise ValueError(
                    f"SQL template has {len(frags) - 1} %s placeholders "
                    f"but the row has {len(row)} values; a '%s' inside a "
                    "string literal in the template is not supported")
            rendered = []
            for i, frag in enumerate(frags):
                rendered.append(frag)
                if i < len(row):
                    rendered.append(sql_literal(row[i]))
            self._stmts.append("".join(rendered))

    def commit(self) -> None:
        if self._stmts:
            run_psql(self.sockdir, self.port, self.user, self.dbname,
                     "BEGIN; " + "; ".join(self._stmts) + "; COMMIT;")
            self._stmts = []

    def close(self) -> None:
        pass


class PsqlConnectionFactory:
    """Picklable zero-arg factory for ``JdbcUpsertSink`` (the sink ships
    it to executors with ``foreachPartition``)."""

    def __init__(self, sockdir: str, port: int = 5432,
                 user: str = "postgres", dbname: str = "postgres"):
        self.sockdir = sockdir
        self.port = port
        self.user = user
        self.dbname = dbname

    def __call__(self) -> PsqlConnection:
        return PsqlConnection(self.sockdir, self.port, self.user,
                              self.dbname)
