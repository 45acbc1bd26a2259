"""Schema providers for the ingestion pipeline.

Reference parity: hudi-utilities/.../schema/SchemaProvider.java (interface),
FilebasedSchemaProvider.java (schema file on DFS), SchemaRegistryProvider.java
(REST registry, e.g. Confluent: GET <url> → {"schema": "..."}),
JdbcbasedSchemaProvider.java (schema from the database's own metadata),
RowBasedSchemaProvider.java (infer from the incoming batch).

Spark-first: providers resolve to a Spark ``StructType`` (from DDL text or
StructType JSON rather than Avro avsc — the Catalyst-native schema form);
sources call :func:`resolve_schema` so a plain DDL string keeps working
everywhere a provider is accepted.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T


class SchemaProvider:
    """SchemaProvider.java: supplies the source (and optionally target)
    schema for an ingest round."""

    def source_schema(self, spark) -> T.StructType:  # pragma: no cover
        raise NotImplementedError

    def target_schema(self, spark) -> T.StructType | None:
        return None


def _parse(text: str) -> T.StructType:
    """Accept Spark DDL ('a int, b string') or StructType JSON."""
    text = text.strip()
    if text.startswith("{"):
        return T.StructType.fromJson(json.loads(text))
    return T._parse_datatype_string(text)


class StaticSchemaProvider(SchemaProvider):
    def __init__(self, schema: str | T.StructType):
        self._schema = schema if isinstance(schema, T.StructType) \
            else _parse(schema)

    def source_schema(self, spark) -> T.StructType:
        return self._schema


class FileBasedSchemaProvider(SchemaProvider):
    """FilebasedSchemaProvider.java: schema text lives in a file (DDL or
    StructType JSON), re-read on each resolve so an upstream schema change
    is picked up at the next ingest round."""

    def __init__(self, path: str, target_path: str | None = None):
        self.path = path
        self.target_path = target_path

    def source_schema(self, spark) -> T.StructType:
        from .. import storage

        raw = storage.FS.read_bytes(self.path)
        if raw is None:
            raise FileNotFoundError(self.path)
        return _parse(raw.decode())

    def target_schema(self, spark) -> T.StructType | None:
        from .. import storage

        if self.target_path is None:
            return None
        raw = storage.FS.read_bytes(self.target_path)
        return None if raw is None else _parse(raw.decode())


class SchemaRegistryProvider(SchemaProvider):
    """SchemaRegistryProvider.java: fetch the latest schema from a REST
    registry. The registry response is ``{"schema": "<text>"}`` (Confluent
    wire format) or raw schema text; ``fetcher`` is injectable for tests
    and for registries needing auth."""

    def __init__(self, url: str, fetcher=None):
        self.url = url
        self._fetch = fetcher or self._http_get

    @staticmethod
    def _http_get(url: str) -> str:
        from urllib.request import urlopen

        with urlopen(url) as r:  # noqa: S310 — registry URL is operator-supplied
            return r.read().decode()

    def source_schema(self, spark) -> T.StructType:
        body = self._fetch(self.url)
        try:
            payload = json.loads(body)
            if isinstance(payload, dict) and "schema" in payload:
                return _parse(payload["schema"])
        except json.JSONDecodeError:
            pass
        return _parse(body)


class JdbcBasedSchemaProvider(SchemaProvider):
    """JdbcbasedSchemaProvider.java: resolve the source schema from the
    database's own metadata by running a zero-row query against the JDBC
    table (``WHERE 1=0`` — the standard JDBC metadata probe: the driver
    returns the ResultSet schema without transferring data). Spark-first:
    the probe is a ``spark.read.format("jdbc")`` load whose ``.schema``
    IS the resolved StructType; no rows are fetched until an action runs,
    and none ever does. ``loader`` is injectable for tests (no JDBC
    database in the sandbox) and must return a DataFrame whose schema is
    the table's."""

    def __init__(self, url: str, table: str, options: dict | None = None,
                 loader=None):
        self.url = url
        self.table = table
        self.options = options or {}
        self._load = loader or self._jdbc_load

    def _jdbc_load(self, spark):
        # dbtable accepts a subquery: the 1=0 pushdown makes this a pure
        # metadata round-trip on every mainstream JDBC driver
        reader = (spark.read.format("jdbc").option("url", self.url)
                  .option("dbtable",
                          f"(SELECT * FROM {self.table} WHERE 1=0) __probe"))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()

    def source_schema(self, spark) -> T.StructType:
        return self._load(spark).schema


class RowBasedSchemaProvider(SchemaProvider):
    """RowBasedSchemaProvider.java: no declared schema — the source infers
    from the data (resolve returns None; the reader's own inference runs)."""

    def source_schema(self, spark):
        return None


def resolve_schema(schema, spark) -> T.StructType | str | None:
    """Normalize the ``schema=`` argument sources accept: None, a DDL
    string, a StructType, or any :class:`SchemaProvider`."""
    if isinstance(schema, SchemaProvider):
        return schema.source_schema(spark)
    return schema
