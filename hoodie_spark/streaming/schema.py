"""Schema providers for the ingestion pipeline.

Reference parity: hudi-utilities/.../schema/SchemaProvider.java (interface),
FilebasedSchemaProvider.java (schema file on DFS), SchemaRegistryProvider.java
(REST registry, e.g. Confluent: GET <url> → {"schema": "..."}),
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
