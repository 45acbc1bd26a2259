"""S3 adapter for the AtomicStorage seam.

Maps the engine's three storage primitives (see ``storage.AtomicStorage``)
onto the S3 API, using only published S3 semantics:

- ``put_atomic``  → a single ``PutObject``. One PUT is atomic by the S3
  consistency contract: readers observe the old object, the new object, or
  404 — never a torn body. No temp + rename needed (S3 has no rename).
- ``put_if_absent`` → ``PutObject`` with ``IfNoneMatch="*"`` — S3's
  conditional write (GA since 2024): the PUT fails with HTTP 412
  ``PreconditionFailed`` when the key already exists, which makes the
  table lock a true cross-host conditional create, the object-store-native
  equivalent of the reference's ZookeeperBasedLockProvider
  (hudi-client/hudi-client-common/src/main/java/org/apache/hudi/client/
  transaction/lock/ZookeeperBasedLockProvider.java). On GCS the same
  primitive is ``x-goog-if-generation-match: 0``.
- ``delete_if_exists`` → ``DeleteObject`` (idempotent by contract; a HEAD
  supplies the best-effort "was it there" return value, which no caller
  uses for correctness).

boto3 is not bundled in every deployment, so the import is deferred to
construction; any client object implementing ``put_object`` /
``delete_object`` / ``head_object`` with botocore-shaped ``ClientError``
responses can be injected instead (tests inject an in-memory fake that
honors the conditional-write protocol).

Paths: the engine builds paths with ``os.path.join`` from the table's
``base_path``. Point ``base_path`` at ``s3://bucket/prefix`` and this
adapter parses bucket/key from each path; a custom ``path_to_key``
callable supports other layouts (tests map keys straight onto a local
directory so the full engine lifecycle can run over the S3 protocol).
"""

from __future__ import annotations

from typing import Callable

from .storage import AtomicStorage


def _error_code(exc: Exception) -> str:
    """botocore ClientError carries the service error under
    ``e.response["Error"]["Code"]``; duck-typed so fakes (and a missing
    botocore) work."""
    try:
        return str(exc.response["Error"]["Code"])  # type: ignore[attr-defined]
    except Exception:
        return ""


class S3AtomicStorage(AtomicStorage):
    """AtomicStorage over the S3 API (or any S3-compatible store that
    supports conditional writes — MinIO, R2, GCS via the XML API)."""

    def __init__(self, bucket: str | None = None, client=None,
                 path_to_key: Callable[[str], tuple[str, str]] | None = None):
        if client is None:  # pragma: no cover - needs a live AWS session
            import boto3  # deferred: not bundled everywhere

            client = boto3.client("s3")
        self.client = client
        self.bucket = bucket
        self.path_to_key = path_to_key or self._parse_uri

    def _parse_uri(self, path: str) -> tuple[str, str]:
        if path.startswith("s3://"):
            bucket, _, key = path[len("s3://"):].partition("/")
            return bucket, key
        if self.bucket is None:
            raise ValueError(
                f"not an s3:// path and no default bucket configured: {path}")
        return self.bucket, path.lstrip("/")

    # ------------------------------------------------------------ contract
    def put_atomic(self, path: str, payload: bytes) -> None:
        bucket, key = self.path_to_key(path)
        # single whole-object PUT — atomic by the S3 consistency model
        self.client.put_object(Bucket=bucket, Key=key, Body=payload)

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        bucket, key = self.path_to_key(path)
        try:
            self.client.put_object(Bucket=bucket, Key=key, Body=payload,
                                   IfNoneMatch="*")
        except Exception as e:
            # 412: the key already exists. 409 ConditionalRequestConflict:
            # a CONCURRENT conditional write raced this one — the loser
            # must treat it as "did not acquire" and let the caller's
            # retry loop observe the outcome, not crash.
            if _error_code(e) in ("PreconditionFailed", "412",
                                  "ConditionalRequestConflict", "409"):
                return False
            raise
        return True

    def delete_if_exists(self, path: str) -> bool:
        bucket, key = self.path_to_key(path)
        existed = True
        try:
            self.client.head_object(Bucket=bucket, Key=key)
        except Exception as e:
            if _error_code(e) in ("404", "NoSuchKey", "NotFound"):
                existed = False
            # HEAD failures other than 404: proceed to delete anyway —
            # the delete is the operation that matters, HEAD only feeds
            # the advisory return value
        self.client.delete_object(Bucket=bucket, Key=key)
        return existed

    def mtime(self, path: str) -> float | None:
        bucket, key = self.path_to_key(path)
        try:
            resp = self.client.head_object(Bucket=bucket, Key=key)
        except Exception as e:
            if _error_code(e) in ("404", "NoSuchKey", "NotFound"):
                return None
            raise
        lm = resp.get("LastModified") if isinstance(resp, dict) else None
        return lm.timestamp() if lm is not None else None
