"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
everything that needs a codec is an Arrow-batched ``mapInPandas`` stage.
The Spark-side contract — schema, batching, partitioning — is real and
tested; the codec itself is stubbed (this container ships no image/audio
libraries): ``decode_media_meta(..., fake=False)`` raises
``NotImplementedError`` at the exact point a real decoder (PIL / torchaudio
/ pyav) would plug in, and ``fake=True`` substitutes a deterministic
byte-derived decode so pipelines remain end-to-end testable.

Scale notes: binary payloads ride the same Parquet row groups as the rest
of the row — at 100 TB keep media in their own table keyed by content hash
(exact_dedup on the digest dedups storage), project the binary column ONLY
in decode stages (column pruning keeps metadata-only queries cheap), and
size ``spark.sql.files.maxPartitionBytes`` so a task's Arrow batches fit in
executor memory (mapInPandas streams batches; it never materializes the
whole partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_SCHEMA", "attach_media", "decode_media_meta",
           "sample_frames", "register_codec", "resize_media",
           "extract_features"]

# ------------------------------------------------------------ codec registry
# The explicit plugin point for real decoders: register a callable
# ``fn(payload: bytes | None) -> {"width", "height", "channels",
# "decode_digest"}`` under a name (e.g. with PIL:
# ``register_codec("pil", lambda b: ...Image.open(io.BytesIO(b))...)``),
# then ``decode_media_meta(df, codec="pil")``. Codec callables are shipped
# to executors by cloudpickle with the mapInPandas closure, so driver-side
# registration is all a user needs.
_CODECS: dict = {}


def register_codec(name: str, fn) -> None:
    _CODECS[name] = fn


def _fake_codec(b):
    """Deterministic byte-derived decode: exercises the full Arrow batch
    path without an image/audio library."""
    import hashlib

    if b is None:
        return {"width": None, "height": None, "channels": None,
                "decode_digest": None}
    d = hashlib.md5(bytes(b)).hexdigest()
    return {"width": int(d[:4], 16) % 1920 + 1,
            "height": int(d[4:8], 16) % 1080 + 1,
            "channels": int(d[8], 16) % 4 + 1,
            "decode_digest": d}


register_codec("fake", _fake_codec)

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("format", T.StringType()),       # e.g. png, wav, mp4
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),       # md5 hex of payload
])


def attach_media(df: DataFrame, payload_col, media_type: str = "image",
                 fmt: str = "bin") -> DataFrame:
    """Wrap a binary column into (media bytes + typed metadata struct)."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    payload = payload.cast("binary")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
        ),
    )


_DECODED_FIELDS = "width int, height int, channels int, decode_digest string"


def decode_media_meta(df: DataFrame, media_col: str = "media",
                      fake: bool = True, codec=None) -> DataFrame:
    """Decode stage: media bytes → (width, height, channels, digest).

    Arrow-batched ``mapInPandas``; schema = input + decoded fields.
    ``codec`` selects the decoder: a name from :func:`register_codec`, or a
    callable ``bytes|None -> dict``. The built-in ``"fake"`` codec is a
    deterministic function of the payload bytes (md5-derived), exercising
    the full batch path without an image/audio library; ``fake=True`` is
    the back-compat spelling of ``codec="fake"``. With no codec resolved
    the stage raises at the exact plug-in point a real decoder (PIL /
    torchaudio / pyav) registers into.
    """
    if codec is None and fake:
        codec = "fake"
    if isinstance(codec, str):
        codec = _CODECS.get(codec)
    out_schema = T.StructType(
        df.schema.fields + T.StructType.fromDDL(_DECODED_FIELDS).fields)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                raise NotImplementedError(
                    "no media codec: register one with "
                    "hoodie_spark.functions.register_codec(name, fn) and "
                    "pass codec=name (or codec=callable); codec='fake' is "
                    "the deterministic test decoder")
            decoded = [codec(b) for b in pdf[media_col]]
            pdf = pdf.copy()
            for field in ("width", "height", "channels", "decode_digest"):
                pdf[field] = [d[field] for d in decoded]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def resize_media(df: DataFrame, width: int, height: int,
                 media_col: str = "media", fake: bool = True,
                 codec=None) -> DataFrame:
    """Resize stage: media bytes → media bytes at the target geometry.

    Arrow-batched ``mapInPandas``; output schema = input with ``media``
    replaced and ``media_meta`` (when present) updated to the new
    ``n_bytes``/``digest``. The resize codec is the plug point —
    ``register_codec("pil_resize", fn)`` with
    ``fn(payload: bytes|None, width, height) -> bytes|None`` for a real
    backend; the built-in fake is a deterministic 1-D nearest-neighbor
    resample (payload repeated/truncated to ``width*height`` bytes), which
    exercises the binary-in/binary-out batch path end to end.

    Scale: map-only over Arrow batches, no shuffle; the payload column is
    the only wide column touched (project it late — see module notes).
    """
    if codec is None and fake:
        codec = "fake_resize"
    if isinstance(codec, str):
        codec = _CODECS.get(codec)
    has_meta = "media_meta" in df.columns
    out_schema = df.schema

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if codec is None:
                raise NotImplementedError(
                    "no resize codec: register one with register_codec("
                    "name, fn(payload, width, height) -> bytes) and pass "
                    "codec=name; codec='fake_resize' is the deterministic "
                    "test resampler")
            pdf = pdf.copy()
            out = [codec(b, width, height) for b in pdf[media_col]]
            pdf[media_col] = out
            if has_meta:
                pdf["media_meta"] = [
                    None if m is None else {
                        **m,
                        "n_bytes": None if b is None else len(b),
                        "digest": None if b is None
                        else hashlib.md5(bytes(b)).hexdigest()}
                    for m, b in zip(pdf["media_meta"], out)]
            yield pdf

    return df.mapInPandas(resize, schema=out_schema)


def _fake_resize(b, width: int, height: int):
    """Deterministic 1-D nearest-neighbor byte resample to width*height."""
    if b is None:
        return None
    target = max(width * height, 0)
    raw = bytes(b)
    if not raw or target == 0:
        return b"" if raw is not None else None
    reps = -(-target // len(raw))  # ceil
    return (raw * reps)[:target]


register_codec("fake_resize", _fake_resize)


def extract_features(df: DataFrame, media_col: str = "media", dim: int = 8,
                     fake: bool = True, codec=None) -> DataFrame:
    """Feature-extract stage: media bytes → ``features array<float>`` —
    the bridge from multimodal payloads into every embedding operator
    (ANN top-k, near-dup, semantic_dedup, cluster_balanced_sample).

    Arrow-batched ``mapInPandas``; output schema = input +
    ``features array<float>``. The embedding model is the plug point —
    ``register_codec("clip", fn)`` with ``fn(payload: bytes|None, dim)
    -> list[float]|None`` for a real backend. The built-in fake derives
    component ``j`` from ``md5(md5(payload) || ':' || j)``: first 4 hex
    nibbles as an int, mapped to ``(v % 2001 - 1000) / 1000.0`` — pure
    integer-then-divide arithmetic any SQL engine reproduces bit-for-bit.
    """
    if codec is None and fake:
        codec = "fake_features"
    if isinstance(codec, str):
        codec = _CODECS.get(codec)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features",
                                          T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                raise NotImplementedError(
                    "no feature codec: register one with register_codec("
                    "name, fn(payload, dim) -> list[float]) and pass "
                    "codec=name; codec='fake_features' is the "
                    "deterministic test embedder")
            pdf = pdf.copy()
            pdf["features"] = [codec(b, dim) for b in pdf[media_col]]
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def _fake_features(b, dim: int):
    """Deterministic md5-derived embedding in [-1, 1]."""
    import hashlib

    if b is None:
        return None
    base = hashlib.md5(bytes(b)).hexdigest()
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{base}:{j}".encode()).hexdigest()
        out.append((int(h[:4], 16) % 2001 - 1000) / 1000.0)
    return out


register_codec("fake_features", _fake_features)


def sample_frames(df: DataFrame, media_col: str = "media", every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame".

    Stands in for video frame extraction: slices the payload every
    ``every_n_bytes`` bytes (a real implementation would seek keyframes).
    Output: input columns + (frame_idx int, frame binary). Uses the posexplode
    of a byte-slice array — JVM-side, no Python.
    """
    media = F.col(media_col)
    n = F.least(F.floor(F.length(media) / every_n_bytes).cast("int") + 1, F.lit(max_frames))
    slices = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: media.substr(i * every_n_bytes + 1, F.lit(every_n_bytes)).cast("binary"),
    )
    return df.select("*", F.posexplode(slices).alias("frame_idx", "frame"))
