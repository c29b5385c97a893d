"""Multimodal (image/audio/video) column plumbing for the interleaved-doc
table.

Media is carried as opaque ``binary`` payloads with typed metadata, exactly
as a 100 TB training pipeline would store it (payload in the row or a
``media_ref`` pointer into object storage). The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signatures, partitioning — is real and
tested; the codec step itself is STUBBED (this container has no image/audio
libraries): ``decode_stub=True`` produces a deterministic fake decode derived
from the payload bytes, and ``decode_stub=False`` raises NotImplementedError
where a real codec (pillow/libsndfile/ffmpeg) would be called.

Batch sizing note (scale): decoded frames are large; callers should lower
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py default 2048)
before decoding so an Arrow batch of decoded tensors stays << executor heap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def synth_payload(media_ref: str, n_bytes: int = 256) -> bytes:
    """Deterministic fake media payload for fixtures: sha256 keystream of the
    ref string. Stands in for an object-store fetch."""
    out = b""
    counter = 0
    while len(out) < n_bytes:
        out += hashlib.sha256(f"{media_ref}#{counter}".encode()).digest()
        counter += 1
    return out[:n_bytes]


def media_table(docs: DataFrame) -> DataFrame:
    """Explode the interleaved spans into a media-item table.

    (doc_id, span_idx, kind, media_ref) for every non-text span — the
    ORDER of spans is preserved in span_idx (posexplode), so the doc table
    can always be reassembled with the span-sequence invariant intact.
    """
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .filter(F.col("span.kind") != "text")
        .select("doc_id", "span_idx",
                F.col("span.kind").alias("kind"),
                F.col("span.media_ref").alias("media_ref"))
    )


def fetch_payloads(media: DataFrame, n_bytes: int = 256) -> DataFrame:
    """Attach the binary payload column (fixture: synthesized; production:
    object-store fetch inside the same mapInPandas, batched per partition)."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_payload(r, n_bytes) for r in pdf["media_ref"]]
            yield pdf

    # copy: StructType.add mutates in place, which would corrupt the source
    # DataFrame's cached schema
    from pyspark.sql import types as TY
    schema = TY.StructType(list(media.schema.fields)).add("payload", "binary")
    return media.mapInPandas(fetch, schema=schema)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a codec: derives (width, height, feature
    vector) purely from the payload bytes. Replaced by a real decoder in
    production; keeps every downstream shape/type contract honest.

    width/height hash the payload's lowercase-hex encoding (not the raw
    bytes) so the fake is reproducible by engines whose hash functions are
    VARCHAR-only — this is what makes the media_decode driver query a full
    VALUE oracle against DuckDB rather than a rows-only check."""
    h = hashlib.sha256(payload.hex().encode()).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    feats = np.array([
        raw[k::FEATURE_DIM].mean() if len(raw[k::FEATURE_DIM]) else 0.0
        for k in range(FEATURE_DIM)
    ])
    return width, height, (feats / 255.0).astype(np.float32)


def decode_and_featurize(media_with_payload: DataFrame,
                         decode_stub: bool = True) -> DataFrame:
    """Decode media payloads and extract a FEATURE_DIM embedding per item.

    mapInPandas over Arrow batches; output schema
    (doc_id, span_idx, kind, media_ref, width, height, features:array<float>).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real codecs (pillow / soundfile / ffmpeg) are not available in "
            "this environment; run with decode_stub=True")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                w, h, f = _fake_decode(bytes(payload), kind)
                ws.append(w); hs.append(h); fs.append(f.tolist())
            out = pdf[["doc_id", "span_idx", "kind", "media_ref"]].copy()
            out["width"] = pd.Series(ws, dtype="int32")
            out["height"] = pd.Series(hs, dtype="int32")
            out["features"] = fs
            yield out

    return media_with_payload.mapInPandas(
        decode,
        schema="doc_id string, span_idx int, kind string, media_ref string, "
               "width int, height int, features array<float>",
    )


def frame_sample(media_with_payload: DataFrame, every_n_bytes: int = 64,
                 decode_stub: bool = True) -> DataFrame:
    """Video-style frame sampling: emit one row per sampled "frame" (here:
    per payload block) — demonstrates the 1->N mapInPandas expansion shape
    used for real frame extraction."""
    if not decode_stub:
        raise NotImplementedError("no video codec in this environment")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, ref, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                for fi, off in enumerate(range(0, len(b), every_n_bytes)):
                    chunk = b[off:off + every_n_bytes]
                    # hex-encoded hash input: cross-engine reproducible
                    # (VARCHAR-only hash engines), see _fake_decode note
                    rows.append((doc_id, int(span_idx), ref, fi,
                                 hashlib.sha256(chunk.hex().encode()).hexdigest()))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "span_idx", "media_ref", "frame_idx", "frame_hash"])

    return media_with_payload.mapInPandas(
        sample,
        schema="doc_id string, span_idx int, media_ref string, "
               "frame_idx int, frame_hash string",
    )
