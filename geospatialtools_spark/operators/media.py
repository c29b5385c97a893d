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


def _real_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Real-codec adapter (round 4): lazily imports the codec per media
    kind — pillow for images, soundfile for audio — and produces the SAME
    (width, height, FEATURE_DIM float32 features) contract as the stub, so
    swapping decode_stub=False changes only the bytes->tensor step, never
    the Spark plan, schema, or batch shape. Raises NotImplementedError with
    the missing dependency named when the codec isn't installed (this
    container ships neither; tests/test_pipeline.py skipif-gates the real
    branch)."""
    import io
    if kind == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image decode needs pillow (pip install pillow); "
                "run with decode_stub=True in codec-less environments") from e
        img = Image.open(io.BytesIO(payload))
        img.load()
        w, h = img.size
        arr = np.asarray(img.convert("L"), dtype=np.float64).ravel()
        chunks = np.array_split(arr, FEATURE_DIM)
        feats = np.array([c.mean() if c.size else 0.0 for c in chunks])
        return w, h, (feats / 255.0).astype(np.float32)
    if kind == "audio":
        try:
            import soundfile as sf
        except ImportError as e:
            raise NotImplementedError(
                "audio decode needs soundfile (pip install soundfile); "
                "run with decode_stub=True in codec-less environments") from e
        data, _rate = sf.read(io.BytesIO(payload), always_2d=True)
        chunks = np.array_split(np.abs(data).mean(axis=1), FEATURE_DIM)
        feats = np.array([float(np.sqrt((c ** 2).mean())) if c.size else 0.0
                          for c in chunks])
        return int(data.shape[0]), int(data.shape[1]), feats.astype(np.float32)
    raise NotImplementedError(
        f"no codec adapter for kind={kind!r} (video needs PyAV/ffmpeg)")


def decode_and_featurize(media_with_payload: DataFrame,
                         decode_stub: bool = True) -> DataFrame:
    """Decode media payloads and extract a FEATURE_DIM embedding per item.

    mapInPandas over Arrow batches; output schema
    (doc_id, span_idx, kind, media_ref, width, height, features:array<float>).
    ``decode_stub=False`` routes each row through the lazily-imported real
    codec (_real_decode) — identical plan and output contract.
    """
    decoder = _fake_decode if decode_stub else _real_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                w, h, f = decoder(bytes(payload), kind)
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


def _real_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Real frame extraction seam: lazily imports PyAV and returns every
    ``every_n``-th decoded frame's raw plane bytes. NotImplementedError
    names the dependency when absent (no ffmpeg in this container)."""
    import io
    try:
        import av
    except ImportError as e:
        raise NotImplementedError(
            "video frame sampling needs PyAV/ffmpeg (pip install av); "
            "run with decode_stub=True in codec-less environments") from e
    out = []
    with av.open(io.BytesIO(payload)) as container:
        for fi, frame in enumerate(container.decode(video=0)):
            if fi % every_n == 0:
                out.append(bytes(frame.to_ndarray(format="gray").tobytes()))
    return out


def frame_sample(media_with_payload: DataFrame, every_n_bytes: int = 64,
                 decode_stub: bool = True,
                 every_n_frames: int = 1) -> DataFrame:
    """Video-style frame sampling: emit one row per sampled "frame" (stub:
    per payload block; real: every Nth decoded PyAV frame) — the 1->N
    mapInPandas expansion shape used for real frame extraction.

    ``every_n_bytes`` sizes the STUB's byte chunks only; the real-codec
    path samples every ``every_n_frames``-th decoded frame — two separate
    parameters because they are different units (a caller tuned for 64-byte
    stub chunks must not silently become a 1-in-64 frame sampler when the
    seam flips to a real codec)."""

    def chunks_of(b: bytes) -> list[bytes]:
        if decode_stub:
            return [b[off:off + every_n_bytes]
                    for off in range(0, len(b), every_n_bytes)]
        return _real_frames(b, max(every_n_frames, 1))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, ref, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["media_ref"], pdf["payload"]):
                for fi, chunk in enumerate(chunks_of(bytes(payload))):
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
