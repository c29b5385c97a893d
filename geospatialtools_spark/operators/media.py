"""Multimodal (image/audio/video) column plumbing for the interleaved-doc
table.

Media is carried as opaque ``binary`` payloads with typed metadata, exactly
as a 100 TB training pipeline would store it (payload in the row or a
``media_ref`` pointer into object storage). The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signatures, partitioning — is real and
tested. ``decode_stub=True`` produces a deterministic fake decode derived
from the payload bytes (the cross-engine-oracled gate surface);
``decode_stub=False`` routes through real codecs: pillow/soundfile when
installed, else a pure-stdlib fallback for PNG (zlib) and PCM WAV (wave) —
exercised end-to-end in this container — and NotImplementedError naming the
missing dependency for formats stdlib can't decode (JPEG, FLAC, video).

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


def _png_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Minimal pure-stdlib PNG decoder (public spec, RFC 2083 / ISO 15948):
    8-bit-depth non-interlaced greyscale/RGB/RGBA, all five scanline
    filters (None/Sub/Up/Average/Paeth), IDAT via stdlib zlib. Returns
    (width, height, luminance float64 array, row-major ravel) — luminance
    by the same ITU-R 601-2 integer formula pillow's convert("L") uses, so
    the fallback and the pillow branch agree on PNG inputs."""
    import struct
    import zlib
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise ValueError(f"unsupported PNG variant (depth={depth}, "
                         f"color={color}, interlace={interlace})")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    rows = []
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        row = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 0:
            pass
        elif f == 2:                      # Up — vectorizable
            row = bytearray((np.frombuffer(bytes(row), np.uint8)
                             + np.frombuffer(bytes(prev), np.uint8))
                            .astype(np.uint8).tobytes())
        elif f in (1, 3, 4):              # Sub/Average/Paeth: left-dependent
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 1:
                    row[i] = (row[i] + a) & 0xFF
                elif f == 3:
                    row[i] = (row[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - ch] if i >= ch else 0
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    row[i] = (row[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rows.append(bytes(row))
        prev = row
    arr = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, ch)
    if ch == 1:
        gray = arr[:, :, 0].astype(np.float64)
    else:
        # pillow convert("L")'s exact fixed-point ITU-R 601-2 form:
        # L = (R*19595 + G*38470 + B*7471) >> 16 (libImaging Convert.c L24).
        # The rational //1000 form differs by ±1 on ~0.1% of RGB triples,
        # which would make decode output environment-dependent.
        rgb = arr[:, :, :3].astype(np.int64)
        gray = ((rgb[:, :, 0] * 19595 + rgb[:, :, 1] * 38470
                 + rgb[:, :, 2] * 7471) >> 16).astype(np.float64)
    return w, h, gray.ravel()


def _wav_decode(payload: bytes) -> np.ndarray:
    """Minimal pure-stdlib WAV decoder via the ``wave`` module: PCM
    8/16/32-bit, any channel count. Returns (frames, channels) float64 in
    [-1, 1] — the same shape/range contract as soundfile.read."""
    import io
    import wave
    with wave.open(io.BytesIO(payload)) as wf:
        ch, sw, n = wf.getnchannels(), wf.getsampwidth(), wf.getnframes()
        frames = wf.readframes(n)
    if sw == 2:
        data = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        data = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
                - 128.0) / 128.0
    elif sw == 4:
        data = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2.0 ** 31
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return data.reshape(-1, ch)


def _real_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Real-codec adapter (round 4; stdlib fallback round 5): lazily
    imports the codec per media kind — pillow for images, soundfile for
    audio — and produces the SAME (width, height, FEATURE_DIM float32
    features) contract as the stub, so swapping decode_stub=False changes
    only the bytes->tensor step, never the Spark plan, schema, or batch
    shape.

    When the third-party codec isn't installed, a pure-stdlib fallback
    handles the two formats the standard library can genuinely decode —
    PNG (zlib inflate + filter reconstruction, _png_decode) and PCM WAV
    (wave module, _wav_decode) — so this container exercises the real
    branch end-to-end with actually-encoded payloads
    (test_real_codec_stdlib_png_wav). Payloads outside those formats still
    raise NotImplementedError naming the missing dependency."""
    import io
    if kind == "image":
        try:
            from PIL import Image
        except ImportError:
            try:
                w, h, gray = _png_decode(payload)
            except Exception as e:
                raise NotImplementedError(
                    "image decode needs pillow (pip install pillow) for "
                    "non-PNG payloads — the stdlib fallback decodes 8-bit "
                    "non-interlaced PNG only; "
                    "run with decode_stub=True in codec-less environments") from e
        else:
            img = Image.open(io.BytesIO(payload))
            img.load()
            w, h = img.size
            gray = np.asarray(img.convert("L"), dtype=np.float64).ravel()
        chunks = np.array_split(gray, FEATURE_DIM)
        feats = np.array([c.mean() if c.size else 0.0 for c in chunks])
        return w, h, (feats / 255.0).astype(np.float32)
    if kind == "audio":
        try:
            import soundfile as sf
        except ImportError:
            try:
                data = _wav_decode(payload)
            except Exception as e:
                raise NotImplementedError(
                    "audio decode needs soundfile (pip install soundfile) "
                    "for non-WAV payloads — the stdlib fallback decodes PCM "
                    "WAV only; "
                    "run with decode_stub=True in codec-less environments") from e
        else:
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
