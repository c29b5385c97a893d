"""WARC (Web ARChive, ISO 28500) ingest — the wire format a web-scale
training-data pipeline actually receives (Common Crawl ships WARC), parsed
distributed.

Spark shape: ``spark.read.format("binaryFile")`` makes each WARC FILE one
row (crawl archives are ~1 GB each, so files are the natural parallelism
unit — a 100 TB crawl is ~100k files spread across executors, no shuffle
anywhere in the ingest: scan -> mapInPandas parse -> columnar records).
The parser is a pure function over the file bytes, run inside an Arrow
batch; one file's records materialize in one task's memory, which is the
standard WARC-processing contract (records cannot span files).

Format essentials implemented (public spec): records begin with a
``WARC/1.0`` version line, followed by ``Name: value`` header lines, a
blank line (CRLF CRLF), ``Content-Length`` octets of block, and a CRLF
CRLF record terminator. For ``response`` records the block is an HTTP/1.x
message: status line, headers, blank line, body. ``.warc.gz`` archives —
the Common Crawl layout, ONE gzip member per record so readers can seek —
are handled too: stdlib zlib inflates the concatenated members into the
identical byte stream and the same ``parse_warc_records`` runs (parity
with the plain parse asserted in tests, fixture written member-per-record
exactly like real crawls).

Truncation/corruption policy: a record whose declared Content-Length is
negative, unparseable, or runs past the file end is DROPPED along with
everything after it (a torn tail from an interrupted transfer must not
fabricate a short payload, and resynchronizing after a corrupt length is
guesswork); complete records before the damage all parse, and the drop is
LOGGED with the file, offset and dropped byte count — mid-file corruption
in a 1 GB archive must never be silent data loss. Asserted in tests.

The synthetic fixture generator (``make_warc_bytes``) is the ground
truth: it KNOWS every record it wrote, so parser tests and the
``warc_ingest`` gate oracle compare the distributed parse against
generator-known rows (the golden-twin discipline — the generator and the
parser share no code path)."""

from __future__ import annotations

import hashlib
import logging
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as TY

WARC_SCHEMA = TY.StructType([
    TY.StructField("src_file", TY.StringType()),
    TY.StructField("record_id", TY.StringType()),
    TY.StructField("warc_type", TY.StringType()),
    TY.StructField("target_uri", TY.StringType()),
    TY.StructField("warc_date", TY.StringType()),
    TY.StructField("http_status", TY.IntegerType()),
    TY.StructField("content_type", TY.StringType()),
    TY.StructField("payload", TY.StringType()),
    TY.StructField("n_bytes", TY.LongType()),
])

_CRLF = b"\r\n"
_log = logging.getLogger(__name__)


def parse_warc_records(blob: bytes, src_file: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts (WARC_SCHEMA fields).

    Pure python over ``bytes`` — runs vectorized-per-file inside the Arrow
    batch of ``read_warc``, and is independently unit-testable against the
    generator's known records."""
    out: list[dict] = []
    pos = 0
    n = len(blob)

    def _stop(reason: str) -> None:
        if pos < n:
            _log.warning("warc: %s at offset %d of %s — dropping the "
                         "remaining %d bytes (%d records parsed)",
                         reason, pos, src_file or "<bytes>", n - pos,
                         len(out))

    while pos < n:
        if blob[pos:pos + 5] != b"WARC/":
            _stop("non-WARC bytes")    # garbage / torn tail: stop cleanly
            break
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            _stop("unterminated record header")
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        if clen < 0:
            # unparseable OR negative: a negative length would move the
            # cursor backwards and loop forever on the same record
            _stop("bad Content-Length")
            break
        block_start = hdr_end + 4
        block_end = block_start + clen
        if block_end > n:
            _stop("truncated record")  # drop, stop
            break
        block = blob[block_start:block_end]
        status, ctype, payload = None, headers.get("content-type"), block
        if headers.get("warc-type") == "response" and \
                block[:5] in (b"HTTP/",):
            http_hdr_end = block.find(_CRLF + _CRLF)
            if http_hdr_end >= 0:
                http_lines = block[:http_hdr_end].split(_CRLF)
                parts = http_lines[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("ascii", "replace")
                payload = block[http_hdr_end + 4:]
        out.append({
            "src_file": src_file,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "content_type": ctype,
            "payload": payload.decode("utf-8", "replace"),
            "n_bytes": len(payload),
        })
        pos = block_end + 4            # skip the record terminator
    return out


def _inflate_gz_members(blob: bytes, src_file: str = "") -> bytes:
    """Inflate a .warc.gz, SALVAGING whatever inflated cleanly: both the
    member-per-record Common Crawl layout and a single-stream gzip are
    handled, and a torn/corrupt member keeps its partial output — the
    downstream parser's drop-torn-record policy then discards only the
    incomplete RECORD, not the archive (a bare gzip.decompress would
    instead abort the whole ingest task with EOFError/BadGzipFile on
    exactly the torn-tail case the module promises to survive).

    Input is fed in bounded chunks off a memoryview cursor: per-member
    `decompress(blob[pos:])` would memcpy the remaining file tail once
    per member — O(members x file_size), hours of pure copying at the
    ~1 GB / 10^5-member archives this module targets."""
    import zlib
    chunk_size = 1 << 20
    mv = memoryview(blob)
    parts: list[bytes] = []
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)          # gzip-wrapped member
        member: list[bytes] = []
        cur = pos
        try:
            while cur < n and not d.eof:
                end = min(cur + chunk_size, n)
                member.append(d.decompress(mv[cur:end]))
                cur = end
        except zlib.error:
            _log.warning("warc: corrupt gzip data at byte %d of %s — "
                         "keeping the %d bytes inflated before it, "
                         "dropping the rest", pos, src_file or "<bytes>",
                         sum(map(len, member)))
            parts += member
            break
        if not d.eof:
            _log.warning("warc: truncated gzip member at byte %d of %s — "
                         "keeping its %d partial bytes (torn trailing "
                         "RECORD drops in the parser)", pos,
                         src_file or "<bytes>", sum(map(len, member)))
            parts += member
            break
        parts += member
        pos = cur - len(d.unused_data)
    return b"".join(parts)


def _warc_parser(types: tuple[str, ...]):
    """The shared Arrow parse closure — batch ``read_warc`` and streaming
    ``read_warc_stream`` run EXACTLY this function, so the two faces can
    never parse differently."""
    want = set(types)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            # one yield PER FILE: an Arrow batch can hold several archive
            # rows, and accumulating them would hold every file's decoded
            # records in memory at once — the per-task memory contract is
            # one archive's records, not one batch's
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if str(p).endswith(".gz"):
                    # member-per-record gzip (the Common Crawl layout),
                    # inflated member-by-member so torn archives salvage
                    blob = _inflate_gz_members(blob, src_file=str(p))
                recs = parse_warc_records(blob, src_file=str(p))
                yield pd.DataFrame(
                    [r for r in recs if not want or r["warc_type"] in want],
                    columns=cols)

    return parse


def read_warc(spark, path: str,
              types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Distributed WARC ingest: binaryFile scan (one row per archive file,
    executors each parse their own files — zero shuffle) -> Arrow-batched
    ``parse_warc_records`` -> one record row per WARC record of the
    requested ``types`` (default: response only — the training-data rows;
    pass ("response", "request", "warcinfo") or () for everything)."""
    binary = (spark.read.format("binaryFile")
              .option("pathGlobFilter", _WARC_GLOB).load(path)
              .select("path", "content"))
    return binary.mapInPandas(_warc_parser(types), WARC_SCHEMA)


# ONE glob for both faces — like _warc_parser, so batch and stream can
# never silently ingest different file sets
_WARC_GLOB = "*.{warc,warc.gz}"

# binaryFile's fixed source schema — streaming file sources require it
# declared explicitly (spark refuses to infer for a stream)
_BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                       "length long, content binary")


def read_warc_stream(spark, path: str,
                     types: tuple[str, ...] = ("response",)) -> DataFrame:
    """The crawl as a STREAM: new archive files landing in ``path``
    become record micro-batches — the live-ingest face of ``read_warc``
    (same ``_warc_parser`` closure, so parse behavior is shared by
    construction). Everything downstream of the parse is per-row
    (``warc_to_docs`` is a pure projection), so the whole
    crawl -> documents chain is streaming-legal with no state store;
    run with ``streaming.ingest.run_available_now`` for catch-up ingest
    or a processing-time trigger for live tailing (file sources do not
    support continuous triggers — ``trigger(continuous=...)`` crashes
    the query). Files are the parallelism AND checkpoint unit: the
    file-source log records which archives are done, so a restart never
    re-parses a committed archive.

    WRITER CONTRACT (the standard file-source discipline, load-bearing
    here): archives must appear ATOMICALLY — write to a temp directory
    and rename into the watched path. A file picked up mid-write is
    parsed as a torn prefix (the tail drops with a logged offset) and
    the checkpoint then marks it done FOREVER; the appended remainder
    would never be re-read."""
    binary = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA)
              .option("pathGlobFilter", _WARC_GLOB).load(path)
              .select("path", "content"))
    return binary.mapInPandas(_warc_parser(types), WARC_SCHEMA)


# ----------------------------------------------------------------- fixture

def _det(token: str) -> str:
    return hashlib.md5(token.encode()).hexdigest()


def make_warc_records(file_no: int, n_records: int) -> list[dict]:
    """Generator-known ground truth for one synthetic WARC file: the exact
    (uri, status, content_type, payload) rows ``make_warc_bytes`` encodes.
    Deterministic in (file_no, record index); no RNG state."""
    recs = []
    for i in range(n_records):
        h = _det(f"warc|{file_no}|{i}")
        body = (f"<html><title>doc {file_no}-{i}</title>"
                f"<p>{h} content for record {i} of file {file_no}</p>"
                "</html>")
        recs.append({
            "record_id": f"<urn:uuid:{h}>",
            "target_uri": f"https://example.test/{file_no}/{i}/{h[:8]}",
            "warc_date": f"2026-01-{(i % 28) + 1:02d}T00:00:00Z",
            "http_status": 200 if i % 7 else 404,
            "content_type": "text/html" if i % 5 else "application/json",
            "payload": body if i % 5 else f'{{"h": "{h}"}}',
        })
    return recs


def make_warc_record_blobs(file_no: int, n_records: int) -> list[bytes]:
    """The per-record byte blobs of one synthetic archive: a warcinfo
    record, then for each logical fetch a request record AND a response
    record (as real crawlers write), so type filtering is exercised by
    construction. ``make_warc_bytes`` joins them for a plain .warc;
    ``make_warc_gz_bytes`` gzips each into its own member (the Common
    Crawl .warc.gz layout)."""
    def record(wtype: str, extra: dict, block: bytes) -> bytes:
        hdrs = {"WARC-Type": wtype, **extra,
                "Content-Length": str(len(block))}
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in hdrs.items())
        return head + _CRLF + block + _CRLF + _CRLF

    out: list[bytes] = [record("warcinfo",
                  {"WARC-Record-ID": f"<urn:uuid:{_det(f'info|{file_no}')}>",
                   "Content-Type": "application/warc-fields"},
                  b"software: spark-geotile-synth/1.0\r\n")]
    for r in make_warc_records(file_no, n_records):
        out.append(record(
            "request",
            {"WARC-Record-ID": r["record_id"].replace("uuid:", "uuid:req-"),
             "WARC-Target-URI": r["target_uri"],
             "WARC-Date": r["warc_date"],
             "Content-Type": "application/http;msgtype=request"},
            f"GET {r['target_uri']} HTTP/1.1\r\nHost: example.test\r\n\r\n"
            .encode()))
        body = r["payload"].encode()
        http = (f"HTTP/1.1 {r['http_status']} X\r\n"
                f"Content-Type: {r['content_type']}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        out.append(record(
            "response",
            {"WARC-Record-ID": r["record_id"],
             "WARC-Target-URI": r["target_uri"],
             "WARC-Date": r["warc_date"],
             "Content-Type": "application/http;msgtype=response"},
            http))
    return out


def make_warc_bytes(file_no: int, n_records: int) -> bytes:
    return b"".join(make_warc_record_blobs(file_no, n_records))


def make_warc_gz_bytes(file_no: int, n_records: int) -> bytes:
    """Member-per-record gzip of the same records — byte-level layout of a
    real crawl archive (mtime pinned so the fixture stays deterministic)."""
    import gzip
    return b"".join(gzip.compress(b, mtime=0)
                    for b in make_warc_record_blobs(file_no, n_records))


def write_warc_fixture(root: str, n_files: int = 3,
                       n_records: int = 25) -> str:
    """Write the deterministic fixture tree (idempotent — same bytes every
    call); returns ``root``."""
    import os
    os.makedirs(root, exist_ok=True)
    for f in range(n_files):
        p = os.path.join(root, f"crawl-{f:03d}.warc")
        data = make_warc_bytes(f, n_records)
        # content compare, not size: a stale file from an older generator
        # (or a torn write) of coincidentally equal size must be replaced
        if os.path.exists(p):
            with open(p, "rb") as fh:
                if fh.read() == data:
                    continue
        with open(p, "wb") as fh:
            fh.write(data)
    return root


def warc_to_docs(records: DataFrame, min_chars: int = 1,
                 extractor: str = "strip") -> DataFrame:
    """Bridge crawl records into the engine's ``documents`` schema
    (doc_id, text, lang, source, n_chars) so the curation pipeline runs
    straight off an archive: keep 200-status text/* responses, strip
    markup (single chained regexp_replace pass: tags -> space, whitespace
    collapse — the documented public-knowledge simplification of HTML
    text extraction; a production pipeline swaps in a real parser at this
    exact seam), and derive:

    - ``doc_id``: first 60 bits of md5(record_id) as a long — stable
      across re-ingests of the same crawl, recomputable by any engine
      (the same construction as sampling.hash_bucket);
    - ``source``: the URI host (the domain-mixture knob's input);
    - ``lang``: 'und' — language ID is a downstream operator
      (textstats.lang_id), not an ingest guess.

    Pure Catalyst projection over the parsed records: zero shuffle, so
    WARC -> docs -> curation adds nothing to the ingest's plan beyond the
    parse itself.

    ``extractor`` picks the HTML->text rule: ``"strip"`` (default, the
    flat tags->space pass above) or ``"blocks"`` — jusText-style
    block-level boilerplate removal (``functions/html.py``): nav bars,
    footers and link farms drop before the text ever reaches dedup and
    quality scoring. Both are per-row expressions; neither adds an
    exchange."""
    if extractor == "strip":
        text = F.trim(F.regexp_replace(
            F.regexp_replace(F.col("payload"), "<[^>]*>", " "),
            r"\s+", " "))
    elif extractor == "blocks":
        from ..functions.html import html_extract_expr
        text = html_extract_expr(F.col("payload"))
    else:
        raise ValueError(f"unknown extractor {extractor!r} "
                         "(want 'strip' or 'blocks')")
    return (records
            .filter((F.col("warc_type") == "response")
                    & (F.col("http_status") == 200)
                    & F.col("content_type").startswith("text/"))
            .select(
                F.conv(F.substring(F.md5(F.col("record_id")), 1, 15), 16, 10)
                 .cast("long").alias("doc_id"),
                text.alias("text"),
                F.lit("und").alias("lang"),
                F.parse_url(F.col("target_uri"), F.lit("HOST"))
                 .alias("source"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .filter(F.col("n_chars") >= min_chars))


def make_expected_docs(file_no: int, n_records: int,
                       min_chars: int = 1) -> list[dict]:
    """Independent python twin of ``warc_to_docs`` over the generator's
    records — ONE shared implementation for the pytest comparison and the
    ``warc_docs`` gate oracle (they must never drift from each other; the
    golden-twin discipline only requires independence from the SPARK
    path, which this preserves: no Catalyst expression is involved)."""
    import re
    rows = []
    for r in make_warc_records(file_no, n_records):
        if r["http_status"] != 200 or \
                not r["content_type"].startswith("text/"):
            continue
        text = re.sub(r"\s+", " ",
                      re.sub("<[^>]*>", " ", r["payload"])).strip()
        if len(text) < min_chars:
            continue
        rows.append({
            "doc_id": int(_det(r["record_id"])[:15], 16),
            "text": text,
            "lang": "und",
            "source": "example.test",
            "n_chars": len(text),
        })
    return rows
