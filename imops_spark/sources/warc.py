"""WARC (Web ARChive, ISO 28500) source/sink — the crawl-native container:
CommonCrawl, Heritrix, wget --warc all ship corpora as WARC records, and a
training-data pipeline's first step is WARC -> (url, payload) rows.

Scale design: WARC parallelizes ONE TASK PER FILE, by construction of the
format — records are Content-Length-framed binary with no record-boundary
sync marker a byte-range split could resynchronize on (and production
crawl WARCs are gzip member streams, unsplittable anyway).  That is also
how the ecosystem runs it: a crawl snapshot is tens of thousands of ~1 GB
files, far more files than any cluster has task slots, so per-file tasks
saturate 1000 executors without intra-file splitting.  The reader is a
``binaryFile`` scan + an Arrow ``mapInPandas`` parser: bytes never become
driver data, and each task's memory is bounded by one file (cap WARC file
size at write time, as every crawler does).

Malformed-record policy is explicit, never silent (the JSONL contract):
``on_corrupt='fail'`` raises with file + byte offset; ``'drop'`` resyncs
to the next plausible record head (``\\r\\nWARC/``) and counts nothing —
use only when loss accounting happens elsewhere.

The writer emits spec-shaped records (version line, case-sensitive
canonical header names, Content-Length octet framing, double-CRLF block
terminator) via Spark's text writer — one record per row, so payloads are
STRINGS (UTF-8 web text; the reader side handles arbitrary binary
payloads, which parquet — not a text writer — should carry outbound).
The text writer appends one ``\\n`` per row after the record's own
``\\r\\n\\r\\n``; the reader (and any whitespace-lenient parser) skips
inter-record whitespace, and the Content-Length framing is unaffected.

Streaming: deliberately absent.  Spark's file stream source does not
support ``binaryFile``; the landing-zone recipe is batch WARC -> JSONL/
parquet conversion per arriving file, then ``sources.jsonl.stream_jsonl``
(gated `src_jsonl_stream`) for the streaming leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_warc", "write_warc"]

_OUT_SCHEMA = (
    "warc_file string, record_id string, record_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def _parse_warc_bytes(buf: bytes, fname: str, on_corrupt: str):
    """Yield header-dict + payload tuples from one WARC file's bytes.
    Content-Length framing per the spec; header names are matched
    case-insensitively (the spec makes them case-insensitive); header
    line continuations (obsolete LWS folding) are not supported."""
    i, n = 0, len(buf)
    while True:
        while i < n and buf[i] in (0x0D, 0x0A):
            i += 1
        if i >= n:
            return
        bad = None
        if not buf.startswith(b"WARC/", i):
            bad = f"expected 'WARC/' version at offset {i}"
        else:
            hdr_end = buf.find(b"\r\n\r\n", i)
            if hdr_end < 0:
                bad = f"record at offset {i}: unterminated header block"
            else:
                head = buf[i:hdr_end].decode("utf-8", errors="replace")
                headers: dict[str, str] = {}
                for ln in head.split("\r\n")[1:]:
                    k, _, v = ln.partition(":")
                    headers[k.strip().lower()] = v.strip()
                try:
                    cl = int(headers["content-length"])
                except (KeyError, ValueError):
                    bad = f"record at offset {i}: missing/bad Content-Length"
                else:
                    body = hdr_end + 4
                    if cl < 0 or body + cl > n:
                        bad = (
                            f"record at offset {i}: Content-Length {cl} "
                            "exceeds file"
                        )
        if bad is not None:
            if on_corrupt == "fail":
                raise ValueError(f"malformed WARC in {fname}: {bad}")
            nxt = buf.find(b"\r\nWARC/", i)
            if nxt < 0:
                return
            i = nxt + 2
            continue
        yield headers, buf[body : body + cl]
        i = body + cl


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple | None = ("response",),
    on_corrupt: str = "fail",
) -> DataFrame:
    """Read WARC records: ``(warc_file, record_id, record_type,
    target_uri, warc_date, content_type, content_length, payload)`` with
    ``payload`` as raw bytes (decode downstream — ``decode(payload,
    'UTF-8')`` for web text, the multimodal kernels for media).

    ``record_types`` filters on ``WARC-Type`` (case-insensitive; the
    default keeps only ``response`` — crawl payloads — and drops the
    request/metadata/warcinfo bookkeeping records); ``None`` keeps all.
    The filter runs INSIDE the parser task, so bookkeeping records never
    become Arrow rows at all."""
    if on_corrupt not in ("fail", "drop"):
        raise ValueError(
            f"on_corrupt must be 'fail' or 'drop', got {on_corrupt!r}"
        )
    want = (
        None
        if record_types is None
        else {str(t).lower() for t in record_types}
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "warc_file": [],
                "record_id": [],
                "record_type": [],
                "target_uri": [],
                "warc_date": [],
                "content_type": [],
                "content_length": [],
                "payload": [],
            }
            for fname, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in _parse_warc_bytes(
                    bytes(content), fname, on_corrupt
                ):
                    rtype = headers.get("warc-type", "")
                    if want is not None and rtype.lower() not in want:
                        continue
                    out["warc_file"].append(fname)
                    out["record_id"].append(headers.get("warc-record-id", ""))
                    out["record_type"].append(rtype)
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content_type"].append(headers.get("content-type"))
                    out["content_length"].append(len(payload))
                    out["payload"].append(payload)
            if not out["warc_file"]:
                continue  # empty Arrow batches type columns wrong — skip
            yield pd.DataFrame(out)

    # drop the binaryFile metadata columns BEFORE the parser: `content` is
    # the whole file, and pruning after mapInPandas would still ship it
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(run, schema=_OUT_SCHEMA)


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    record_type: str = "response",
    content_type: str = "text/plain",
    warc_date: str = "2026-01-01T00:00:00Z",
    mode: str = "error",
    files: int | None = None,
) -> None:
    """Write one spec-shaped WARC record per row (see module docstring
    for the text-writer framing contract).  ``payload_col`` must be a
    STRING column; ``Content-Length`` is its exact UTF-8 octet count
    (``octet_length``, not ``length`` — multi-byte text would otherwise
    under-frame).  ``WARC-Record-ID`` is deterministic: a urn:uuid
    formatted from ``md5(uri || payload)``, so re-exports are
    byte-identical (the snapshot-diff property every artifact here
    keeps).  ``files`` coalesces the part count — WARC tasks are
    per-file on re-read, so the part count IS the read parallelism."""
    if files is not None and int(files) < 1:
        raise ValueError(f"files must be >= 1, got {files}")
    uri = F.col(uri_col).cast("string")
    payload = F.col(payload_col).cast("string")
    h = F.md5(F.concat_ws("|", uri, payload))
    rid = F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-"),
        F.substring(h, 13, 4),
        F.lit("-"),
        F.substring(h, 17, 4),
        F.lit("-"),
        F.substring(h, 21, 12),
        F.lit(">"),
    )
    crlf = "\r\n"
    rec = F.concat(
        F.lit("WARC/1.0" + crlf),
        F.lit("WARC-Type: " + str(record_type) + crlf),
        F.lit("WARC-Record-ID: "),
        rid,
        F.lit(crlf),
        F.lit("WARC-Date: " + str(warc_date) + crlf),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit(crlf),
        F.lit("Content-Type: " + str(content_type) + crlf),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(crlf + crlf),
        payload,
        F.lit(crlf + crlf),  # spec record terminator; the text writer
        # appends one more \n, which whitespace-lenient readers skip
    )
    out = df.select(rec.alias("value"))
    if files is not None:
        out = out.coalesce(int(files))
    out.write.mode(mode).text(path)
