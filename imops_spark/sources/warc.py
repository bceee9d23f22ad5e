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

Gzip (the production norm): ``read_warc`` auto-detects the gzip magic at
file start and iterates GZIP MEMBERS with ``zlib.decompressobj`` — the
actual CommonCrawl layout is one gzip member per record (that is what
makes the crawl index's byte-offset seeks work), and a whole-file
single-member ``.warc.gz`` (what any stock gzip of a bare WARC, or this
module's ``compression='gzip'`` writer, produces) is the degenerate
one-member case of the same loop.  Records are parsed from a rolling
carry buffer, so a record split across member boundaries (legal, if
unusual) still parses; peak memory is one decompressed member plus any
carried tail, NOT the whole decompressed file, for the member-per-record
layout.  A corrupt member under ``on_corrupt='drop'`` resyncs to the
next gzip magic (``1f 8b 08``); under ``'fail'`` it raises with file +
compressed byte offset — a gzipped file can never silently yield zero
rows (the failure mode a bare-WARC-only parser has when fed gzip bytes).

Malformed-record policy is explicit, never silent (the JSONL contract):
``on_corrupt='fail'`` raises with file + byte offset; ``'drop'`` resyncs
to the next plausible record head (``\\r\\nWARC/``, or the next gzip
member for compressed input) and counts nothing — use only when loss
accounting happens elsewhere.

The writer emits spec-shaped records (version line, case-sensitive
canonical header names, Content-Length octet framing, double-CRLF block
terminator) via Spark's text writer — one record per row, so payloads are
STRINGS (UTF-8 web text; the reader side handles arbitrary binary
payloads, which parquet — not a text writer — should carry outbound).
The text writer appends one ``\\n`` per row after the record's own
``\\r\\n\\r\\n``; the reader (and any whitespace-lenient parser) skips
inter-record whitespace, and the Content-Length framing is unaffected.

Streaming: :func:`stream_warc` — ``binaryFile`` is a plain file-based
format, so it streams like any other file source (explicit fixed schema
required), and the per-file parse task is stateless, so the batch plan
runs unchanged as a micro-batch plan.  A fetcher drops ``.warc.gz``
files into a landing directory; the stream picks each file up exactly
once (file-source checkpointing) and feeds the row-local operator
family directly — no intermediate JSONL/parquet conversion hop needed.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_warc",
    "stream_warc",
    "write_warc",
    "repack_warc_gz",
    "parse_http_payload",
    "parse_http_df",
]

_GZIP_MAGIC = b"\x1f\x8b\x08"  # gzip + deflate method, the only method defined
_GZ_CHUNK = 1 << 18  # 256 KiB decompress feed; bounds per-member over-read


def _scan_records(buf: bytes, fname: str, on_corrupt: str, at_eof: bool):
    """Parse WARC records from ``buf``; return ``(records, tail)`` where
    ``records`` is a list of (header-dict, payload-bytes) and ``tail`` is
    the offset of the first unconsumed byte.  Content-Length framing per
    the spec; header names are matched case-insensitively (the spec makes
    them case-insensitive); header line continuations (obsolete LWS
    folding) are not supported.  With ``at_eof=False`` a record whose
    header block or body extends past the buffer is NOT corrupt — it is
    left in the tail for the caller to extend (gzip members can split a
    record); with ``at_eof=True`` it is malformed per ``on_corrupt``."""
    recs: list = []
    i, n = 0, len(buf)
    while True:
        while i < n and buf[i] in (0x0D, 0x0A):
            i += 1
        if i >= n:
            return recs, n
        bad = None
        if not buf.startswith(b"WARC/", i):
            bad = f"expected 'WARC/' version at offset {i}"
        else:
            hdr_end = buf.find(b"\r\n\r\n", i)
            if hdr_end < 0:
                if not at_eof:
                    return recs, i
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
                    if cl < 0:
                        bad = f"record at offset {i}: negative Content-Length"
                    elif body + cl > n:
                        if not at_eof:
                            return recs, i
                        bad = (
                            f"record at offset {i}: Content-Length {cl} "
                            "exceeds file"
                        )
        if bad is not None:
            if on_corrupt == "fail":
                raise ValueError(f"malformed WARC in {fname}: {bad}")
            nxt = buf.find(b"\r\nWARC/", i)
            if nxt < 0:
                if not at_eof:
                    # keep a bounded suffix (one marker-length minus one)
                    # in the tail: a valid record head split across the
                    # NEXT member boundary after a corrupt region would
                    # otherwise be discarded with the corrupt bytes
                    return recs, max(i, n - (len(b"\r\nWARC/") - 1))
                return recs, n
            i = nxt + 2
            continue
        recs.append((headers, buf[body : body + cl]))
        i = body + cl


def _iter_gzip_members(buf: bytes, fname: str, on_corrupt: str):
    """Yield ``(compressed_offset, decompressed_bytes)`` per gzip member
    of a member stream (RFC 1952 members are simply concatenated).  Each
    member is decompressed with its own ``zlib.decompressobj(wbits=31)``
    fed in 256 KiB slices of a memoryview, so the bytes copied past a
    member's end (``unused_data``) are bounded per member — the loop is
    O(file) even for CommonCrawl's ~100k-members-per-file layout.  A
    member that fails to decompress (bad CRC, truncation, garbage)
    raises under ``on_corrupt='fail'`` with the compressed offset and
    resyncs to the next gzip magic under ``'drop'``."""
    import zlib

    mv = memoryview(buf)
    i, n = 0, len(buf)
    while i < n:
        start = i
        d = zlib.decompressobj(wbits=31)
        parts = []
        pos = i
        try:
            while not d.eof:
                if pos >= n:
                    raise zlib.error("truncated gzip member")
                end = min(pos + _GZ_CHUNK, n)
                parts.append(d.decompress(mv[pos:end]))
                pos = end
        except zlib.error as e:
            if on_corrupt == "fail":
                raise ValueError(
                    f"corrupt gzip member in {fname} at "
                    f"compressed offset {start}: {e}"
                ) from None
            nxt = buf.find(_GZIP_MAGIC, start + 1)
            if nxt < 0:
                return
            i = nxt
            continue
        pos -= len(d.unused_data)
        yield start, b"".join(parts)
        i = pos


def _parse_warc_gz(buf: bytes, fname: str, on_corrupt: str):
    """Yield records from a gzip member stream.  Records normally align
    with members (CommonCrawl: one record per member) but need not — the
    unconsumed tail of each member carries into the next, so a record
    split across members parses, and a whole-file single-member gzip is
    just the one-member case.  Worst-case carry (garbage that keeps
    looking like an incomplete record under 'drop') is bounded by the
    decompressed file size, same as the bare-file parser's buffer."""
    carry = b""
    for off, member in _iter_gzip_members(buf, fname, on_corrupt):
        data = carry + member if carry else member
        recs, tail = _scan_records(
            data, f"{fname} (gzip member at {off})", on_corrupt, at_eof=False
        )
        yield from recs
        carry = data[tail:]
    if carry:
        recs, _ = _scan_records(
            carry, f"{fname} (final gzip member)", on_corrupt, at_eof=True
        )
        yield from recs


def _parse_warc_bytes(buf: bytes, fname: str, on_corrupt: str):
    """Yield header-dict + payload tuples from one WARC file's bytes,
    auto-detecting gzip (member stream or single-member) vs bare WARC
    by the file magic."""
    if buf[:2] == _GZIP_MAGIC[:2]:
        yield from _parse_warc_gz(buf, fname, on_corrupt)
    else:
        recs, _ = _scan_records(buf, fname, on_corrupt, at_eof=True)
        yield from recs


# --------------------------------------------------------------------------
# HTTP payload extraction.  A real crawl `response` record's payload is an
# HTTP/1.x message — status line, headers, CRLF CRLF, body — with the body
# possibly Content-Encoding-compressed and/or chunked-transfer-encoded, in
# a charset that is frequently NOT UTF-8.  Nothing upstream of the text
# pipeline may assume bytes are prose: these kernels split the framing,
# reverse the codings, detect the charset, and decode — all row-local,
# inside the same per-file Arrow task that parsed the WARC framing, so the
# raw bytes never cross an exchange.  No counterpart in /root/reference
# (it has no network/ingest code); framing per RFC 7230, charset prescan
# per the HTML5 meta-prescan convention (first 1024 bytes).
# --------------------------------------------------------------------------

_META_PRESCAN = 1024  # HTML5 charset prescan window


def _split_http_head(buf: bytes):
    """Split an HTTP message into (status, header-pairs, body, error).
    Headers decode as latin-1 (lossless byte map — header VALUES may
    carry any bytes; RFC 7230 says treat them as opaque octets).  Names
    are lowercased; obsolete line folding (leading SP/HTAB) joins onto
    the previous value.  Tolerates bare-LF framing (seen in old crawls)."""
    if not buf.startswith(b"HTTP/"):
        return None, [], buf, "not-http"
    sep, seplen = buf.find(b"\r\n\r\n"), 4
    lf = buf.find(b"\n\n")
    if sep < 0 or (0 <= lf < sep):
        if lf >= 0:
            sep, seplen = lf, 2
        elif sep < 0:
            return None, [], b"", "unterminated-http-headers"
    head = buf[:sep].decode("latin-1")
    lines = head.split("\r\n") if "\r\n" in head else head.split("\n")
    parts = lines[0].split(None, 2)
    status, err = None, None
    if len(parts) >= 2:
        try:
            status = int(parts[1])
        except ValueError:
            err = "bad-status-line"
    else:
        err = "bad-status-line"
    headers: list = []
    for ln in lines[1:]:
        if ln[:1] in (" ", "\t") and headers:  # obs-fold continuation
            headers[-1] = (headers[-1][0], headers[-1][1] + " " + ln.strip())
            continue
        k, _, v = ln.partition(":")
        headers.append((k.strip().lower(), v.strip()))
    return status, headers, buf[sep + seplen :], err


def _dechunk(body: bytes):
    """Reverse chunked transfer coding: hex-size lines frame each chunk;
    a 0-size chunk terminates (trailers ignored).  Truncated input keeps
    the bytes already assembled and reports the error — crawl payloads
    are routinely cut mid-body (WARC-Truncated) and partial text is
    worth more than none."""
    out: list = []
    i, n = 0, len(body)
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            return b"".join(out), "truncated-chunked"
        tok = body[i:j].split(b";")[0].strip()
        try:
            size = int(tok, 16)
        except ValueError:
            return b"".join(out), "bad-chunk-size"
        i = j + 2
        if size == 0:
            return b"".join(out), None
        if i + size > n:
            out.append(body[i:])
            return b"".join(out), "truncated-chunked"
        out.append(body[i : i + size])
        i += size + 2  # skip the chunk's own CRLF


def _decode_coding(body: bytes, coding: str):
    """Reverse one content coding.  gzip/x-gzip/deflate via zlib —
    deflate tries zlib-wrapped first, then raw (the historic IE bug
    means both occur in the wild).  Truncated streams yield the bytes
    decoded so far plus an error tag.  Unknown codings (br, zstd — no
    codecs in this container) return ``(None, tag)``: mojibake from
    decoding compressed bytes as text is worse than a NULL."""
    import zlib

    if coding in ("identity", ""):
        return body, None
    if coding in ("gzip", "x-gzip", "deflate"):
        wbits = 31 if coding != "deflate" else 15
        for wb in ((wbits,) if coding != "deflate" else (15, -15)):
            d = zlib.decompressobj(wbits=wb)
            try:
                out = d.decompress(body) + d.flush()
            except zlib.error:
                continue
            if not d.eof:
                return out, f"truncated-{coding}"
            return out, None
        return None, f"undecodable-{coding}"
    return None, f"unknown-content-encoding:{coding}"


_CHARSET_RE = None  # compiled lazily per worker


def _detect_charset(body: bytes, declared: str | None, default: str):
    """Charset resolution: BOM > Content-Type param > HTML meta prescan
    (first 1024 bytes) > ``default``.  Returns ``(codec-canonical-name,
    error-or-None)``; an unknown declared name falls through to the next
    source with a tag, never raises — decode policy downstream is always
    errors='replace' (crawl bytes are dirty by construction)."""
    import codecs
    import re

    global _CHARSET_RE
    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", None
    if body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        return "utf-16", None
    err = None
    if declared:
        try:
            return codecs.lookup(declared).name, None
        except LookupError:
            err = f"unknown-charset:{declared}"
    if _CHARSET_RE is None:
        _CHARSET_RE = re.compile(
            rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?([A-Za-z0-9_#-]{1,40})",
            re.IGNORECASE,
        )
    m = _CHARSET_RE.search(body[:_META_PRESCAN])
    if m:
        try:
            return codecs.lookup(m.group(1).decode("latin-1")).name, err
        except LookupError:
            tag = f"unknown-charset:{m.group(1).decode('latin-1')}"
            err = f"{err};{tag}" if err else tag
    return codecs.lookup(default).name, err


def _charset_param(content_type: str | None):
    """Pull ``charset=`` out of a Content-Type value; quotes stripped."""
    if not content_type:
        return None, None
    media, _, rest = content_type.partition(";")
    for p in rest.split(";"):
        k, _, v = p.partition("=")
        if k.strip().lower() == "charset":
            return media.strip().lower(), v.strip().strip("\"'") or None
    return media.strip().lower(), None


def parse_http_payload(
    buf: bytes, default_charset: str = "utf-8", is_http: bool = True
):
    """Parse one HTTP response payload into a plain dict: ``status``
    (int|None), ``headers`` (dict, names lowercased, duplicates
    comma-joined per RFC 7230 §3.2.2), ``content_type`` (media type,
    lowercased, params stripped), ``charset`` (codec canonical name
    actually used), ``text`` (decoded body; None when the bytes are
    undecodable, e.g. an unknown content coding), ``error``
    (semicolon-joined tags, None when clean).

    Coding order is the receiver's: de-chunk (transfer coding) first,
    then reverse content codings right-to-left.  With ``is_http=False``
    the buffer is treated as a bare body (WET-style records): framing
    fields are None and the bytes go straight to charset detection.
    Pure Python, deterministic, no IO — safe inside any Arrow task."""
    errors: list = []
    if is_http and buf.startswith(b"HTTP/"):
        status, pairs, body, err = _split_http_head(buf)
        if err:
            errors.append(err)
        hdrs: dict = {}
        for k, v in pairs:
            hdrs[k] = f"{hdrs[k]}, {v}" if k in hdrs else v
        te = [
            t.strip().lower()
            for t in hdrs.get("transfer-encoding", "").split(",")
            if t.strip()
        ]
        if "chunked" in te:
            body, err = _dechunk(body)
            if err:
                errors.append(err)
            te = [t for t in te if t != "chunked"]
        codings = te + [
            c.strip().lower()
            for c in hdrs.get("content-encoding", "").split(",")
            if c.strip()
        ]
        for coding in reversed(codings):
            body, err = _decode_coding(body, coding)
            if err:
                errors.append(err)
            if body is None:
                break
        media, declared = _charset_param(hdrs.get("content-type"))
    else:
        status, hdrs, body = None, None, buf
        media, declared = None, None
        if is_http:
            errors.append("not-http")
    if body is None:
        charset, text = None, None
    else:
        charset, err = _detect_charset(body, declared, default_charset)
        if err:
            errors.append(err)
        text = body.decode(charset, errors="replace")
    return {
        "status": status,
        "headers": hdrs,
        "content_type": media,
        "charset": charset,
        "text": text,
        "error": ";".join(errors) if errors else None,
    }


def parse_http_df(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: str | None = "content_type",
    default_charset: str = "utf-8",
    out_col: str = "http",
) -> DataFrame:
    """HTTP extraction over a payload column already in a DataFrame
    (e.g. WARC records landed in parquet): adds ``out_col`` as a struct
    ``(status int, headers map<string,string>, content_type string,
    charset string, text string, error string)``.  A row parses as HTTP
    iff its WARC ``content_type_col`` says ``application/http`` OR the
    bytes start with ``HTTP/``; anything else (WET text, warcinfo) goes
    straight to charset detection as a bare body.  Row-local Arrow
    pandas_udf — zero shuffle, composes into any plan."""
    from pyspark.sql.functions import pandas_udf

    schema = (
        "status int, headers map<string,string>, content_type string, "
        "charset string, text string, error string"
    )

    @pandas_udf(schema)
    def run(payload: pd.Series, wct: pd.Series) -> pd.DataFrame:
        rows = []
        for buf, ct in zip(payload, wct):
            if buf is None:
                rows.append(
                    {
                        "status": None,
                        "headers": None,
                        "content_type": None,
                        "charset": None,
                        "text": None,
                        "error": None,
                    }
                )
                continue
            b = bytes(buf)
            is_http = bool(
                (ct or "").lower().startswith("application/http")
                or b.startswith(b"HTTP/")
            )
            rows.append(parse_http_payload(b, default_charset, is_http))
        return pd.DataFrame(rows)

    wct = (
        F.col(content_type_col)
        if content_type_col is not None
        else F.lit(None).cast("string")
    )
    return df.withColumn(out_col, run(F.col(payload_col), wct))


def _warc_records_df(
    files: DataFrame,
    record_types: tuple | None,
    on_corrupt: str,
    http: bool,
    keep_payload: bool | None,
) -> DataFrame:
    """The shared parser plan behind :func:`read_warc` and
    :func:`stream_warc`: ``files`` is a ``(path string, content binary)``
    relation — batch or streaming — and every record of every file
    materializes inside the per-file ``mapInPandas`` task.  The task is
    stateless (each file parses independently, no cross-batch state), so
    the identical plan is legal on a file-source stream."""
    if on_corrupt not in ("fail", "drop"):
        raise ValueError(
            f"on_corrupt must be 'fail' or 'drop', got {on_corrupt!r}"
        )
    want = (
        None
        if record_types is None
        else {str(t).lower() for t in record_types}
    )
    if keep_payload is None:
        keep_payload = not http
    cols = [
        "warc_file",
        "record_id",
        "record_type",
        "target_uri",
        "warc_date",
        "content_type",
        "content_length",
    ]
    schema = "warc_file string, record_id string, record_type string, " \
        "target_uri string, warc_date string, content_type string, " \
        "content_length long"
    if keep_payload:
        cols.append("payload")
        schema += ", payload binary"
    if http:
        cols += [
            "http_status",
            "http_headers",
            "http_content_type",
            "charset",
            "text",
            "http_error",
        ]
        schema += (
            ", http_status int, http_headers map<string,string>, "
            "http_content_type string, charset string, text string, "
            "http_error string"
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for fname, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in _parse_warc_bytes(
                    bytes(content), fname, on_corrupt
                ):
                    rtype = headers.get("warc-type", "")
                    if want is not None and rtype.lower() not in want:
                        continue
                    wct = headers.get("content-type")
                    out["warc_file"].append(fname)
                    out["record_id"].append(headers.get("warc-record-id", ""))
                    out["record_type"].append(rtype)
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content_type"].append(wct)
                    out["content_length"].append(len(payload))
                    if keep_payload:
                        out["payload"].append(payload)
                    if http:
                        is_http = bool(
                            (wct or "").lower().startswith("application/http")
                            or payload.startswith(b"HTTP/")
                        )
                        h = parse_http_payload(payload, is_http=is_http)
                        out["http_status"].append(h["status"])
                        out["http_headers"].append(h["headers"])
                        out["http_content_type"].append(h["content_type"])
                        out["charset"].append(h["charset"])
                        out["text"].append(h["text"])
                        out["http_error"].append(h["error"])
            if not out["warc_file"]:
                continue  # empty Arrow batches type columns wrong — skip
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=schema)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple | None = ("response",),
    on_corrupt: str = "fail",
    http: bool = False,
    keep_payload: bool | None = None,
) -> DataFrame:
    """Read WARC records: ``(warc_file, record_id, record_type,
    target_uri, warc_date, content_type, content_length, payload)`` with
    ``payload`` as raw bytes (decode downstream — ``decode(payload,
    'UTF-8')`` for web text, the multimodal kernels for media).  Bare
    WARC and ``.warc.gz`` (member-per-record CommonCrawl layout OR
    whole-file gzip) are auto-detected per file by magic — a directory
    may mix both.

    ``record_types`` filters on ``WARC-Type`` (case-insensitive; the
    default keeps only ``response`` — crawl payloads — and drops the
    request/metadata/warcinfo bookkeeping records); ``None`` keeps all.
    The filter runs INSIDE the parser task, so bookkeeping records never
    become Arrow rows at all.

    ``http=True`` additionally splits each payload's HTTP framing INSIDE
    the same task (see :func:`parse_http_payload`): columns
    ``http_status``, ``http_headers`` (map, names lowercased),
    ``http_content_type``, ``charset``, ``text`` (body de-chunked,
    de-compressed, charset-decoded) and ``http_error`` are appended.
    Payloads whose WARC Content-Type is not ``application/http`` and do
    not start with ``HTTP/`` (WET-style text records) skip the framing
    split and go straight to charset detection.  ``keep_payload``
    controls whether the raw bytes column survives — default False when
    ``http=True`` (text is what downstream wants; shipping bytes AND
    text would double the Arrow traffic), True otherwise."""
    # drop the binaryFile metadata columns BEFORE the parser: `content` is
    # the whole file, and pruning after mapInPandas would still ship it
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _warc_records_df(files, record_types, on_corrupt, http, keep_payload)


# binaryFile's schema is FIXED by the format; file-source streams require
# it stated explicitly (there is no batch-side inference pass at stream
# planning time)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple | None = ("response",),
    on_corrupt: str = "fail",
    http: bool = False,
    keep_payload: bool | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_warc` — the crawl
    landing-zone shape: a fetcher drops ``.warc.gz`` files into ``path``
    and the stream picks each file up exactly once (file-source
    checkpointing), parsing records — and, with ``http=True``, HTTP
    framing / content codings / charsets — inside the same stateless
    per-file Arrow task as the batch reader, so every row-local
    downstream operator (strip_html, quality scores, fingerprints,
    hashed embeddings) composes unchanged on the stream.

    ``binaryFile`` is a plain file-based format, so it streams like any
    other file source; its schema is fixed and must be stated explicitly
    (``_BINARYFILE_SCHEMA``).  ``max_files_per_trigger`` bounds
    micro-batch size the way ``stream_jsonl`` does — and since WARC
    parse tasks are per-file, it is also the micro-batch's maximum
    parallelism: size it to at least the executor core count once the
    backlog allows.  Same ``record_types`` / ``on_corrupt`` /
    ``keep_payload`` contract as the batch reader."""
    r = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        if int(max_files_per_trigger) < 1:
            # a silently-dropped 0 would ingest the whole backlog in one
            # micro-batch — the exact failure this knob exists to prevent
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
            )
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = r.load(path).select("path", "content")
    return _warc_records_df(files, record_types, on_corrupt, http, keep_payload)


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
    compression: str | None = None,
) -> None:
    """Write one spec-shaped WARC record per row (see module docstring
    for the text-writer framing contract).  ``payload_col`` must be a
    STRING column; ``Content-Length`` is its exact UTF-8 octet count
    (``octet_length``, not ``length`` — multi-byte text would otherwise
    under-frame).  ``WARC-Record-ID`` is deterministic: a urn:uuid
    formatted from ``md5(uri || payload)``, so re-exports are
    byte-identical (the snapshot-diff property every artifact here
    keeps).  ``files`` coalesces the part count — WARC tasks are
    per-file on re-read, so the part count IS the read parallelism.
    ``compression='gzip'`` emits each part file as a SINGLE-member
    ``.warc.gz`` via Spark's text codec (valid, and what stock ``gzip``
    of a bare WARC produces); for the CommonCrawl member-per-record
    layout — needed when downstream wants byte-offset record seeks —
    repack with :func:`repack_warc_gz`.  ``read_warc`` handles both."""
    if files is not None and int(files) < 1:
        raise ValueError(f"files must be >= 1, got {files}")
    if compression not in (None, "gzip"):
        raise ValueError(
            f"compression must be None or 'gzip', got {compression!r}"
        )
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
    writer = out.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.text(path)


def repack_warc_gz(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    on_corrupt: str = "fail",
    level: int = 6,
) -> list:
    """Repack WARC files (bare or gzipped) into the CommonCrawl layout:
    one ``.warc.gz`` per input file, ONE GZIP MEMBER PER RECORD — the
    layout whose member boundaries make the crawl index's byte-offset
    seeks (and this reader's corrupt-member resync) possible.

    Runs as one task per input file: a ``binaryFile`` scan feeds the
    same record parser ``read_warc`` uses, each record is re-emitted as
    its own gzip member (payload and framing byte-exact; header names
    re-serialized in canonical case in parse order — byte-identical for
    anything this module wrote), and the task writes
    ``dst_path/<name>.gz`` with plain file IO.  Input basenames must be
    unique across ``src_path`` (they are for any Spark-written
    directory).  ``dst_path`` must therefore be TASK-VISIBLE
    shared storage (local mode, NFS/FUSE mounts, s3fs); on HDFS/S3-API
    deployments run the same kernel inside ``foreachBatch`` with the
    object-store client.  Returns the collected manifest
    ``[(file, n_records, bytes_out), ...]`` — one row per input file,
    manifest-sized, never record data."""
    import os

    os.makedirs(dst_path, exist_ok=True)

    def run(batches):
        import gzip as _gzip
        import pandas as pd

        os.makedirs(dst_path, exist_ok=True)
        for pdf in batches:
            out = {"file": [], "n_records": [], "bytes_out": []}
            for fname, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(fname.split("://")[-1])
                if base.endswith(".gz"):
                    base = base[:-3]
                dst = os.path.join(dst_path, base + ".gz")
                n_rec = 0
                tmp = dst + ".inprogress"
                with open(tmp, "wb") as fh:
                    for headers, payload in _parse_warc_bytes(
                        bytes(content), fname, on_corrupt
                    ):
                        head_lines = ["WARC/1.0"]
                        for k, v in headers.items():
                            # canonical-case the names we know; pass
                            # through the rest title-cased per spec style
                            head_lines.append(
                                "-".join(
                                    p.upper() if p in ("warc", "id", "uri")
                                    else p.capitalize()
                                    for p in k.split("-")
                                )
                                + ": "
                                + v
                            )
                        rec = (
                            "\r\n".join(head_lines).encode("utf-8")
                            + b"\r\n\r\n"
                            + payload
                            + b"\r\n\r\n"
                        )
                        fh.write(_gzip.compress(rec, compresslevel=level))
                        n_rec += 1
                os.replace(tmp, dst)
                out["file"].append(dst)
                out["n_records"].append(n_rec)
                out["bytes_out"].append(os.path.getsize(dst))
            if out["file"]:
                yield pd.DataFrame(out)

    files = (
        spark.read.format("binaryFile").load(src_path).select("path", "content")
    )
    manifest = files.mapInPandas(
        run, schema="file string, n_records long, bytes_out long"
    )
    return [tuple(r) for r in manifest.collect()]
