"""WARC (Web ARChive) parsing + a Spark 4 Python Data Source — the
Common Crawl ingest path, stdlib-only.

    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc")
          .option("path", "/crawl/segments")     # dir, file, or glob
          .option("record_type", "response")     # optional filter
          .load())

Schema: ``warc_file string, record_type string, target_uri string,
http_status int, content_type string, n_bytes long, body binary``.

Format notes (ISO 28500, the public WARC 1.0/1.1 spec): a WARC file
is a sequence of records — ``WARC/1.x`` version line, CRLF header
block, CRLF CRLF, ``Content-Length`` bytes of block, CRLF CRLF. In
``.warc.gz`` files each record is its own gzip MEMBER (the spec's
record-at-time compression), so members can be decompressed
independently; ``_gunzip_members`` walks the member chain with
stdlib zlib. ``response`` records carry an HTTP message as the
block: status line + headers + CRLF CRLF + payload, split here so
downstream gets the raw page bytes ready for
``operators/text.py:html_to_text``.

Scale posture: Common Crawl ships ~100 MB–1 GB ``.warc.gz`` segment
files — the natural split. One input partition per file; each task
decompresses and parses only its own segment, payloads never touch
the driver, and a ``record_type`` filter prunes inside the reader.
"""

from __future__ import annotations

import glob as _glob
import os
import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw input is
    returned unchanged when it isn't gzip. A corrupt or truncated
    member ends decompression with the bytes decoded so far — damaged
    crawl segments must not kill the ingest task."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error:
            break
        rest = d.unused_data
    return bytes(out)


def _iter_decompressed(f, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Yield decompressed chunks from a file object holding either a
    (possibly multi-member) gzip stream or raw bytes, reading at most
    ``chunk`` compressed bytes at a time. Corrupt or truncated data
    ends iteration with what decoded so far instead of raising."""
    first = f.read(2)
    if first[:2] != b"\x1f\x8b":
        while first:
            yield first
            first = f.read(chunk)
        return
    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    pending = first
    while True:
        if not pending:
            pending = f.read(chunk)
            if not pending:
                return  # clean EOF, or truncated mid-member
        try:
            out = d.decompress(pending)
        except zlib.error:
            return
        pending = b""
        if out:
            yield out
        if d.eof:
            rest = d.unused_data
            if len(rest) == 1:  # gzip magic split across reads
                rest += f.read(1)
            if not rest:
                nxt = f.read(chunk)
                if not nxt:
                    return
                rest = nxt
                if len(rest) == 1:
                    rest += f.read(1)
            if rest[:2] != b"\x1f\x8b":
                return  # trailing garbage after the member chain
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            pending = rest


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP chunked transfer-encoding (hex size line + CRLF per
    chunk, 0-size terminator); returns the input on malformed data."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return bytes(body)
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        start = nl + 2
        out += body[start : start + size]
        pos = start + size + 2  # skip chunk CRLF
    return bytes(out)


def split_http_response(block: bytes) -> tuple[int | None, str, bytes]:
    """(status, content-type, payload) from an HTTP response message;
    (None, "", block) when the block isn't one. Chunked
    transfer-encoding is undone and gzip content-encoding inflated —
    both appear verbatim in real crawl captures."""
    if not block.startswith(b"HTTP/"):
        return None, "", block
    head, sep, payload = block.partition(b"\r\n\r\n")
    if not sep:
        return None, "", block
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, "", block
    headers = _parse_headers(rest)
    ctype = headers.get("content-type", "")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    if (
        "gzip" in headers.get("content-encoding", "").lower()
        and payload[:2] == b"\x1f\x8b"
    ):
        try:
            payload = _gunzip_members(payload)
        except zlib.error:
            pass  # keep raw bytes rather than dropping the record
    return status, ctype, payload


def _next_record(data, pos: int):
    """Parse the first complete record at/after ``pos`` in ``data``
    (bytes or bytearray). Returns ``(record, next_pos, may_continue)``:
    record is ``None`` when none could be parsed, and ``may_continue``
    distinguishes "incomplete — more input could complete it" (True)
    from "malformed — stop" (False)."""
    n = len(data)
    while pos < n and data[pos : pos + 2] == b"\r\n":
        pos += 2
    if n - pos < 5:
        return None, pos, True
    if data[pos : pos + 5] != b"WARC/":
        return None, pos, False
    head_end = data.find(b"\r\n\r\n", pos)
    if head_end < 0:
        return None, pos, True
    headers = _parse_headers(bytes(data[pos:head_end]))
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None, pos, False
    block_start = head_end + 4
    if block_start + length > n:
        return None, pos, True
    block = bytes(data[block_start : block_start + length])
    rtype = headers.get("warc-type", "")
    uri = headers.get("warc-target-uri", "")
    if rtype == "response":
        status, ctype, body = split_http_response(block)
    else:
        status, ctype, body = None, headers.get("content-type", ""), block
    rec = {
        "record_type": rtype,
        "target_uri": uri,
        "http_status": status,
        "content_type": ctype,
        "body": bytes(body),
    }
    return rec, block_start + length, True


def iter_warc_records(payload: bytes) -> Iterator[dict]:
    """Yield parsed records from a WARC (or .warc.gz) byte string:
    ``{record_type, target_uri, http_status, content_type, body}``.
    Response records have their HTTP envelope split off; other types
    (request, metadata, warcinfo) pass their block through. Malformed
    or truncated trailing data (including corrupt gzip members) ends
    iteration rather than raising."""
    data = _gunzip_members(payload)
    pos = 0
    while True:
        rec, pos, _ = _next_record(data, pos)
        if rec is None:
            return
        yield rec


def iter_warc_stream(f) -> Iterator[dict]:
    """Stream records from an open binary file holding a ``.warc`` or
    ``.warc.gz`` segment WITHOUT materializing the decompressed
    segment: gzip members are inflated one chunk at a time and the
    parse buffer is compacted after every record, so peak memory is
    O(largest single record), not O(segment). This is the reader the
    Spark data source uses — a ~1 GB Common Crawl segment per task
    stays within a bounded buffer."""
    buf = bytearray()
    src = _iter_decompressed(f)
    exhausted = False
    while True:
        rec, pos, may_continue = _next_record(buf, 0)
        if rec is not None:
            del buf[:pos]
            yield rec
            continue
        if not may_continue:
            return
        if exhausted:
            return
        try:
            buf += next(src)
        except StopIteration:
            exhausted = True


def build_warc(records: list[dict], gzipped: bool = False) -> bytes:
    """Fixture/re-shard writer: serialize records (fields as accepted
    by ``iter_warc_records``; ``body`` is the block, or for
    ``response`` records the payload to wrap in a minimal HTTP 200
    envelope when ``http_status`` is set)."""
    import gzip as _gzip

    out = bytearray()
    for r in records:
        body = r["body"]
        if r.get("record_type") == "response" and r.get("http_status"):
            envelope = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            body = envelope + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('record_type', 'resource')}\r\n"
            f"WARC-Target-URI: {r.get('target_uri', '')}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        rec = head + body + b"\r\n\r\n"
        out += _gzip.compress(rec) if gzipped else rec
    return bytes(out)


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _warc_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            _glob.glob(os.path.join(path, "*.warc"))
            + _glob.glob(os.path.join(path, "*.warc.gz"))
        )
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return [path] if path else []


def _read_warc_partition(
    partition: _WarcPartition, record_type: str
) -> Iterator[tuple]:
    fname = os.path.basename(partition.path)
    with open(partition.path, "rb") as f:
        for r in iter_warc_stream(f):
            if record_type and r["record_type"] != record_type:
                continue
            yield (
                fname,
                r["record_type"],
                r["target_uri"],
                r["http_status"],
                r["content_type"],
                len(r["body"]),
                r["body"],
            )


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        self.record_type = options.get("record_type", "")

    def partitions(self) -> list[InputPartition]:
        paths = _warc_paths(self.path)
        if not paths:
            raise FileNotFoundError(f"no WARC files under {self.path!r}")
        return [_WarcPartition(x) for x in paths]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        yield from _read_warc_partition(partition, self.record_type)


class WarcStreamReader(DataSourceStreamReader):
    """Crawl-ingest streaming (r6 verdict #8): watch a directory of
    WARC segments and ingest each newly-arrived file exactly once —
    the Common Crawl drop-folder pattern. Offsets are the sorted set
    of segment paths already planned, so a restart replays from the
    checkpointed offset deterministically.

    Unlike ``CanvasReportStreamReader`` (a driver-side
    SimpleDataSourceStreamReader over KB-sized report CSVs), this is
    the PARTITIONED stream reader: the driver only lists files;
    each new segment becomes an ``InputPartition`` whose gzip-member
    streaming parse (``iter_warc_stream``, O(largest record) memory)
    runs on executors — the shape that holds when a crawl drops
    thousands of multi-GB segments per hour.

    Offset compaction (the 100 TB concern: a crawl accumulates
    millions of segments, and a naive planned-set offset grows — and
    is checkpoint-serialized — without bound): when the tracked set
    exceeds ``max_tracked_files``, the oldest ALREADY-PLANNED names
    collapse into a ``floor`` marker — every path lexicographically
    <= floor counts as ingested. Only names planned in a PRIOR batch
    are ever compacted, the floor is capped below the smallest
    listed-but-not-yet-planned name (an out-of-order arrival visible
    at plan time is planned, never compacted past), and
    ``partitions`` never plans paths <= the start offset's floor, so
    no segment is lost or duplicated
    (including across restarts). The documented tradeoff — a
    late-arriving segment sorting below the floor is skipped — is the
    same one Spark's own FileStreamSource makes with ``maxFileAge``,
    and crawl segment names are timestamped/monotonic in practice."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        self.record_type = options.get("record_type", "")
        self.max_tracked = int(options.get("max_tracked_files", 10_000))
        # names known planned from a previous latestOffset in THIS
        # process; lost on restart, which only delays compaction
        self._planned: set[str] = set()
        # high-water compaction mark for THIS process: listings are
        # pre-filtered to > _floor so compacted names never re-enter
        # consideration (and _planned can be pruned below it without
        # those names later appearing "unplanned"). Lost on restart,
        # which only delays re-compaction — the checkpointed offset's
        # floor still fences `partitions` against replay.
        self._floor = ""

    def initialOffset(self) -> dict:
        return {"floor": "", "files": []}

    def latestOffset(self) -> dict:
        files = sorted(
            p for p in _warc_paths(self.path) if p > self._floor
        )
        floor = self._floor
        if len(files) > self.max_tracked:
            # compact only names already planned in a prior batch,
            # and never past a listed-but-unplanned name: an
            # out-of-order arrival visible in THIS listing must stay
            # above the floor or it would be excluded before it was
            # ever planned (it is not a "late arrival below an
            # existing floor" — it is plannable right now)
            unplanned = [p for p in files if p not in self._planned]
            lo = min(unplanned) if unplanned else None
            eligible = [
                p
                for p in files
                if p in self._planned and (lo is None or p < lo)
            ]
            excess = len(files) - self.max_tracked
            if excess > 0 and eligible:
                floor = eligible[min(excess, len(eligible)) - 1]
                files = [p for p in files if p > floor]
                self._floor = floor
                # names <= floor are excluded by the listing filter
                # above from now on; keeping them would grow the
                # driver-side set without bound in exactly the
                # millions-of-segments scenario compaction bounds
                self._planned = {
                    p for p in self._planned if p > floor
                }
        self._planned.update(files)
        return {"floor": floor, "files": files}

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        start_floor = start.get("floor", "")
        seen = set(start.get("files", []))
        new = sorted(
            p
            for p in end.get("files", [])
            if p > start_floor and p not in seen
        )
        return [_WarcPartition(p) for p in new]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        yield from _read_warc_partition(partition, self.record_type)

    def commit(self, end: dict) -> None:
        pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return (
            "warc_file string, record_type string, target_uri string,"
            " http_status int, content_type string, n_bytes long,"
            " body binary"
        )

    def reader(self, schema) -> DataSourceReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return WarcStreamReader(self.options)


def register_warc(spark) -> None:
    spark.dataSource.register(WarcDataSource)
