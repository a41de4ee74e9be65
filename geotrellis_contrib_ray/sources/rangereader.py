"""RangeReader abstraction: byte-range access behind a URI scheme.

The reference's sources read file/S3/HTTP URIs lazily through a RangeReader
(GeoTiffRasterSource.scala:37-41 — the streaming reader; its integration
bench reads COGs over HTTP/S3 range GETs).  This sandbox has no network, so
the remote tier is an IN-MEMORY http stub with the same contract: explicit
ranged reads, observable request log — the plumbing (scheme resolution,
block-aligned fetch, LRU of fetched blocks, lazy header parse) is real and
byte-equal to the local-file path.

Schemes:
  file:///abs/path        -> FileRangeReader (seek+read, no mmap dependency)
  http(s)://host/path     -> HTTPRangeReader: REAL ranged GETs (Range:
                             bytes=a-b, 206/Content-Range framing, bounded
                             retries).  LoopbackRangeServer below serves
                             payloads over an actual 127.0.0.1 socket so the
                             wire path is exercised end-to-end in-sandbox;
                             in deployment the same reader speaks to any
                             HTTP object store.
  mem+http://host/path    -> MemoryHTTPRangeReader over a registered payload
                             (serve_mem_http) — each read_range is one
                             simulated ranged GET, recorded in .requests
"""

from __future__ import annotations

import time
from collections import OrderedDict
from urllib.parse import urlparse


class RangeReader:
    """Contract: total_length() and read_range(offset, length) -> bytes
    (short read allowed only at EOF)."""

    def total_length(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def read_range(self, offset: int, length: int) -> bytes:  # pragma: no cover
        raise NotImplementedError

    def close(self) -> None:  # default: nothing to release
        pass


class FileRangeReader(RangeReader):
    def __init__(self, path: str):
        import os

        self.path = path
        self._size = os.stat(path).st_size
        self._fh = open(path, "rb")

    def total_length(self) -> int:
        return self._size

    def read_range(self, offset: int, length: int) -> bytes:
        if self._fh is None:
            raise ValueError(f"FileRangeReader({self.path}) is closed")
        self._fh.seek(offset)
        return self._fh.read(length)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __del__(self):  # fd hygiene: long-lived workers open many sources
        try:
            self.close()
        except Exception:
            pass


# uri -> payload bytes, registered by tests/fixtures (the network stand-in).
# PER-PROCESS: a real ranged-HTTP server is cluster-visible, this stub is
# not — a mem+http source read from a Ray worker task must have the payload
# registered IN THAT WORKER (e.g. re-register inside the map fn, or ship
# the bytes via ray.put and register on first touch).  The resolver error
# below spells this out.
_MEM_HTTP_STORE: dict[str, bytes] = {}


def serve_mem_http(uri: str, payload: bytes) -> None:
    """Register a payload under a mem+http:// URI (fixture 'server');
    registration is per-process — see _MEM_HTTP_STORE."""
    _MEM_HTTP_STORE[uri] = bytes(payload)


class MemoryHTTPRangeReader(RangeReader):
    """HTTP range-GET stub over a registered in-memory payload.  Each
    read_range appends (offset, length) to ``requests`` — tests assert a
    windowed read touches a small fraction of the payload, the same
    property a real COG-over-HTTP reader is built for."""

    def __init__(self, uri: str):
        if uri not in _MEM_HTTP_STORE:
            raise FileNotFoundError(
                f"no mem+http payload registered for {uri} IN THIS PROCESS — "
                "the stub store is per-process (serve_mem_http on the driver "
                "is invisible to Ray workers; register inside the worker or "
                "ship the bytes via ray.put)")
        self.uri = uri
        self._data = _MEM_HTTP_STORE[uri]
        self.requests: list[tuple[int, int]] = []

    def total_length(self) -> int:
        return len(self._data)

    def read_range(self, offset: int, length: int) -> bytes:
        self.requests.append((offset, length))
        return self._data[offset : offset + length]


class HTTPRangeReader(RangeReader):
    """Ranged HTTP reader over real sockets: one ``Range: bytes=a-b`` GET per
    read_range, expecting 206 + Content-Range (a 200 full-body reply is
    tolerated and sliced — some stores ignore Range on tiny objects).
    Transient socket/5xx failures retry with exponential backoff.  The total
    length comes from a HEAD request at open.  Request tuples are recorded in
    ``requests`` (the observable the COG access-pattern tests assert on)."""

    def __init__(self, uri: str, retries: int = 3, backoff_s: float = 0.05):
        self.uri = uri
        self.retries = retries
        self.backoff_s = backoff_s
        self.requests: list[tuple[int, int]] = []
        self._len = int(self._do("HEAD").headers["Content-Length"])

    def _do(self, method: str, rng: tuple[int, int] | None = None):
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(self.retries):
            req = urllib.request.Request(self.uri, method=method)
            if rng is not None:
                req.add_header("Range", f"bytes={rng[0]}-{rng[1]}")
            try:
                return urllib.request.urlopen(req, timeout=10)
            except urllib.error.HTTPError as e:
                if e.code < 500:  # 4xx is permanent
                    raise
                last = e
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                last = e
            time.sleep(self.backoff_s * (2 ** attempt))
        raise ConnectionError(f"ranged GET {self.uri} failed after "
                              f"{self.retries} attempts: {last}")

    def total_length(self) -> int:
        return self._len

    def read_range(self, offset: int, length: int) -> bytes:
        if length <= 0 or offset >= self._len:
            return b""
        end = min(offset + length, self._len) - 1
        self.requests.append((offset, length))
        resp = self._do("GET", (offset, end))
        body = resp.read()
        if resp.status == 206:
            return body
        return body[offset : end + 1]  # store ignored Range: slice the 200


class LoopbackRangeServer:
    """A REAL ranged-HTTP server on 127.0.0.1 (stdlib http.server in a daemon
    thread) for registered payloads.  The sandbox has no external network,
    but loopback sockets are real sockets: serving through this exercises the
    HTTPRangeReader's actual wire framing (Range request headers, 206 +
    Content-Range parsing, HEAD length probe) byte-for-byte as deployment
    would.  ``served`` records every (path, offset, length) range hit."""

    def __init__(self):
        import http.server
        import threading

        payloads: dict[str, bytes] = {}
        served: list[tuple[str, int, int]] = []
        self.payloads = payloads
        self.served = served

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _payload(self):
                return payloads.get(self.path)

            def do_HEAD(self):
                data = self._payload()
                if data is None:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.send_header("Accept-Ranges", "bytes")
                self.end_headers()

            def do_GET(self):
                data = self._payload()
                if data is None:
                    self.send_error(404)
                    return
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    a, b = rng[len("bytes="):].split("-")
                    start = int(a)
                    end = min(int(b) if b else len(data) - 1, len(data) - 1)
                    body = data[start : end + 1]
                    served.append((self.path, start, len(body)))
                    self.send_response(206)
                    self.send_header("Content-Range",
                                     f"bytes {start}-{end}/{len(data)}")
                else:
                    body = data
                    served.append((self.path, 0, len(body)))
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve(self, name: str, payload: bytes) -> str:
        """Register ``payload`` under /name; returns its full URI."""
        path = "/" + name.lstrip("/")
        self.payloads[path] = bytes(payload)
        return f"http://127.0.0.1:{self.port}{path}"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def open_range_reader(uri: str) -> RangeReader:
    scheme = urlparse(uri).scheme
    if scheme == "file":
        return FileRangeReader(urlparse(uri).path)
    if scheme in ("http", "https"):
        return HTTPRangeReader(uri)
    if scheme == "mem+http":
        return MemoryHTTPRangeReader(uri)
    raise KeyError(f"no RangeReader for scheme {scheme!r}")


class LazyRangeBytes:
    """A lazily-fetched bytes view over a RangeReader: slicing fetches only
    the touched BLOCK_SIZE-aligned blocks (LRU-cached), so header parsing
    and windowed tile decodes never pull the whole object — the RangeReader
    analogue of the local mmap path."""

    def __init__(self, reader: RangeReader, block_size: int = 1 << 16,
                 cache_blocks: int = 64):
        self._r = reader
        self._bs = block_size
        self._cache: OrderedDict[int, bytes] = OrderedDict()
        self._cap = cache_blocks
        self._len = reader.total_length()

    def __len__(self) -> int:
        return self._len

    def _block(self, bi: int) -> bytes:
        blk = self._cache.get(bi)
        if blk is None:
            blk = self._r.read_range(bi * self._bs, self._bs)
            self._cache[bi] = blk
            if len(self._cache) > self._cap:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(bi)
        return blk

    def __getitem__(self, key):
        if isinstance(key, int):
            if key < 0:
                key += self._len
            blk = self._block(key // self._bs)
            return blk[key % self._bs]
        start, stop, step = key.indices(self._len)
        if step != 1:
            raise ValueError("LazyRangeBytes supports contiguous slices only")
        if start >= stop:
            return b""
        b0, b1 = start // self._bs, (stop - 1) // self._bs
        parts = [self._block(bi) for bi in range(b0, b1 + 1)]
        raw = parts[0] if len(parts) == 1 else b"".join(parts)
        off = start - b0 * self._bs
        return raw[off : off + (stop - start)]
