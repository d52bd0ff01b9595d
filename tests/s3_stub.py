"""Minimal in-process S3-compatible HTTP server (stdlib only).

Speaks enough of the real S3 REST protocol for pyarrow's bundled AWS C++
client (pyarrow.fs.S3FileSystem with endpoint_override) to list, stat,
read (ranged GETs) and write (multipart upload) objects — the genuine
wire-protocol evidence the SubTreeFileSystem stand-in could not give
(reference: native/core/src/parquet/objectstore/s3.rs speaks the same
protocol through the object_store crate). Auth headers are accepted and
ignored; no TLS (scheme="http").

Supported requests:
  GET    /bucket?list-type=2&prefix=...        ListObjectsV2 (XML)
  HEAD   /bucket/key                           object stat
  GET    /bucket/key          (+ Range)        object read
  PUT    /bucket/key                           single-shot write
  POST   /bucket/key?uploads                   CreateMultipartUpload
  PUT    /bucket/key?partNumber=N&uploadId=U   UploadPart
  POST   /bucket/key?uploadId=U                CompleteMultipartUpload
  DELETE /bucket/key[?uploadId=U]              delete / abort
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape


class _State:
    def __init__(self):
        self.objects = {}  # (bucket, key) -> bytes
        self.uploads = {}  # upload_id -> {(part_no): bytes}
        self.next_upload = [0]
        self.lock = threading.Lock()


def _handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        # -- helpers ---------------------------------------------------------
        def _path(self):
            parsed = urllib.parse.urlparse(self.path)
            parts = parsed.path.lstrip("/").split("/", 1)
            bucket = parts[0]
            key = parts[1] if len(parts) > 1 else ""
            q = urllib.parse.parse_qs(parsed.query, keep_blank_values=True)
            return bucket, key, q

        def _send(self, code, body=b"", headers=None,
                  content_type="application/xml", content_length=None):
            self.send_response(code)
            n = content_length if content_length is not None else len(body)
            self.send_header("Content-Length", str(n))
            self.send_header("Content-Type", content_type)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            if body and self.command != "HEAD":
                self.wfile.write(body)

        def _read_body(self):
            # handle_expect_100 (HTTP/1.1) already sent "100 Continue"
            if "chunked" in (self.headers.get("Transfer-Encoding") or ""):
                raw = self._read_http_chunked()
            else:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b""
            if "aws-chunked" in (self.headers.get("Content-Encoding") or ""):
                raw = self._strip_aws_chunks(raw)
            return raw

        def _read_http_chunked(self):
            out = []
            while True:
                line = self.rfile.readline().strip()
                if b";" in line:
                    line = line.split(b";")[0]
                size = int(line or b"0", 16)
                if size == 0:
                    while True:  # consume trailers
                        t = self.rfile.readline()
                        if t in (b"\r\n", b"\n", b""):
                            break
                    break
                out.append(self.rfile.read(size))
                self.rfile.readline()
            return b"".join(out)

        @staticmethod
        def _strip_aws_chunks(raw: bytes) -> bytes:
            # aws-chunked: "<hex-size>[;chunk-signature=...]\r\n<data>\r\n"*
            # then a 0-chunk + optional trailer lines
            out = []
            pos = 0
            while pos < len(raw):
                nl = raw.find(b"\r\n", pos)
                if nl < 0:
                    break
                head = raw[pos:nl].split(b";")[0]
                try:
                    size = int(head, 16)
                except ValueError:
                    break
                pos = nl + 2
                if size == 0:
                    break
                out.append(raw[pos:pos + size])
                pos += size + 2
            return b"".join(out)

        # -- verbs -----------------------------------------------------------
        def do_HEAD(self):
            bucket, key, _ = self._path()
            if not key:  # HeadBucket
                self._send(200)
                return
            with state.lock:
                data = state.objects.get((bucket, key))
            if data is None:
                self._send(404)
                return
            self._send(200, b"",
                       {"ETag": '"stub"',
                        "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
                        "Accept-Ranges": "bytes"},
                       content_type="application/octet-stream",
                       content_length=len(data))

        def do_GET(self):
            bucket, key, q = self._path()
            if not key or "list-type" in q:
                prefix = q.get("prefix", [""])[0]
                with state.lock:
                    keys = sorted(k for (b, k) in state.objects
                                  if b == bucket and k.startswith(prefix))
                items = "".join(
                    f"<Contents><Key>{escape(k)}</Key>"
                    f"<Size>{len(state.objects[(bucket, k)])}</Size>"
                    f"<LastModified>2026-01-01T00:00:00.000Z</LastModified>"
                    f"<ETag>&quot;stub&quot;</ETag>"
                    f"<StorageClass>STANDARD</StorageClass></Contents>"
                    for k in keys)
                body = (f'<?xml version="1.0" encoding="UTF-8"?>'
                        f'<ListBucketResult>'
                        f'<Name>{escape(bucket)}</Name>'
                        f'<Prefix>{escape(prefix)}</Prefix>'
                        f'<KeyCount>{len(keys)}</KeyCount>'
                        f'<MaxKeys>1000</MaxKeys><IsTruncated>false</IsTruncated>'
                        f'{items}</ListBucketResult>').encode()
                self._send(200, body)
                return
            with state.lock:
                data = state.objects.get((bucket, key))
            if data is None:
                self._send(404, b"<Error><Code>NoSuchKey</Code></Error>")
                return
            rng = self.headers.get("Range")
            headers = {"ETag": '"stub"', "Accept-Ranges": "bytes",
                       "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT"}
            if rng and rng.startswith("bytes="):
                spec = rng[len("bytes="):]
                lo_s, hi_s = spec.split("-", 1)
                lo = int(lo_s) if lo_s else 0
                hi = int(hi_s) if hi_s else len(data) - 1
                hi = min(hi, len(data) - 1)
                part = data[lo:hi + 1]
                headers["Content-Range"] = f"bytes {lo}-{hi}/{len(data)}"
                self._send(206, part, headers,
                           content_type="application/octet-stream")
                return
            self._send(200, data, headers,
                       content_type="application/octet-stream")

        def do_PUT(self):
            bucket, key, q = self._path()
            body = self._read_body()
            if "partNumber" in q:
                part_no = int(q["partNumber"][0])
                upload_id = q["uploadId"][0]
                with state.lock:
                    state.uploads.setdefault(upload_id, {})[part_no] = body
                self._send(200, b"", {"ETag": f'"part{part_no}"'})
                return
            with state.lock:
                state.objects[(bucket, key)] = body
            self._send(200, b"", {"ETag": '"stub"'})

        def do_POST(self):
            bucket, key, q = self._path()
            body = self._read_body()
            if "uploads" in q:  # CreateMultipartUpload
                with state.lock:
                    state.next_upload[0] += 1
                    uid = f"upload-{state.next_upload[0]}"
                    state.uploads[uid] = {}
                xml = (f'<?xml version="1.0" encoding="UTF-8"?>'
                       f"<InitiateMultipartUploadResult>"
                       f"<Bucket>{escape(bucket)}</Bucket>"
                       f"<Key>{escape(key)}</Key>"
                       f"<UploadId>{uid}</UploadId>"
                       f"</InitiateMultipartUploadResult>").encode()
                self._send(200, xml)
                return
            if "uploadId" in q:  # CompleteMultipartUpload
                uid = q["uploadId"][0]
                with state.lock:
                    parts = state.uploads.pop(uid, {})
                    data = b"".join(parts[i] for i in sorted(parts))
                    state.objects[(bucket, key)] = data
                xml = (f'<?xml version="1.0" encoding="UTF-8"?>'
                       f"<CompleteMultipartUploadResult>"
                       f"<Bucket>{escape(bucket)}</Bucket>"
                       f"<Key>{escape(key)}</Key>"
                       f'<ETag>"stub"</ETag>'
                       f"</CompleteMultipartUploadResult>").encode()
                self._send(200, xml)
                return
            self._send(400)

        def do_DELETE(self):
            bucket, key, q = self._path()
            with state.lock:
                if "uploadId" in q:
                    state.uploads.pop(q["uploadId"][0], None)
                else:
                    state.objects.pop((bucket, key), None)
            self._send(204)

    return Handler


class S3Stub:
    """Context manager running the stub on an ephemeral localhost port."""

    def __init__(self):
        self.state = _State()
        self.server = ThreadingHTTPServer(("127.0.0.1", 0),
                                          _handler(self.state))
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()

    @property
    def endpoint(self) -> str:
        return f"127.0.0.1:{self.port}"
