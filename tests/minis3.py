"""Minimal in-process S3 REST endpoint for VFS integration tests.

Implements just enough of the S3 HTTP API for pyarrow's real
S3FileSystem (the bundled AWS C++ SDK) to operate against it over
localhost: HeadBucket/HeadObject, GetObject (incl. ranged reads —
the 206 path the reference's S3 seek quirk is about,
FitsLib.scala:319-323), ListObjectsV2 (prefix + delimiter),
PutObject, CreateBucket, the full multipart-upload trio
(initiate / UploadPart / complete / abort), DeleteObject and
multi-object POST ?delete. Auth headers are accepted and ignored
(the SDK signs; a test endpoint has no reason to verify).

This is NOT a mock of our own code: the client side is pyarrow's
production S3 stack, so a test driving `vfs.resolve_fs("s3://...")`
against this server exercises the exact wire behavior (multipart
writes, Range'd positional reads, paginated listings) a real
object store sees. State is per-server-instance; every request is
logged as (method, path, range_header) for protocol-level asserts.
"""

from __future__ import annotations

import http.server
import re
import threading
import time
import urllib.parse
from email.utils import formatdate


class MiniS3Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # SDK expects keep-alive + 100-continue

    def log_message(self, fmt, *args):  # silence default stderr noise
        pass

    # -- plumbing ----------------------------------------------------
    @property
    def _srv(self):
        return self.server  # MiniS3Server carries the state

    def _record(self):
        with self._srv.lock:
            self._srv.requests.append(
                (self.command, self.path, self.headers.get("Range")))

    def _split(self):
        u = urllib.parse.urlparse(self.path)
        parts = u.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        q = urllib.parse.parse_qs(u.query, keep_blank_values=True)
        return bucket, key, q

    def _send(self, code, body=b"", headers=None,
              content_type="application/xml"):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD" and body:
            self.wfile.write(body)

    def _err(self, code, s3code):
        body = (f'<?xml version="1.0"?><Error><Code>{s3code}</Code>'
                f"<Message>{s3code}</Message></Error>").encode()
        self._send(code, body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", "0") or 0)
        data = self.rfile.read(n)
        if "aws-chunked" in (self.headers.get("Content-Encoding") or ""):
            # strip the SDK's chunked-signing framing if it ever appears
            out, i = [], 0
            while i < len(data):
                j = data.find(b"\r\n", i)
                size = int(data[i:j].split(b";")[0], 16)
                i = j + 2
                out.append(data[i:i + size])
                i += size + 2
                if size == 0:
                    break
            data = b"".join(out)
        return data

    # -- verbs -------------------------------------------------------
    def do_HEAD(self):
        self._record()
        bucket, key, _ = self._split()
        with self._srv.lock:
            objs = self._srv.buckets.get(bucket)
            obj = objs.get(key) if (objs is not None and key) else None
        if objs is None:
            return self._err(404, "NoSuchBucket")
        if not key:
            return self._send(200, b"",
                              {"x-amz-bucket-region": "us-east-1"})
        if obj is None:
            return self._err(404, "NoSuchKey")
        data, mtime = obj
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Last-Modified", formatdate(mtime, usegmt=True))
        self.send_header("ETag", '"minis3"')
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        self._record()
        bucket, key, q = self._split()
        with self._srv.lock:
            objs = self._srv.buckets.get(bucket)
            snapshot = dict(objs) if objs is not None else None
        if snapshot is None:
            return self._err(404, "NoSuchBucket")
        if not key:
            if "location" in q:
                return self._send(
                    200, b'<?xml version="1.0"?><LocationConstraint/>')
            return self._list_v2(bucket, snapshot, q)
        if key not in snapshot:
            return self._err(404, "NoSuchKey")
        data, mtime = snapshot[key]
        headers = {"Last-Modified": formatdate(mtime, usegmt=True),
                   "ETag": '"minis3"', "Accept-Ranges": "bytes"}
        rng = self.headers.get("Range")
        if rng:
            m = re.match(r"bytes=(\d+)-(\d*)$", rng)
            a = int(m.group(1))
            b = int(m.group(2)) if m.group(2) else len(data) - 1
            b = min(b, len(data) - 1)
            headers["Content-Range"] = f"bytes {a}-{b}/{len(data)}"
            return self._send(206, data[a:b + 1], headers,
                              content_type="application/octet-stream")
        return self._send(200, data, headers,
                          content_type="application/octet-stream")

    def _list_v2(self, bucket, objs, q):
        prefix = q.get("prefix", [""])[0]
        delim = q.get("delimiter", [""])[0]
        contents, prefixes, seen = [], [], set()
        for k in sorted(k for k in objs if k.startswith(prefix)):
            rest = k[len(prefix):]
            if delim and delim in rest:
                p = prefix + rest.split(delim)[0] + delim
                if p not in seen:
                    seen.add(p)
                    prefixes.append(p)
                continue
            data, mtime = objs[k]
            lm = time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime(mtime))
            contents.append(
                f"<Contents><Key>{k}</Key><Size>{len(data)}</Size>"
                f"<LastModified>{lm}</LastModified><ETag>\"minis3\"</ETag>"
                f"<StorageClass>STANDARD</StorageClass></Contents>")
        body = (
            '<?xml version="1.0"?>'
            '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
            f"<Name>{bucket}</Name><Prefix>{prefix}</Prefix>"
            f"<KeyCount>{len(contents) + len(prefixes)}</KeyCount>"
            "<MaxKeys>1000</MaxKeys><IsTruncated>false</IsTruncated>"
            + "".join(contents)
            + "".join(f"<CommonPrefixes><Prefix>{p}</Prefix></CommonPrefixes>"
                      for p in prefixes)
            + "</ListBucketResult>").encode()
        self._send(200, body)

    def do_PUT(self):
        self._record()
        bucket, key, q = self._split()
        body = self._read_body()
        with self._srv.lock:
            if not key:  # CreateBucket
                self._srv.buckets.setdefault(bucket, {})
                return self._send(200)
            if bucket not in self._srv.buckets:
                return self._err(404, "NoSuchBucket")
            if "partNumber" in q:  # UploadPart
                up = self._srv.uploads.setdefault(q["uploadId"][0], {})
                up[int(q["partNumber"][0])] = body
                return self._send(
                    200, b"", {"ETag": f'"part-{q["partNumber"][0]}"'})
            self._srv.buckets[bucket][key] = (body, time.time())
        self._send(200, b"", {"ETag": '"minis3"'})

    def do_POST(self):
        self._record()
        bucket, key, q = self._split()
        body = self._read_body()
        with self._srv.lock:
            if "uploads" in q:  # CreateMultipartUpload
                uid = f"up-{self._srv.next_upload}"
                self._srv.next_upload += 1
                self._srv.uploads[uid] = {}
                xml = ('<?xml version="1.0"?><InitiateMultipartUploadResult>'
                       f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                       f"<UploadId>{uid}</UploadId>"
                       "</InitiateMultipartUploadResult>")
                return self._send(200, xml.encode())
            if "uploadId" in q:  # CompleteMultipartUpload
                parts = self._srv.uploads.pop(q["uploadId"][0], {})
                self._srv.buckets.setdefault(bucket, {})[key] = (
                    b"".join(parts[i] for i in sorted(parts)), time.time())
                xml = ('<?xml version="1.0"?><CompleteMultipartUploadResult>'
                       f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                       '<ETag>"minis3"</ETag>'
                       "</CompleteMultipartUploadResult>")
                return self._send(200, xml.encode())
            if "delete" in q:  # DeleteObjects
                keys = re.findall(r"<Key>([^<]+)</Key>", body.decode())
                for k in keys:
                    self._srv.buckets.get(bucket, {}).pop(
                        urllib.parse.unquote(k), None)
                xml = ('<?xml version="1.0"?><DeleteResult>'
                       + "".join(f"<Deleted><Key>{k}</Key></Deleted>"
                                 for k in keys)
                       + "</DeleteResult>")
                return self._send(200, xml.encode())
        self._err(400, "BadRequest")

    def do_DELETE(self):
        self._record()
        bucket, key, q = self._split()
        with self._srv.lock:
            if "uploadId" in q:  # AbortMultipartUpload
                self._srv.uploads.pop(q["uploadId"][0], None)
                return self._send(204)
            if bucket in self._srv.buckets:
                if key:
                    self._srv.buckets[bucket].pop(key, None)
                else:
                    del self._srv.buckets[bucket]
        self._send(204)


class MiniS3Server(http.server.ThreadingHTTPServer):
    """S3-subset endpoint bound to 127.0.0.1:<ephemeral>."""

    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), MiniS3Handler)
        self.buckets: dict[str, dict[str, tuple[bytes, float]]] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.next_upload = 0
        self.requests: list[tuple[str, str, str | None]] = []
        self.lock = threading.Lock()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"


def start() -> MiniS3Server:
    srv = MiniS3Server()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
