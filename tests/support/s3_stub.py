"""In-process fake of the boto3 S3 client surface S3FileIO uses —
the same role aws_stubs.py plays for Glue/S3 Tables: no AWS endpoint
exists in CI, so the full contract (conditional put CAS, delimiter
listing, pagination, copy+delete moves) is exercised against this."""

from __future__ import annotations

import threading


class _ClientError(Exception):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.response = {"Error": {"Code": code, "Message": message}}


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class FakeS3Client:
    """Stores objects in a dict; implements exactly the kwargs S3FileIO
    sends.  ``page_size`` is small by default so pagination paths run."""

    def __init__(self, page_size: int = 2):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.page_size = page_size
        self._lock = threading.Lock()

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        with self._lock:
            if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
                raise _ClientError("PreconditionFailed", Key)
            self.objects[(Bucket, Key)] = Body if isinstance(Body, bytes) else Body.encode()
        return {}

    def get_object(self, Bucket, Key, **kw):
        try:
            return {"Body": _Body(self.objects[(Bucket, Key)])}
        except KeyError:
            raise _ClientError("NoSuchKey", Key)

    def head_object(self, Bucket, Key, **kw):
        try:
            return {"ContentLength": len(self.objects[(Bucket, Key)])}
        except KeyError:
            raise _ClientError("404", Key)

    def delete_object(self, Bucket, Key, **kw):
        self.objects.pop((Bucket, Key), None)
        return {}

    def copy_object(self, Bucket, Key, CopySource, **kw):
        src = (CopySource["Bucket"], CopySource["Key"])
        if src not in self.objects:
            raise _ClientError("NoSuchKey", CopySource["Key"])
        self.objects[(Bucket, Key)] = self.objects[src]
        return {}

    def list_objects_v2(self, Bucket, Prefix="", Delimiter=None,
                        ContinuationToken=None, **kw):
        keys = sorted(k for (b, k) in self.objects if b == Bucket and k.startswith(Prefix))
        if Delimiter:
            children, prefixes = [], []
            seen = set()
            for k in keys:
                tail = k[len(Prefix):]
                if Delimiter in tail:
                    p = Prefix + tail.split(Delimiter, 1)[0] + Delimiter
                    if p not in seen:
                        seen.add(p)
                        prefixes.append({"Prefix": p})
                else:
                    children.append(k)
            return {
                "Contents": [{"Key": k, "Size": len(self.objects[(Bucket, k)])} for k in children],
                "CommonPrefixes": prefixes,
                "IsTruncated": False,
            }
        start = int(ContinuationToken or 0)
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        out = {
            "Contents": [{"Key": k, "Size": len(self.objects[(Bucket, k)])} for k in page],
            "IsTruncated": truncated,
        }
        if truncated:
            out["NextContinuationToken"] = str(start + self.page_size)
        return out
