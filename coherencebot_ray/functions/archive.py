"""parsefilter-archive (src/plugin/parsefilter-archive/.../
ArchiveParseFilter.java:50-165): archive fetched PDFs to an object
store so they survive unpublishing.

Key layout (:95-118): strip the protocol, split host / path;
``<prefix><host>/<digest>.pdf`` when the content digest is known, else
``<prefix><host>/<slug(path)>.pdf``; ``<prefix>no-host/...`` when the
url has no host/path split. Existing keys are not re-uploaded; either
way the parse metadata gains ``file.url_archive = s3://<bucket>/<key>``
(:142-157).

The reference talks to AWS S3; this environment has neither the SDK
nor network, so the store is an injectable seam: any object with
``exists(bucket, key) -> bool`` and ``put(bucket, key, data,
content_type)``. ``LocalObjectStore`` is the filesystem-backed double.
"""

from __future__ import annotations

import os
import re

_PROTOCOL_RE = re.compile(r"(file://|http://|https://)")
_HOST_RE = re.compile(r"([^/?]+)[/?](.+)")
_SLUG_RE = re.compile(r"[^a-z0-9]+")

SUPPORTED_MIME_TYPES = ("application/pdf",)
ARCHIVE_META_KEY = "file.url_archive"


def slugify(s: str) -> str:
    """com.github.slugify.Slugify analogue: lowercase, non-alnum runs
    collapse to '-', trimmed."""
    return _SLUG_RE.sub("-", s.lower()).strip("-")


class LocalObjectStore:
    """Filesystem double of the S3 client seam."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key)

    def exists(self, bucket: str, key: str) -> bool:
        return os.path.exists(self._path(bucket, key))

    def put(self, bucket: str, key: str, data: bytes, content_type: str) -> None:
        p = self._path(bucket, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)


def archive_key(url: str, digest_hex: str | None, prefix: str) -> str:
    """ArchiveParseFilter.java:95-118 key derivation."""
    no_proto = _PROTOCOL_RE.sub("", url)
    m = _HOST_RE.match(no_proto)
    if m:
        host, path = m.group(1), m.group(2)
        if digest_hex:
            return f"{prefix}{host}/{digest_hex}.pdf"
        return f"{prefix}{host}/{slugify(path)}.pdf"
    if digest_hex:
        return f"{prefix}no-host/{digest_hex}.pdf"
    return f"{prefix}no-host/{slugify(no_proto)}.pdf"


class ArchiveFilter:
    """Per-actor archiver: built once in ParseBatch.__init__ when
    cfg.extra['archive_store_factory'] and archive_s3_bucket are set."""

    def __init__(self, bucket: str, prefix: str, store):
        self.bucket = bucket
        self.prefix = prefix
        self.store = store

    def archive(self, url: str, content_type: str, content: bytes,
                digest_hex: str | None) -> str | None:
        """Returns the archive url (stamped into parse metadata), or
        None for unsupported types / empty content."""
        if content_type not in SUPPORTED_MIME_TYPES:
            return None
        key = archive_key(url, digest_hex, self.prefix)
        archive_url = f"s3://{self.bucket}/{key}"
        if self.store.exists(self.bucket, key):
            return archive_url  # :155-157 stamp without re-upload
        if not content:
            return None  # :152-154 zero bytes: no upload, no stamp
        self.store.put(self.bucket, key, content, content_type)
        return archive_url
