"""Driver-side metadata IO that works on ANY Hadoop-supported filesystem.

The pipeline's resume/index machinery (the ``_manifest.json`` checkpoint,
the Bloom ``_bloom_meta.json`` geometry sidecar, pending-partition cleanup,
output-existence probes) is tiny driver-side metadata — but the reference's
whole deployment model is warehouse-remote, so these paths must accept
``hdfs://`` / ``s3a://`` / ``file://`` URIs, not just the driver's local
disk. Spark's executors already read/write any URI through Hadoop; this
module gives the DRIVER the same reach via the JVM's
``org.apache.hadoop.fs.FileSystem`` API (``spark._jvm``), which resolves
the correct FS implementation per scheme from the active Hadoop conf
(including credentials — the same ones the parquet writes use).

Dispatch rule: a bare path (no ``scheme://``) uses plain python calls —
fast, no JVM round-trips, and usable before a session exists. ANY URI,
*including* ``file://``, routes through the Hadoop API — so local tests
with ``file://`` exercise the exact code path a real ``s3a://`` run takes.

These helpers replace the round-3/4 ``_require_local`` hard refusal (which
closed the silent-geometry-drift hazard by rejecting remote URIs outright —
now deleted): a remote Bloom index or manifest resolves its real recorded
geometry instead of being rejected, and the geometry sidecars keep failing
loudly on genuine drift.

Scale note: every call here moves O(bytes-of-a-small-JSON) or a single
RPC — never data. The data planes (parquet scans/writes, bitmap merges)
stay on Spark's own readers/writers, which were always URI-capable.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
import shutil

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def is_uri(path: str) -> bool:
    """True for any ``scheme://...`` path (file://, hdfs://, s3a://, ...)."""
    return bool(_URI_RE.match(path))


def _hfs(spark, path: str):
    """(FileSystem, Path, jvm) for ``path`` under the session's Hadoop conf.

    ``Path.getFileSystem`` picks the implementation by scheme and caches it
    JVM-side, so repeated metadata calls don't re-open connections."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(spark, path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    fs, jpath, _ = _hfs(spark, path)
    return bool(fs.exists(jpath))


def mkdirs(spark, path: str) -> None:
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, jpath, _ = _hfs(spark, path)
    fs.mkdirs(jpath)  # no-op if it already exists, like exist_ok=True


def delete(spark, path: str) -> None:
    """Recursive delete; silently succeeds if the path doesn't exist
    (mirrors ``shutil.rmtree(..., ignore_errors=True)``)."""
    if not is_uri(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, jpath, _ = _hfs(spark, path)
    fs.delete(jpath, True)


def has_glob(spark, pattern: str) -> bool:
    """Any match for a Hadoop-style glob (``dir/bucket=*`` etc.)."""
    if not is_uri(pattern):
        return bool(_glob.glob(pattern))
    fs, jpath, _ = _hfs(spark, pattern)
    statuses = fs.globStatus(jpath)
    return statuses is not None and len(statuses) > 0


def read_text(spark, path: str) -> str:
    if not is_uri(path):
        with open(path) as f:
            return f.read()
    fs, jpath, jvm = _hfs(spark, path)
    stream = fs.open(jpath)
    try:
        # commons-io ships in every Spark distribution; toByteArray reads
        # the stream fully and py4j hands the byte[] back as python bytes
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text(spark, path: str, text: str) -> None:
    if not is_uri(path):
        with open(path, "w") as f:
            f.write(text)
        return
    fs, jpath, _ = _hfs(spark, path)
    out = fs.create(jpath, True)  # overwrite=True: sidecars/manifests rotate
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_json(spark, path: str) -> dict:
    return json.loads(read_text(spark, path))


def write_json(spark, path: str, obj: dict) -> None:
    write_text(spark, path, json.dumps(obj))


def content_length(spark, path: str) -> int:
    """Total bytes under ``path`` (file or directory tree) — the cheap
    footer-level size probe used to gate broadcast decisions. 0 for a
    missing path."""
    if not is_uri(path):
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    fs, jpath, _ = _hfs(spark, path)
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())


def join(path: str, *parts: str) -> str:
    """Join path components; URI-safe (always '/', never os.sep games)."""
    out = path.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out
