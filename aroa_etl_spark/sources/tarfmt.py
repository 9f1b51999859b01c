"""POSIX tar (USTAR) member extraction — the WebDataset ingestion path.

Large multimodal training corpora ship as tar shards (the WebDataset
convention: one shard = one tar, one sample = a few adjacently-stored
members).  This module parses the 512-byte USTAR header blocks by hand
— name, octal size, typeflag, and the spec's checksum (header bytes
summed with the checksum field blanked) — and explodes each archive
blob into one row per regular member, the same Content-Length-driven,
zero-shuffle mapInPandas shape as the WARC/MPEG/JPEG/BMFF scanners.

Hand-parsing (rather than the stdlib ``tarfile``) keeps the kernel
byte-transparent for the catalog oracle and makes the failure modes
explicit: strict mode raises on checksum mismatches, non-octal size
fields, and archives that end without the two-zero-block terminator.
Fixture WRITERS should use the stdlib ``tarfile`` — guaranteed-valid
input is the honest way to test a reader.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TAR_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("member_idx", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

_BLOCK = 512


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"non-octal {what} field {field!r}") from exc


def parse_tar_blob(content: bytes, *, strict: bool = True):
    """Yield (idx, name, size, payload_md5) for each REGULAR member."""
    pos = 0
    idx = 0
    zero_blocks = 0
    while pos + _BLOCK <= len(content):
        header = content[pos:pos + _BLOCK]
        if header == b"\x00" * _BLOCK:
            zero_blocks += 1
            pos += _BLOCK
            if zero_blocks == 2:
                return
            continue
        if zero_blocks:
            raise ValueError(
                f"data after a single zero block at byte {pos - _BLOCK}"
            )
        stored = _octal(header[148:156], "checksum")
        computed = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
        if stored != computed:
            raise ValueError(
                f"tar header checksum mismatch at byte {pos} "
                f"(stored {stored}, computed {computed})"
            )
        name = header[0:100].split(b"\x00", 1)[0].decode("utf-8")
        size = _octal(header[124:136], "size")
        typeflag = header[156:157]
        data_end = pos + _BLOCK + size
        if data_end > len(content):
            raise ValueError(f"member '{name}' payload overruns the archive")
        if typeflag in (b"0", b"\x00"):  # regular file (old and ustar forms)
            payload = content[pos + _BLOCK:data_end]
            yield (
                idx,
                name,
                size,
                hashlib.md5(payload).hexdigest(),
            )
            idx += 1
        pos = data_end + (-size % _BLOCK)
    if strict:
        raise ValueError("archive ended without the two-zero-block terminator")


def parse_tar_members(df: DataFrame, *, strict: bool = True) -> DataFrame:
    """Explode (media_id, content) tar blobs into one row per regular
    member: (media_id, member_idx, name, size, payload_md5)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"] or b"")
                for idx, name, size, digest in parse_tar_blob(
                    content, strict=strict
                ):
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "member_idx": idx,
                            "name": name,
                            "size": size,
                            "payload_md5": digest,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in TAR_MEMBERS_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, TAR_MEMBERS_SCHEMA)
