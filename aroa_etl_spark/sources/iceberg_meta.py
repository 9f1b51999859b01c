"""Apache Iceberg table READER without iceberg-spark (metadata walk).

The second big lakehouse format next to Delta: an Iceberg table is a
tree of PUBLIC-spec metadata (iceberg.apache.org/spec; nothing here
reads Iceberg source code) —

    <root>/metadata/vN.metadata.json      table metadata + snapshots
    <root>/metadata/version-hint.text     optional newest-N pointer
    snapshot.manifest-list  -> Avro of ``manifest_file`` records
    manifest_file.manifest_path -> Avro of ``manifest_entry`` records
    manifest_entry.data_file.file_path -> parquet data

and BOTH Avro layers are read by the engine's own OCF reader
(sources/avro_ocf.py) — the round-11 logical-type/bytes/fixed work is
exactly what Iceberg's manifest schemas exercise.

Unlike Delta there is NO log replay: every snapshot's manifest list
enumerates the COMPLETE file set, so time travel is "pick the
snapshot, read its tree".  Reader posture:

- metadata/manifests are DRIVER-SIDE, O(#manifests + #files); data is
  one ``spark.read.parquet(*files)`` (identity-partition columns are
  stored IN Iceberg data files, so no reconstruction join is needed —
  the opposite of Delta, and the reason this reader has zero joins);
- ``prune`` (col -> (lo, hi)) drops data files whose
  ``data_file.partition`` value for an identity-partitioned column
  cannot overlap — manifest-tree pruning, I/O-only as always;
- v2 MERGE-ON-READ deletes apply (round 12): DELETE manifests
  (``manifest_file.content = 1``) contribute POSITION deletes
  (parquet of file_path + pos, anti-joined on data-file basename +
  ``_metadata.row_index``, applied to data_seq <= delete_seq) and
  EQUALITY deletes (parquet of the ``equality_ids`` columns, matched
  null-safely, applied to STRICTLY older sequences — the rule that
  makes Flink upsert streams read correctly: a same-sequence
  re-insert survives its own delete).  Sequence numbers come from
  per-entry fields with manifest-list inheritance;
- HONEST gates: format-version > 2 raises by name, and malformed
  delete metadata (id-less equality entries, data entries inside a
  delete manifest) fails loudly instead of guessing;
- ``manifest_entry.status = 2`` (DELETED) rows are history, not state:
  they are skipped, which is the spec's read path.

``build_iceberg_table`` is the fixture twin: real parquet data files,
real Avro manifests/manifest lists written by the engine's own OCF
writer with spec-shaped schemas, metadata.json + version-hint — the
full tree a reader must navigate, including delete manifests with
position-delete parquet (``pos_deletes``) and equality-delete parquet
(``eq_deletes``), all sequence-numbered.

Reference analogue: none; extension inventory SURVEY §2.11.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["iceberg_snapshot", "iceberg_read", "build_iceberg_table"]


def _metadata_path(root: str) -> str:
    mdir = os.path.join(root, "metadata")
    if not os.path.isdir(mdir):
        raise ValueError(f"iceberg: no metadata/ directory under {root!r}")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        p = os.path.join(mdir, f"v{n}.metadata.json")
        if os.path.exists(p):
            return p
    cands = []
    for name in os.listdir(mdir):
        if name.endswith(".metadata.json") and name.startswith("v"):
            try:
                cands.append((int(name[1:-len(".metadata.json")]), name))
            except ValueError:
                continue
    if not cands:
        raise ValueError(f"iceberg: no vN.metadata.json under {mdir!r}")
    return os.path.join(mdir, max(cands)[1])


def _resolve(root: str, path: str) -> str:
    """Spec paths are absolute URIs of the writing environment; treat
    anything under the table location as root-relative (the portable
    reading every engine applies to relocated tables)."""
    if "://" in path:
        path = path.split("://", 1)[1]
    if not os.path.isabs(path):
        return os.path.join(root, path)
    # absolute path from another environment: re-anchor at the table
    # using the RIGHTMOST marker — a table located under a directory
    # itself named data/ (e.g. /data/warehouse/tbl) must not re-anchor
    # at its own prefix (review finding, r11)
    best = -1
    for m in ("/metadata/", "/data/"):
        i = path.rfind(m)
        if i > best:
            best = i
    if best >= 0:
        return os.path.join(root, path[best + 1:])
    return path


def iceberg_snapshot(
    root: str, *, snapshot_id: "int | None" = None
) -> dict:
    """Walk the metadata tree -> {'snapshot_id', 'files': {path:
    {'partition', 'record_count'}}, 'schema' (the metadata's JSON
    schema dict), 'partition_fields', 'n_manifests'}."""
    from aroa_etl_spark.sources.avro_ocf import parse_avro_blob

    root = root.rstrip("/")
    with open(_metadata_path(root), encoding="utf-8") as f:
        try:
            meta = json.load(f)
        except json.JSONDecodeError as e:
            raise ValueError(f"iceberg: malformed metadata json: {e}") from None
    if not isinstance(meta, dict):
        raise ValueError("iceberg: metadata json is not an object")
    fv = meta.get("format-version", 1)
    if not isinstance(fv, int):
        raise ValueError("iceberg: non-integer format-version")
    if fv > 2:
        raise NotImplementedError(
            f"iceberg: format-version {fv} is beyond this reader (<= 2)"
        )
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("iceberg: table has no snapshots")
    sid = meta.get("current-snapshot-id") if snapshot_id is None \
        else snapshot_id
    chosen = [s for s in snaps if s.get("snapshot-id") == sid]
    if not chosen:
        raise ValueError(
            f"iceberg: snapshot {snapshot_id} not in the metadata "
            f"(have {[s.get('snapshot-id') for s in snaps]})"
        )
    snap = chosen[0]
    if not isinstance(snap, dict) or "manifest-list" not in snap:
        raise ValueError("iceberg: snapshot without a manifest-list")
    ml_path = _resolve(root, str(snap["manifest-list"]))
    with open(ml_path, "rb") as f:
        _hdr, manifests = parse_avro_blob(f.read())
    files: dict = {}
    pos_delete_files: list = []
    eq_delete_files: list = []
    for mf in manifests:
        if not isinstance(mf, dict) or "manifest_path" not in mf:
            raise ValueError(
                "iceberg: manifest-list record without manifest_path"
            )
        is_delete_manifest = mf.get("content", 0) == 1
        mf_seq = mf.get("sequence_number") or 0
        mpath = _resolve(root, mf["manifest_path"])
        with open(mpath, "rb") as f:
            _h2, entries = parse_avro_blob(f.read())
        for e in entries:
            if e.get("status") == 2:  # DELETED: history, not state
                continue
            df_ = e.get("data_file") if isinstance(e, dict) else None
            if not isinstance(df_, dict) or "file_path" not in df_:
                raise ValueError(
                    "iceberg: manifest entry without a data_file path"
                )
            fmt = (df_.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"iceberg: data file format {fmt} is not supported"
                )
            # data sequence number (v2): explicit per entry, else
            # inherited from the manifest-list entry (spec inheritance)
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf_seq
            content = df_.get("content", 0)
            if is_delete_manifest:
                # v2 merge-on-read (round 12): POSITION deletes apply to
                # data with data_seq <= delete_seq, EQUALITY deletes to
                # data with data_seq < delete_seq (strictly older) —
                # both enforced in iceberg_read's anti-join conditions
                if content == 2:
                    ids = df_.get("equality_ids")
                    if not ids:
                        raise ValueError(
                            "iceberg: equality delete file without "
                            "equality_ids"
                        )
                    eq_delete_files.append(
                        {"path": df_["file_path"], "seq": seq,
                         "equality_ids": list(ids)}
                    )
                    continue
                if content != 1:
                    raise ValueError(
                        "iceberg: delete manifest entry with "
                        f"content={content}"
                    )
                pos_delete_files.append(
                    {"path": df_["file_path"], "seq": seq}
                )
                continue
            if content != 0:
                raise ValueError(
                    f"iceberg: DATA manifest entry with content={content}"
                )
            files[df_["file_path"]] = {
                "partition": df_.get("partition") or {},
                "record_count": df_.get("record_count"),
                "seq": seq,
            }
    # identity partition fields of the current spec (for prune checks)
    pfields = []
    for spec in meta.get("partition-specs") or []:
        if spec.get("spec-id") == meta.get("default-spec-id", 0):
            pfields = [
                f["name"] for f in spec.get("fields", ())
                if f.get("transform") == "identity"
            ]
    # the CURRENT schema is the entry whose schema-id matches
    # current-schema-id, not the last list element — metadata written
    # with historical schemas out of order would otherwise type an
    # empty snapshot's frame from the wrong schema (advice finding,
    # r12); v1 metadata may carry only a bare 'schema'
    schemas = meta.get("schemas") or []
    cur_id = meta.get("current-schema-id")
    cur_schema = next(
        (s for s in schemas if isinstance(s, dict)
         and s.get("schema-id") == cur_id),
        None,
    )
    if cur_schema is None:
        cur_schema = meta.get("schema") or (schemas[-1] if schemas else None)
    return {
        "snapshot_id": sid,
        "files": files,
        "position_delete_files": pos_delete_files,
        "equality_delete_files": eq_delete_files,
        "schema": cur_schema,
        "partition_fields": pfields,
        "n_manifests": len(manifests),
    }


_ICEBERG_SPARK_TYPES = {
    "boolean": "boolean", "int": "int", "long": "bigint",
    "float": "float", "double": "double", "string": "string",
    "date": "date", "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp", "binary": "binary", "uuid": "string",
}


def _spark_schema_ddl(schema: dict) -> str:
    """Iceberg struct schema json -> a Spark DDL string (the primitive
    subset this reader's tables use; nested/unknown types refuse by
    name — only needed to type an EMPTY snapshot's frame)."""
    parts = []
    for f in (schema or {}).get("fields", ()):
        t = f.get("type")
        if isinstance(t, str) and t.startswith("decimal("):
            spark_t = t
        elif isinstance(t, str) and t in _ICEBERG_SPARK_TYPES:
            spark_t = _ICEBERG_SPARK_TYPES[t]
        else:
            raise NotImplementedError(
                f"iceberg: cannot type an empty frame for field type {t!r}"
            )
        parts.append(f"`{f['name']}` {spark_t}")
    return ", ".join(parts)


def iceberg_read(
    spark: SparkSession,
    path: str,
    *,
    snapshot_id: "int | None" = None,
    prune: "dict | None" = None,
) -> DataFrame:
    """The Iceberg snapshot as a DataFrame.  ``prune`` (col ->
    (lo, hi)) drops files by their identity-partition value — I/O-only,
    rows still flow for kept files.  An EMPTY snapshot (the format
    allows delete-all states) yields an empty frame typed from the
    metadata schema, matching delta_read's contract."""
    root = path.rstrip("/")
    snap = iceberg_snapshot(root, snapshot_id=snapshot_id)
    entries = sorted(snap["files"].items())
    if not entries:
        return spark.createDataFrame([], _spark_schema_ddl(snap["schema"]))
    if prune:
        def keep(info) -> bool:
            part = info["partition"]
            for col, (lo, hi) in prune.items():
                v = part.get(col)
                if v is None:
                    continue
                try:
                    if (hi is not None and v > hi) or (
                        lo is not None and v < lo
                    ):
                        return False
                except TypeError:
                    continue
            return True

        entries = [(p, i) for p, i in entries if keep(i)]
    if not entries:
        # every file pruned: empty frame, same schema contract
        return spark.createDataFrame([], _spark_schema_ddl(snap["schema"]))
    df = spark.read.parquet(*[_resolve(root, p) for p, _ in entries])
    pos_dels = snap["position_delete_files"]
    eq_dels = snap["equality_delete_files"]
    if pos_dels or eq_dels:
        # v2 merge-on-read (round 12): drop deleted rows with anti-
        # joins.  POSITION deletes are parquet of (file_path, pos) —
        # matched on (data-file basename, _metadata.row_index), the
        # exact space the spec's pos column addresses — and apply to
        # data with data_seq <= delete_seq.  EQUALITY deletes are
        # parquet of the equality_ids columns, matched NULL-SAFELY and
        # applied to STRICTLY OLDER data (data_seq < delete_seq) — the
        # spec's rule that makes upsert streams correct (the row a
        # writer re-inserts in the same sequence survives its own
        # delete).  Sequence numbers ride a broadcast basename dim;
        # delete rows naming rewritten-away files are inert via the
        # join.  AQE sizes everything; no driver materialize.
        from pyspark.sql import functions as F

        data_cols = df.columns
        seq_dim = spark.createDataFrame(
            [(os.path.basename(_resolve(root, p)), int(i["seq"]))
             for p, i in entries],
            "__ib_file string, __ib_seq long",
        )
        df = (
            df.withColumn(
                "__ib_file",
                F.url_decode(
                    F.element_at(F.split(F.input_file_name(), "/"), -1)
                ),
            )
            .withColumn("__ib_pos", F.col("_metadata.row_index"))
            .join(F.broadcast(seq_dim), "__ib_file")
        )
        if pos_dels:
            del_df = spark.read.parquet(
                *[_resolve(root, d["path"]) for d in pos_dels]
            )
            if set(del_df.columns) < {"file_path", "pos"}:
                raise ValueError(
                    "iceberg: position-delete parquet without file_path/pos"
                )
            seq_of = {
                os.path.basename(_resolve(root, d["path"])): int(d["seq"])
                for d in pos_dels
            }
            dseq = spark.createDataFrame(
                list(seq_of.items()), "__del_file string, __del_seq long"
            )
            del_dim = (
                del_df.withColumn(
                    "__del_file",
                    F.url_decode(
                        F.element_at(F.split(F.input_file_name(), "/"), -1)
                    ),
                )
                .join(F.broadcast(dseq), "__del_file")
                .select(
                    F.element_at(F.split(F.col("file_path"), "/"), -1)
                    .alias("__ib_file"),
                    F.col("pos").cast("long").alias("__ib_pos"),
                    "__del_seq",
                )
            )
            df = df.join(
                del_dim,
                (df["__ib_file"] == del_dim["__ib_file"])
                & (df["__ib_pos"] == del_dim["__ib_pos"])
                & (del_dim["__del_seq"] >= df["__ib_seq"]),
                "left_anti",
            )
        # resolve equality_ids (schema field ids) -> column names once
        if eq_dels:
            id2name = {
                f.get("id"): f.get("name")
                for f in (snap["schema"] or {}).get("fields", ())
            }
            # ONE anti-join per equality_ids SIGNATURE, not per delete
            # file (r12 verdict #4 / r13 optimization): a Flink upsert
            # stream emits one delete file per checkpoint, all with the
            # same equality_ids — chaining an anti-join per file makes
            # the plan (and Catalyst analysis time) linear in checkpoint
            # count.  Same-signature files are read as one scan; each
            # delete row carries its own __del_seq via a broadcast
            # basename→seq dim (the position-delete trick), and the
            # strictly-older rule rides the join condition per row —
            # semantics identical to the per-file chain.
            by_sig: dict[tuple, list] = {}
            for d in eq_dels:
                by_sig.setdefault(tuple(d["equality_ids"]), []).append(d)
            for sig, ds in by_sig.items():
                cols = [id2name.get(i) for i in sig]
                if any(c is None for c in cols):
                    raise ValueError(
                        f"iceberg: equality_ids {list(sig)} not in "
                        "the current schema"
                    )
                paths = [_resolve(root, d["path"]) for d in ds]
                # per-file strictness is kept: a malformed file missing
                # an equality column must RAISE, not null-match — check
                # each footer (cheap driver-side metadata) because the
                # merged scan would silently null-fill a missing column
                import pyarrow.parquet as _pq

                for p in paths:
                    have = set(_pq.read_schema(p).names)
                    missing = [c for c in cols if c not in have]
                    if missing:
                        raise ValueError(
                            f"iceberg: equality-delete file lacks {missing}"
                        )
                dseq = spark.createDataFrame(
                    [(os.path.basename(p), int(d["seq"]))
                     for p, d in zip(paths, ds)],
                    "__del_file string, __del_seq long",
                )
                eq_dim = (
                    spark.read.parquet(*paths)
                    .withColumn(
                        "__del_file",
                        F.url_decode(
                            F.element_at(
                                F.split(F.input_file_name(), "/"), -1
                            )
                        ),
                    )
                    .join(F.broadcast(dseq), "__del_file")
                    .select(
                        *[F.col(c).alias(f"__eq_{c}") for c in cols],
                        "__del_seq",
                    )
                )
                cond = eq_dim["__del_seq"] > df["__ib_seq"]
                for c in cols:
                    cond = cond & df[c].eqNullSafe(eq_dim[f"__eq_{c}"])
                df = df.join(eq_dim, cond, "left_anti")
        df = df.select(*data_cols)
    return df


# --- fixture-side twin ---------------------------------------------------------

# spec-shaped Avro schemas (field subsets this reader consumes; real
# writers add more optional fields, which the OCF reader's record walk
# tolerates only if declared — fixtures declare exactly these)
_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
    ],
}


def _manifest_entry_schema(partition_fields: "list[tuple[str, str]]"):
    part_fields = [
        {"name": n, "type": ["null", t], "field-id": 1000 + i}
        for i, (n, t) in enumerate(partition_fields)
    ]
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102",
                        "fields": part_fields,
                    }},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "equality_ids", "field-id": 135,
                     "type": ["null", {"type": "array", "items": "int"}]},
                ],
            }},
        ],
    }


def build_iceberg_table(
    spark: SparkSession,
    root: str,
    schema_fields: "list[tuple[str, str]]",
    partition_fields: "list[tuple[str, str]]",
    snapshots: "list[list[dict]]",
    *,
    format_version: int = 2,
) -> "list[int]":
    """Write a real Iceberg-layout table.  ``snapshots[i]`` is a list
    of manifest specs {'adds': [(partition_values, rows_df)],
    'deletes': [file_paths], 'delete_where': {col: value}} — each
    spec's adds become ONE manifest
    Avro file, so multi-spec snapshots produce MULTI-MANIFEST lists.
    Deletes REWRITE the affected older manifest with the deleted
    entries flipped to status 2 (the copy-on-write metadata rewrite a
    real compaction performs), and the rewritten manifest stays in the
    list — the reader must skip status-2 rows, which is exactly the
    spec's read path.  Returns snapshot ids."""
    import shutil

    root = root.rstrip("/")
    mdir = os.path.join(root, "metadata")
    ddir = os.path.join(root, "data")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)
    from aroa_etl_spark.sources.avro_ocf import build_avro_ocf

    entry_schema = _manifest_entry_schema(partition_fields)

    def _entry(status, sid, fp, pv, n, sz, content=0, seq=None,
               equality_ids=None):
        return {
            "status": status,
            "snapshot_id": sid,
            "sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": fp,
                "file_format": "PARQUET",
                "partition": pv,
                "record_count": n,
                "file_size_in_bytes": sz,
                "equality_ids": equality_ids,
            },
        }

    def _write_manifest(entries, content=0):
        name = f"metadata/manifest-{uuid.uuid4().hex[:12]}.avro"
        blob = build_avro_ocf(entry_schema, entries, codec="deflate")
        with open(os.path.join(root, name), "wb") as f:
            f.write(blob)
        n_added = sum(1 for e in entries if e["status"] == 1)
        return (name, len(blob), n_added, entries, content)

    snap_ids = []
    snaps_meta = []
    manifests: list = []  # (name, length, n_added, entries) in list order
    for i, manifest_specs in enumerate(snapshots):
        sid = 1000 + i
        seq = i + 1  # v2 data sequence number of this snapshot
        snap_ids.append(sid)
        for spec in manifest_specs:
            # delete selectors resolve against the PRE-add state, so a
            # compaction spec (delete_where + re-add in one manifest
            # spec) does not swallow its own replacement file
            pre_manifests = list(manifests)
            adds = []
            for pv, rows_df in spec.get("adds", ()):
                fname = f"data/part-{uuid.uuid4().hex[:16]}.parquet"
                tmp = os.path.join(root, f".tmp-{uuid.uuid4().hex[:8]}")
                n_rows = rows_df.count()
                rows_df.coalesce(1).write.mode("error").parquet(tmp)
                part = [n for n in os.listdir(tmp)
                        if n.endswith(".parquet")][0]
                os.replace(os.path.join(tmp, part),
                           os.path.join(root, fname))
                shutil.rmtree(tmp)
                adds.append(_entry(
                    1, sid, fname, dict(pv), n_rows,
                    os.path.getsize(os.path.join(root, fname)),
                    seq=seq,
                ))
            if adds:
                manifests.append(_write_manifest(adds))
            if spec.get("pos_deletes"):
                # v2 merge-on-read fixture: one parquet of
                # (file_path, pos) + a DELETE manifest (content=1).
                # Targets are named by an identity-partition selector
                # (files get their uuid names only at build time).
                import pyarrow as pa
                import pyarrow.parquet as pq

                rows_fp, rows_pos = [], []
                for want, positions in spec["pos_deletes"]:
                    targets = [
                        e["data_file"]["file_path"]
                        for _n, _l, _na, ents, ct in manifests if ct == 0
                        for e in ents
                        if e["status"] != 2 and all(
                            e["data_file"]["partition"].get(k) == v
                            for k, v in want.items()
                        )
                    ]
                    if len(targets) != 1:
                        raise ValueError(
                            f"pos_deletes selector {want} matched "
                            f"{len(targets)} files"
                        )
                    rows_fp.extend([targets[0]] * len(positions))
                    rows_pos.extend(int(x) for x in positions)
                dname = f"data/delete-{uuid.uuid4().hex[:16]}.parquet"
                pq.write_table(
                    pa.table({"file_path": pa.array(rows_fp, pa.string()),
                              "pos": pa.array(rows_pos, pa.int64())}),
                    os.path.join(root, dname),
                )
                dentry = _entry(
                    1, sid, dname,
                    {n: None for n, _t in partition_fields},
                    len(rows_pos),
                    os.path.getsize(os.path.join(root, dname)),
                    content=1, seq=seq,
                )
                manifests.append(_write_manifest([dentry], content=1))
            if spec.get("eq_deletes"):
                # v2 EQUALITY deletes: parquet of the equality columns
                # + a content=2 entry carrying their schema field ids
                import pyarrow as pa
                import pyarrow.parquet as pq

                cols, rows_vals = spec["eq_deletes"]
                ids = [1 + [f[0] for f in schema_fields].index(c)
                       for c in cols]
                arrays = {
                    c: pa.array([r[j] for r in rows_vals])
                    for j, c in enumerate(cols)
                }
                ename = f"data/eq-delete-{uuid.uuid4().hex[:16]}.parquet"
                pq.write_table(pa.table(arrays), os.path.join(root, ename))
                eentry = _entry(
                    1, sid, ename,
                    {n: None for n, _t in partition_fields},
                    len(rows_vals),
                    os.path.getsize(os.path.join(root, ename)),
                    content=2, seq=seq, equality_ids=ids,
                )
                manifests.append(_write_manifest([eentry], content=1))
            dels = set(spec.get("deletes") or ())
            if spec.get("delete_where"):
                want = spec["delete_where"]
                for _name, _ln, _na, entries, _ct in pre_manifests:
                    for e in entries:
                        if e["status"] == 2:
                            continue
                        pv = e["data_file"]["partition"]
                        if all(pv.get(k) == v for k, v in want.items()):
                            dels.add(e["data_file"]["file_path"])
            if dels:
                rewritten = []
                for name, ln, na, entries, ct in manifests:
                    touched = [
                        e for e in entries
                        if e["data_file"]["file_path"] in dels
                        and e["status"] != 2
                    ]
                    if not touched:
                        rewritten.append((name, ln, na, entries, ct))
                        continue
                    new_entries = [
                        (
                            {**e, "status": 2, "snapshot_id": sid}
                            if e["data_file"]["file_path"] in dels
                            else e
                        )
                        for e in entries
                    ]
                    rewritten.append(_write_manifest(new_entries, ct))
                manifests = rewritten
        manifest_paths = [(n, ln, na, ct) for n, ln, na, _e, ct in manifests]
        ml_name = f"metadata/snap-{sid}-manifest-list.avro"
        ml_records = [
            {
                "manifest_path": mp,
                "manifest_length": ln,
                "partition_spec_id": 0,
                "content": ct,
                "sequence_number": seq,
                "added_snapshot_id": sid,
                "added_files_count": ne,
                "existing_files_count": 0,
                "deleted_files_count": 0,
            }
            for mp, ln, ne, ct in manifest_paths
        ]
        with open(os.path.join(root, ml_name), "wb") as f:
            f.write(build_avro_ocf(_MANIFEST_FILE_SCHEMA, ml_records))
        snaps_meta.append({
            "snapshot-id": sid,
            "timestamp-ms": 0,
            "manifest-list": ml_name,
            "summary": {"operation": "append"},
        })
        meta = {
            "format-version": format_version,
            "table-uuid": "00000000-0000-0000-0000-000000000000",
            "location": root,
            "current-snapshot-id": sid,
            "snapshots": snaps_meta,
            "schemas": [{
                "type": "struct", "schema-id": 0,
                "fields": [
                    {"id": j + 1, "name": n, "required": False, "type": t}
                    for j, (n, t) in enumerate(schema_fields)
                ],
            }],
            "current-schema-id": 0,
            "partition-specs": [{
                "spec-id": 0,
                "fields": [
                    {"name": n, "transform": "identity",
                     "source-id": 1 + [f[0] for f in schema_fields].index(n),
                     "field-id": 1000 + j}
                    for j, (n, _t) in enumerate(partition_fields)
                ],
            }],
            "default-spec-id": 0,
        }
        with open(os.path.join(mdir, f"v{i + 1}.metadata.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(mdir, "version-hint.text"), "w") as f:
            f.write(str(i + 1))
    return snap_ids
