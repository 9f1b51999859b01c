"""mbox source tests: separator/quoting discipline, header unfolding,
round-trip through the writer."""

import pytest

from aroa_etl_spark.sources.mbox import (
    build_mbox,
    parse_mbox_blob,
    parse_mbox_records,
)


def _msg(i, body):
    return {
        "from_": f"sender{i}@example.com",
        "headers": [
            ("Message-ID", f"<m{i}@example.com>"),
            ("From", f"Sender {i} <sender{i}@example.com>"),
            ("Subject", f"hello {i}"),
        ],
        "body": body,
    }


def test_roundtrip_preserves_quoted_from_lines():
    body = "line one\nFrom me to you\n>From depth two\nlast"
    blob = build_mbox([_msg(0, body), _msg(1, "short")])
    # the writer quoted both 'From '-family lines
    assert b"\n>From me to you\n" in blob
    assert b"\n>>From depth two\n" in blob
    msgs = parse_mbox_blob(blob)
    assert len(msgs) == 2
    m0 = msgs[0]
    assert m0["body_lines"] == 4
    # logical body round-trips byte-exactly (one '>' stripped)
    assert m0["body_bytes"] == len(body.encode()) + 1  # writer adds final \n
    assert m0["from_addr"] == "sender0@example.com"
    assert m0["message_id"] == "<m0@example.com>"
    assert msgs[1]["msg_idx"] == 1


def test_unquoted_from_line_fails_loudly():
    # an archive written WITHOUT quoting splits at the body's 'From '
    # line; the phantom message has no header block, so the parser
    # raises instead of silently truncating the real body — the
    # documented boundary rule
    raw = (
        b"From a@b Thu Jan  1 00:00:00 1970\n"
        b"From: a@b\n\nbody\nFrom c@d more\n"
    )
    with pytest.raises(ValueError, match="no blank line"):
        parse_mbox_blob(raw)


def test_header_unfolding_and_bare_from_addr():
    raw = (
        b"From x@y Thu Jan  1 00:00:00 1970\n"
        b"Subject: part one\n\tpart two\n"
        b"From: bare@example.org\n"
        b"\n"
    )
    m = parse_mbox_blob(raw)[0]
    assert m["subject"] == "part one part two"
    assert m["from_addr"] == "bare@example.org"
    assert m["n_headers"] == 2
    assert m["body_lines"] == 0 and m["body_bytes"] == 0


def test_malformed_blobs_raise():
    with pytest.raises(ValueError, match="does not start"):
        parse_mbox_blob(b"Subject: no envelope\n")
    with pytest.raises(ValueError, match="no blank line"):
        parse_mbox_blob(b"From a@b now\nSubject: x\n")
    with pytest.raises(ValueError, match="without colon"):
        parse_mbox_blob(b"From a@b now\ngarbage line\n\n")
    with pytest.raises(ValueError, match="continuation"):
        parse_mbox_blob(b"From a@b now\n folded first\n\n")
    assert parse_mbox_blob(b"") == []


def test_parse_mbox_records_explodes(spark):
    blob = build_mbox([_msg(0, "a"), _msg(1, "b\nc"), _msg(2, "d")])
    df = spark.createDataFrame(
        [(7, bytearray(blob))], "blob_id long, content binary"
    )
    rows = parse_mbox_records(df).orderBy("msg_idx").collect()
    assert [r.msg_idx for r in rows] == [0, 1, 2]
    assert all(r.blob_id == 7 for r in rows)
    assert rows[1].body_lines == 2


def test_roundtrip_trailing_newline_and_empty_body():
    # 'line\n' is ONE logical line; '' is an EMPTY body — the writer
    # must not grow either by a blank line (round-trip contract)
    blob = build_mbox([_msg(0, "line\n"), _msg(1, "")])
    msgs = parse_mbox_blob(blob)
    assert msgs[0]["body_lines"] == 1 and msgs[0]["body_bytes"] == 5
    assert msgs[1]["body_lines"] == 0 and msgs[1]["body_bytes"] == 0


def test_mbox_datasource_batch_and_streaming(spark, tmp_path):
    from aroa_etl_spark.sources.mbox import build_mbox, register_mbox_source

    (tmp_path / "a.mbox").write_bytes(build_mbox([_msg(0, "x"), _msg(1, "y")]))
    (tmp_path / "manifest.json").write_bytes(b"{}")  # must be ignored
    register_mbox_source(spark)
    df = spark.read.format("mbox").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2
    assert {r.from_addr for r in rows} == {
        "sender0@example.com", "sender1@example.com"
    }
    assert all(r.path.endswith("a.mbox") for r in rows)

    # streaming: second file picked up incrementally
    q = (
        spark.readStream.format("mbox").load(str(tmp_path))
        .writeStream.format("memory").queryName("mbox_inc")
        .trigger(processingTime="500 milliseconds").start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM mbox_inc").first().c == 2
        (tmp_path / "b.mbox").write_bytes(build_mbox([_msg(2, "z")]))
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM mbox_inc").first().c == 3
    finally:
        q.stop()
