"""WARC source/sink: spec-shape goldens + distributed round-trip."""

import gzip

import pandas as pd
import pytest

from ironspark.warc import decode_records, encode_record, read_warc, write_warc


def test_encode_record_spec_shape():
    rec = encode_record(
        "http://example.com/a", "2026-01-02T03:04:05Z", b"<html>x</html>"
    )
    head, _, rest = rec.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    assert lines[0] == b"WARC/1.0"
    fields = dict(
        ln.split(b": ", 1) for ln in lines[1:]
    )
    assert fields[b"WARC-Type"] == b"response"
    assert fields[b"WARC-Target-URI"] == b"http://example.com/a"
    assert fields[b"WARC-Date"] == b"2026-01-02T03:04:05Z"
    assert fields[b"WARC-Record-ID"].startswith(b"<urn:uuid:")
    # content-length covers the embedded HTTP message exactly
    clen = int(fields[b"Content-Length"])
    assert rest[:clen].startswith(b"HTTP/1.1 200 OK\r\n")
    assert rest[:clen].endswith(b"<html>x</html>")
    assert rest[clen:] == b"\r\n\r\n"
    # deterministic ids: same key -> same record bytes
    assert rec == encode_record(
        "http://example.com/a", "2026-01-02T03:04:05Z", b"<html>x</html>"
    )


def test_decode_inverts_encode():
    recs = b"".join(
        encode_record(f"http://h/{i}", "2026-01-01T00:00:00Z",
                      f"body{i}".encode(), status=200 + i)
        for i in range(3)
    )
    out = list(decode_records(recs))
    assert [r["url"] for r in out] == [f"http://h/{i}" for i in range(3)]
    assert [r["status"] for r in out] == [200, 201, 202]
    assert [r["payload"] for r in out] == [b"body0", b"body1", b"body2"]


def test_warc_roundtrip_distributed(spark, tmp_path):
    import datetime

    n = 500
    pdf = pd.DataFrame({
        "url": [f"http://site{i % 7}.test/p/{i}" for i in range(n)],
        "warc_ts": [
            datetime.datetime(2026, 1, 1, 0, 0, i % 60) for i in range(n)
        ],
        "html": [f"<html><body>doc {i} é</body></html>" for i in range(n)],
    })
    df = spark.createDataFrame(pdf).repartition(8)
    out_dir = str(tmp_path / "warcs")
    written = write_warc(df, out_dir, partitions=8)
    assert written == n
    import glob

    files = glob.glob(out_dir + "/part-*.warc.gz")
    assert 1 <= len(files) <= 8  # one file per non-empty partition
    # every file is a valid multi-member gzip stream
    with open(files[0], "rb") as fh:
        gzip.decompress(fh.read(2 << 20))  # first member decompresses

    back = read_warc(spark, out_dir).toPandas()
    assert len(back) == n
    assert set(back["url"]) == set(pdf["url"])
    assert (back["status"] == 200).all()
    assert (back["warc_type"] == "response").all()
    by_url = dict(zip(back["url"], back["payload"]))
    for i in (0, 123, n - 1):
        assert bytes(by_url[pdf["url"][i]]).decode() == pdf["html"][i]


def test_read_warc_is_parallel_over_files(spark, tmp_path):
    # the source's unit of parallelism is the segment file: the scan of
    # K files must carry no Exchange before the parse stage
    pdf = pd.DataFrame({
        "url": [f"http://h/{i}" for i in range(40)],
        "warc_ts": ["2026-01-01T00:00:00Z"] * 40,
        "html": [f"<p>{i}</p>" for i in range(40)],
    })
    df = spark.createDataFrame(pdf).repartition(4)
    out_dir = str(tmp_path / "w2")
    write_warc(df, out_dir, partitions=4)
    reader = read_warc(spark, out_dir)
    plan = reader._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert reader.count() == 40


def test_warc_roundtrip_file_uri(spark, tmp_path):
    """Scheme-qualified sink path: segments open through the pyarrow
    filesystem API (the shared-storage path on a real cluster) and the
    bytes round-trip unchanged — no double-gzip from the .gz suffix."""
    import datetime

    pdf = pd.DataFrame({
        "url": [f"http://fs.test/p/{i}" for i in range(50)],
        "warc_ts": [datetime.datetime(2026, 1, 1)] * 50,
        "html": [f"<html>u{i}</html>" for i in range(50)],
    })
    df = spark.createDataFrame(pdf).repartition(4)
    out_uri = "file://" + str(tmp_path / "warcs_uri")
    assert write_warc(df, out_uri, partitions=4) == 50

    import glob
    files = glob.glob(str(tmp_path / "warcs_uri") + "/part-*.warc.gz")
    assert files, "segments must land at the URI path"
    with open(files[0], "rb") as fh:
        raw = fh.read()
    # exactly ONE layer of gzip: the decompressed first member is a
    # WARC record, not another gzip stream
    first = gzip.decompress(raw)
    assert first.startswith(b"WARC/1.0")

    back = read_warc(spark, out_uri).toPandas()
    assert len(back) == 50
    by_url = dict(zip(back["url"], back["payload"]))
    assert bytes(by_url["http://fs.test/p/7"]).decode() == "<html>u7</html>"
