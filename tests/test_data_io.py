"""Data layer: multi-bucket S3 routing + s3 path/range parsing.

Reference behavior: rapid_doc/data/data_reader_writer/multi_bucket_s3.py
(bucket-routed clients, default-prefix relative paths, ?offset,limit
range reads). Clients are stubbed — no boto3/network involved.
"""
import pytest

from rapiddoc_tpu.data import (
    MultiBucketS3DataReader,
    MultiBucketS3DataWriter,
    S3Config,
    parse_s3_range,
    parse_s3path,
)


def _cfgs():
    return [
        S3Config("alpha", "ak1", "sk1", "http://ep1"),
        S3Config("beta", "ak2", "sk2", "http://ep2"),
    ]


class _StubClient:
    """Stands in for S3DataReader/S3DataWriter; records calls."""

    calls: list = []

    def __init__(self, bucket, ak, sk, endpoint, addressing_style="auto"):
        self.bucket = bucket

    def read_at(self, key, offset=0, limit=-1):
        _StubClient.calls.append(("read", self.bucket, key, offset, limit))
        return f"{self.bucket}:{key}".encode()

    def write(self, key, data):
        _StubClient.calls.append(("write", self.bucket, key, data))


@pytest.fixture(autouse=True)
def _stub(monkeypatch):
    _StubClient.calls = []
    monkeypatch.setattr(MultiBucketS3DataReader, "_cls", _StubClient)
    monkeypatch.setattr(MultiBucketS3DataWriter, "_cls", _StubClient)


def test_parse_s3path():
    assert parse_s3path("s3://b/a/c.pdf") == ("b", "a/c.pdf")
    with pytest.raises(ValueError):
        parse_s3path("/local/path")


def test_parse_s3_range():
    assert parse_s3_range("s3://b/k?100,50") == ("s3://b/k", 100, 50)
    assert parse_s3_range("s3://b/k") == ("s3://b/k", 0, -1)
    assert parse_s3_range("s3://b/k?bogus") == ("s3://b/k", 0, -1)


def test_relative_path_uses_default_bucket_and_prefix():
    r = MultiBucketS3DataReader("alpha/docs", _cfgs())
    assert r.read("x.pdf") == b"alpha:docs/x.pdf"


def test_absolute_path_routes_by_bucket():
    r = MultiBucketS3DataReader("alpha", _cfgs())
    assert r.read("s3://beta/y.pdf") == b"beta:y.pdf"
    # per-bucket clients are cached: same client object on second call
    c1 = r._client_for("beta")
    assert r._client_for("beta") is c1


def test_range_read_via_query_suffix():
    r = MultiBucketS3DataReader("alpha", _cfgs())
    r.read("s3://alpha/k?10,5")
    assert _StubClient.calls[-1] == ("read", "alpha", "k", 10, 5)


def test_writer_routes_and_prefixes():
    w = MultiBucketS3DataWriter("beta/out", _cfgs())
    w.write("a.md", b"data")
    assert _StubClient.calls[-1] == ("write", "beta", "out/a.md", b"data")
    w.write("s3://alpha/direct.md", b"d2")
    assert _StubClient.calls[-1] == ("write", "alpha", "direct.md", b"d2")


def test_config_validation():
    with pytest.raises(ValueError):
        MultiBucketS3DataReader("", _cfgs())
    with pytest.raises(ValueError):  # default bucket unconfigured
        MultiBucketS3DataReader("gamma", _cfgs())
    with pytest.raises(ValueError):  # duplicate bucket names
        MultiBucketS3DataReader(
            "alpha", [_cfgs()[0], S3Config("alpha", "a", "s", "e")]
        )
    r = MultiBucketS3DataReader("alpha", _cfgs())
    with pytest.raises(ValueError):  # unknown bucket at request time
        r.read("s3://gamma/k")
