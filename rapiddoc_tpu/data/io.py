"""Data reader/writer abstractions.

API-compatible with the reference data layer
(reference: rapid_doc/data/data_reader_writer/base.py, filebase.py,
s3.py, io/http.py): same class names and method shapes so downstream code
ports over unchanged.
"""
from __future__ import annotations

import os
from abc import ABC, abstractmethod
from pathlib import Path


class DataReader(ABC):
    def read(self, path: str) -> bytes:
        return self.read_at(path)

    @abstractmethod
    def read_at(self, path: str, offset: int = 0, limit: int = -1) -> bytes:
        ...


class DataWriter(ABC):
    @abstractmethod
    def write(self, path: str, data: bytes) -> None:
        ...

    def write_string(self, path: str, data: str) -> None:
        self.write(path, data.encode("utf-8"))


class FileBasedDataReader(DataReader):
    def __init__(self, parent_dir: str = ""):
        self._parent_dir = parent_dir

    def read_at(self, path: str, offset: int = 0, limit: int = -1) -> bytes:
        fn = path if os.path.isabs(path) else os.path.join(self._parent_dir, path)
        with open(fn, "rb") as f:
            f.seek(offset)
            return f.read() if limit == -1 else f.read(limit)


class FileBasedDataWriter(DataWriter):
    def __init__(self, parent_dir: str = ""):
        self._parent_dir = parent_dir

    def write(self, path: str, data: bytes) -> None:
        fn = path if os.path.isabs(path) else os.path.join(self._parent_dir, path)
        Path(fn).parent.mkdir(parents=True, exist_ok=True)
        with open(fn, "wb") as f:
            f.write(data)


class MemoryDataWriter(DataWriter):
    def __init__(self, parent_dir: str = "images") -> None:
        self._parent_dir = parent_dir
        self.data: dict[str, bytes] = {}

    def write(self, path: str, data: bytes) -> None:
        self.data[path.replace("\\", "/")] = data

    def get_value(self) -> dict[str, bytes]:
        return self.data


class FanoutDataWriter(DataWriter):
    def __init__(self, *writers: DataWriter | None) -> None:
        self._writers = [w for w in writers if w is not None]
        self._parent_dir = next(
            (getattr(w, "_parent_dir", "") for w in self._writers
             if getattr(w, "_parent_dir", "")),
            "",
        )

    def write(self, path: str, data: bytes) -> None:
        for w in self._writers:
            w.write(path, data)


class DummyDataWriter(DataWriter):
    def write(self, path: str, data: bytes) -> None:
        pass


class HttpReader(DataReader):
    def read_at(self, path: str, offset: int = 0, limit: int = -1) -> bytes:
        import requests

        resp = requests.get(path, timeout=60)
        resp.raise_for_status()
        data = resp.content
        if offset or limit != -1:
            end = None if limit == -1 else offset + limit
            data = data[offset:end]
        return data


class S3DataReader(DataReader):
    """S3 reader; requires boto3 (not present in all environments)."""

    def __init__(self, bucket: str, ak: str, sk: str, endpoint: str,
                 parent_dir: str = ""):
        try:
            import boto3  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("boto3 is not available in this environment") from e
        self._client = boto3.client(
            "s3", aws_access_key_id=ak, aws_secret_access_key=sk,
            endpoint_url=endpoint,
        )
        self._bucket = bucket
        self._parent = parent_dir

    def read_at(self, path: str, offset: int = 0, limit: int = -1) -> bytes:
        key = os.path.join(self._parent, path) if self._parent else path
        kwargs = {}
        if offset or limit != -1:
            end = "" if limit == -1 else offset + limit - 1
            kwargs["Range"] = f"bytes={offset}-{end}"
        obj = self._client.get_object(Bucket=self._bucket, Key=key, **kwargs)
        return obj["Body"].read()


class S3DataWriter(DataWriter):
    def __init__(self, bucket: str, ak: str, sk: str, endpoint: str,
                 parent_dir: str = ""):
        try:
            import boto3  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("boto3 is not available in this environment") from e
        self._client = boto3.client(
            "s3", aws_access_key_id=ak, aws_secret_access_key=sk,
            endpoint_url=endpoint,
        )
        self._bucket = bucket
        self._parent = parent_dir

    def write(self, path: str, data: bytes) -> None:
        key = os.path.join(self._parent, path) if self._parent else path
        self._client.put_object(Bucket=self._bucket, Key=key, Body=data)
