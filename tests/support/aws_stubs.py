"""In-process fakes for the AWS Glue and S3 Tables client surfaces the
catalogs use — the same role the REST fixture (rest_server.py) plays for
the REST backend: no AWS endpoint exists here, so the fakes implement the
documented API semantics (optimistic VersionId / versionToken CAS,
pagination, error codes) and the tests drive the full catalog matrix
against them.  Error classes are named after the service error codes;
``aws._err_name`` maps real botocore errors and these alike."""

from __future__ import annotations

import threading
from typing import Any, Optional


class EntityNotFoundException(Exception):
    pass


class AlreadyExistsException(Exception):
    pass


class ConcurrentModificationException(Exception):
    pass


class NotFoundException(Exception):
    pass


class ConflictException(Exception):
    pass


class FakeGlueClient:
    """The subset of boto3's Glue client the catalog touches, with Glue's
    documented optimistic locking: every table update bumps VersionId and
    ``update_table(VersionId=...)`` must present the current one."""

    def __init__(self, page_size: int = 100):
        self.lock = threading.Lock()
        self.databases: dict[str, dict[str, Any]] = {}
        self.tables: dict[tuple[str, str], dict[str, Any]] = {}
        self.page = page_size

    # -- databases --------------------------------------------------------
    def create_database(self, DatabaseInput):
        with self.lock:
            name = DatabaseInput["Name"]
            if name in self.databases:
                raise AlreadyExistsException(name)
            self.databases[name] = {
                "Name": name,
                "Parameters": dict(DatabaseInput.get("Parameters", {})),
            }

    def get_database(self, Name):
        db = self.databases.get(Name)
        if db is None:
            raise EntityNotFoundException(Name)
        return {"Database": dict(db)}

    def get_databases(self, NextToken: Optional[str] = None):
        names = sorted(self.databases)
        start = int(NextToken or 0)
        page = names[start : start + self.page]
        out = {"DatabaseList": [dict(self.databases[n]) for n in page]}
        if start + self.page < len(names):
            out["NextToken"] = str(start + self.page)
        return out

    def update_database(self, Name, DatabaseInput):
        with self.lock:
            if Name not in self.databases:
                raise EntityNotFoundException(Name)
            self.databases[Name] = {
                "Name": DatabaseInput["Name"],
                "Parameters": dict(DatabaseInput.get("Parameters", {})),
            }

    def delete_database(self, Name):
        with self.lock:
            if Name not in self.databases:
                raise EntityNotFoundException(Name)
            del self.databases[Name]

    # -- tables -----------------------------------------------------------
    def create_table(self, DatabaseName, TableInput):
        with self.lock:
            if DatabaseName not in self.databases:
                raise EntityNotFoundException(DatabaseName)
            key = (DatabaseName, TableInput["Name"])
            if key in self.tables:
                raise AlreadyExistsException(TableInput["Name"])
            self.tables[key] = {**_copy_input(TableInput), "VersionId": "1"}

    def get_table(self, DatabaseName, Name):
        t = self.tables.get((DatabaseName, Name))
        if t is None:
            raise EntityNotFoundException(Name)
        return {"Table": _copy_table(t)}

    def get_tables(self, DatabaseName, NextToken: Optional[str] = None):
        if DatabaseName not in self.databases:
            raise EntityNotFoundException(DatabaseName)
        names = sorted(n for (d, n) in self.tables if d == DatabaseName)
        start = int(NextToken or 0)
        page = names[start : start + self.page]
        out = {
            "TableList": [
                _copy_table(self.tables[(DatabaseName, n)]) for n in page
            ]
        }
        if start + self.page < len(names):
            out["NextToken"] = str(start + self.page)
        return out

    def update_table(self, DatabaseName, TableInput, VersionId: Optional[str] = None):
        with self.lock:
            key = (DatabaseName, TableInput["Name"])
            t = self.tables.get(key)
            if t is None:
                raise EntityNotFoundException(TableInput["Name"])
            if VersionId is not None and VersionId != t["VersionId"]:
                raise ConcurrentModificationException(TableInput["Name"])
            self.tables[key] = {
                **_copy_input(TableInput),
                "VersionId": str(int(t["VersionId"]) + 1),
            }

    def delete_table(self, DatabaseName, Name):
        with self.lock:
            if (DatabaseName, Name) not in self.tables:
                raise EntityNotFoundException(Name)
            del self.tables[(DatabaseName, Name)]


def _copy_input(table_input):
    return {
        "Name": table_input["Name"],
        "TableType": table_input.get("TableType", "EXTERNAL_TABLE"),
        "Parameters": dict(table_input.get("Parameters", {})),
        "StorageDescriptor": dict(table_input.get("StorageDescriptor", {})),
    }


def _copy_table(t):
    out = _copy_input(t)
    out["VersionId"] = t["VersionId"]
    return out


class FakeS3TablesClient:
    """The subset of boto3's s3tables client the catalog touches, with the
    documented versionToken CAS on update_table_metadata_location."""

    def __init__(self, page_size: int = 100):
        self.lock = threading.Lock()
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], dict[str, Any]] = {}
        self.page = page_size
        self._token = 0

    def _next_token(self) -> str:
        self._token += 1
        return f"tok{self._token}"

    # -- namespaces -------------------------------------------------------
    def create_namespace(self, tableBucketARN, namespace):
        with self.lock:
            (ns,) = namespace
            if ns in self.namespaces:
                raise ConflictException(ns)
            self.namespaces.add(ns)

    def get_namespace(self, tableBucketARN, namespace):
        if namespace not in self.namespaces:
            raise NotFoundException(namespace)
        return {"namespace": [namespace]}

    def list_namespaces(self, tableBucketARN, continuationToken: Optional[str] = None):
        names = sorted(self.namespaces)
        start = int(continuationToken or 0)
        page = names[start : start + self.page]
        out = {"namespaces": [{"namespace": [n]} for n in page]}
        if start + self.page < len(names):
            out["continuationToken"] = str(start + self.page)
        return out

    def delete_namespace(self, tableBucketARN, namespace):
        with self.lock:
            if namespace not in self.namespaces:
                raise NotFoundException(namespace)
            self.namespaces.discard(namespace)

    # -- tables -----------------------------------------------------------
    def create_table(self, tableBucketARN, namespace, name, format, warehouseLocation=None):
        with self.lock:
            if namespace not in self.namespaces:
                raise NotFoundException(namespace)
            if (namespace, name) in self.tables:
                raise ConflictException(name)
            t = {
                "namespace": namespace,
                "name": name,
                "format": format,
                "warehouseLocation": warehouseLocation,
                "metadataLocation": None,
                "versionToken": self._next_token(),
            }
            self.tables[(namespace, name)] = t
            return dict(t)

    def get_table(self, tableBucketARN, namespace, name):
        t = self.tables.get((namespace, name))
        if t is None:
            raise NotFoundException(name)
        return dict(t)

    def list_tables(self, tableBucketARN, namespace, continuationToken: Optional[str] = None):
        if namespace not in self.namespaces:
            raise NotFoundException(namespace)
        names = sorted(n for (ns, n) in self.tables if ns == namespace)
        start = int(continuationToken or 0)
        page = names[start : start + self.page]
        out = {"tables": [{"name": n} for n in page]}
        if start + self.page < len(names):
            out["continuationToken"] = str(start + self.page)
        return out

    def update_table_metadata_location(
        self, tableBucketARN, namespace, name, metadataLocation, versionToken
    ):
        with self.lock:
            t = self.tables.get((namespace, name))
            if t is None:
                raise NotFoundException(name)
            if versionToken != t["versionToken"]:
                raise ConflictException(name)
            t["metadataLocation"] = metadataLocation
            t["versionToken"] = self._next_token()

    def delete_table(self, tableBucketARN, namespace, name, versionToken=None):
        with self.lock:
            t = self.tables.get((namespace, name))
            if t is None:
                raise NotFoundException(name)
            if versionToken is not None and versionToken != t["versionToken"]:
                raise ConflictException(name)
            del self.tables[(namespace, name)]

    def rename_table(
        self,
        tableBucketARN,
        namespace,
        name,
        newNamespaceName=None,
        newName=None,
        versionToken=None,
    ):
        with self.lock:
            t = self.tables.get((namespace, name))
            if t is None:
                raise NotFoundException(name)
            if versionToken is not None and versionToken != t["versionToken"]:
                raise ConflictException(name)
            new_ns = newNamespaceName or namespace
            new_name = newName or name
            if new_ns not in self.namespaces:
                raise NotFoundException(new_ns)
            if (new_ns, new_name) in self.tables:
                raise ConflictException(new_name)
            del self.tables[(namespace, name)]
            t = {**t, "namespace": new_ns, "name": new_name,
                 "versionToken": self._next_token()}
            self.tables[(new_ns, new_name)] = t
