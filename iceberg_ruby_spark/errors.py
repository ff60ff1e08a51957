"""Typed error model, mirroring the reference's error classes.

Reference: ``lib/iceberg.rb:30-42`` defines ``Iceberg::Error`` and subclasses
``NamespaceAlreadyExistsError``, ``NoSuchNamespaceError``, ``NoSuchTableError``,
``TableAlreadyExistsError``, ``UnsupportedFeatureError``, ``InvalidDataError``
and ``Todo`` ("not implemented yet"); Rust-side mapping in
``ext/iceberg/src/error.rs:4-53``.
"""

from __future__ import annotations


class Error(Exception):
    """Base class for all engine errors (reference ``Iceberg::Error``)."""


class NamespaceAlreadyExistsError(Error):
    pass


class NoSuchNamespaceError(Error):
    pass


class NoSuchTableError(Error):
    pass


class TableAlreadyExistsError(Error):
    pass


class UnsupportedFeatureError(Error):
    pass


class InvalidDataError(Error):
    pass


class Todo(Error):
    """Reference raises ``Iceberg::Todo("not implemented yet")`` for gaps
    (``lib/iceberg.rb:38-42``).  We keep the class for API parity but aim to
    never raise it where Spark has native support."""

    def __init__(self, message: str = "not implemented yet"):
        super().__init__(message)
