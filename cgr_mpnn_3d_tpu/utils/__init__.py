"""Shared utilities: JSON persistence, tables."""

from .json_io import json_dumper
from .table import AsciiTable

__all__ = ["json_dumper", "AsciiTable"]
