"""Utilities: logging, timing."""

from .logging import make_writer

__all__ = ["make_writer"]
