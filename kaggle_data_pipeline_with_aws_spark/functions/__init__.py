"""Scalar function library (SURVEY §2.8, F1-F19)."""

from . import scalars
from .scalars import *  # noqa: F401,F403

__all__ = ["scalars"]
