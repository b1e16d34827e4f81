"""Decode stack (ref: gr-air-modes python decode layer, SURVEY.md §2.3)."""

from . import acas, altitude, commb, cpr, fields, mlat, parse  # noqa: F401
