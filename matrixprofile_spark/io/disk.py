"""Reference-parity profile disk facade: to_disk / from_disk / infer.

Mirrors /root/reference/matrixprofile/io/__io.py:129-250 — extension
inference from the last dot suffix (153-174), extension appended when
the path lacks it (129-150), format dispatch json|mpf (177-250) — over
the engine's own codecs: json_io (text) and mpf (from-scratch proto3
wire format, binary-compatible with the reference's MPFOutput).

These operate on single profile dicts (driver-side interchange, KBs);
the distributed table paths are io.json_io.write_profiles_json and
io.mpf.write_profiles_mpf / read_profiles_mpf.
"""

from __future__ import annotations

from . import json_io, mpf

SUPPORTED_FORMATS = ("json", "mpf")


def _check_profile(profile) -> None:
    cls = isinstance(profile, dict) and profile.get("class")
    if cls not in ("MatrixProfile", "PMP"):
        raise ValueError(
            "profile is expected to be of type MatrixProfile or PMP")


def add_extension_to_path(file_path: str, extension: str) -> str:
    """io/__io.py:129-150 — append `.extension` when not already the
    last dot suffix. Case-SENSITIVE like the reference's
    endswith('.' + extension): to_disk(p, 'x.JSON', 'json') writes
    x.JSON.json there, and so does this (r7 ADVICE parity fix)."""
    if file_path.split(".")[-1] != extension:
        return f"{file_path}.{extension}"
    return file_path


def infer_file_format(file_path: str) -> str:
    """io/__io.py:153-174 — the last dot suffix, validated."""
    extension = file_path.split(".")[-1].lower()
    if extension not in SUPPORTED_FORMATS:
        raise RuntimeError(
            f"Unsupported file type with extension {extension}")
    return extension


def to_disk(profile: dict, file_path: str, format: str = "json") -> None:
    """io/__io.py:177-210 — write one profile as json (text) or mpf
    (binary proto3 wire format)."""
    _check_profile(profile)
    if format not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported file format {format} given.")
    file_path = add_extension_to_path(file_path, format)
    if format == "json":
        with open(file_path, "w") as out:
            out.write(json_io.to_json(profile))
    else:
        with open(file_path, "wb") as out:
            out.write(mpf.to_mpf(profile))


def from_disk(file_path: str, format: str = "infer") -> dict:
    """io/__io.py:213-250 — read one profile, inferring the format from
    the extension by default."""
    if format == "infer":
        format = infer_file_format(file_path)
    if format not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported file format {format} given.")
    if format == "json":
        with open(file_path) as fh:
            return json_io.from_json(fh.read())
    with open(file_path, "rb") as fh:
        return mpf.from_mpf(fh.read())
