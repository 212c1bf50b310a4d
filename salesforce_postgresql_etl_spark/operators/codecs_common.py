"""Shared contract for the pure-Python media parsers.

Every ``decode_*`` documents "malformed input raises ``ValueError``",
and every dispatch site (``_decode_payload`` / ``_resize_payload`` /
``sample_frames`` in ``operators/multimodal.py``) implements the
fake-mode never-raises stub contract by catching exactly
``ValueError``. A truncation path that instead surfaces
``IndexError`` or ``struct.error`` therefore crashes a whole Arrow
batch — and the Spark job — on one bad payload even in fake mode
(r7 review finding). ``parser_boundary`` closes the class at the
function boundary instead of chasing each unguarded read."""

from __future__ import annotations

import functools
import struct


def parser_boundary(fn):
    """Re-raise the honest truncation/short-read exception classes a
    byte parser can hit (IndexError from ``data[pos]``, struct.error
    from ``unpack_from`` past the end) as the documented ValueError.
    Genuine logic bugs still surface — as a ValueError naming the
    original error, which the codec test suites would catch."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (IndexError, struct.error) as e:
            raise ValueError(
                f"malformed {fn.__name__.replace('decode_', '')} payload: "
                f"{e}"
            ) from e

    return wrapper
