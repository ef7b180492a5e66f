"""Shared helpers for the measurement tools.

One copy of the order-independent result checksum: the formula
changed once already (r10 ADVICE moved it from bare sorted values to
(name, value) pairs so cross-column drift can't checksum
identically), and two diverged copies would make decade_check and
pl09_bucket_ab silently emit incomparable checksums for the same
result set (r11 review).
"""

from __future__ import annotations

import hashlib


def row_set_checksum(rows) -> str:
    """Order-independent checksum over a collected row SET, hashed
    WITH column names attached. md5, not Python hash(): hash() is
    salted per process (PYTHONHASHSEED), which would defeat the
    cross-run comparison these tools exist for. Formula changed in
    r11 (names attached) — checksums recorded before then used the
    bare sorted-values form and are not comparable."""
    s = sum(
        int.from_bytes(
            hashlib.md5(
                str(sorted((k, str(v)) for k, v in r.asDict().items())).encode()
            ).digest()[:4],
            "big",
        )
        for r in rows
    )
    return f"{s & 0xFFFFFFFF:#010x}"
