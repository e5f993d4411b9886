"""DuckDB oracle for the multimodal feature-extraction plumbing.

The codec is a documented stub (operators/multimodal.py::_fake_decode):
features[i] = float32(uint32_le(sha256(payload)[4i:4i+4])) / 2**32.
That is exactly replayable in SQL: DuckDB's sha256() returns the lowercase
hex digest of the UTF-8 bytes (same bytes as Spark's encode(text,'utf-8')),
each little-endian uint32 is reassembled from hex pairs, the float32
rounding is CAST AS REAL (IEEE round-to-nearest, identical to
numpy .astype(float32)), and the division by 2**32 is exact (power of two).
The engine's feat_sum left-folds the 8 doubles in array order
(F.aggregate) — mirrored by an explicit left-nested addition chain.
"""

from __future__ import annotations

FEATURE_DIM = 8


def _nib(expr: str) -> str:
    """hex char -> 0..15 (sha256 output is lowercase)."""
    return f"(strpos('0123456789abcdef', {expr}) - 1)"


def _byte(i: int) -> str:
    """i-th byte (0-based) of the digest, from hex chars 2i+1, 2i+2."""
    hi = _nib(f"substr(h, {2 * i + 1}, 1)")
    lo = _nib(f"substr(h, {2 * i + 2}, 1)")
    return f"({hi} * 16 + {lo})"


def _feature(i: int) -> str:
    """float32(uint32_le(bytes[4i:4i+4])) / 2**32, widened to double."""
    b0, b1, b2, b3 = (_byte(4 * i + j) for j in range(4))
    u32 = (
        f"(CAST({b0} AS BIGINT) + CAST({b1} AS BIGINT) * 256 + "
        f"CAST({b2} AS BIGINT) * 65536 + CAST({b3} AS BIGINT) * 16777216)"
    )
    return f"(CAST(CAST({u32} AS REAL) AS DOUBLE) / 4294967296.0)"


def _feat_sum() -> str:
    expr = _feature(0)
    for i in range(1, FEATURE_DIM):
        expr = f"({expr} + {_feature(i)})"
    return expr


ORACLE_MULTIMODAL = f"""
WITH hashed AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(length(text) AS INT) AS n_bytes,
           sha256(text) AS h
    FROM documents
)
SELECT doc_id, media_type, n_bytes,
       round({_feat_sum()}, 6) AS feat_sum
FROM hashed
"""
