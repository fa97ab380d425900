"""Error taxonomy (SURVEY.md §2 M16 — semantics of reference
anomalydetection/errors.py: stable error codes, message↔code matching,
exceptions always degrade to Unknown verdicts rather than failing the
run)."""

from __future__ import annotations

from enum import Enum


class ErrorCode(str, Enum):
    NOT_ENOUGH_DATA = "NOT_ENOUGH_DATA"
    EMPTY_HISTORY = "EMPTY_HISTORY"
    MODEL_FIT_FAILED = "MODEL_FIT_FAILED"
    MISSING_COLUMN = "MISSING_COLUMN"
    INVALID_CONFIG = "INVALID_CONFIG"
    TABLE_NOT_FOUND = "TABLE_NOT_FOUND"
    PERMISSION_DENIED = "PERMISSION_DENIED"
    TIMEOUT = "TIMEOUT"
    STORE_WRITE_FAILED = "STORE_WRITE_FAILED"
    SCHEMA_MISMATCH = "SCHEMA_MISMATCH"
    UNKNOWN_ERROR = "UNKNOWN_ERROR"


_MESSAGE_MARKERS: list[tuple[str, ErrorCode]] = [
    ("not enough", ErrorCode.NOT_ENOUGH_DATA),
    ("insufficient", ErrorCode.NOT_ENOUGH_DATA),
    ("empty history", ErrorCode.EMPTY_HISTORY),
    ("no commits", ErrorCode.EMPTY_HISTORY),
    ("fit", ErrorCode.MODEL_FIT_FAILED),
    ("converge", ErrorCode.MODEL_FIT_FAILED),
    ("column", ErrorCode.MISSING_COLUMN),
    ("config", ErrorCode.INVALID_CONFIG),
    ("not found", ErrorCode.TABLE_NOT_FOUND),
    ("permission", ErrorCode.PERMISSION_DENIED),
    ("denied", ErrorCode.PERMISSION_DENIED),
    ("timeout", ErrorCode.TIMEOUT),
    ("timed out", ErrorCode.TIMEOUT),
    ("write", ErrorCode.STORE_WRITE_FAILED),
    ("schema", ErrorCode.SCHEMA_MISMATCH),
]

ERROR_MESSAGE_CLIP = 500  # reference freshness_info.py:213


def match_error_message_to_code(message: str | None) -> ErrorCode:
    if not message:
        return ErrorCode.UNKNOWN_ERROR
    low = message.lower()
    for marker, code in _MESSAGE_MARKERS:
        if marker in low:
            return code
    return ErrorCode.UNKNOWN_ERROR


def clip_error_message(message: str | None) -> str | None:
    if message is None:
        return None
    return message[:ERROR_MESSAGE_CLIP]
