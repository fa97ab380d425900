"""From-scratch GIF decoder (and fixture encoder) in pure
numpy/stdlib — the multimodal layer's third genuinely COMPRESSED
format after zlib-inflated PNG and baseline JPEG.

Decode path (``parse_gif``): GIF87a/GIF89a header, logical screen
descriptor, global/local color tables, extension-block skipping, the
first image descriptor (interlaced or sequential), and a real
variable-code-width LZW decompressor (2..12-bit codes, CLEAR/EOI
handling, 4096-entry dictionary with the deferred-clear rule). Output
contract matches the other image codecs: ``(width, height,
pixels[3wh] uint8)`` after palette mapping, or ``None`` for anything
malformed — callers fall back to the metadata stub, never crash.

Encoder (``encode_gif``) is a REAL LZW compressor (greedy
longest-match dictionary, the standard encoder-side +1 width-bump
offset, CLEAR emission at dictionary overflow), so planted fixtures
exercise genuine decompression; an ``interlace=True`` mode writes the
four-pass row order to exercise the deinterlacer.

The width-synchronization subtlety, pinned here because it is easy to
break: the decoder bumps its code width after ITS dictionary reaches
``2^width`` entries, but the decoder's dictionary trails the encoder's
by exactly one entry at every emission point — so the encoder bumps
when its next free code reaches ``2^width + 1``.

No reference analog: the reference engine
(erddantas/anomaly_detection) contains no media code at all; format
layout follows the public GIF89a specification.
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_gif", "encode_gif"]

# Decode budget: LZW is an interpreted-Python per-code loop (like the
# PNG unfilter bound) — cap pixels so one oversized asset degrades to
# metadata-only instead of stalling an executor task.
_GIF_MAX_PIXELS = 4_000_000

_MAX_CODE = 1 << 12  # GIF LZW dictionary is hard-capped at 4096 codes


def _u16(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8)


def _skip_subblocks(b: bytes, i: int) -> int | None:
    """Advance past a sub-block chain (len byte + payload, 0-terminated)."""
    n = len(b)
    while i < n:
        ln = b[i]
        i += 1
        if ln == 0:
            return i
        i += ln
    return None


def _collect_subblocks(b: bytes, i: int) -> tuple[bytes, int] | None:
    n = len(b)
    parts = []
    while i < n:
        ln = b[i]
        i += 1
        if ln == 0:
            return b"".join(parts), i
        if i + ln > n:
            return None
        parts.append(b[i : i + ln])
        i += ln
    return None


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray | None:
    """GIF variable-width LZW: returns exactly ``n_expected`` palette
    indices or None. Codes are packed LSB-first; width starts at
    ``min_code_size + 1`` and grows to 12; at 4096 entries the table
    freezes until the stream sends CLEAR (deferred-clear rule)."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n:
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = []
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return None  # hit EOI before producing every pixel
        if code < clear:
            entry = base[code]
        elif code < next_code:
            entry = table[code - eoi - 1]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) != n_expected:
        return None
    return np.frombuffer(bytes(out), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Row indices in GIF interlace transmission order."""
    return [y for start, step in _INTERLACE_PASSES for y in range(start, height, step)]


def parse_gif(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode the FIRST image of a GIF87a/GIF89a payload to
    ``(width, height, rgb[3wh] uint8)``; None for anything malformed,
    truncated, paletted-out-of-range, or past the pixel budget."""
    if not payload or len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = payload[10]
    i = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        ncol = 2 << (flags & 0x07)
        if i + 3 * ncol > len(payload):
            return None
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * ncol, offset=i)
        i += 3 * ncol
    n = len(payload)
    while i < n:
        marker = payload[i]
        if marker == 0x3B:  # trailer before any image
            return None
        if marker == 0x21:  # extension: label byte, then sub-blocks
            nxt = _skip_subblocks(payload, i + 2)
            if nxt is None:
                return None
            i = nxt
            continue
        if marker != 0x2C:  # image descriptor
            return None
        if i + 10 > n:
            return None
        w, h = _u16(payload, i + 5), _u16(payload, i + 7)
        iflags = payload[i + 9]
        i += 10
        ct = gct
        if iflags & 0x80:
            ncol = 2 << (iflags & 0x07)
            if i + 3 * ncol > n:
                return None
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * ncol, offset=i)
            i += 3 * ncol
        if ct is None or w <= 0 or h <= 0 or w * h > _GIF_MAX_PIXELS or i >= n:
            return None
        min_code_size = payload[i]
        collected = _collect_subblocks(payload, i + 1)
        if collected is None:
            return None
        data, _ = collected
        idx = _lzw_decode(data, min_code_size, w * h)
        if idx is None:
            return None
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = idx.reshape(h, w)
            out = np.empty_like(rows)
            out[_interlace_order(h)] = rows
            idx = out.reshape(-1)
        ncol = len(ct) // 3
        if int(idx.max(initial=0)) >= ncol:
            return None
        px = ct.reshape(-1, 3)[idx].reshape(-1)
        return w, h, px
    return None


# ---------- fixture encoder ----------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real greedy-LZW compressor emitting decoder-compatible
    variable-width codes (see module docstring for the +1 width-bump
    offset); resets with CLEAR when the dictionary hits 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    s = b""
    for v in indices.tolist():
        c = bytes([v])
        if s + c in table:
            s += c
            continue
        emit(table[s], width)
        table[s + c] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == _MAX_CODE + 1:
            emit(clear, width)
            table = {bytes([k]): k for k in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = c
    if s:
        emit(table[s], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: np.ndarray,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Spec-valid single-image GIF89a from palette indices.

    ``palette`` is 3·2^n bytes (n in 1..8); every index must be under
    the palette size. ``interlace=True`` writes rows in the four-pass
    order with the interlace flag set."""
    ncol = len(palette) // 3
    if ncol * 3 != len(palette) or ncol & (ncol - 1) or not 2 <= ncol <= 256:
        raise ValueError(f"palette must be 3*2^n bytes (n in 1..8), got {len(palette)}")
    idx = np.asarray(indices, dtype=np.uint8).reshape(-1)
    if idx.size != width * height:
        raise ValueError(f"need {width * height} indices, got {idx.size}")
    if idx.size and int(idx.max()) >= ncol:
        raise ValueError("index out of palette range")
    bits = max(2, (ncol - 1).bit_length())
    if interlace:
        idx = idx.reshape(height, width)[_interlace_order(height)].reshape(-1)

    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT present, 2^bits entries
    out += b"\x00\x00"  # background index, aspect
    out += palette + b"\x00" * (3 * (1 << bits) - len(palette))
    out.append(0x2C)  # image descriptor
    out += b"\x00\x00\x00\x00" + width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    out.append(bits)  # LZW minimum code size
    data = _lzw_encode(idx, bits)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
