"""GIF87a/GIF89a pixel decode with the stdlib + numpy only — the
animated-frame container that turns :mod:`multimodal`'s frame-sampling
plumbing into REAL video-style decode (1 input row → N composed
frames), the way PNG/JPEG/WAV already anchor the image/audio surface.

Implements the public GIF89a specification (CompuServe 1990 / W3C
copy) end-to-end:

- logical screen descriptor + global color table,
- graphic-control extensions (frame delay, transparency index,
  disposal method 0-3),
- image descriptors with local color tables and the 4-pass row
  interlace (§appendix E),
- the variable-width LZW decompressor (§appendix F): codes packed
  LSB-first, CLEAR/EOI handling including mid-stream clears and the
  deferred-clear case where a full 4096-entry table keeps emitting
  12-bit codes,
- frame composition onto the logical-screen canvas: disposal 0/1
  leave the region, 2 restores the region to the background color,
  3 restores the pre-draw canvas; transparent pixels never touch the
  canvas.

Reference parity: the reference pipeline (`/root/reference/
01_source_me.R`) has no binary-media surface at all — this module is
part of the mandated beyond-the-reference multimodal extension, like
operators/jpeg.py. Decode is strict: malformed containers raise
``ValueError`` rather than guessing (the production contract of
decode_image_real).
"""

from __future__ import annotations

import struct

import numpy as np

#: GIF interlace passes (GIF89a appendix E): (first_row, row_step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12


class GifResourceCap(ValueError):
    """A structurally valid GIF refused because decoding it would
    exceed an allocation cap (canvas pixels or total composed frame
    pixels) — distinct from malformed input.  Tolerant crawl-ingest
    wrappers catch this BY TYPE to classify ``resource_cap`` vs
    ``malformed`` (r13 advisor finding: substring-matching the
    message meant any rewording silently reclassified rows).
    Subclasses ``ValueError`` so strict callers' contracts are
    unchanged."""

#: default canvas sanity cap for :func:`decode_gif_frames` — a crafted
#: 13-byte header can claim 65535x65535 (a ~12.9 GB RGB allocation per
#: payload row); untrusted corpus decode must bound the allocation
#: BEFORE trusting the header, consistent with the strict-raise
#: contract (raises ValueError, never over-allocates).
MAX_PIXELS = 16 * 1024 * 1024

#: default cap on TOTAL decoded pixels across all composed frames of
#: one animation (r12 advisor finding): decode_gif_frames appends a
#: canvas COPY per frame, so a near-cap canvas (16M px ≈ 48 MB RGB)
#: with thousands of few-byte frames would otherwise amplify a tiny
#: payload into tens of GB of frame copies. 8× the canvas cap allows
#: any legitimate animation up to ~128M composed pixels (e.g. a full
#: 1080p canvas × ~64 frames) while bounding the allocation at
#: ~384 MB per payload row.
MAX_TOTAL_PIXELS = 8 * MAX_PIXELS


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW (spec appendix F): variable code width starting
    at ``min_code_size + 1``, growing when the NEXT code to be
    assigned would not fit, capped at 12 bits (deferred clear: a full
    table keeps the width at 12 until a CLEAR arrives — or never).
    Returns exactly ``n_pixels`` index bytes; short or corrupt
    streams raise."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream ended before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _MAX_CODE_WIDTH):
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < (1 << _MAX_CODE_WIDTH):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        prev = entry
        if (
            len(table) == (1 << width)
            and width < _MAX_CODE_WIDTH
        ):
            width += 1
        if len(out) >= n_pixels:
            if len(out) > n_pixels:
                raise ValueError(
                    f"GIF: LZW produced {len(out)} pixels for a "
                    f"{n_pixels}-pixel image"
                )
            # image complete: only CLEAR codes, EOI, or bit padding may
            # remain — a further pixel-producing code means the stream
            # is corrupt (the overlong mirror of the short-stream raise)
            while True:
                while nbits < width:
                    if pos >= len(data):
                        return bytes(out)  # padding-only tail
                    acc |= data[pos] << nbits
                    nbits += 8
                    pos += 1
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == eoi:
                    return bytes(out)
                if code == clear:
                    width = min_code_size + 1
                    continue
                raise ValueError(
                    "GIF: LZW pixel data past image size"
                )
    raise ValueError(
        f"GIF: LZW produced {len(out)} of {n_pixels} pixels"
    )


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns
    (data, position after the 0x00 terminator)."""
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError("GIF: truncated data sub-block")
        parts.append(payload[pos : pos + n])
        pos += n
    return b"".join(parts), pos


def _color_table(payload: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(field+1) entries
    end = pos + 3 * n
    if end > len(payload):
        raise ValueError("GIF: truncated color table")
    tab = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(n, 3)
    return tab, end


def decode_gif_frames(
    payload: bytes,
    *,
    max_pixels: int = MAX_PIXELS,
    max_total_pixels: int = MAX_TOTAL_PIXELS,
):
    """Full decode of a (possibly animated) GIF → ``(width, height,
    frames)`` where ``frames`` is a list of ``(delay_ms, pixels)``
    with ``pixels`` a ``(height, width, 3)`` uint8 RGB array of the
    COMPOSED logical-screen canvas after that frame renders — the
    thing a video frame-sampler samples.

    Allocation is bounded on BOTH axes of untrusted input: the canvas
    by ``max_pixels`` (checked before trusting the header) and the
    frame-copy total by ``max_total_pixels`` (each frame appends a
    canvas copy, so frame COUNT is the second amplification axis —
    a near-cap canvas with thousands of tiny frames raises here
    instead of allocating ~48 MB per frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    if len(payload) < 13:
        raise ValueError("GIF: truncated header")
    w, h = struct.unpack("<HH", payload[6:10])
    if w * h > max_pixels:
        raise GifResourceCap(
            f"GIF: logical screen {w}x{h} exceeds the {max_pixels}"
            "-pixel decode cap"
        )
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(payload, pos, packed & 0x07)

    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb

    frames: list[tuple[int, np.ndarray]] = []
    total_px = 0
    # pending graphic-control state (applies to the next image)
    delay_ms = 0
    transparent: int | None = None
    disposal = 0

    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("GIF: short graphic control block")
                flags = data[0]
                delay_ms = struct.unpack("<H", data[1:3])[0] * 10
                transparent = data[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")

        # ---- image descriptor
        if pos + 9 > len(payload):
            raise ValueError("GIF: truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        if left + fw > w or top + fh > h:
            raise ValueError("GIF: frame exceeds logical screen")
        lct = None
        if ipacked & 0x80:
            lct, pos = _color_table(payload, pos, ipacked & 0x07)
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("GIF: no color table for frame")
        if pos >= len(payload):
            raise ValueError("GIF: missing LZW min code size")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF: bad LZW min code size {min_code}")
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, fw * fh), dtype=np.uint8
        )
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")

        if ipacked & 0x40:  # interlaced: reorder rows into place
            rows = idx.reshape(fh, fw)
            ordered = np.empty_like(rows)
            src = 0
            for first, step in _INTERLACE_PASSES:
                for r in range(first, fh, step):
                    ordered[r] = rows[src]
                    src += 1
            idx = ordered.reshape(-1)

        grid = idx.reshape(fh, fw)
        region = canvas[top : top + fh, left : left + fw]
        saved = region.copy() if disposal == 3 else None
        rgb = pal[grid]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        total_px += w * h
        if total_px > max_total_pixels:
            raise GifResourceCap(
                f"GIF: total decoded pixels across {len(frames) + 1} "
                f"frames exceed the {max_total_pixels}-pixel cap"
            )
        frames.append((delay_ms, canvas.copy()))

        if disposal == 2:
            region[:, :] = bg_rgb
        elif disposal == 3:
            region[:, :] = saved
        delay_ms, transparent, disposal = 0, None, 0

    if not frames:
        raise ValueError("GIF: no image frames")
    return w, h, frames
