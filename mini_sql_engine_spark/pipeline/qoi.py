"""Stdlib-only QOI codec — the second REAL image decode path beside
``pipeline.png`` (VERDICT r11 #8: "either a pure-python baseline-JPEG
(or QOI) decoder with a replay pytest beside PNG-8, or a recorded
decision").

QOI ("Quite OK Image", qoiformat.org — public spec, one page) is the
container-constrained sweet spot: byte-oriented, no entropy coder, no
DCT, decodable in ~80 lines of pure Python with zero dependencies —
yet it is a genuine production format (raylib, SDL_image, stb ship
it). Supporting it means the multimodal kernel now decodes TWO real
compressed formats, exercising different codec shapes: PNG's
filter-then-DEFLATE pipeline and QOI's pixel-op stream
(run-length / seen-pixel index / channel deltas).

Spec recap (all of it): 14-byte header ``qoif`` + width/height (u32
BE) + channels (3|4) + colorspace; then a stream of ops —
``QOI_OP_RGB`` (0xFE + 3 bytes), ``QOI_OP_RGBA`` (0xFF + 4),
``QOI_OP_INDEX`` (0b00 + 6-bit index into a 64-slot array of
previously seen pixels, hash (3r+5g+7b+11a) % 64), ``QOI_OP_DIFF``
(0b01 + three 2-bit channel deltas, bias 2), ``QOI_OP_LUMA`` (0b10 +
6-bit dg bias 32, then dr-dg / db-dg 4-bit bias 8), ``QOI_OP_RUN``
(0b11 + 6-bit run length bias -1, 62 max); previous pixel starts at
(0,0,0,255); 7×0x00 + 0x01 end marker. Every decoded pixel is stored
into the index slot its hash names.

Scale note: like ``pipeline.png`` this runs inside Arrow-batched
``mapInPandas`` workers — a slow-but-exact reference kernel with the
same ``(width, height, channels, pixels)`` contract the production
swap-in (stb_image via Pillow plugin, or a C extension) keeps.
"""

from __future__ import annotations

import struct

_QOI_MAGIC = b"qoif"
_END_MARKER = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00  # 0b00xxxxxx
_OP_DIFF = 0x40   # 0b01xxxxxx
_OP_LUMA = 0x80   # 0b10xxxxxx
_OP_RUN = 0xC0    # 0b11xxxxxx
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def is_qoi(data: bytes) -> bool:
    return data is not None and data[:4] == _QOI_MAGIC


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a QOI image → ``(width, height, channels, pixels)``,
    ``pixels`` row-major interleaved 8-bit samples — the same
    contract as :func:`pipeline.png.decode_png`."""
    if not is_qoi(data):
        raise ValueError("not a QOI image: bad magic")
    if len(data) < 14 + len(_END_MARKER):
        raise ValueError("truncated QOI: shorter than header + end marker")
    width, height = struct.unpack(">II", data[4:12])
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI colorspace must be 0 or 1, got {colorspace}")
    if data[-8:] != _END_MARKER:
        raise ValueError("truncated QOI: missing end marker")

    n_px = width * height
    # plausibility guard BEFORE allocating: one op byte decodes at
    # most 62 pixels (QOI_OP_RUN), so a crafted header claiming huge
    # dimensions over a tiny op stream must be rejected rather than
    # attempting a multi-exabyte bytearray in the worker
    max_px = (len(data) - 14 - 8) * 62
    if n_px > max_px:
        raise ValueError(
            f"QOI dimensions implausible: {width}x{height} needs "
            f"{n_px} pixels but the op stream can encode at most "
            f"{max_px}")
    out = bytearray(n_px * channels)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, px = 14, 0
    end = len(data) - 8
    while px < n_px:
        if pos >= end:
            raise ValueError("truncated QOI: op stream ended early")
        byte = data[pos]
        pos += 1
        # operand reads are bounds-checked against the op-stream end:
        # without this a truncated stream silently decodes end-marker
        # zero bytes as pixel samples instead of raising
        if byte == _OP_RGB:
            if pos + 3 > end:
                raise ValueError("truncated QOI: RGB op cut short")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("truncated QOI: RGBA op cut short")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((byte >> 4) & 0x03) - 2) & 0xFF
                g = (g + ((byte >> 2) & 0x03) - 2) & 0xFF
                b = (b + (byte & 0x03) - 2) & 0xFF
            elif tag == _OP_LUMA:
                if pos >= end:
                    raise ValueError("truncated QOI: LUMA op cut short")
                dg = (byte & 0x3F) - 32
                second = data[pos]
                pos += 1
                r = (r + dg + ((second >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (second & 0x0F) - 8) & 0xFF
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                # the reference decoder stores index[hash(px)] for a
                # RUN chunk too (qoi.h keeps the store outside the op
                # dispatch) — matters for the implicit first pixel
                # (0,0,0,255), which a foreign encoder may legally
                # reference via QOI_OP_INDEX 53 after an opening run
                # (ADVICE r12); all run pixels are identical, so one
                # store is the loop's fixed point
                index[_hash(r, g, b, a)] = (r, g, b, a)
                for _ in range(run):
                    if px >= n_px:
                        raise ValueError("QOI run overflows pixel count")
                    o = px * channels
                    out[o] = r
                    out[o + 1] = g
                    out[o + 2] = b
                    if channels == 4:
                        out[o + 3] = a
                    px += 1
                continue  # index already stored above; skip px emit
        index[_hash(r, g, b, a)] = (r, g, b, a)
        o = px * channels
        out[o] = r
        out[o + 1] = g
        out[o + 2] = b
        if channels == 4:
            out[o + 3] = a
        px += 1
    return width, height, channels, bytes(out)


def encode_qoi(width: int, height: int, channels: int,
               pixels: bytes) -> bytes:
    """Encode row-major interleaved 8-bit samples as QOI, using the
    full op set (run / index / diff / luma / rgb / rgba) so a decode
    replay exercises every decoder branch."""
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    out = bytearray(_QOI_MAGIC)
    out += struct.pack(">IIBB", width, height, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    n_px = width * height
    for px in range(n_px):
        o = px * channels
        r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
        a = pixels[o + 3] if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62 or px == n_px - 1:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        h = _hash(r, g, b, a)
        if index[h] == (r, g, b, a):
            out.append(_OP_INDEX | h)
        elif a != pa:
            out.append(_OP_RGBA)
            out += bytes((r, g, b, a))
        else:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out.append(_OP_RGB)
                out += bytes((r, g, b))
        index[h] = (r, g, b, a)
        pr, pg, pb, pa = r, g, b, a
    out += _END_MARKER
    return bytes(out)
