"""Image-container metadata scrub + inject (struct-level, no recode).

Crawled images carry privacy-sensitive metadata — EXIF GPS/device tags
(JPEG APP1), editor comments (JPEG COM, GIF comment extensions), PNG
text/time chunks. A training-data pipeline strips these WITHOUT
re-encoding: the entropy-coded pixel data is byte-identical before and
after, so the scrub is lossless, cheap (pure segment surgery), and
safe at any quality level — unlike a decode/re-encode pass.

``strip_image_metadata`` dispatches on magic bytes and returns the
scrubbed blob plus the labels of removed segments. The ``add_*``
helpers write the same segments (synthetic EXIF, comments, tEXt) so
tests and fixtures can exercise the scrub against realistic streams.

Kept segments per container:
* JPEG — everything structural plus APP0 (JFIF); APP1..APP15 and COM
  are dropped. The scan walks only the header region (SOI → SOS);
  entropy data is copied verbatim.
* PNG — IHDR, PLTE, IDAT, IEND, tRNS, gAMA, sRGB (pixel/rendering
  affecting); tEXt/zTXt/iTXt/tIME/eXIf/pHYs etc. are dropped.
* GIF — comment (0xFE) and plain-text (0x01) extensions are dropped;
  application extensions are dropped EXCEPT NETSCAPE2.0 (loop count is
  playback behavior, not metadata). Frames and control blocks are
  copied verbatim.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_KEEP = {b"IHDR", b"PLTE", b"IDAT", b"IEND", b"tRNS", b"gAMA", b"sRGB"}
_GIF_SIGS = (b"GIF87a", b"GIF89a")
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}  # TEM, RST0-7 (no length)


# --------------------------------------------------------------------------
# JPEG


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(b"\xff\xd8")
    removed: list[str] = []
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows — copy the rest
            out += data[pos:]
            return bytes(out), removed
        if marker in _JPEG_STANDALONE or marker == 0xD9:
            out += data[pos : pos + 2]
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos : pos + 2 + length]
        if 0xE1 <= marker <= 0xEF:
            removed.append(f"APP{marker - 0xE0}")
        elif marker == 0xFE:
            removed.append("COM")
        else:
            out += seg
        pos += 2 + length
    raise ValueError("JPEG: no SOS marker")


def add_jpeg_app1_exif(data: bytes, payload: bytes) -> bytes:
    """Insert a synthetic EXIF APP1 segment right after SOI."""
    body = b"Exif\x00\x00" + payload
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return data[:2] + seg + data[2:]


def add_jpeg_comment(data: bytes, text: str) -> bytes:
    body = text.encode()
    seg = b"\xff\xfe" + struct.pack(">H", len(body) + 2) + body
    return data[:2] + seg + data[2:]


# --------------------------------------------------------------------------
# PNG


def strip_png_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = bytearray(_PNG_SIG)
    removed: list[str] = []
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos : pos + 12 + length]
        if tag in _PNG_KEEP:
            out += chunk
        else:
            removed.append(tag.decode("latin-1"))
        if tag == b"IEND":
            break
        pos += 12 + length
    return bytes(out), removed


def add_png_text(data: bytes, key: str, value: str) -> bytes:
    """Insert a tEXt chunk right after IHDR (25 bytes in)."""
    payload = key.encode() + b"\x00" + value.encode()
    chunk = (
        struct.pack(">I", len(payload))
        + b"tEXt"
        + payload
        + struct.pack(">I", zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF)
    )
    at = 8 + 12 + 13  # signature + IHDR chunk
    return data[:at] + chunk + data[at:]


# --------------------------------------------------------------------------
# GIF


def _gif_header_end(data: bytes) -> int:
    packed = data[10]
    end = 13
    if packed & 0x80:
        end += 3 * (2 << (packed & 0x07))
    return end


def strip_gif_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    end = _gif_header_end(data)
    out = bytearray(data[:end])
    removed: list[str] = []
    pos = end

    def sub_blocks_end(p: int) -> int:
        while data[p] != 0:
            p += 1 + data[p]
        return p + 1

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            out.append(0x3B)
            break
        if block == 0x21:
            label = data[pos + 1]
            p = pos + 2
            if label in (0x01, 0xFF):
                p += 1 + data[p]  # fixed-size header sub-block
            p = sub_blocks_end(p)
            if label == 0xFE:
                removed.append("comment")
            elif label == 0x01:
                removed.append("plaintext")
            elif label == 0xFF:
                app = data[pos + 3 : pos + 3 + 11]
                if app == b"NETSCAPE2.0":  # looping is behavior, keep
                    out += data[pos:p]
                else:
                    removed.append("app:" + app.decode("latin-1", "replace").strip())
            else:
                out += data[pos:p]  # graphic control etc.
            pos = p
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        p = pos + 10
        if data[pos + 9] & 0x80:  # local color table
            p += 3 * (2 << (data[pos + 9] & 0x07))
        p += 1  # LZW min code size
        p = sub_blocks_end(p)
        out += data[pos:p]
        pos = p
    return bytes(out), removed


def add_gif_comment(data: bytes, text: str) -> bytes:
    body = text.encode()
    blocks = bytearray(b"\x21\xfe")
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    at = _gif_header_end(data)
    return data[:at] + bytes(blocks) + data[at:]


# --------------------------------------------------------------------------
# Dispatch


def strip_image_metadata(data: bytes) -> tuple[bytes, list[str]]:
    """Magic-byte dispatch → (scrubbed bytes, removed segment labels).
    Containers with no metadata concept (QNT stand-in, BMP's fixed
    header) pass through unchanged with an empty removed list."""
    if data[:2] == b"\xff\xd8":
        return strip_jpeg_metadata(data)
    if data[:8] == _PNG_SIG:
        return strip_png_metadata(data)
    if data[:6] in _GIF_SIGS:
        return strip_gif_metadata(data)
    if data[:2] == b"BM" or data[:4] == b"QNT1":
        return data, []
    raise ValueError("unknown image container")
