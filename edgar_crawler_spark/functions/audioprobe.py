"""Container-level AUDIO probe — the audio twin of
``imaging.probe_video_header`` (same triage contract: answer "what
codecs do I hold and how many hours of each" from headers alone,
before committing to — or honestly stubbing — a decode pass).

Real audio corpora arrive as MP3 / FLAC / Ogg (Vorbis|Opus) / WAV;
only WAV is decodable here (stdlib), so the probe is what makes the
other three auditable at corpus scale. Pure struct/int bit-math over
container structure — no codec work, no external libraries.

Stub writers (``encode_mp3_stub`` / ``encode_flac_stub`` /
``encode_ogg_stub``) emit structurally valid headers with silent or
empty payloads as probe test fixtures; they make no decode claim,
exactly like ``imaging.encode_mp4_stub``.
"""

from __future__ import annotations

import struct

# MPEG-1/2/2.5 Layer III tables (ISO 11172-3 / 13818-3 header fields)
_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _mp3_frame(data: bytes, pos: int):
    """Parse an MPEG audio frame header at pos → (frame_len,
    sample_rate, samples_per_frame, bitrate_kbps, channels) or None."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3, _b4 = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version = (b2 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b2 >> 1) & 3  # 1=Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    rate = _MP3_RATES[version][sr_idx]
    kbps = (_MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3)[br_idx]
    padding = (b3 >> 1) & 1
    spf = 1152 if version == 3 else 576
    frame_len = spf // 8 * kbps * 1000 // rate + padding
    channels = 1 if ((data[pos + 3] >> 6) & 3) == 3 else 2
    return frame_len, rate, spf, kbps, channels


def _probe_mp3(data: bytes) -> dict:
    pos = 0
    if data[:3] == b"ID3":  # skip ID3v2 (syncsafe size)
        sz = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + sz
    # resync to the first valid frame
    first = None
    while pos + 4 <= len(data):
        first = _mp3_frame(data, pos)
        if first:
            break
        pos += 1
    if not first:
        raise ValueError("MP3: no valid frame header")
    frame_len, rate, spf, kbps, channels = first
    # Xing/Info VBR header: frame count without walking every frame.
    # Side-info size depends on the MPEG VERSION (spf 1152 = MPEG-1),
    # not just channel mode: MPEG-1 is 32/17 (stereo/mono), MPEG-2/2.5
    # Layer III is 17/9 — the old constant missed VBR tags in MPEG-2
    # files entirely.
    if spf == 1152:  # MPEG-1
        side = 32 if channels == 2 else 17
    else:  # MPEG-2 / 2.5
        side = 17 if channels == 2 else 9
    tag_at = pos + 4 + side
    n_frames = None
    has_tag = data[tag_at : tag_at + 4] in (b"Xing", b"Info")
    if has_tag:
        (flags,) = struct.unpack(">I", data[tag_at + 4 : tag_at + 8])
        if flags & 1:
            (n_frames,) = struct.unpack(">I", data[tag_at + 8 : tag_at + 12])
    if n_frames is None:  # CBR walk (bounded: header arithmetic per frame)
        n_frames = 0
        # a Xing/Info frame with no frame-count flag is still a TAG
        # frame, not audio — start counting after it
        p = pos + frame_len if has_tag else pos
        while True:
            fr = _mp3_frame(data, p)
            if not fr:
                break
            n_frames += 1
            p += fr[0]
    dur = n_frames * spf / rate if n_frames else None
    return {
        "container": "mp3",
        "codec": "mp3",
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n_frames * spf if n_frames else None,
        "duration_s": round(dur, 3) if dur else None,
        "bitrate_kbps": kbps,
    }


def _probe_flac(data: bytes) -> dict:
    if data[4:5] != b"\x00" and (data[4] & 0x7F) != 0:
        raise ValueError("FLAC: first metadata block is not STREAMINFO")
    si = data[8:42]  # STREAMINFO body (34 bytes)
    if len(si) < 34:
        raise ValueError("FLAC: truncated STREAMINFO")
    bits = int.from_bytes(si[10:18], "big")
    sample_rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    total = bits & ((1 << 36) - 1)
    if not sample_rate:
        raise ValueError("FLAC: zero sample rate")
    return {
        "container": "flac",
        "codec": "flac",
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": total or None,
        "duration_s": round(total / sample_rate, 3) if total else None,
        "bitrate_kbps": None,
    }


def _probe_ogg(data: bytes) -> dict:
    # first page payload identifies the codec
    nseg = data[26]
    body = 27 + nseg
    head = data[body : body + 16]
    if head[:7] == b"\x01vorbis":
        channels = data[body + 11]
        (sample_rate,) = struct.unpack("<I", data[body + 12 : body + 16])
        codec = "vorbis"
        pre_skip = 0
        gran_rate = sample_rate
    elif head[:8] == b"OpusHead":
        channels = data[body + 9]
        (pre_skip,) = struct.unpack("<H", data[body + 10 : body + 12])
        (sample_rate,) = struct.unpack("<I", data[body + 12 : body + 16])
        codec = "opus"
        gran_rate = 48000  # Opus granulepos is always 48 kHz
    else:
        raise ValueError("Ogg: unrecognized codec packet")
    last = data.rfind(b"OggS")
    (granule,) = struct.unpack("<q", data[last + 6 : last + 14])
    n = max(granule - pre_skip, 0) if granule > 0 else 0
    return {
        "container": "ogg",
        "codec": codec,
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": n or None,
        "duration_s": round(n / gran_rate, 3) if n else None,
        "bitrate_kbps": None,
    }


def _probe_wav(data: bytes) -> dict:
    pos = 12
    sample_rate = channels = bits = None
    data_len = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt ":
            channels, sample_rate = struct.unpack("<HI", data[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", data[pos + 22 : pos + 24])
        elif tag == b"data":
            data_len = size
        pos += 8 + size + (size % 2)
    if not sample_rate:
        raise ValueError("WAV: no fmt chunk")
    n = (
        data_len // (channels * max(bits // 8, 1))
        if data_len and channels and bits
        else None
    )
    return {
        "container": "wav",
        "codec": f"pcm{bits}" if bits else "pcm",
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": n,
        "duration_s": round(n / sample_rate, 3) if n else None,
        "bitrate_kbps": None,
    }


def probe_audio_header(data: bytes) -> dict:
    """Audio container probe: (container, codec, sample_rate, channels,
    n_samples, duration_s, bitrate_kbps) from header structure alone.
    WAV/RIFF, FLAC (STREAMINFO), Ogg (Vorbis/Opus, duration from the
    last page's granulepos), MP3 (frame-header walk; Xing/Info VBR
    frame count honored; ID3v2 skipped). Raises ValueError otherwise."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _probe_wav(data)
    if data[:4] == b"fLaC":
        return _probe_flac(data)
    if data[:4] == b"OggS":
        return _probe_ogg(data)
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return _probe_mp3(data)
    raise ValueError("not a recognized audio container (WAV/FLAC/Ogg/MP3)")


# ---------------------------------------------------------------- fixtures


def encode_mp3_stub(
    n_frames: int = 38, sample_rate: int = 44100, kbps: int = 128, channels: int = 2
) -> bytes:
    """Structurally valid CBR MPEG-1 Layer III stream: real frame
    headers, zeroed payloads (no decode claim — probe fixture only)."""
    sr_idx = _MP3_RATES[3].index(sample_rate)
    br_idx = _MP3_BITRATES_V1L3.index(kbps)
    chan_bits = 0xC0 if channels == 1 else 0x00
    frame_len = 1152 // 8 * kbps * 1000 // sample_rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), chan_bits])
    return (hdr + b"\x00" * (frame_len - 4)) * n_frames


def encode_flac_stub(
    sample_rate: int = 22050, channels: int = 1, n_samples: int = 44100
) -> bytes:
    """fLaC signature + last-metadata STREAMINFO block, no frames."""
    bits_per_sample = 16
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | n_samples
    )
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 3  # min framesize (24-bit)
        + b"\x00" * 3  # max framesize (24-bit)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def encode_ogg_stub(
    codec: str = "opus",
    sample_rate: int = 48000,
    channels: int = 2,
    n_samples: int = 96000,
    pre_skip: int = 312,
) -> bytes:
    """Two Ogg pages: an identification page (OpusHead or Vorbis ident
    packet) and a terminal page whose granulepos encodes the length.
    Page CRCs are zeroed — the probe reads structure, not checksums."""
    if codec == "opus":
        ident = (
            b"OpusHead"
            + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + struct.pack("<hB", 0, 0)
        )
        granule = n_samples + pre_skip
    else:
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", 0, 128000, 0)
            + bytes([0xB8, 0x01])
        )
        granule = n_samples
        pre_skip = 0

    def page(granulepos: int, seq: int, payload: bytes, header_type: int) -> bytes:
        return (
            b"OggS"
            + bytes([0, header_type])
            + struct.pack("<q", granulepos)
            + struct.pack("<III", 1, seq, 0)
            + bytes([1, len(payload)])
            + payload
        )

    return page(0, 0, ident, 0x02) + page(granule, 1, b"\x00", 0x04)
