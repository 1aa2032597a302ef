"""WebP lossless (VP8L) codec tests — feature-matrix round-trips plus
hand-assembled streams that pin the bit layout to the spec (RFC 9649)
rather than to our own encoder's habits."""

import struct

import numpy as np
import pytest

from edgar_crawler_spark.functions.imaging import (
    decode_image,
    encode_image,
    sniff_format,
)
from edgar_crawler_spark.functions.webpcodec import (
    _BitWriter,
    decode_webp,
    encode_webp,
)

rng = np.random.default_rng(20260818)


@pytest.mark.parametrize("shape", [(8, 8), (13, 7), (1, 1), (32, 32), (5, 40)])
@pytest.mark.parametrize(
    "opts",
    [
        {},
        {"subtract_green": False},
        {"use_lz77": False},
        {"cache_bits": 5},
        {"short_codes": True},
        {"cache_bits": 3, "short_codes": True},
    ],
)
def test_roundtrip_feature_matrix(shape, opts):
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    blob = encode_webp(px, **opts)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" and blob[12:16] == b"VP8L"
    assert np.array_equal(decode_webp(blob), px)


@pytest.mark.parametrize("levels", [2, 4, 13, 200])
def test_palette_packing(levels):
    px = (rng.integers(0, levels, size=(10, 17, 3)) * (255 // max(1, levels - 1))).astype(
        np.uint8
    )
    blob = encode_webp(px, palette=True)
    assert np.array_equal(decode_webp(blob), px)


def test_predictor_all_modes():
    # every predictor mode appears in the per-block mode image
    px = rng.integers(0, 256, size=(33, 39, 3), dtype=np.uint8)
    modes = (np.arange(5 * 5).reshape(5, 5) % 14).astype(np.uint8)
    blob = encode_webp(px, predictor_modes=modes, predictor_size_bits=3)
    assert np.array_equal(decode_webp(blob), px)


def test_color_transform_and_stacking():
    px = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    elems = (rng.integers(-16, 17, size=(2, 2, 3)) & 0xFF).astype(np.uint8)
    modes = rng.integers(0, 14, size=(2, 2)).astype(np.uint8)
    blob = encode_webp(
        px, color_elems=elems, predictor_modes=modes, subtract_green=True
    )
    assert np.array_equal(decode_webp(blob), px)


def test_meta_prefix_groups():
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    blob = encode_webp(px, subtract_green=False, meta_group_bits=3)
    assert np.array_equal(decode_webp(blob), px)


def test_long_run_splits_at_4096():
    # one flat 70x70 image → a >4900-pixel run → multiple max-length refs
    px = np.full((70, 70, 3), 77, np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)


def test_header_bit_layout_hand_checked():
    # w=17, h=5: payload bits after the 0x2f signature are, LSB-first:
    # (w-1)=16 in 14 bits, (h-1)=4 in 14 bits, alpha=0, version=000
    blob = encode_webp(np.zeros((5, 17, 3), np.uint8))
    payload = blob[20:]
    assert payload[0] == 0x2F
    acc = payload[1] | (payload[2] << 8) | (payload[3] << 16) | (payload[4] << 24)
    assert (acc & 0x3FFF) == 16
    assert ((acc >> 14) & 0x3FFF) == 4
    assert ((acc >> 28) & 1) == 0  # alpha hint
    assert ((acc >> 29) & 7) == 0  # version


def test_hand_assembled_single_pixel_stream():
    """1x1 image built bit-by-bit from the spec: five 'simple' prefix
    codes each with a single (hence zero-bit) symbol — the decoder
    must produce exactly that ARGB pixel."""
    bw = _BitWriter()
    bw.bits(0, 14)  # w-1
    bw.bits(0, 14)  # h-1
    bw.bits(0, 1)  # alpha
    bw.bits(0, 3)  # version
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no meta prefix image
    bw.bits(0, 1)  # no color cache
    for sym in (10, 200, 30, 255, 0):  # green, red, blue, alpha, dist
        bw.bits(1, 1)  # simple code
        bw.bits(0, 1)  # one symbol
        bw.bits(1, 1)  # 8-bit first symbol
        bw.bits(sym, 8)
    vp8l = b"\x2f" + bw.bytes()
    if len(vp8l) % 2:
        chunk = struct.pack("<4sI", b"VP8L", len(vp8l)) + vp8l + b"\x00"
    else:
        chunk = struct.pack("<4sI", b"VP8L", len(vp8l)) + vp8l
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(blob)
    assert out.shape == (1, 1, 3)
    assert tuple(out[0, 0]) == (200, 10, 30)  # RGB of ARGB(255,200,10,30)


def test_lossy_and_extended_raise_named():
    fake_vp8 = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(fake_vp8)
    # a VP8X wrapper is fine when it holds a VP8L image (metadata
    # chunks are walked past) — but lossy/animated payloads still raise
    fake_vp8x_lossy = (
        b"RIFF" + struct.pack("<I", 24) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 0)
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(fake_vp8x_lossy)
    # animated markers with a frameless/truncated body are malformed
    # (real animations decode — see TestAnimatedWebP), not unsupported
    fake_anim = (
        b"RIFF" + struct.pack("<I", 20) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 0)
        + b"ANIM" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp(fake_anim)
    # VP8X with no image chunk at all is malformed, not unsupported
    fake_vp8x = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8X" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_webp(fake_vp8x)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_webp(encode_webp(np.zeros((2, 2, 3), np.uint8))[:25])


def test_imaging_dispatch():
    px = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    blob = encode_image(px, "webp")
    assert sniff_format(blob) == "webp"
    assert np.array_equal(decode_image(blob), px)
    # WAV/AVI are RIFF too — no sniff collision
    from edgar_crawler_spark.functions.imaging import encode_avi_rgb

    avi = encode_avi_rgb(px[None], fps=10)
    assert sniff_format(avi) is None


# --------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM + ANMF over VP8L frames)


class TestAnimatedWebP:
    def _clip(self, n=5, h=24, w=40):
        frames = np.zeros((n, h, w, 3), np.uint8)
        frames[:] = [10, 30, 60]
        for i in range(n):
            frames[i, 3 + 2 * i : 11 + 2 * i, 4 + 3 * i : 16 + 3 * i] = [250, 120, 40]
        return frames

    def test_roundtrip_delta_rects(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
            walk_webp_chunks,
        )

        frames = self._clip()
        blob = encode_webp_anim(frames, durations_ms=50, loop_count=3)
        fps, got = decode_webp_frames(blob)
        assert np.array_equal(got, frames)  # VP8L frames are lossless
        assert fps == pytest.approx(20.0)
        # the container really is VP8X/ANIM/ANMF with one frame each
        fourccs = [f for f, _, _ in walk_webp_chunks(blob)]
        assert fourccs[:2] == [b"VP8X", b"ANIM"]
        assert fourccs.count(b"ANMF") == len(frames)
        # delta frames are sub-canvas rectangles: every ANMF after the
        # first is smaller than a full-frame encode would be
        sizes = [ln for f, _, ln in walk_webp_chunks(blob) if f == b"ANMF"]
        hdr = blob.find(b"ANMF") + 8
        assert blob[hdr : hdr + 6] == b"\x00" * 6  # frame 0 at (0, 0)

    def test_decode_webp_returns_first_frame(self):
        from edgar_crawler_spark.functions.webpcodec import encode_webp_anim

        frames = self._clip(n=3)
        assert np.array_equal(decode_webp(encode_webp_anim(frames, 40)), frames[0])

    def test_sub_rect_offsets_compose(self):
        """Hand-pinned ANMF x/y semantics: offsets are stored halved,
        the decoder pastes at (2x, 2y)."""
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )

        frames = np.zeros((2, 16, 16, 3), np.uint8)
        frames[1, 6:9, 10:13] = 255  # odd-sized change at odd offset
        blob = encode_webp_anim(frames, durations_ms=40)
        # stored rect must start at the even-snapped corner (10, 6) → (5, 3)
        at = blob.rfind(b"ANMF") + 8
        assert int.from_bytes(blob[at : at + 3], "little") == 5
        assert int.from_bytes(blob[at + 3 : at + 6], "little") == 3
        _, got = decode_webp_frames(blob)
        assert np.array_equal(got, frames)

    def test_alpha_blend_over_canvas(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )

        f0 = np.zeros((8, 8, 4), np.uint8)
        f0[:, :, 2] = 255
        f0[:, :, 3] = 255  # opaque blue
        f1 = np.zeros((8, 8, 4), np.uint8)
        f1[:, :, 0] = 255
        f1[:, :, 3] = 128  # half-transparent red
        blob = encode_webp_anim(
            np.stack([f0, f1]), durations_ms=[40, 40], blend=[False, True], delta=False
        )
        _, got = decode_webp_frames(blob)
        assert np.array_equal(got[0], f0[:, :, :3])
        r, g, b = (int(v) for v in got[1, 0, 0])
        a = 128 / 255
        assert abs(r - round(255 * a)) <= 1
        assert abs(b - round(255 * (1 - a))) <= 1
        assert g == 0

    def test_dispose_to_background(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )

        frames = np.zeros((2, 8, 8, 3), np.uint8)
        frames[0] = 200
        frames[1, :, :4] = 90  # second frame covers the left half only
        bg = (7, 11, 13, 255)
        # frame 0 disposes to background; frame 1 is a half-width rect,
        # so the right half of frame 1's snapshot shows the background
        f1_rect = frames[1][:, :4]
        import edgar_crawler_spark.functions.webpcodec as wc

        body = wc._chunk(
            b"VP8X", bytes([wc._VP8X_ANIM, 0, 0, 0]) + wc._u24(7) + wc._u24(7)
        )
        body += wc._chunk(
            b"ANIM", bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", 0)
        )
        body += wc._chunk(
            b"ANMF",
            wc._u24(0) + wc._u24(0) + wc._u24(7) + wc._u24(7) + wc._u24(40)
            + bytes([2 | 1])  # no-blend, dispose
            + wc._chunk(b"VP8L", wc.encode_vp8l(frames[0])),
        )
        body += wc._chunk(
            b"ANMF",
            wc._u24(0) + wc._u24(0) + wc._u24(3) + wc._u24(7) + wc._u24(40)
            + bytes([2])  # no-blend, keep
            + wc._chunk(b"VP8L", wc.encode_vp8l(np.ascontiguousarray(f1_rect))),
        )
        blob = wc._riff_container(body)
        _, got = decode_webp_frames(blob)
        assert np.array_equal(got[0], frames[0])
        assert np.array_equal(got[1][:, :4], f1_rect)
        assert (got[1][:, 4:] == np.array(bg[:3], np.uint8)).all()

    def test_malformed_and_lossy_frames(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )
        import edgar_crawler_spark.functions.webpcodec as wc

        with pytest.raises(ValueError, match="at least one frame"):
            encode_webp_anim(np.zeros((0, 4, 4, 3), np.uint8), 40)
        # lossy VP8 frame payload raises NAMED NotImplementedError
        body = wc._chunk(
            b"VP8X", bytes([wc._VP8X_ANIM, 0, 0, 0]) + wc._u24(3) + wc._u24(3)
        )
        body += wc._chunk(b"ANIM", bytes(4) + struct.pack("<H", 0))
        body += wc._chunk(
            b"ANMF",
            wc._u24(0) * 2 + wc._u24(3) + wc._u24(3) + wc._u24(40) + bytes([2])
            + wc._chunk(b"VP8 ", b"\x00" * 6),
        )
        with pytest.raises(NotImplementedError, match="lossy"):
            decode_webp_frames(wc._riff_container(body))
        # frame rect outside the canvas is malformed
        frames = np.zeros((1, 4, 4, 3), np.uint8)
        blob = bytearray(encode_webp_anim(frames, 40))
        at = blob.find(b"ANMF") + 8 + 6
        blob[at : at + 3] = wc._u24(63)  # claim a 64-wide frame on a 4-canvas
        with pytest.raises(ValueError, match="canvas|disagree"):
            decode_webp_frames(bytes(blob))

    def test_video_dispatch_and_scrub(self):
        """decode_video picks the WebP decoder for RIFF/WEBP; the EXIF
        scrub keeps an animated container intact (ANIM flag holds the
        VP8X wrapper)."""
        from edgar_crawler_spark.functions.imaging import decode_video
        from edgar_crawler_spark.functions.metadata import (
            strip_image_metadata,
        )
        from edgar_crawler_spark.functions.webpcodec import (
            encode_webp_anim,
            walk_webp_chunks,
        )

        frames = self._clip(n=3)
        blob = encode_webp_anim(frames, durations_ms=40)
        fps, got = decode_video(blob)
        assert fps == pytest.approx(25.0)
        assert np.array_equal(got, frames)
        # splice an EXIF chunk in, scrub it back out
        chunks = walk_webp_chunks(blob)
        vp8x_at = chunks[0][1]
        tagged = bytearray(blob)
        tagged[vp8x_at] |= 0x08  # EXIF flag
        tagged = bytes(tagged) + b"EXIF" + struct.pack("<I", 4) + b"ABCD"
        tagged = tagged[:4] + struct.pack("<I", len(tagged) - 8) + tagged[8:]
        scrubbed, removed = strip_image_metadata(tagged)
        assert removed == ["EXIF"]
        _, again = decode_video(scrubbed)
        assert np.array_equal(again, frames)


class TestAnimDeltaGuards:
    def test_blend_then_delta_roundtrip(self):
        """A blended frame leaves the canvas != its raw pixels, so the
        following frame must NOT be stored as a dirty rect against the
        raw previous frame (regression: decoded [100,100,0] vs
        expected composite)."""
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )

        f0 = np.zeros((8, 8, 4), np.uint8)
        f0[:, :, 1] = 200
        f0[:, :, 3] = 255  # opaque green
        f1 = np.zeros((8, 8, 4), np.uint8)
        f1[:, :, 0] = 255
        f1[:, :, 3] = 128  # half-red, BLENDED over f0
        f2 = f1.copy()
        f2[2:4, 2:4, 2] = 99  # small change vs f1's raw pixels
        blob = encode_webp_anim(
            np.stack([f0, f1, f2]),
            durations_ms=[40, 40, 40],
            blend=[False, True, False],
            delta=True,
        )
        _, got = decode_webp_frames(blob)
        # frame 2 overwrites the FULL canvas (delta disabled after a
        # blend), so its flattened output is exactly f2 over background
        a = 128.0 / 255.0
        exp = f2[:, :, :3] * a + 255.0 * (1 - a)
        assert np.abs(got[2].astype(np.float64) - exp).max() <= 1.0

    def test_alpha_only_change_is_a_delta(self):
        """RGBA frames whose only difference is the alpha channel must
        still produce a dirty rect covering the changed pixels."""
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp_frames,
            encode_webp_anim,
        )

        f0 = np.zeros((8, 8, 4), np.uint8)
        f0[:, :, 0] = 10
        f0[:, :, 3] = 255
        f1 = f0.copy()
        f1[0:2, 0:2, 3] = 0  # alpha-only change (RGB identical)
        blob = encode_webp_anim(
            np.stack([f0, f1]), durations_ms=[40, 40], delta=True
        )
        _, got = decode_webp_frames(blob)
        # flattened over the default white background: transparent
        # corner shows white in frame 1
        assert (got[1][0:2, 0:2] == 255).all()
        assert (got[1][4:, 4:] == got[0][4:, 4:]).all()


class TestFastDecodePaths:
    """The two-phase decoder (token scan + vectorized apply) switches
    strategy by image size and tree entropy: combined-literal LUTs
    (GRBA / RBA) only build above 2048 px when the Kraft coverage
    estimate pays for them, and the color-cache apply path splits
    scalar/vectorized at run length 64. These cases pin every branch
    at LUT-triggering sizes (the knob matrix at small sizes already
    covers the slow paths)."""

    def _imgs(self):
        yy, xx = np.mgrid[0:128, 0:128]
        smooth = np.stack(  # photo-entropy trees → RBA LUT, k=16
            [
                (128 + 100 * np.sin(xx / 9.0 + 0.5)).astype(np.uint8),
                (128 + 100 * np.sin(yy / 11.0)).astype(np.uint8),
                ((xx + yy) // 2 % 256).astype(np.uint8),
            ],
            axis=-1,
        )
        pal = np.array(
            [[255, 255, 255], [0, 0, 0], [200, 30, 30], [30, 30, 200]], np.uint8
        )
        gfx = pal[((xx // 7 + yy // 5) % 4)]  # shallow trees → GRBA LUT
        flat = np.full((128, 128, 3), 77, np.uint8)  # one giant backref
        flat[64:, :] = 200
        return {"smooth": smooth, "gfx": gfx, "flat": flat}

    def test_lut_paths_roundtrip(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp,
            encode_webp,
        )

        for name, img in self._imgs().items():
            for knobs in ({}, {"cache_bits": 8}, {"use_lz77": False}):
                out = decode_webp(encode_webp(img, **knobs))
                assert np.array_equal(out, img), (name, knobs)

    def test_lut_with_meta_groups_and_transforms(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp,
            encode_webp,
        )

        imgs = self._imgs()
        rng_ = np.random.default_rng(5)
        modes = rng_.integers(0, 14, (8, 8), np.int64)
        elems = rng_.integers(0, 256, (8, 8, 3), np.uint8)
        for knobs in (
            {"predictor_modes": modes},
            {"color_elems": elems},
            {"cache_bits": 6, "predictor_modes": modes, "color_elems": elems},
        ):
            out = decode_webp(encode_webp(imgs["smooth"], **knobs))
            assert np.array_equal(out, imgs["smooth"]), knobs

    def test_truncated_large_stream_raises(self):
        from edgar_crawler_spark.functions.webpcodec import (
            decode_webp,
            encode_webp,
        )

        blob = encode_webp(self._imgs()["smooth"])
        for frac in (0.3, 0.7, 0.97):
            with pytest.raises(ValueError):
                decode_webp(blob[: int(len(blob) * frac)])
