"""Behavior pins for the round-12 additions — mechanism-level
assertions beyond the registry-wide oracle parity sweep.

- mm_decode_png: the decode leg is a REAL inflate + unfilter, not a
  metadata echo — the scanline stream exercises all five PNG filter
  types, per-chunk CRC-32 is verified (corruption rejected), and the
  unfilter is a genuine inverse (an all-None-filter encoding of the
  same pixels decodes to identical statistics).
- profile_psi_bits share clamp (r11 ADVICE): the Laplace-smoothed
  ppm share can floor to 0 at extreme totals; both engines clamp to
  >= 1 before the log so _log2u never sees 0.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
    _png_dims,
    decode_png,
    encode_png,
)


def _expected_sums(doc_id: int) -> tuple[int, int, int]:
    w, h = _png_dims(doc_id)
    vals = [(doc_id * 29 + 13 * k) % 256 for k in range(3 * w * h)]
    return sum(vals[0::3]), sum(vals[1::3]), sum(vals[2::3])


def test_png_roundtrip_matches_closed_form():
    for d in (0, 1, 2, 3, 4, 19, 123456):
        w, h, n_px, r, g, b = decode_png(encode_png(d))
        assert (w, h) == (4 + d % 5, 5 + d % 4)
        assert n_px == w * h
        assert (r, g, b) == _expected_sums(d)


def test_png_stream_uses_all_five_filter_types():
    # h >= 5 by construction, so rows 0..4 carry filters 0..4 — the
    # decode leg cannot pass without a working Sub/Up/Average/Paeth
    # inverse
    payload = encode_png(7)
    idat_start = payload.find(b"IDAT") + 4
    (ln,) = struct.unpack(">I", payload[idat_start - 8 : idat_start - 4])
    raw = zlib.decompress(payload[idat_start : idat_start + ln])
    w, h = _png_dims(7)
    stride = 3 * w
    filters = {raw[r * (1 + stride)] for r in range(h)}
    assert filters == {0, 1, 2, 3, 4}


def test_png_unfilter_is_true_inverse_of_filtering():
    # re-encode the same pixels with ALL rows filter-0 (None); a
    # decoder that merely echoes metadata or ignores filter bytes
    # would return the same stats for both, but one that unfilters
    # wrongly would diverge — equality here plus the closed-form
    # check above pins the unfilter as a genuine inverse
    d = 42
    w, h = _png_dims(d)
    stride = 3 * w
    px = bytes((d * 29 + 13 * k) % 256 for k in range(h * stride))
    scan = bytearray()
    for r in range(h):
        scan.append(0)
        scan += px[r * stride : (r + 1) * stride]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    flat = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )
    assert decode_png(flat) == decode_png(encode_png(d))


def test_png_crc_corruption_rejected():
    p = bytearray(encode_png(13))
    p[p.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(AssertionError, match="CRC"):
        decode_png(bytes(p))


def test_png_truncation_and_bad_signature_rejected():
    with pytest.raises(AssertionError):
        decode_png(encode_png(5)[:24])
    with pytest.raises(AssertionError, match="signature"):
        decode_png(b"\x88PNG\r\n\x1a\n" + encode_png(5)[8:])


def test_png_unsupported_color_type_rejected():
    # patch IHDR to grayscale (color type 0) WITH a recomputed CRC:
    # the rejection must come from the header check, not CRC
    p = encode_png(9)
    ihdr_off = p.index(b"IHDR")
    data = bytearray(p[ihdr_off + 4 : ihdr_off + 17])
    data[9] = 0  # color type byte
    body = b"IHDR" + bytes(data)
    patched = (
        p[: ihdr_off - 4]
        + struct.pack(">I", 13)
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        + p[ihdr_off + 21 :]
    )
    with pytest.raises(AssertionError, match="truecolor"):
        decode_png(patched)


def test_psi_share_clamp_guards_log_of_zero():
    # the clamp expression: ((cnt+1)*1e6) div (tot+bins) floors to 0
    # once tot > ~1e6*(cnt+1); greatest(..., 1) must keep the share
    # positive so _log2u's bin()-length decomposition stays defined
    import inspect

    from pe_firm_investment_database_pipeline_spark.plans import quality

    src = inspect.getsource(quality.profile_psi_bits)
    assert "greatest" in src and "CAST(1 AS BIGINT)" in src
    sql = quality._psi_sql()
    assert "GREATEST" in sql
    # replay the guarded arithmetic at the failure scale: cnt=0 bin
    # against a 2e6-event epoch
    cnt, tot, bins = 0, 2_000_000, 5
    raw = ((cnt + 1) * 1_000_000) // (tot + bins)
    assert raw == 0  # the r11 ADVICE failure mode is real
    clamped = max(raw, 1)
    assert clamped.bit_length() - 1 == 0  # _log2u(1) is defined


# ---------------------------------------------------------------------------
# mm_decode_jpeg — baseline-JFIF codec leg (r12 second wave)
# ---------------------------------------------------------------------------

def _jpg_expected(doc_id: int) -> tuple[int, int, int, int, int, int]:
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        _jpg_block_v,
        _jpg_dims,
    )

    w, h = _jpg_dims(doc_id)
    nb = (w // 8) * (h // 8)
    vs = [_jpg_block_v(doc_id, b) for b in range(nb)]
    return (w, h, nb, sum(64 * v for v in vs), min(vs), max(vs))


def test_jpeg_roundtrip_matches_closed_form():
    """The DC-only fixture is exactly lossless through the full
    marker-walk + Huffman + dequant + zigzag + IDCT pipeline."""
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    for doc_id in (0, 1, 2, 3, 4, 5, 6, 7, 11, 100, 999, 4999, 123457):
        assert decode_jpeg(encode_jpeg(doc_id)) == _jpg_expected(doc_id)


def test_jpeg_ac_runlength_and_zrl_coefficient_roundtrip():
    """The AC entropy machinery (run/size RLE, ZRL for >=16-zero
    runs, EOB) is exact at the quantized-coefficient level — the
    integer surface where bitstream parity is provable (IDCT of
    irrational AC bases stays out of hash-compared outputs)."""
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        decode_jpeg_coeffs,
        encode_jpeg_blocks,
    )

    blk = [5] + [0] * 63
    blk[3] = 7     # short zero run
    blk[25] = -3   # negative value, longer run
    blk[45] = 1    # 19 zeros since last nonzero -> forces a ZRL
    w, h, qtab, blocks = decode_jpeg_coeffs(
        encode_jpeg_blocks(16, 8, [blk, list(blk)])
    )
    assert (w, h) == (16, 8)
    assert blocks[0] == blk and blocks[1] == blk
    assert qtab[0] == 8 and qtab[1] == 16  # DQT de-zigzags correctly


def test_jpeg_byte_stuffing_roundtrip():
    """A stream whose entropy bytes contain 0xFF must be stuffed
    (0xFF 0x00) by the writer and un-stuffed by the reader — pinned
    on a planted coefficient vector known to produce one."""
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        decode_jpeg_coeffs,
        encode_jpeg_blocks,
    )

    blk = [-128] + [0] * 63
    blk[1] = -40
    payload = encode_jpeg_blocks(8, 8, [blk])
    sos = payload.find(b"\xFF\xDA")
    assert b"\xFF\x00" in payload[sos + 10 : -2], "vector lost stuffing"
    _, _, _, blocks = decode_jpeg_coeffs(payload)
    assert blocks[0] == blk


def test_jpeg_corruption_rejected_or_visible():
    """Bad SOI and truncation raise; flipping ANY entropy byte either
    raises or changes the decoded statistics — no silent survival."""
    import pytest

    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    p = encode_jpeg(7)
    with pytest.raises(AssertionError, match="SOI"):
        decode_jpeg(b"\x00" + p[1:])
    with pytest.raises(AssertionError, match="truncated"):
        decode_jpeg(p[:-4])
    good = decode_jpeg(p)
    start = p.find(b"\xFF\xDA") + 10
    for off in range(start, len(p) - 2):
        bad = bytearray(p)
        bad[off] ^= 0x40
        try:
            assert decode_jpeg(bytes(bad)) != good
        except AssertionError as ex:
            if "!=" in str(ex) or not str(ex):
                raise
