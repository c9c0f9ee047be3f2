"""Tiled Image Compression convention (RICE_1/GZIP_1/GZIP_2) — encode +
decode roundtrips through real files, bitstream edge cases, and the
explicit unsupported-codec error (reference reads these via astropy
CompImageHDU, reference io/fits.py:76-81)."""

import os

import numpy as np
import pytest

from spectral_cube_tpu.io.fits_low import (Header, HDU, read_fits,
                                           write_fits, format_header, BLOCK)
from spectral_cube_tpu.io.tile_compress import (rice_encode, rice_decode,
                                                compressed_image_blocks,
                                                decompress_image_hdu)
from spectral_cube_tpu.utils import FITSReadError

from conftest import base_header


def test_rice_known_bitstream():
    """Hand-decoded vector pinning the convention's bit layout: first
    value raw big-endian, selector 0 = all-zero-diff block."""
    vals = np.full(40, 7, dtype=np.int64)
    enc = rice_encode(vals, blocksize=32, bytepix=4)
    # 4 bytes first value + selector bits for 2 blocks (5 bits each -> 2
    # bytes with padding)
    assert enc[:4] == (7).to_bytes(4, "big")
    assert len(enc) == 6
    # both selectors are 0 (fs = -1): the tail bytes are zero
    assert enc[4] == 0 and enc[5] == 0
    out = rice_decode(enc, 40, blocksize=32, bytepix=4)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("bytepix", [1, 2, 4])
def test_rice_roundtrip_random(bytepix):
    rng = np.random.RandomState(3)
    lo, hi = (0, 255) if bytepix == 1 else (
        (-30000, 30000) if bytepix == 2 else (-2 ** 30, 2 ** 30))
    for n in (1, 31, 32, 33, 200):
        vals = rng.randint(lo, hi, size=n).astype(np.int64)
        enc = rice_encode(vals, bytepix=bytepix)
        out = rice_decode(enc, n, bytepix=bytepix)
        np.testing.assert_array_equal(out, vals)
    # smooth data compresses well (the raison d'etre)
    smooth = (1000 * np.sin(np.arange(300) / 10.0)).astype(np.int64)
    enc = rice_encode(smooth, bytepix=4)
    assert len(enc) < 300 * 4 / 2
    np.testing.assert_array_equal(rice_decode(enc, 300, bytepix=4), smooth)


def test_rice_escape_block_noise():
    # white noise at full 32-bit range forces the direct-copy escape
    rng = np.random.RandomState(4)
    vals = rng.randint(-2 ** 31, 2 ** 31 - 1, size=64).astype(np.int64)
    enc = rice_encode(vals, bytepix=4)
    np.testing.assert_array_equal(rice_decode(enc, 64, bytepix=4), vals)


def _write_compressed(tmp_path, data, cmptype, name, hdrkw=None):
    h = base_header(nx=data.shape[2], ny=data.shape[1],
                    nchan=data.shape[0], **(hdrkw or {}))
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=data, header=h)], compress=cmptype)
    return path


@pytest.mark.parametrize("cmptype", ["RICE_1", "GZIP_1", "GZIP_2"])
def test_compressed_int_cube_roundtrip(tmp_path, cmptype):
    rng = np.random.RandomState(5)
    data = rng.randint(-500, 500, size=(4, 6, 10)).astype(np.int32)
    path = _write_compressed(tmp_path, data, cmptype, f"{cmptype}.fits")
    hdus = read_fits(path)
    imgs = [h for h in hdus if getattr(h, "is_image", False)
            and h.data is not None]
    assert len(imgs) == 1
    np.testing.assert_array_equal(np.asarray(imgs[0].data), data)
    # geometry restored from the Z-keywords
    assert int(imgs[0].header["NAXIS1"]) == 10
    assert int(imgs[0].header["NAXIS3"]) == 4


@pytest.mark.parametrize("cmptype", ["RICE_1", "GZIP_1", "GZIP_2"])
def test_compressed_float_cube_roundtrip_lossless(tmp_path, cmptype):
    # float data stores losslessly (RICE_1 falls back to GZIP of the raw
    # pixels rather than lossy quantization)
    rng = np.random.RandomState(6)
    data = rng.randn(3, 8, 12).astype(np.float32)
    data[1, 2, 3] = np.nan
    path = _write_compressed(tmp_path, data, cmptype, f"f{cmptype}.fits")
    hdus = read_fits(path)
    imgs = [h for h in hdus if getattr(h, "is_image", False)
            and h.data is not None]
    got = np.asarray(imgs[0].data)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
    fin = np.isfinite(data)
    np.testing.assert_array_equal(got[fin], data[fin])


def test_compressed_cube_reads_as_spectral_cube(tmp_path):
    """End to end: SpectralCube.read of a tile-compressed file."""
    from spectral_cube_tpu import SpectralCube
    rng = np.random.RandomState(7)
    data = rng.rand(5, 6, 8).astype(np.float32)
    path = _write_compressed(tmp_path, data, "RICE_1", "cube.fits",
                             hdrkw={})
    cube = SpectralCube.read(path)
    assert cube.shape == (5, 6, 8)
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               data, rtol=0, atol=0)


def test_quantized_rice_tiles_reconstruct():
    """A quantized float HDU (ZSCALE/ZZERO per tile + ZBLANK) decodes to
    scale*int + zero with blanks -> NaN — built straight from the
    convention's table layout, independent of this repo's writer."""
    ny, nx = 4, 6
    ints = np.arange(ny * nx, dtype=np.int64).reshape(ny, nx) - 7
    ints[2, 3] = -99  # blank marker
    heap = bytearray()
    descrs = []
    scales = [0.5, 0.25, 2.0, 1.5]
    zeros = [10.0, -3.0, 0.0, 1.25]
    for row in range(ny):  # one row per tile (default ZTILE)
        enc = rice_encode(ints[row], bytepix=4)
        descrs.append((len(enc), len(heap)))
        heap.extend(enc)
    table = np.zeros((ny,), dtype=np.dtype(
        [("d", ">i4", (2,)), ("s", ">f8"), ("z", ">f8")]))
    for row, (ln, off) in enumerate(descrs):
        table["d"][row] = (ln, off)
        table["s"][row] = scales[row]
        table["z"][row] = zeros[row]
    hdr = Header()
    hdr["XTENSION"] = "BINTABLE"
    hdr["NAXIS1"] = 24
    hdr["NAXIS2"] = ny
    hdr["TFIELDS"] = 3
    hdr["TTYPE1"] = "COMPRESSED_DATA"
    hdr["TFORM1"] = "1PB(64)"
    hdr["TTYPE2"] = "ZSCALE"
    hdr["TFORM2"] = "1D"
    hdr["TTYPE3"] = "ZZERO"
    hdr["TFORM3"] = "1D"
    hdr["ZIMAGE"] = True
    hdr["ZCMPTYPE"] = "RICE_1"
    hdr["ZBITPIX"] = 32
    hdr["ZNAXIS"] = 2
    hdr["ZNAXIS1"] = nx
    hdr["ZNAXIS2"] = ny
    hdr["ZBLANK"] = -99
    img_hdr, data = decompress_image_hdu(hdr, table.tobytes(), bytes(heap))
    exp = ints.astype(np.float64) * np.asarray(scales)[:, None] \
        + np.asarray(zeros)[:, None]
    exp[2, 3] = np.nan
    np.testing.assert_allclose(data, exp, rtol=0, atol=0)
    assert int(img_hdr["NAXIS1"]) == nx


def test_unsupported_compression_raises(tmp_path):
    hdr = Header()
    hdr["XTENSION"] = "BINTABLE"
    hdr["BITPIX"] = 8
    hdr["NAXIS"] = 2
    hdr["NAXIS1"] = 8
    hdr["NAXIS2"] = 1
    hdr["PCOUNT"] = 0
    hdr["GCOUNT"] = 1
    hdr["TFIELDS"] = 1
    hdr["TTYPE1"] = "COMPRESSED_DATA"
    hdr["TFORM1"] = "1PB(8)"
    hdr["ZIMAGE"] = True
    hdr["ZCMPTYPE"] = "HCOMPRESS_1"
    hdr["ZBITPIX"] = 32
    hdr["ZNAXIS"] = 2
    hdr["ZNAXIS1"] = 4
    hdr["ZNAXIS2"] = 2
    path = str(tmp_path / "bad.fits")
    ph = Header()
    ph["SIMPLE"] = True
    ph["BITPIX"] = 8
    ph["NAXIS"] = 0
    ph["EXTEND"] = True
    with open(path, "wb") as f:
        f.write(format_header(ph))
        f.write(format_header(hdr))
        f.write(b"\x00" * BLOCK)
    with pytest.raises(FITSReadError, match="HCOMPRESS_1"):
        read_fits(path)


_FIXDIR = os.path.join(os.path.dirname(__file__), "data", "compressed")


@pytest.mark.parametrize("name", ["rice_d1", "rice_d2", "gzip2_nod",
                                  "rice_int32", "gzip1_lossless"])
def test_cfitsio_fixture_decodes_bit_exact(name):
    """Vendored fixtures written by the system CFITSIO library itself
    (tests/cfitsio_oracle.py generated them offline; the expected arrays
    are CFITSIO's own reads) — the expected bytes did NOT originate in
    this repo's encoder.  Covers quantized+SUBTRACTIVE_DITHER_1/2 RICE,
    NO_DITHER GZIP_2, lossless int32 RICE, and lossless float GZIP_1,
    all with ZBITPIX=-32 real-archive-format headers."""
    path = os.path.join(_FIXDIR, f"{name}.fits")
    expected = np.load(os.path.join(_FIXDIR, f"{name}_expected.npy"))
    hdus = read_fits(path)
    imgs = [h for h in hdus if getattr(h, "is_image", False)
            and h.data is not None]
    assert len(imgs) == 1
    got = np.asarray(imgs[0].data).astype(expected.dtype)
    np.testing.assert_array_equal(np.isnan(got.astype(np.float64)),
                                  np.isnan(expected.astype(np.float64)))
    fin = ~np.isnan(expected.astype(np.float64))
    np.testing.assert_array_equal(got[fin], expected[fin])


def test_cfitsio_fixture_dither_reversal_not_biased():
    """The dithered fixture must reconstruct the *original* pixels to
    within half a quantization step — a wrong dither walk would show a
    systematic per-pixel error up to 0.5*ZSCALE."""
    path = os.path.join(_FIXDIR, "rice_d1.fits")
    orig = np.load(os.path.join(_FIXDIR, "original_float.npy"))
    imgs = [h for h in read_fits(path) if getattr(h, "is_image", False)
            and h.data is not None]
    got = np.asarray(imgs[0].data)
    fin = np.isfinite(orig)
    # fixture was written with absolute delta 0.01
    assert float(np.abs(got[fin] - orig[fin]).max()) <= 0.005 + 1e-6
    np.testing.assert_array_equal(np.isnan(got), np.isnan(orig))


def _cfitsio():
    import cfitsio_oracle as co
    return co if co.available() else None


needs_cfitsio = pytest.mark.skipif(_cfitsio() is None,
                                   reason="libcfitsio not installed")


@needs_cfitsio
@pytest.mark.parametrize("bytepix", [1, 2, 4])
def test_rice_bitstream_bit_identical_to_cfitsio(bytepix):
    """rice_encode's bitstream must be byte-for-byte what CFITSIO's
    fits_rcomp produces, and each side must decode the other."""
    co = _cfitsio()
    rng = np.random.RandomState(13)
    lo, hi = (0, 255) if bytepix == 1 else (
        (-30000, 30000) if bytepix == 2 else (-2 ** 30, 2 ** 30))
    for n in (1, 32, 33, 333):
        vals = rng.randint(lo, hi, size=n).astype(np.int64)
        mine = rice_encode(vals, bytepix=bytepix)
        theirs = co.rice_encode_oracle(vals, bytepix=bytepix)
        assert mine == theirs
        np.testing.assert_array_equal(
            rice_decode(theirs, n, bytepix=bytepix), vals)
        np.testing.assert_array_equal(
            co.rice_decode_oracle(mine, n, bytepix=bytepix), vals)


@needs_cfitsio
@pytest.mark.parametrize("dither", ["SUBTRACTIVE_DITHER_1",
                                    "SUBTRACTIVE_DITHER_2", "NO_DITHER"])
def test_cfitsio_reads_my_quantized_files(tmp_path, dither):
    """Files written by compressed_image_blocks with quantization must
    open in CFITSIO and reconstruct the same pixels CFITSIO computes."""
    co = _cfitsio()
    rng = np.random.RandomState(17)
    data = (50 + 3 * rng.randn(5, 12, 16)).astype(np.float32)
    data[2, 4, 4] = np.nan
    data[1, 0, 0] = 0.0
    h = base_header(nx=16, ny=12, nchan=5)
    path = str(tmp_path / "mine.fits")
    chdr, payload = compressed_image_blocks(
        data, header=h, cmptype="RICE_1", quantize_level=-0.01,
        dither=dither, dither_seed=9)
    ph = Header()
    ph["SIMPLE"] = True
    ph["BITPIX"] = 8
    ph["NAXIS"] = 0
    ph["EXTEND"] = True
    with open(path, "wb") as f:
        f.write(format_header(ph))
        f.write(format_header(Header(chdr)))
        f.write(payload)
        f.write(b"\x00" * ((-len(payload)) % BLOCK))
    oracle = co.read_image(path, data.shape)
    mine = np.asarray([h2.data for h2 in read_fits(path)
                       if getattr(h2, "is_image", False)
                       and h2.data is not None][0])
    np.testing.assert_array_equal(np.isnan(oracle), np.isnan(data))
    fin = np.isfinite(data)
    # CFITSIO's read of my file == my read of my file, bit-exact
    np.testing.assert_array_equal(mine[fin], oracle[fin])
    assert float(np.abs(oracle[fin] - data[fin]).max()) <= 0.005 + 1e-6
    if dither == "SUBTRACTIVE_DITHER_2":
        assert oracle[1, 0, 0] == 0.0   # exact zero survives


@pytest.mark.parametrize("dither", ["SUBTRACTIVE_DITHER_1",
                                    "SUBTRACTIVE_DITHER_2", "NO_DITHER"])
def test_quantized_write_read_roundtrip(dither):
    rng = np.random.RandomState(21)
    data = (rng.randn(4, 10, 14) * 7).astype(np.float32)
    data[0, 0, 0] = np.nan
    data[3, 9, 13] = 0.0
    chdr, payload = compressed_image_blocks(
        data, cmptype="RICE_1", quantize_level=-0.001, dither=dither,
        dither_seed=100)
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    img_hdr, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                        payload[tbl:])
    np.testing.assert_array_equal(np.isnan(out), np.isnan(data))
    fin = np.isfinite(data)
    assert float(np.abs(out[fin] - data[fin]).max()) <= 0.0005 + 1e-7
    if dither == "SUBTRACTIVE_DITHER_2":
        assert out[3, 9, 13] == 0.0


def test_quantized_relative_level_uses_tile_noise():
    rng = np.random.RandomState(23)
    data = (10 + 0.5 * rng.randn(3, 20, 20)).astype(np.float32)
    chdr, payload = compressed_image_blocks(
        data, cmptype="RICE_1", quantize_level=16.0)
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    # per-tile ZSCALE lives in the table; delta should track the noise
    # sigma (0.5) / qlevel (16) within estimator scatter, and the recon
    # error bound is half the worst tile's step
    rec = np.frombuffer(payload[:tbl], dtype=np.dtype(
        [("d", ">i4", (2,)), ("s", ">f8"), ("z", ">f8")]))
    zscales = rec["s"].astype(float)
    assert 0.25 * (0.5 / 16) < zscales.mean() < 4 * (0.5 / 16)
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    per_tile_err = np.abs(out - data).reshape(len(zscales), -1).max(axis=1)
    assert np.all(per_tile_err <= zscales / 2 + 1e-6)
    assert str(chdr["ZQUANTIZ"]).startswith("SUBTRACTIVE_DITHER_1")


def test_int64_rice_write_falls_back_to_gzip():
    """RICE_1 is a 32-bit code: int64 pixels outside int32 range must
    fall back to lossless GZIP_1 instead of silently truncating."""
    data = np.array([[2 ** 40, -2 ** 40], [5, 2 ** 33 + 17]],
                    dtype=np.int64)
    chdr, payload = compressed_image_blocks(data, cmptype="RICE_1")
    assert str(chdr["ZCMPTYPE"]).strip() == "GZIP_1"
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    np.testing.assert_array_equal(out, data)


def test_unsigned_int_write_never_wraps():
    data = np.array([[3000000000, 7], [2 ** 31 + 5, 0]], dtype=np.uint32)
    chdr, payload = compressed_image_blocks(data, cmptype="RICE_1")
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    np.testing.assert_array_equal(out.astype(np.uint64),
                                  data.astype(np.uint64))
    with pytest.raises(ValueError, match="uint64"):
        compressed_image_blocks(np.array([[2 ** 63]], dtype=np.uint64))


def test_gzip_fallback_column_holds_raw_pixels():
    """A tile whose dynamic range cannot quantize into int32 is stored
    as the gzip of the ORIGINAL float pixels in GZIP_COMPRESSED_DATA —
    and must decode via the image dtype with no scaling applied."""
    data = np.ones((2, 4, 8), dtype=np.float32)
    data[1] = np.linspace(0, 1, 32, dtype=np.float32).reshape(4, 8)
    data[1, 0, 0] = 1e30          # span 1e30 / delta 1e-6 >> int32
    data[1, 0, 1] = -1e30
    chdr, payload = compressed_image_blocks(
        data, cmptype="RICE_1", quantize_level=-1e-6, tile=[8, 4, 1])
    ttypes = [str(chdr[f"TTYPE{i}"])
              for i in range(1, int(chdr["TFIELDS"]) + 1)]
    assert "GZIP_COMPRESSED_DATA" in ttypes
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    # fallback tile is bit-exact (raw floats), quantized tile is lossy
    np.testing.assert_array_equal(out[1], data[1])
    assert float(np.abs(out[0] - data[0]).max()) <= 5e-7


def test_dither_missing_seed_raises():
    hdr = Header()
    hdr["XTENSION"] = "BINTABLE"
    hdr["NAXIS1"] = 8
    hdr["NAXIS2"] = 1
    hdr["TFIELDS"] = 1
    hdr["TTYPE1"] = "COMPRESSED_DATA"
    hdr["TFORM1"] = "1PB(8)"
    hdr["ZIMAGE"] = True
    hdr["ZCMPTYPE"] = "RICE_1"
    hdr["ZBITPIX"] = -32
    hdr["ZNAXIS"] = 1
    hdr["ZNAXIS1"] = 4
    hdr["ZQUANTIZ"] = "SUBTRACTIVE_DITHER_1"
    with pytest.raises(FITSReadError, match="ZDITHER0"):
        decompress_image_hdu(hdr, b"\x00" * 8, b"")


def test_unknown_zquantiz_raises():
    hdr = Header()
    hdr["XTENSION"] = "BINTABLE"
    hdr["NAXIS1"] = 8
    hdr["NAXIS2"] = 1
    hdr["TFIELDS"] = 1
    hdr["TTYPE1"] = "COMPRESSED_DATA"
    hdr["TFORM1"] = "1PB(8)"
    hdr["ZIMAGE"] = True
    hdr["ZCMPTYPE"] = "RICE_1"
    hdr["ZBITPIX"] = -32
    hdr["ZNAXIS"] = 1
    hdr["ZNAXIS1"] = 4
    hdr["ZQUANTIZ"] = "FUTURE_METHOD_9"
    with pytest.raises(FITSReadError, match="FUTURE_METHOD_9"):
        decompress_image_hdu(hdr, b"\x00" * 8, b"")


def test_archive_scale_decode_speed():
    """The codec must run at archive speed (>= 10 Mpx/s end-to-end
    through decompress_image_hdu), not the pure-Python bit loop's
    ~0.06 Mpx/s — a 623x768x768 ALMA cube decodes in seconds."""
    from spectral_cube_tpu.io.native import native_available
    if not native_available():
        pytest.skip("native codec unavailable (no compiler)")
    import time
    rng = np.random.RandomState(31)
    ny, nx = 4096, 512                     # 2 Mpx keeps the test quick
    data = (1000 * np.sin(np.arange(ny * nx) / 500.0)
            + 20 * rng.randn(ny * nx)).astype(np.float32).reshape(ny, nx)
    chdr, payload = compressed_image_blocks(
        data, cmptype="RICE_1", quantize_level=-0.05)
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    t0 = time.time()
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    dt = time.time() - t0
    # half the 0.05 step, plus float32 output rounding at |data|~1000
    assert float(np.abs(out - data).max()) <= 0.025 + 1e-3
    mpxs = ny * nx / 1e6 / dt
    assert mpxs >= 10, f"decode ran at {mpxs:.1f} Mpx/s (< 10)"


def test_multi_axis_tiles(tmp_path):
    # non-default tiling: 2-D tiles spanning several rows and channels
    rng = np.random.RandomState(8)
    data = rng.randint(0, 1000, size=(3, 7, 10)).astype(np.int32)
    hdr, payload = compressed_image_blocks(data, cmptype="RICE_1",
                                           tile=[4, 3, 2])
    table_len = int(hdr["NAXIS1"]) * int(hdr["NAXIS2"])
    img_hdr, out = decompress_image_hdu(Header(hdr), payload[:table_len],
                                        payload[table_len:])
    np.testing.assert_array_equal(out, data)


def test_inf_pixels_set_zblank_both_paths():
    """inf quantizes to the null sentinel like NaN, so ZBLANK must be
    written even when no NaN is present — without it an external reader
    (CFITSIO/astropy) unscales the sentinel to a bogus finite value."""
    data = (np.arange(2 * 8 * 8, dtype=np.float32) / 37.0).reshape(2, 8, 8)
    data[1, 3, 3] = np.inf
    data[0, 2, 5] = -np.inf
    # vectorized uniform-tile path (default row tiling, GZIP avoids the
    # fused native RICE path so the pure-Python quantizer is exercised)
    chdr, payload = compressed_image_blocks(
        data, cmptype="GZIP_1", quantize_level=-0.001, dither="NO_DITHER")
    assert int(chdr["ZBLANK"]) == -2147483647
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    assert np.isnan(out[1, 3, 3]) and np.isnan(out[0, 2, 5])
    fin = np.isfinite(data)
    assert np.isfinite(out[fin]).all()
    # per-tile path (non-uniform tiling)
    chdr2, _ = compressed_image_blocks(
        data, cmptype="GZIP_1", quantize_level=-0.001, dither="NO_DITHER",
        tile=[5, 3, 2])
    assert int(chdr2["ZBLANK"]) == -2147483647


def test_quantize_level_zero_rejected():
    """quantize_level == 0 would divide the noise estimate by zero and
    write ZSCALE=inf files whose pixels all read back NaN: reject it."""
    data = np.ones((2, 4, 4), dtype=np.float32)
    with pytest.raises(ValueError, match="quantize_level"):
        compressed_image_blocks(data, quantize_level=0.0)
    with pytest.raises(ValueError, match="quantize_level"):
        compressed_image_blocks(data, quantize_level=np.inf)


def test_wide_range_tile_write_warning_free():
    """A tile whose dynamic range exceeds int32 is stored losslessly; the
    discarded quantization attempt must not leak a cast RuntimeWarning
    (crashes under -W error / pytest filterwarnings=error)."""
    import warnings
    rng = np.random.RandomState(77)
    data = rng.randn(4, 2, 64).astype(np.float32)
    data[1, 0, 3] = 1e15                   # span/delta >> 2^31 -> cbad row
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        chdr, payload = compressed_image_blocks(
            data, cmptype="GZIP_1", quantize_level=4.0, dither="NO_DITHER")
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    # the wide tile (one 64-px row under the default row tiling) comes
    # back exactly via the lossless fallback column
    np.testing.assert_array_equal(out[1, 0], data[1, 0])


def test_unquantize_chunking_exact(monkeypatch):
    """The chunked unquantize path (bounds host temporaries on the
    non-native decode) is bit-identical across chunk sizes."""
    from spectral_cube_tpu.io import tile_compress as tc
    rng = np.random.RandomState(5)
    data = (rng.randn(6, 5, 32) * 3).astype(np.float32)
    data[2, 1, 7] = np.nan
    chdr, payload = compressed_image_blocks(
        data, cmptype="GZIP_1", quantize_level=-0.01,
        dither="SUBTRACTIVE_DITHER_1", dither_seed=42)
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, ref = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    monkeypatch.setattr(tc, "_UNQUANT_CHUNK_PX", 7)  # force many chunks
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float64),
        np.asarray(ref, dtype=np.float64))


def test_archive_scale_encode_speed():
    """The write path must run at archive speed too (>= 10 Mpx/s
    end-to-end through compressed_image_blocks: quantization + dither +
    RICE encode + table assembly) — round-4 enforced only the decode
    side."""
    from spectral_cube_tpu.io.native import native_available
    if not native_available():
        pytest.skip("native codec unavailable (no compiler)")
    import time
    rng = np.random.RandomState(33)
    ny, nx = 4096, 512                     # 2 Mpx keeps the test quick
    data = (1000 * np.sin(np.arange(ny * nx) / 500.0)
            + 20 * rng.randn(ny * nx)).astype(np.float32).reshape(ny, nx)
    compressed_image_blocks(data[:128], cmptype="RICE_1",
                            quantize_level=-0.05)   # warm the codec
    t0 = time.time()
    chdr, payload = compressed_image_blocks(
        data, cmptype="RICE_1", quantize_level=-0.05)
    dt = time.time() - t0
    mpxs = ny * nx / 1e6 / dt
    assert mpxs >= 10, f"encode ran at {mpxs:.1f} Mpx/s (< 10)"
    # and the product still round-trips through the decoder
    tbl = int(chdr["NAXIS1"]) * int(chdr["NAXIS2"])
    _, out = decompress_image_hdu(Header(chdr), payload[:tbl],
                                  payload[tbl:])
    assert float(np.abs(out - data).max()) <= 0.025 + 1e-3
