"""Tiled Image Compression convention (RICE_1/GZIP_1/GZIP_2) — encode +
decode roundtrips through real files, bitstream edge cases, and the
explicit unsupported-codec error (reference reads these via astropy
CompImageHDU, reference io/fits.py:76-81)."""

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
