"""ctypes bridge to the system CFITSIO shared library (when present).

This is the *external oracle* for the tiled-image-compression codec in
``spectral_cube_tpu.io.tile_compress``: CFITSIO is the reference
implementation of the convention (the reference library reads compressed
HDUs through astropy, whose codecs are ports of these exact routines —
reference spectral_cube/io/fits.py:76-81).  Tests use this module to

* write compressed files with CFITSIO's own encoder and assert our
  reader decodes them bit-exactly (including quantized + subtractively
  dithered float images), and
* open files written by our encoder with CFITSIO and assert it
  reconstructs the original pixels.

Nothing here ships in the package; it is test-support only, gated on
``libcfitsio`` being installed (``available()``).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

# CFITSIO constants (fitsio.h)
RICE_1 = 11
GZIP_1 = 21
GZIP_2 = 22
NO_DITHER = -1
SUBTRACTIVE_DITHER_1 = 1
SUBTRACTIVE_DITHER_2 = 2
READONLY = 0

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for name in ("libcfitsio.so.10", "libcfitsio.so.9", "libcfitsio.so",
                 ctypes.util.find_library("cfitsio")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        c_int_p = ctypes.POINTER(ctypes.c_int)
        lib.ffinit.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                               ctypes.c_char_p, c_int_p]
        lib.ffopen.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                               ctypes.c_char_p, ctypes.c_int, c_int_p]
        lib.ffclos.argtypes = [ctypes.c_void_p, c_int_p]
        lib.fits_set_compression_type.argtypes = [
            ctypes.c_void_p, ctypes.c_int, c_int_p]
        lib.fits_set_tile_dim.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_long),
            c_int_p]
        lib.fits_set_quantize_level.argtypes = [
            ctypes.c_void_p, ctypes.c_float, c_int_p]
        lib.fits_set_quantize_method.argtypes = [
            ctypes.c_void_p, ctypes.c_int, c_int_p]
        lib.fits_set_dither_seed.argtypes = [
            ctypes.c_void_p, ctypes.c_int, c_int_p]
        lib.ffcrim.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_long), c_int_p]
        lib.ffppre.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.c_longlong, ctypes.c_longlong,
                               ctypes.c_void_p, c_int_p]
        lib.ffpprk.argtypes = lib.ffppre.argtypes      # int array
        lib.ffppne.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.c_longlong, ctypes.c_longlong,
                               ctypes.c_void_p, ctypes.c_float, c_int_p]
        lib.ffgpve.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.c_longlong, ctypes.c_longlong,
                               ctypes.c_float, ctypes.c_void_p, c_int_p,
                               c_int_p]
        lib.ffgpvk.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.c_longlong, ctypes.c_longlong,
                               ctypes.c_int, ctypes.c_void_p, c_int_p,
                               c_int_p]
        lib.ffmahd.argtypes = [ctypes.c_void_p, ctypes.c_int, c_int_p,
                               c_int_p]
        # raw RICE codec entry points (ricecomp.c)
        lib.fits_rcomp.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int]
        lib.fits_rcomp.restype = ctypes.c_int
        lib.fits_rdecomp.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_int]
        lib.fits_rdecomp.restype = ctypes.c_int
        lib.fits_rcomp_short.argtypes = lib.fits_rcomp.argtypes
        lib.fits_rcomp_short.restype = ctypes.c_int
        lib.fits_rdecomp_short.argtypes = lib.fits_rdecomp.argtypes
        lib.fits_rdecomp_short.restype = ctypes.c_int
        lib.fits_rcomp_byte.argtypes = lib.fits_rcomp.argtypes
        lib.fits_rcomp_byte.restype = ctypes.c_int
        lib.fits_rdecomp_byte.argtypes = lib.fits_rdecomp.argtypes
        lib.fits_rdecomp_byte.restype = ctypes.c_int
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


class CFITSIOError(RuntimeError):
    pass


def _ck(status, what):
    if status.value != 0:
        raise CFITSIOError(f"{what}: CFITSIO status {status.value}")


def write_compressed(path, data, cmptype=RICE_1, tile=None, qlevel=None,
                     dither=None, dither_seed=None):
    """Write ``data`` as a tile-compressed image using CFITSIO itself.

    ``tile`` is in FITS axis order (axis 1 first).  ``qlevel`` follows the
    CFITSIO convention: >0 relative to tile noise, <0 absolute delta.
    """
    lib = _load()
    if lib is None:
        raise CFITSIOError("libcfitsio not available")
    data = np.ascontiguousarray(data)
    status = ctypes.c_int(0)
    fptr = ctypes.c_void_p()
    _ck_path = ("!" + str(path)).encode()       # ! = clobber
    lib.ffinit(ctypes.byref(fptr), _ck_path, ctypes.byref(status))
    _ck(status, "ffinit")
    try:
        lib.fits_set_compression_type(fptr, int(cmptype),
                                      ctypes.byref(status))
        _ck(status, "set_compression_type")
        if tile is not None:
            dims = (ctypes.c_long * len(tile))(*[int(t) for t in tile])
            lib.fits_set_tile_dim(fptr, len(tile), dims,
                                  ctypes.byref(status))
            _ck(status, "set_tile_dim")
        if dither is not None:
            lib.fits_set_quantize_method(fptr, int(dither),
                                         ctypes.byref(status))
            _ck(status, "set_quantize_method")
        if dither_seed is not None:
            lib.fits_set_dither_seed(fptr, int(dither_seed),
                                     ctypes.byref(status))
            _ck(status, "set_dither_seed")
        if qlevel is not None:
            lib.fits_set_quantize_level(fptr, float(qlevel),
                                        ctypes.byref(status))
            _ck(status, "set_quantize_level")
        naxes_np = list(data.shape[::-1])       # FITS order
        naxes = (ctypes.c_long * data.ndim)(*naxes_np)
        if data.dtype == np.float32:
            bitpix = -32
        elif data.dtype == np.int32:
            bitpix = 32
        elif data.dtype == np.int16:
            bitpix = 16
        else:
            raise CFITSIOError(f"unsupported dtype {data.dtype}")
        lib.ffcrim(fptr, bitpix, data.ndim, naxes, ctypes.byref(status))
        _ck(status, "ffcrim")
        n = data.size
        if data.dtype == np.float32:
            if np.isnan(data).any():
                # null-aware write: NaNs become the reserved quantized
                # null (and ZBLANK is recorded).  ffppne matches nulls by
                # equality, so swap NaN for a finite sentinel first.
                sentinel = np.float32(-9.9e33)
                buf = np.where(np.isnan(data), sentinel,
                               data).astype(np.float32)
                lib.ffppne(fptr, 1, 1, n,
                           buf.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_float(sentinel), ctypes.byref(status))
            else:
                lib.ffppre(fptr, 1, 1, n,
                           data.ctypes.data_as(ctypes.c_void_p),
                           ctypes.byref(status))
        else:
            arr = data.astype(np.int32)
            lib.ffpprk(fptr, 1, 1, n,
                       arr.ctypes.data_as(ctypes.c_void_p),
                       ctypes.byref(status))
        _ck(status, "write image")
    finally:
        cst = ctypes.c_int(0)
        lib.ffclos(fptr, ctypes.byref(cst))
    return str(path)


def read_image(path, shape, dtype=np.float32, hdu=2):
    """Read (and transparently decompress) an image with CFITSIO."""
    lib = _load()
    if lib is None:
        raise CFITSIOError("libcfitsio not available")
    status = ctypes.c_int(0)
    fptr = ctypes.c_void_p()
    lib.ffopen(ctypes.byref(fptr), str(path).encode(), READONLY,
               ctypes.byref(status))
    _ck(status, "ffopen")
    try:
        hdutype = ctypes.c_int(0)
        lib.ffmahd(fptr, int(hdu), ctypes.byref(hdutype),
                   ctypes.byref(status))
        _ck(status, "ffmahd")
        n = int(np.prod(shape))
        anynul = ctypes.c_int(0)
        if np.dtype(dtype) == np.float32:
            out = np.empty(n, dtype=np.float32)
            lib.ffgpve(fptr, 1, 1, n, ctypes.c_float(np.nan),
                       out.ctypes.data_as(ctypes.c_void_p),
                       ctypes.byref(anynul), ctypes.byref(status))
        else:
            out = np.empty(n, dtype=np.int32)
            lib.ffgpvk(fptr, 1, 1, n, 0,
                       out.ctypes.data_as(ctypes.c_void_p),
                       ctypes.byref(anynul), ctypes.byref(status))
        _ck(status, "ffgpv")
    finally:
        cst = ctypes.c_int(0)
        lib.ffclos(fptr, ctypes.byref(cst))
    return out.reshape(shape)


def rice_decode_oracle(buf, npix, bytepix=4, blocksize=32):
    """Decode a RICE_1 bitstream with CFITSIO's fits_rdecomp*."""
    lib = _load()
    if lib is None:
        raise CFITSIOError("libcfitsio not available")
    b = bytes(buf)
    if bytepix == 4:
        out = np.empty(npix, dtype=np.uint32)
        rc = lib.fits_rdecomp(b, len(b),
                              out.ctypes.data_as(ctypes.c_void_p),
                              npix, blocksize)
        signed = out.view(np.int32)
    elif bytepix == 2:
        out = np.empty(npix, dtype=np.uint16)
        rc = lib.fits_rdecomp_short(b, len(b),
                                    out.ctypes.data_as(ctypes.c_void_p),
                                    npix, blocksize)
        signed = out.view(np.int16)
    else:
        out = np.empty(npix, dtype=np.uint8)
        rc = lib.fits_rdecomp_byte(b, len(b),
                                   out.ctypes.data_as(ctypes.c_void_p),
                                   npix, blocksize)
        signed = out  # byte RICE is unsigned in CFITSIO
    if rc != 0:
        raise CFITSIOError(f"fits_rdecomp rc={rc}")
    return signed.astype(np.int64)


def rice_encode_oracle(values, bytepix=4, blocksize=32):
    """Encode integer pixels with CFITSIO's fits_rcomp*."""
    lib = _load()
    if lib is None:
        raise CFITSIOError("libcfitsio not available")
    vals = np.asarray(values)
    npix = vals.size
    cap = npix * max(bytepix, 4) + 64
    out = np.zeros(cap, dtype=np.uint8)
    if bytepix == 4:
        arr = vals.astype(np.int32)
        n = lib.fits_rcomp(arr.ctypes.data_as(ctypes.c_void_p), npix,
                           out.ctypes.data_as(ctypes.c_void_p), cap,
                           blocksize)
    elif bytepix == 2:
        arr = vals.astype(np.int16)
        n = lib.fits_rcomp_short(arr.ctypes.data_as(ctypes.c_void_p), npix,
                                 out.ctypes.data_as(ctypes.c_void_p), cap,
                                 blocksize)
    else:
        arr = vals.astype(np.uint8).view(np.int8)
        n = lib.fits_rcomp_byte(arr.ctypes.data_as(ctypes.c_void_p), npix,
                                out.ctypes.data_as(ctypes.c_void_p), cap,
                                blocksize)
    if n <= 0:
        raise CFITSIOError(f"fits_rcomp returned {n}")
    return bytes(out[:n].tobytes())
