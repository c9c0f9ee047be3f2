"""FITS Tiled Image Compression convention (ZIMAGE=T): RICE_1 / GZIP_1 /
GZIP_2 codecs, reader and writer.

Real ALMA archive products are frequently tile-compressed.  The reference
reads them for free through astropy (its ``fits.open`` handles
``CompImageHDU`` transparently — reference spectral_cube/io/fits.py:76-81);
this framework's native FITS stack implements the convention directly:
the compressed HDU is a BINTABLE whose ``COMPRESSED_DATA`` column holds
one heap block per tile, with the image geometry in ``ZNAXISn``/``ZTILEn``
and the codec in ``ZCMPTYPE``.

RICE_1 is the Rice/FS code as specified by the convention (and by
CFITSIO's fits_rcomp/fits_rdecomp, whose bitstream it must match):
successive pixel differences are zigzag-mapped to non-negative ints; each
block of ``BLOCKSIZE`` (default 32) pixels picks a split position ``fs``
and stores each value as ``value >> fs`` in unary (that many 0-bits then
a 1) followed by the ``fs`` low bits; two escape selectors mark
all-zero-difference blocks and uncompressed (bit-for-bit) blocks.

Unsupported codecs raise :class:`~..utils.FITSReadError` naming the
compression rather than silently skipping the HDU.
"""

from __future__ import annotations

import zlib
from collections import OrderedDict

import numpy as np

from ..utils import FITSReadError

__all__ = ["is_compressed_image", "decompress_image_hdu",
           "compressed_image_blocks", "rice_encode", "rice_decode"]

_FSBITS = {1: 3, 2: 4, 4: 5}
_FSMAX = {1: 6, 2: 14, 4: 25}


def is_compressed_image(header) -> bool:
    val = header.get("ZIMAGE", False)
    return val is True or str(val).strip().upper() in ("T", "TRUE", "1")


# ------------------------------------------------------------------ RICE


def rice_decode(buf, npix, blocksize=32, bytepix=4):
    """Decode one RICE_1 tile into int values (int64 work array).

    ``buf``: the tile's compressed bytes; ``npix``: pixel count."""
    fsbits = _FSBITS[bytepix]
    fsmax = _FSMAX[bytepix]
    bbits = 8 * bytepix
    mask = (1 << bbits) - 1
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    nbits = bits.shape[0]
    # pack back to python ints lazily via positions
    out = np.empty(npix, dtype=np.int64)
    lastpix = 0
    for b in buf[:bytepix]:
        lastpix = (lastpix << 8) | b
    pos = bbits

    def read(n, pos):
        v = 0
        for bit in bits[pos:pos + n]:
            v = (v << 1) | int(bit)
        return v, pos + n

    i = 0
    while i < npix:
        thisblock = min(blocksize, npix - i)
        if pos + fsbits > nbits:
            raise FITSReadError("RICE_1 tile bitstream truncated")
        fs, pos = read(fsbits, pos)
        fs -= 1
        if fs < 0:
            out[i:i + thisblock] = lastpix
            i += thisblock
        elif fs == fsmax:
            for j in range(thisblock):
                diff, pos = read(bbits, pos)
                if diff & 1:
                    diff = ~(diff >> 1)
                else:
                    diff >>= 1
                lastpix = (lastpix + diff) & mask
                out[i + j] = lastpix
            i += thisblock
        else:
            for j in range(thisblock):
                # unary: count 0-bits to the terminating 1
                nz = int(np.argmax(bits[pos:]))
                if not bits[pos + nz]:
                    raise FITSReadError("RICE_1 tile bitstream truncated")
                pos += nz + 1
                low, pos = read(fs, pos)
                diff = (nz << fs) | low
                if diff & 1:
                    diff = ~(diff >> 1)
                else:
                    diff >>= 1
                lastpix = (lastpix + diff) & mask
                out[i + j] = lastpix
            i += thisblock
    # reinterpret as signed bytepix-width ints
    half = 1 << (bbits - 1)
    if bytepix > 1:
        out = np.where(out >= half, out - (1 << bbits), out)
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.bytes.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def done(self):
        if self.nacc:
            self.bytes.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = self.nacc = 0
        return bytes(self.bytes)


def rice_encode(values, blocksize=32, bytepix=4):
    """Encode one tile of integer pixel values as a RICE_1 bitstream."""
    fsbits = _FSBITS[bytepix]
    fsmax = _FSMAX[bytepix]
    bbits = 8 * bytepix
    mask = (1 << bbits) - 1
    vals = np.asarray(values).astype(np.int64) & mask
    npix = vals.shape[0]
    w = _BitWriter()
    first = int(vals[0])
    w.write(first, bbits)
    lastpix = first
    # zigzag-mapped successive differences (wraparound arithmetic)
    diffs = np.empty(npix, dtype=object)
    for idx in range(npix):
        d = (int(vals[idx]) - lastpix) & mask
        if d >= (1 << (bbits - 1)):
            d -= 1 << bbits     # shortest signed representative
        diffs[idx] = (~(d << 1)) if d < 0 else (d << 1)
        lastpix = int(vals[idx])
    i = 0
    while i < npix:
        thisblock = min(blocksize, npix - i)
        block = [int(diffs[i + j]) for j in range(thisblock)]
        pixelsum = float(sum(block))
        if pixelsum == 0.0:
            w.write(0, fsbits)          # selector 0 -> fs = -1: all zero
            i += thisblock
            continue
        dpsum = (pixelsum - thisblock / 2.0 - 1.0) / thisblock
        if dpsum < 0:
            dpsum = 0.0
        psum = int(dpsum) >> 1
        fs = 0
        while psum > 0:
            psum >>= 1
            fs += 1
        if fs >= fsmax:
            w.write(fsmax + 1, fsbits)  # escape: raw bbits copies
            for v in block:
                w.write(v, bbits)
        else:
            w.write(fs + 1, fsbits)
            for v in block:
                top = v >> fs
                w.write(1, top + 1)     # `top` zeros then a 1
                if fs:
                    w.write(v, fs)
        i += thisblock
    return w.done()


# -------------------------------------------------------------- GZIP 1/2


def _gzip1_decode(buf, npix, dtype):
    raw = zlib.decompress(bytes(buf))
    return np.frombuffer(raw, dtype=dtype, count=npix).astype(
        dtype.newbyteorder("="))


def _gzip2_decode(buf, npix, dtype):
    raw = zlib.decompress(bytes(buf))
    itemsize = dtype.itemsize
    shuf = np.frombuffer(raw, dtype=np.uint8, count=npix * itemsize)
    unshuf = shuf.reshape(itemsize, npix).T.copy()
    return unshuf.view(dtype)[:, 0].astype(dtype.newbyteorder("="))


# ------------------------------------------------------------- the HDU


def _tile_grid(znaxis, ztile):
    """Tile spans in numpy (reversed-FITS) axis order; iteration is FITS
    order (axis 1 fastest)."""
    counts = [-(-n // t) for n, t in zip(znaxis, ztile)]
    return counts


def _header_get_int(header, key, default=None):
    v = header.get(key, default)
    if v is None:
        raise FITSReadError(f"compressed HDU missing {key}")
    return int(v)


def decompress_image_hdu(header, table_buf, heap_buf):
    """Reconstruct (image_header_dict, data ndarray) from a tile-compressed
    BINTABLE's fixed table bytes + heap bytes."""
    cmptype = str(header.get("ZCMPTYPE", "")).strip().upper()
    if cmptype not in ("RICE_1", "RICE_ONE", "GZIP_1", "GZIP_2"):
        raise FITSReadError(
            f"unsupported tile compression {cmptype or '?'!r} "
            "(supported: RICE_1, GZIP_1, GZIP_2)")
    zbitpix = _header_get_int(header, "ZBITPIX")
    znaxis_n = _header_get_int(header, "ZNAXIS")
    dims_fits = [_header_get_int(header, f"ZNAXIS{i}")
                 for i in range(1, znaxis_n + 1)]
    tile_fits = [int(header.get(f"ZTILE{i}", dims_fits[0] if i == 1 else 1))
                 for i in range(1, znaxis_n + 1)]
    # RICE parameters
    blocksize, bytepix = 32, abs(zbitpix) // 8 if zbitpix > 0 else 4
    for i in (1, 2):
        name = str(header.get(f"ZNAME{i}", "")).strip().upper()
        if name == "BLOCKSIZE":
            blocksize = _header_get_int(header, f"ZVAL{i}")
        elif name == "BYTEPIX":
            bytepix = _header_get_int(header, f"ZVAL{i}")
    if zbitpix > 0 and bytepix not in _FSBITS and cmptype.startswith("RICE"):
        raise FITSReadError(f"RICE_1 BYTEPIX {bytepix} unsupported")

    nrows = _header_get_int(header, "NAXIS2")
    rowlen = _header_get_int(header, "NAXIS1")
    tfields = _header_get_int(header, "TFIELDS")
    # parse the fixed table: P descriptors -> (len, offset) int32 pairs,
    # Q descriptors -> int64 pairs; scalar D columns for ZSCALE/ZZERO
    names, formats, offsets = [], [], []
    off = 0
    import re as _re
    for i in range(1, tfields + 1):
        name = str(header.get(f"TTYPE{i}", f"COL{i}")).strip()
        tform = str(header[f"TFORM{i}"]).strip()
        m = _re.fullmatch(r"(\d*)([PQ])([A-Z])\(?\d*\)?", tform)
        if m:
            kind = ">i4" if m.group(2) == "P" else ">i8"
            names.append(name)
            formats.append((kind, (2,)))
            offsets.append(off)
            off += np.dtype(kind).itemsize * 2
            continue
        m = _re.fullmatch(r"(\d*)([LBIJKED])", tform)
        if not m:
            raise FITSReadError(f"unsupported TFORM {tform!r} in "
                                "compressed HDU")
        rep = int(m.group(1) or 1)
        base = {"L": ">u1", "B": ">u1", "I": ">i2", "J": ">i4",
                "K": ">i8", "E": ">f4", "D": ">f8"}[m.group(2)]
        names.append(name)
        formats.append(base if rep == 1 else (base, (rep,)))
        offsets.append(off)
        off += np.dtype(base).itemsize * rep
    dtype = np.dtype({"names": names, "formats": formats,
                      "offsets": offsets, "itemsize": rowlen})
    rec = np.frombuffer(table_buf[:nrows * rowlen], dtype=dtype)

    col = None
    gzip_col = None
    if "COMPRESSED_DATA" in names:
        col = rec["COMPRESSED_DATA"]
    if "GZIP_COMPRESSED_DATA" in names:
        gzip_col = rec["GZIP_COMPRESSED_DATA"]
    if col is None and gzip_col is None:
        raise FITSReadError("compressed HDU lacks COMPRESSED_DATA")

    zscale = rec["ZSCALE"].astype("f8") if "ZSCALE" in names else None
    zzero = rec["ZZERO"].astype("f8") if "ZZERO" in names else None
    zblank_hdr = header.get("ZBLANK", None)

    # numpy (reversed) geometry
    dims = dims_fits[::-1]
    tile = tile_fits[::-1]
    counts = _tile_grid(dims, tile)
    quantized = zbitpix > 0 and (zscale is not None or zzero is not None
                                 or int(header.get("ZQUANTIZ_FLAG", 0)))
    float_out = str(header.get("ZQUANTIZ", "")).strip() != "" \
        or quantized or zbitpix < 0
    if zbitpix < 0:
        out_dtype = np.float32 if zbitpix == -32 else np.float64
        comp_dtype = np.dtype(">f4" if zbitpix == -32 else ">f8")
    else:
        out_dtype = np.float64 if float_out else {
            8: np.uint8, 16: np.int16, 32: np.int32, 64: np.int64}[zbitpix]
        comp_dtype = np.dtype({8: ">u1", 16: ">i2", 32: ">i4",
                               64: ">i8"}[zbitpix])
    data = np.empty(dims, dtype=out_dtype)

    ntiles = int(np.prod(counts))
    if nrows != ntiles:
        raise FITSReadError(f"compressed HDU has {nrows} rows for "
                            f"{ntiles} tiles")
    for row in range(ntiles):
        # tile index in FITS order: axis 1 fastest
        rem = row
        idx_fits = []
        for c in counts[::-1]:         # FITS axis 1 first
            idx_fits.append(rem % c)
            rem //= c
        # -> numpy slices (reverse order back)
        slices = tuple(
            slice(idx * t, min(idx * t + t, n))
            for idx, t, n in zip(idx_fits[::-1], tile, dims))
        npix = int(np.prod([s.stop - s.start for s in slices]))
        ln, hoff = (int(col[row][0]), int(col[row][1])) if col is not None \
            else (0, 0)
        if ln == 0 and gzip_col is not None:
            ln, hoff = int(gzip_col[row][0]), int(gzip_col[row][1])
            vals = _gzip1_decode(heap_buf[hoff:hoff + ln], npix, comp_dtype)
        elif cmptype.startswith("RICE"):
            ivals = rice_decode(heap_buf[hoff:hoff + ln], npix,
                                blocksize=blocksize, bytepix=bytepix)
            vals = ivals
        elif cmptype == "GZIP_1":
            vals = _gzip1_decode(heap_buf[hoff:hoff + ln], npix, comp_dtype)
        else:
            vals = _gzip2_decode(heap_buf[hoff:hoff + ln], npix, comp_dtype)
        vals = np.asarray(vals)
        if zbitpix > 0 and quantized:
            sc = float(zscale[row]) if zscale is not None else 1.0
            zr = float(zzero[row]) if zzero is not None else 0.0
            fvals = vals.astype(np.float64) * sc + zr
            if zblank_hdr is not None:
                fvals = np.where(vals == int(zblank_hdr), np.nan, fvals)
            vals = fvals
        elif zbitpix > 0 and zblank_hdr is not None and float_out:
            vals = np.where(vals == int(zblank_hdr), np.nan,
                            vals.astype(np.float64))
        data[slices] = vals.reshape([s.stop - s.start for s in slices]) \
            .astype(out_dtype, copy=False)

    # reconstructed image header: Z-keywords restored, table scaffolding
    # dropped (mirrors astropy CompImageHDU.header)
    img = OrderedDict()
    img["BITPIX"] = zbitpix if not (zbitpix > 0 and float_out) else -64
    img["NAXIS"] = znaxis_n
    for i in range(1, znaxis_n + 1):
        img[f"NAXIS{i}"] = dims_fits[i - 1]
    drop_prefixes = ("Z", "TTYPE", "TFORM", "TUNIT", "TDIM")
    drop = {"XTENSION", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "PCOUNT",
            "GCOUNT", "TFIELDS", "THEAP", "EXTNAME"}
    for key in header.keys():
        ku = str(key).upper()
        if ku in drop or any(ku.startswith(p) and ku != "ZODIAC"
                             for p in drop_prefixes):
            continue
        img[key] = header[key]
    return img, data


# --------------------------------------------------------------- writer


def compressed_image_blocks(data, header=None, cmptype="RICE_1",
                            tile=None, blocksize=32):
    """Build the BINTABLE header dict + table/heap payload bytes for one
    tile-compressed image HDU (integer data lossless; float data is
    stored via GZIP of the raw bytes — no lossy quantization).

    Returns (table_header_dict, payload_bytes) where payload is the
    fixed table followed by the heap, unpadded."""
    data = np.asarray(data)
    cmptype = cmptype.upper()
    if cmptype not in ("RICE_1", "GZIP_1", "GZIP_2"):
        raise ValueError(f"unsupported compression {cmptype!r}")
    if data.dtype.kind == "f":
        bitpix = -32 if data.dtype.itemsize == 4 else -64
        comp_dtype = np.dtype(">f4" if bitpix == -32 else ">f8")
        if cmptype.startswith("RICE"):
            # lossless float RICE needs quantization; store via GZIP_1
            cmptype = "GZIP_1"
    else:
        bitpix = {1: 8, 2: 16, 4: 32, 8: 64}[data.dtype.itemsize]
        comp_dtype = np.dtype({8: ">u1", 16: ">i2", 32: ">i4",
                               64: ">i8"}[bitpix])
    dims = list(data.shape)           # numpy order
    dims_fits = dims[::-1]
    n = len(dims)
    if tile is None:
        tile_fits = [dims_fits[0]] + [1] * (n - 1)
    else:
        tile_fits = list(tile)
    tile_np = tile_fits[::-1]
    counts = _tile_grid(dims, tile_np)
    ntiles = int(np.prod(counts))
    bytepix = min(comp_dtype.itemsize, 4) if bitpix > 0 else 4

    heap = bytearray()
    descrs = []
    for row in range(ntiles):
        rem = row
        idx_fits = []
        for c in counts[::-1]:
            idx_fits.append(rem % c)
            rem //= c
        slices = tuple(slice(idx * t, min(idx * t + t, nn))
                       for idx, t, nn in zip(idx_fits[::-1], tile_np, dims))
        tile_vals = np.ascontiguousarray(data[slices]).ravel()
        if cmptype == "RICE_1":
            enc = rice_encode(tile_vals.astype(np.int64),
                              blocksize=blocksize, bytepix=bytepix)
        elif cmptype == "GZIP_1":
            enc = zlib.compress(tile_vals.astype(comp_dtype).tobytes())
        else:
            be = tile_vals.astype(comp_dtype).view(np.uint8) \
                .reshape(-1, comp_dtype.itemsize).T
            enc = zlib.compress(np.ascontiguousarray(be).tobytes())
        descrs.append((len(enc), len(heap)))
        heap.extend(enc)

    table = np.zeros((ntiles,), dtype=np.dtype([("d", ">i4", (2,))]))
    for row, (ln, off) in enumerate(descrs):
        table["d"][row] = (ln, off)
    maxlen = max((d[0] for d in descrs), default=0)

    hdr = OrderedDict()
    hdr["XTENSION"] = "BINTABLE"
    hdr["BITPIX"] = 8
    hdr["NAXIS"] = 2
    hdr["NAXIS1"] = 8
    hdr["NAXIS2"] = ntiles
    hdr["PCOUNT"] = len(heap)
    hdr["GCOUNT"] = 1
    hdr["TFIELDS"] = 1
    hdr["TTYPE1"] = "COMPRESSED_DATA"
    hdr["TFORM1"] = f"1PB({maxlen})"
    hdr["ZIMAGE"] = True
    hdr["ZCMPTYPE"] = cmptype
    hdr["ZBITPIX"] = bitpix
    hdr["ZNAXIS"] = n
    for i in range(1, n + 1):
        hdr[f"ZNAXIS{i}"] = dims_fits[i - 1]
        hdr[f"ZTILE{i}"] = tile_fits[i - 1]
    if cmptype == "RICE_1":
        hdr["ZNAME1"] = "BLOCKSIZE"
        hdr["ZVAL1"] = blocksize
        hdr["ZNAME2"] = "BYTEPIX"
        hdr["ZVAL2"] = bytepix
    if header is not None:
        skip = set(hdr) | {"SIMPLE", "BITPIX", "NAXIS", "EXTEND"} | {
            f"NAXIS{i}" for i in range(1, 8)}
        for key in header.keys():
            if str(key).upper() not in skip:
                hdr[key] = header[key]
    payload = table.tobytes() + bytes(heap)
    return hdr, payload
