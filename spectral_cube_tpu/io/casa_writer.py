"""Native CASA image writer (no casatools required).

Inverse of :mod:`.casa_low`: serializes the AipsIO table structures
(Table/TableDesc/TableRecord/Array<T>/IPosition), the TiledCellStMan
storage manager header, and the tiled payloads — producing a ``.image``
directory laid out like casacore's PlainTable (table.dat / table.f0 /
table.f0_TSM0 / table.info, plus a ``mask0`` subtable for the validity
mask).  The reference can only write CASA images through casatools
(``io/casa_masks.py``); here it is native and round-trips through our own
reader bit-exactly.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .casa_low import TP_BOOL, TP_FLOAT

__all__ = ["write_casa_image"]

# FITS SPECSYS -> casacore MFrequency frame names (inverse of
# casa_low._SPECTRAL_SYSTEMS); unknown frames degrade to TOPO with the
# mapping below rather than silently — extendable as needed
_SPECSYS_TO_CASA = {"BARYCENT": "BARY", "LSRK": "LSRK", "LSRD": "LSRD",
                    "TOPOCENT": "TOPO", "GEOCENTR": "GEO",
                    "GALACTOC": "GALACTO", "LOCALGRP": "LGROUP",
                    "CMBDIPOL": "CMB", "SOURCE": "REST"}


class AipsIOWriter:
    def __init__(self):
        self.parts = [b""]

    def raw(self, b):
        self.parts.append(b)

    def u8(self, v):
        self.raw(struct.pack(">B", v))

    def u32(self, v):
        self.raw(struct.pack(">I", int(v) & 0xFFFFFFFF))

    def i32(self, v):
        self.raw(struct.pack(">i", int(v)))

    def f32(self, v):
        self.raw(struct.pack(">f", float(v)))

    def f64(self, v):
        self.raw(struct.pack(">d", float(v)))

    def string(self, s):
        b = str(s).encode("latin1")
        self.u32(len(b))
        self.raw(b)

    def block(self, typename, version):
        """Context manager writing a length-prefixed putstart object."""
        return _Block(self, typename, version)

    def getvalue(self):
        return b"".join(self.parts)


class _Block:
    def __init__(self, w: AipsIOWriter, typename, version):
        self.w = w
        self.typename = typename
        self.version = version

    def __enter__(self):
        self.idx = len(self.w.parts)
        self.w.raw(b"\x00\x00\x00\x00")  # placeholder for the length
        self.w.string(self.typename)
        self.w.u32(self.version)
        return self

    def __exit__(self, *exc):
        total = sum(len(p) for p in self.w.parts[self.idx:])
        self.w.parts[self.idx] = struct.pack(">I", total)
        return False


def _field_type(value):
    if isinstance(value, dict):
        return 25
    if isinstance(value, bool):
        return 0
    if isinstance(value, (int, np.integer)):
        return 5
    if isinstance(value, (float, np.floating)):
        return 8
    if isinstance(value, str):
        return 11
    arr = np.asarray(value)
    if arr.dtype == object or arr.dtype.kind in "SU":
        return 24  # Array<String>
    if arr.dtype.kind == "b":
        return 13
    if arr.dtype.kind in "iu":
        return 18  # Array<Int>
    return 21      # Array<double>


_ARRAY_NAMES = {13: ("Bool", None), 18: ("Int", ">i4"),
                20: ("Float", ">f4"), 21: ("double", ">f8"),
                24: ("String", None)}


def write_recorddesc(w, record):
    with w.block("RecordDesc", 2):
        w.u32(len(record))
        for name, value in record.items():
            w.string(name)
            tp = _field_type(value)
            w.i32(tp)
            if tp == 25:
                write_recorddesc(w, value)
            elif 13 <= tp <= 24:
                with w.block("IPosition", 1):
                    w.u32(1)
                    w.u32(0xFFFFFFFF)  # variable shape marker (-1)
            w.string("")  # comment


def write_aips_array(w, value, tp):
    name, dt = _ARRAY_NAMES[tp]
    arr = np.asarray(value)
    with w.block(f"Array<{name}>", 3):
        w.u32(arr.ndim if arr.ndim else 1)
        # casacore Array streams carry dims as-is with Fortran-ordered
        # payloads (reversed-dims + C-ravel wrote the TRANSPOSE of 2-D
        # records like the pc matrix)
        for d in (arr.shape if arr.ndim else (1,)):
            w.u32(d)
        w.u32(arr.size)
        if tp == 24:
            for s in arr.ravel(order="F"):
                w.string(str(s))
        elif tp == 13:
            w.raw(arr.ravel(order="F").astype("u1").tobytes())
        else:
            w.raw(arr.ravel(order="F").astype(dt).tobytes())


def write_tablerecord(w, record):
    with w.block("TableRecord", 1):
        write_recorddesc(w, record)
        w.u32(1)  # record type
        for name, value in record.items():
            tp = _field_type(value)
            if tp == 25:
                write_tablerecord(w, value)
            elif tp == 11:
                w.string(value)
            elif tp == 5:
                w.i32(value)
            elif tp == 8:
                w.f64(value)
            elif tp == 0:
                w.u8(1 if value else 0)
            else:
                write_aips_array(w, value, tp)


def _write_table_dat(path, keywords, colname, dtype_code, ndim):
    w = AipsIOWriter()
    w.u32(0xBEBEBEBE)
    with w.block("Table", 2):
        w.u32(1)   # number of rows
        w.u32(0)   # format: 0 = big-endian payloads
        w.string("PlainTable")
        with w.block("TableDesc", 2):
            w.string("")
            w.string("")
            w.string("")
            write_tablerecord(w, keywords)
            write_tablerecord(w, {f"Hypercolumn_{colname}": {
                "ndim": ndim,
                "data": np.array([colname], dtype=object),
                "coord": np.array([], dtype=object),
                "id": np.array([], dtype=object)}})
            w.u32(1)  # number of columns
            w.u32(1)
            typename = "Bool" if dtype_code == TP_BOOL else "float"
            w.string(f"ArrayColumnDesc<{typename:<8s}")
            w.u32(1)
            w.string(colname)
            w.string("version 4.0")
            w.string("TiledShapeStMan")
            w.string(colname)
            w.u32(dtype_code)
            w.u32(0)
            w.i32(ndim)
            with w.block("IPosition", 1):
                w.u32(0)
            w.u32(0)
            write_tablerecord(w, {})
            w.u32(1)
            w.u8(0)
        # PlainTable trailer: data manager bindings
        w.raw(b"\xff\xff\xff\xfe")
        w.u32(1)  # nrow
        w.u32(1)
        w.u32(1)  # number of data managers
        w.string("TiledCellStMan")
        w.u32(0)
        w.u32(2)
        w.string(colname)
        w.u32(1)
        w.u32(0)
        w.u32(0)
        w.u8(0)
    with open(path, "wb") as f:
        f.write(w.getvalue())


def _encode_tiles(arr_np, casa_shape, tile_shape, dtype_code):
    """Re-layout a numpy array (shape ``casa_shape[::-1]``) into CASA's
    tiled payload: tiles traverse the tile grid in Fortran order over the
    CASA dims, each tile Fortran-ordered (ragged edges zero-padded;
    booleans bit-packed LSB-first per tile) — the exact inverse of
    casa_low.read_tiled_data."""
    ntiles = [-(-c // t) for c, t in zip(casa_shape, tile_shape)]
    np_tile = tile_shape[::-1]
    padded = [nt * t for nt, t in zip(ntiles, tile_shape)][::-1]
    pads = [(0, p - s) for p, s in zip(padded, arr_np.shape)]
    arrp = np.pad(arr_np, pads)
    # vectorized tile re-layout (the per-tile Python loop took minutes
    # and 3x transient memory for realistically-tiled near-4-GiB cubes):
    # split every np axis into (grid, tile) pairs, bring the grid axes to
    # the front — grid C-order over the reversed-casa axes IS the casa
    # Fortran tile traversal, and each tile C-ravels in np order exactly
    # like arrp[sl].ravel() did.
    n = arrp.ndim
    split = []
    for g, t in zip(ntiles[::-1], np_tile):
        split.extend([g, t])
    interleaved = arrp.reshape(split)
    perm = list(range(0, 2 * n, 2)) + list(range(1, 2 * n, 2))
    tiles2d = interleaved.transpose(perm).reshape(
        int(np.prod(ntiles)), int(np.prod(np_tile)))
    if dtype_code == TP_BOOL:
        # per-tile bit packing: packbits(axis=1) pads each TILE to a
        # byte boundary, matching the reader's per-tile layout
        return np.packbits(tiles2d.astype("u1"), axis=1,
                           bitorder="little").tobytes()
    return np.ascontiguousarray(tiles2d, dtype=">f4").tobytes()


def _write_tsm(dirpath, colname, data_casa_shape, payload, dtype_code,
               tile_shape=None):
    """table.f0 header + table.f0_TSM0 payload.  ``tile_shape`` (CASA
    order) defaults to the whole cube (single tile); pass a smaller shape
    to write genuinely multi-tile hypercubes."""
    tile_shape = list(tile_shape) if tile_shape is not None \
        else list(data_casa_shape)
    if len(payload) > 0xFFFFFFFF:
        # the TiledStMan v2 header stores the total byte count as u32;
        # silently masking it would write an image casacore cannot read
        raise ValueError(
            f"CASA TiledStMan payload is {len(payload)} bytes (> 4 GiB, "
            "the u32 limit of the version-2 header); write the cube as "
            "FITS or split it before export")
    w = AipsIOWriter()
    w.u32(0xBEBEBEBE)
    with w.block("TiledCellStMan", 1):
        with w.block("IPosition", 1):
            w.u32(len(data_casa_shape))
            for d in data_casa_shape:
                w.u32(d)
        with w.block("TiledStMan", 2):
            w.u32(0)
            w.u32(0)
            w.u8(1)
            w.u32(1)            # sequence number
            w.u32(dtype_code)
            w.string(colname)
            w.u32(0)
            w.u32(len(data_casa_shape))
            w.u32(1)
            w.u8(1)
            w.u32(1)
            w.u32(0)
            w.u32(len(payload))
            w.u32(1)            # one hypercube
            w.u32(1)
            with w.block("Record", 1):
                with w.block("RecordDesc", 2):
                    w.u32(0)
                w.u32(1)
            for shape in (data_casa_shape, tile_shape):  # cube, tile
                with w.block("IPosition", 1):
                    w.u32(len(shape))
                    for d in shape:
                        w.u32(d)
            w.u32(0)
            w.u32(0)
    with open(os.path.join(dirpath, "table.f0"), "wb") as f:
        f.write(w.getvalue())
    with open(os.path.join(dirpath, "table.f0_TSM0"), "wb") as f:
        f.write(payload)


def _write_info(dirpath, typename):
    with open(os.path.join(dirpath, "table.info"), "w") as f:
        f.write(f"Type = {typename}\nSubType = \n\n")


def _wcs_to_casa_coords(wcs, stokes_names=None):
    """Inverse of casa_low.casa_coords_to_wcs for the axes we write."""
    D2R = np.pi / 180.0
    coords = {}
    ci = 0
    world_index = {}
    # direction
    if wcs.has_celestial:
        li, bi = wcs.lon_axis, wcs.lat_axis
        system = "J2000"
        if wcs.ctype[li].startswith("GLON"):
            system = "GALACTIC"
        elif wcs.radesys == "ICRS":
            system = "ICRS"
        proj = wcs.projection_code or "SIN"
        coords[f"direction{ci}"] = {
            "system": system,
            "projection": proj,
            "projection_parameters": np.zeros(2),
            "crval": np.array([wcs.crval[li] * wcs.cunit[li].to("rad"),
                               wcs.crval[bi] * wcs.cunit[bi].to("rad")]),
            "crpix": np.array([wcs.crpix[li] - 1.0, wcs.crpix[bi] - 1.0]),
            "cdelt": np.array([wcs.cdelt[li] * wcs.cunit[li].to("rad"),
                               wcs.cdelt[bi] * wcs.cunit[bi].to("rad")]),
            "pc": np.array([[wcs.pc[li, li], wcs.pc[li, bi]],
                            [wcs.pc[bi, li], wcs.pc[bi, bi]]]),
            "axes": np.array(["Right Ascension", "Declination"]
                             if system != "GALACTIC" else
                             ["Longitude", "Latitude"], dtype=object),
            "units": np.array(["rad", "rad"], dtype=object),
            "conversionSystem": system,
            "longpole": float(wcs.lonpole if wcs.lonpole is not None
                              else 180.0),
            "latpole": float(wcs.latpole if wcs.latpole is not None
                             else wcs.crval[bi]),
        }
        coords[f"worldmap{ci}"] = np.array([li, bi], dtype=np.int32)
        coords[f"worldreplace{ci}"] = coords[f"direction{ci}"]["crval"]
        coords[f"pixelmap{ci}"] = np.array([li, bi], dtype=np.int32)
        coords[f"pixelreplace{ci}"] = np.zeros(2)
        ci += 1
    if stokes_names:
        si = wcs.stokes_axis if wcs.stokes_axis >= 0 else 3
        coords[f"stokes{ci}"] = {
            "axes": np.array(["Stokes"], dtype=object),
            "stokes": np.array(list(stokes_names), dtype=object),
            "crval": np.array([1.0]), "crpix": np.array([0.0]),
            "cdelt": np.array([1.0]), "pc": np.array([[1.0]]),
        }
        coords[f"worldmap{ci}"] = np.array([si], dtype=np.int32)
        coords[f"worldreplace{ci}"] = np.array([1.0])
        coords[f"pixelmap{ci}"] = np.array([si], dtype=np.int32)
        coords[f"pixelreplace{ci}"] = np.array([0.0])
        ci += 1
    if wcs.spec >= 0:
        sp = wcs.spec
        # write the spectral axis as a (linear) frequency tabular record
        from ..units import Unit
        cunit = wcs.cunit[sp]
        if cunit.physical_type != "frequency":
            # convert reference/cdelt to Hz via the analytic transforms
            from ..wcs import convert_spectral_axis
            fwcs = convert_spectral_axis(wcs, Unit.parse("Hz"), "FREQ")
        else:
            fwcs = wcs
        crval = fwcs.crval[sp] * fwcs.cunit[sp].to("Hz")
        cdelt = fwcs.cdelt[sp] * fwcs.cunit[sp].to("Hz")
        coords[f"spectral{ci}"] = {
            "version": 2,
            "system": _SPECSYS_TO_CASA.get(wcs.specsys, "TOPO"),
            "restfreq": float(wcs.restfrq or 0.0),
            "restfreqs": np.array([float(wcs.restfrq or 0.0)]),
            "velType": 0,
            "nativeType": 2,
            "velUnit": "km/s",
            "waveUnit": "mm",
            "formatUnit": "",
            "tabular": {
                "crval": np.array([crval]),
                "crpix": np.array([wcs.crpix[sp] - 1.0]),
                "cdelt": np.array([cdelt]),
                "pc": np.array([[1.0]]),
                "axes": np.array(["Frequency"], dtype=object),
                "units": np.array(["Hz"], dtype=object),
            },
            "unit": "Hz",
            "name": "Frequency",
        }
        coords[f"worldmap{ci}"] = np.array([sp], dtype=np.int32)
        coords[f"worldreplace{ci}"] = np.array([crval])
        coords[f"pixelmap{ci}"] = np.array([sp], dtype=np.int32)
        coords[f"pixelreplace{ci}"] = np.array([0.0])
        ci += 1
    return coords


def _beam_record(beam):
    def q(v, unit):
        return {"value": float(v), "unit": unit}

    return {"major": q(beam.major.to_value("deg") * 3600, "arcsec"),
            "minor": q(beam.minor.to_value("deg") * 3600, "arcsec"),
            "positionangle": q(beam.pa.to_value("deg"), "deg")}


def write_casa_image(cube, dirname, overwrite=False, tile_shape=None,
                     with_stokes=True):
    """Write a cube (or StokesSpectralCube) as a CASA .image directory.

    ``tile_shape`` (CASA order [x, y, stokes, chan]) controls the tiled
    storage manager's tile size; the default is one tile spanning the
    whole cube.  Smaller tiles produce genuinely multi-tile hypercubes
    (what real CASA writes for large images).  ``with_stokes=False``
    writes a genuine 3-axis image (no degenerate Stokes axis — the form
    real CASA emits after ``imsubimage(dropdeg=True)``)."""
    from ..stokes import StokesSpectralCube

    if os.path.exists(dirname):
        if not overwrite:
            raise OSError(f"{dirname} exists; use overwrite=True")
        import shutil
        shutil.rmtree(dirname)
    os.makedirs(dirname)

    if isinstance(cube, StokesSpectralCube):
        comps = cube.components
        data_np = np.stack([np.asarray(cube[c].filled().value)
                            for c in comps], axis=0)
        ref = cube[comps[0]]
        stokes_names = comps
        with_stokes = True
    else:
        ref = cube
        data_np = np.asarray(cube.filled().value)[None]
        stokes_names = ["I"]
    nstokes, nchan, ny, nx = data_np.shape
    wcs3 = ref.wcs
    if with_stokes:
        # CASA pixel order: [x, y, stokes, freq]
        casa_shape = [nx, ny, nstokes, nchan]
        wcs_w = wcs3.add_stokes_axis(2)  # lon, lat, stokes, spec
        # numpy order for the CASA layout is [freq, stokes, y, x]
        arr = np.ascontiguousarray(np.swapaxes(data_np, 0, 1))
    else:
        casa_shape = [nx, ny, nchan]
        wcs_w = wcs3
        stokes_names = None
        arr = np.ascontiguousarray(data_np[0])     # [freq, y, x]
    if tile_shape is not None:
        payload = _encode_tiles(arr, casa_shape, list(tile_shape),
                                TP_FLOAT)
    else:
        payload = arr.astype(">f4").tobytes()

    keywords = {
        "coords": _wcs_to_casa_coords(wcs_w, stokes_names=stokes_names),
        "units": ref.unit.to_string(),
        "miscinfo": {k.lower(): v for k, v in ref.meta.items()
                     if isinstance(v, (str, int, float, bool))
                     and k.upper() not in ("BUNIT",)},
        "imageinfo": _imageinfo(ref, cube if isinstance(
            cube, StokesSpectralCube) else None),
        "Image_defaultmask": "mask0",
    }
    _write_table_dat(os.path.join(dirname, "table.dat"), keywords, "map",
                     TP_FLOAT, len(casa_shape))
    _write_tsm(dirname, "map", casa_shape, payload, TP_FLOAT,
               tile_shape=tile_shape)
    _write_info(dirname, "Image")

    # validity mask as a Bool subtable (bit-packed, LSB-first): the
    # cube's INCLUDE mask (isfinite alone drops the mask whenever the
    # fill value is finite — masked voxels would reload as valid data)
    maskdir = os.path.join(dirname, "mask0")
    os.makedirs(maskdir)

    def _inc(c):
        if getattr(c, "_mask", None) is not None:
            return np.asarray(c._include_view(())) & \
                np.isfinite(np.asarray(c.unmasked_data[:].value))
        return np.isfinite(np.asarray(c.unmasked_data[:].value))

    if isinstance(cube, StokesSpectralCube):
        inc_np = np.stack([_inc(cube[c]) for c in comps], axis=0)
    else:
        inc_np = _inc(cube)[None]
    if with_stokes:
        valid = np.ascontiguousarray(np.swapaxes(inc_np, 0, 1))
    else:
        valid = np.ascontiguousarray(inc_np[0])
    if tile_shape is not None:
        bits = _encode_tiles(valid, casa_shape, list(tile_shape), TP_BOOL)
    else:
        bits = np.packbits(valid.ravel().astype("u1"),
                           bitorder="little").tobytes()
    _write_table_dat(os.path.join(maskdir, "table.dat"), {}, "PagedArray",
                     TP_BOOL, len(casa_shape))
    _write_tsm(maskdir, "PagedArray", casa_shape, bits, TP_BOOL,
               tile_shape=tile_shape)
    _write_info(maskdir, "Paged Array")
    return dirname


def _imageinfo(ref, stokes_cube=None):
    info = {"imagetype": "Intensity",
            "objectname": str(ref.meta.get("OBJECT", ""))}
    beams = getattr(ref, "unmasked_beams", None)
    if stokes_cube is not None and beams is not None:
        # stokes-major per-plane beams: key = *{istokes*nchan + chan}
        comps = stokes_cube.components
        nchan = len(beams)
        pp = {"nChannels": nchan, "nStokes": len(comps)}
        for s, name in enumerate(comps):
            comp_beams = getattr(stokes_cube[name], "unmasked_beams",
                                 beams)
            for c, b in enumerate(comp_beams):
                pp[f"*{s * nchan + c}"] = _beam_record(b)
        info["perplanebeams"] = pp
    elif beams is not None:
        pp = {"nChannels": len(beams), "nStokes": 1}
        for i, b in enumerate(beams):
            pp[f"*{i}"] = _beam_record(b)
        info["perplanebeams"] = pp
    else:
        beam = getattr(ref, "_beam", None)
        if beam is not None:
            info["restoringbeam"] = _beam_record(beam)
    return info
