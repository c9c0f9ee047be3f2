"""Byte-faithful reconstructions of the reference's seeded test fixtures
(/root/reference/spectral_cube/conftest.py): the header_jybeam.hdr WCS with
np.random.seed(96) data for ``data_adv`` and seed 42 for ``data_advs``.
Tests built on these can replay the reference suite's hard-coded expected
arrays verbatim, pinning our semantics to the reference's own numbers."""

import numpy as np

from spectral_cube_tpu.io.fits_low import Header, HDU, write_fits


def jybeam_header():
    """The fields of tests/data/header_jybeam.hdr that matter for cube
    semantics (WCS, beam, units, rest frequency)."""
    h = Header()
    h["SIMPLE"] = True
    h["BITPIX"] = -64
    h["NAXIS"] = 4
    h["NAXIS1"] = 1884
    h["NAXIS2"] = 2606
    h["NAXIS3"] = 200
    h["NAXIS4"] = 1
    h["CDELT1"] = -5.55555561268e-04
    h["CRPIX1"] = 1373.0
    h["CRVAL1"] = 2.31837500515e01
    h["CUNIT1"] = "deg"
    h["CTYPE1"] = "RA---SIN"
    h["CDELT2"] = 5.55555561268e-04
    h["CRPIX2"] = 1152.0
    h["CRVAL2"] = 3.05765277962e01
    h["CUNIT2"] = "deg"
    h["CTYPE2"] = "DEC--SIN"
    h["CDELT3"] = 1.28821496879e00
    h["CRPIX3"] = 1.0
    h["CRVAL3"] = -3.21214698632e02
    h["CTYPE3"] = "VOPT"
    h["CUNIT3"] = "km/s"
    h["CDELT4"] = 1.0
    h["CRPIX4"] = 1.0
    h["CRVAL4"] = 1.0
    h["CTYPE4"] = "STOKES"
    h["CUNIT4"] = ""
    h["SPECSYS"] = "BARYCENT"
    h["RESTFREQ"] = 1.42040571841e09
    h["BUNIT"] = "JY/BEAM"
    h["BMAJ"] = 0.0002777777777777778
    h["BMIN"] = 0.0002777777777777778
    h["BPA"] = 0.0
    return h


def prepare_adv_data():
    """reference conftest.prepare_adv_data: 3-D (v, dec, ra) = (4, 3, 2)
    K cube, seed 96."""
    h = jybeam_header()
    h["BUNIT"] = "K"
    h["NAXIS"] = 3
    h["NAXIS1"] = 2
    h["NAXIS2"] = 3
    h["NAXIS3"] = 4
    for k in [k for k in h.keys() if k.endswith("4")]:
        del h[k]
    np.random.seed(96)
    d = np.random.random((4, 3, 2))
    return d, h


def data_adv(tmp_path, name="adv.fits"):
    d, h = prepare_adv_data()
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=d, header=h)])
    return path, d


def cube_and_raw(tmp_path, name="adv.fits"):
    from spectral_cube_tpu import SpectralCube
    path, d = data_adv(tmp_path, name)
    return SpectralCube.read(path), d


def transpose(d, h, axes):
    """reference conftest.transpose (conftest.py:50-58): permute the data
    and the per-axis header cards together."""
    d = d.transpose(np.argsort(axes))
    h2 = h.copy()
    n = len(axes)
    for i in range(n):
        for key in ("NAXIS", "CDELT", "CRPIX", "CRVAL", "CTYPE", "CUNIT"):
            src = f"{key}{axes[i] + 1}"
            if src in h:
                h2[f"{key}{i + 1}"] = h[src]
    return d, h2


def prepare_advs_data():
    """reference conftest.prepare_advs_data: 4-D single-Stokes (1,2,3,4),
    seed 42, BUNIT K."""
    h = jybeam_header()
    h["BUNIT"] = "K"
    h["NAXIS1"] = 2
    h["NAXIS2"] = 3
    h["NAXIS3"] = 4
    h["NAXIS4"] = 1
    np.random.seed(42)
    d = np.random.random((1, 2, 3, 4))
    return d, h


def prepare_4_beams_table():
    """reference conftest.prepare_4_beams (conftest.py:61-79)."""
    from collections import OrderedDict
    from spectral_cube_tpu.io.fits_low import BinTableHDU
    bt = BinTableHDU(columns=OrderedDict(
        BMAJ=np.array([0.4, 0.3, 0.3, 0.4], "f4"),
        BMIN=np.array([0.1, 0.2, 0.2, 0.1], "f4"),
        BPA=np.array([0, 45, 60, 30], "f4"),
        CHAN=np.arange(4, dtype="i4"),
        POL=np.zeros(4, dtype="i4")), name="BEAMS",
        units={"BMAJ": "arcsec", "BMIN": "arcsec", "BPA": "deg"})
    bt.header["NCHAN"] = 4
    bt.header["NPOL"] = 1
    return bt


def data_advs(tmp_path, name="advs.fits"):
    d, h = prepare_advs_data()
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=d, header=h)])
    return path, d


def data_vda_beams(tmp_path, name="vda_beams.fits"):
    """reference conftest.data_vda_beams: adv transposed to (v,d,a) with
    BUNIT ' Jy / beam ' and the 4-beam BEAMS table."""
    d, h = prepare_adv_data()
    d, h = transpose(d, h, [2, 0, 1])
    d, h = transpose(d, h, [2, 1, 0])
    h["BUNIT"] = " Jy / beam "
    for k in ("BMAJ", "BMIN", "BPA"):
        try:
            del h[k]
        except Exception:
            pass
    h["CASAMBM"] = True
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=d, header=h), prepare_4_beams_table()])
    return path, d


def data_sdav_beams(tmp_path, name="sdav_beams.fits"):
    """reference conftest.data_sdav_beams: 4-D (4,3,2,1) numpy with axes
    (s,d,a,v) in FITS order and the 4-beam table."""
    d, h = prepare_advs_data()
    d, h = transpose(d, h, [1, 2, 3, 0])
    d, h = transpose(d, h, [1, 2, 3, 0])
    d, h = transpose(d, h, [1, 2, 3, 0])
    d, h = transpose(d, h, [0, 2, 1, 3])
    for k in ("BMAJ", "BMIN", "BPA"):
        try:
            del h[k]
        except Exception:
            pass
    np.random.seed(42)
    d = np.random.random((4, 3, 2, 1))
    h["CASAMBM"] = True
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=d, header=h), prepare_4_beams_table()])
    return path, d
