import math

import numpy as np
import pytest

from spectral_cube_tpu.beams import Beam, Beams, BeamError, commonbeam
from spectral_cube_tpu.units import Quantity


def asec(v):
    return Quantity(v, "arcsec")


def test_beam_basics():
    b = Beam.make(asec(4), asec(3), Quantity(30, "deg"))
    assert b.major.to_value("arcsec") == pytest.approx(4)
    assert b.minor.to_value("arcsec") == pytest.approx(3)
    assert b.pa.to_value("deg") == pytest.approx(30)
    assert b.sr.value == pytest.approx(
        math.pi / (4 * math.log(2)) * b.major_rad * b.minor_rad)


def test_minor_exceeds_major_raises():
    with pytest.raises(BeamError):
        Beam.make(asec(2), asec(3))


def test_radio_beam_style_constructor():
    """radio_beam-compatible construction: Quantity keywords or positional
    Quantities must normalize to radians (a positional Quantity used to
    land un-converted in the float fields and corrupt the beam algebra)."""
    kw = Beam(major=asec(4), minor=asec(3), pa=Quantity(30, "deg"))
    pos = Beam(asec(4), asec(3), Quantity(30, "deg"))
    ref = Beam.make(asec(4), asec(3), Quantity(30, "deg"))
    assert kw == ref and pos == ref
    assert isinstance(kw.major_rad, float)
    # deconvolution (the path that used to crash) works on them
    tgt = Beam(major=asec(6))
    assert tgt.deconvolve(kw).isfinite
    # minor defaults to major (circular beam)
    assert Beam(major=asec(2)).minor.to_value("arcsec") == pytest.approx(2)
    with pytest.raises(TypeError):
        Beam(minor=asec(2))


def test_convolve_deconvolve_roundtrip():
    b1 = Beam.make(asec(4), asec(3), Quantity(30, "deg"))
    b2 = Beam.make(asec(2), asec(2))
    conv = b1.convolve(b2)
    dec = conv.deconvolve(b2)
    assert dec.major_rad == pytest.approx(b1.major_rad, rel=1e-12)
    assert dec.minor_rad == pytest.approx(b1.minor_rad, rel=1e-12)


def test_circular_quadrature():
    c = Beam.make(asec(3)).convolve(Beam.make(asec(4)))
    assert c.major.to_value("arcsec") == pytest.approx(5, rel=1e-12)


def test_deconvolve_failure():
    with pytest.raises(BeamError):
        Beam.make(asec(2)).deconvolve(Beam.make(asec(3)))
    out = Beam.make(asec(2)).deconvolve(Beam.make(asec(3)),
                                        failure_returns_pointlike=True)
    assert out.major_rad == 0


def test_deconvolve_self_is_pointlike():
    b = Beam.make(asec(3), asec(2), Quantity(10, "deg"))
    out = b.deconvolve(b)
    assert out.major_rad == 0 and out.minor_rad == 0


def test_jtok():
    b = Beam.make(asec(1))
    jtok = b.jtok(Quantity(100, "GHz"))
    # standard approximation: 1.222e6 / (nu_GHz^2 maj_as min_as)
    assert jtok.value == pytest.approx(1.222e6 / 1e4, rel=0.01)


def test_kernel_properties():
    b = Beam.make(asec(4), asec(3), Quantity(30, "deg"))
    k = b.as_kernel(Quantity(1, "arcsec").to("rad"))
    assert k.sum() == pytest.approx(1.0, abs=1e-12)
    iy, ix = np.unravel_index(np.argmax(k), k.shape)
    assert (iy, ix) == (k.shape[0] // 2, k.shape[1] // 2)
    assert k.shape[0] % 2 == 1


def test_from_header():
    b = Beam.from_header({"BMAJ": 1e-3, "BMIN": 5e-4, "BPA": 45.0})
    assert b.major.to_value("deg") == pytest.approx(1e-3)
    assert b.pa.to_value("deg") == pytest.approx(45)
    assert Beam.from_header({}) is None


def test_beams_collection():
    bs = Beams(major=Quantity([1, 2, 3], "arcsec"),
               minor=Quantity([1, 1, 2], "arcsec"),
               pa=Quantity([0, 45, 90], "deg"))
    assert len(bs) == 3
    assert bs.largest_beam().major.to_value("arcsec") == pytest.approx(3)
    assert bs.smallest_beam().major.to_value("arcsec") == pytest.approx(1)
    sub = bs[np.array([True, False, True])]
    assert len(sub) == 2
    avg = bs.average_beam()
    assert 1 < avg.major.to_value("arcsec") < 3


def test_common_beam_identical():
    bs = Beams(major=Quantity([2, 2], "arcsec"))
    cb = commonbeam(bs)
    assert cb.major.to_value("arcsec") == pytest.approx(2)


def test_common_beam_nested():
    bs = Beams(major=Quantity([1, 3], "arcsec"))
    cb = commonbeam(bs)
    assert cb.major.to_value("arcsec") == pytest.approx(3)


def test_common_beam_crossed_ellipses():
    bs = Beams(beams=[
        Beam.make(asec(4), asec(2), Quantity(0, "deg")),
        Beam.make(asec(4), asec(2), Quantity(90, "deg"))])
    cb = commonbeam(bs)
    for b in bs:
        cb.deconvolve(b)  # must not raise
    assert cb.major.to_value("arcsec") == pytest.approx(4, rel=0.1)
    assert cb.minor.to_value("arcsec") >= 3.5


def test_beams_table_roundtrip():
    bs = Beams(major=Quantity([1, 2], "arcsec"),
               minor=Quantity([0.5, 1], "arcsec"),
               pa=Quantity([10, 20], "deg"))
    cols = bs.to_table_columns()
    bs2 = Beams(major=Quantity(np.asarray(cols["BMAJ"], dtype=float),
                               "arcsec"),
                minor=Quantity(np.asarray(cols["BMIN"], dtype=float),
                               "arcsec"),
                pa=Quantity(np.asarray(cols["BPA"], dtype=float), "deg"))
    assert bs2[0].major.to_value("arcsec") == pytest.approx(1, rel=1e-6)
    assert bs2[1].pa.to_value("deg") == pytest.approx(20, rel=1e-5)


def test_beam_convolve_deconvolve_roundtrip_rotated():
    """Gaussian beam algebra round-trips exactly for rotated elliptical
    beams, and convolution matches the covariance-matrix oracle.

    Regression: _from_abc returned the COMPLEMENT angle (90 - pa), so
    convolve -> deconvolve distorted the axes by up to several percent
    for any rotated beam (caught by fuzzing; fixtures used pa=0)."""
    from spectral_cube_tpu.beams import Beam
    from spectral_cube_tpu.units import Quantity

    def cov(maj, mnr, pa_deg):
        th = np.radians(pa_deg)
        c, s = np.sin(th), np.cos(th)   # major axis = (sin pa, cos pa)
        R = np.array([[c, -s], [s, c]])
        return R @ np.diag([maj ** 2, mnr ** 2]) @ R.T

    a = Beam(Quantity(3.0, "arcsec"), Quantity(1.5, "arcsec"),
             Quantity(30.0, "deg"))
    b = Beam(Quantity(2.0, "arcsec"), Quantity(1.0, "arcsec"),
             Quantity(-40.0, "deg"))
    c = a.convolve(b)
    M = cov(3.0, 1.5, 30.0) + cov(2.0, 1.0, -40.0)
    evals, evecs = np.linalg.eigh(M)
    np.testing.assert_allclose(float(c.major.to_value("arcsec")),
                               np.sqrt(evals[1]), rtol=1e-12)
    np.testing.assert_allclose(float(c.minor.to_value("arcsec")),
                               np.sqrt(evals[0]), rtol=1e-12)
    pa_oracle = np.degrees(np.arctan2(evecs[0, 1], evecs[1, 1]))
    dpa = (float(c.pa.to_value("deg")) - pa_oracle + 90) % 180 - 90
    assert abs(dpa) < 1e-9

    rng = np.random.RandomState(4)
    for _ in range(50):
        maj1 = rng.uniform(0.5, 5.0)
        min1 = rng.uniform(0.2, maj1)
        pa1 = rng.uniform(-90, 90)
        maj2 = rng.uniform(0.5, 5.0)
        min2 = rng.uniform(0.2, maj2)
        pa2 = rng.uniform(-90, 90)
        a = Beam(Quantity(maj1, "arcsec"), Quantity(min1, "arcsec"),
                 Quantity(pa1, "deg"))
        b = Beam(Quantity(maj2, "arcsec"), Quantity(min2, "arcsec"),
                 Quantity(pa2, "deg"))
        d = a.convolve(b).deconvolve(b)
        np.testing.assert_allclose(float(d.major.to_value("arcsec")),
                                   maj1, rtol=1e-9)
        np.testing.assert_allclose(float(d.minor.to_value("arcsec")),
                                   min1, rtol=1e-9)
        if abs(maj1 - min1) > 1e-3:
            dpa = (float(d.pa.to_value("deg")) - pa1 + 90) % 180 - 90
            assert abs(dpa) < 1e-6


def test_rotated_beam_kernel_orientation():
    """as_kernel of a rotated elliptical beam is elongated along the
    right direction: second moments of the kernel match the beam's
    covariance (east-of-north pa, x = +east in pixel coords)."""
    from spectral_cube_tpu.beams import Beam, SIGMA_TO_FWHM
    from spectral_cube_tpu.units import Quantity

    pa = 30.0
    beam = Beam(Quantity(6.0, "arcsec"), Quantity(2.0, "arcsec"),
                Quantity(pa, "deg"))
    pix = Quantity(0.5, "arcsec")
    k = np.asarray(beam.as_kernel(pix, x_size=101, y_size=101))
    y, x = np.mgrid[0:101, 0:101].astype(float)
    x -= 50.0
    y -= 50.0
    w = k / k.sum()
    Mxx = (w * x * x).sum()
    Myy = (w * y * y).sum()
    Mxy = (w * x * y).sum()
    pa_meas = 0.5 * np.degrees(np.arctan2(2 * Mxy, Mxx - Myy))
    # radio_beam convention (reference parity): kernel theta = pa + 90
    # from +x — correct for standard CDELT1 < 0 images where +x points
    # WEST (east-of-north pa mirrors to 90 + pa in pixel coords)
    dpa = (pa_meas - (90.0 + pa) + 90) % 180 - 90
    assert abs(dpa) < 1.0, (pa_meas, pa)
    # axis lengths: eigenvalues of the moment matrix = sigma^2 in pixels
    evals = np.linalg.eigvalsh(np.array([[Mxx, Mxy], [Mxy, Myy]]))
    sig_maj = 6.0 / 0.5 / SIGMA_TO_FWHM
    sig_min = 2.0 / 0.5 / SIGMA_TO_FWHM
    np.testing.assert_allclose(np.sqrt(evals[1]), sig_maj, rtol=0.02)
    np.testing.assert_allclose(np.sqrt(evals[0]), sig_min, rtol=0.02)


def test_module_level_beam_utils():
    """cube_utils.largest_beam/smallest_beam and beams.beams_to_bintable
    (reference test_cube_utils.py:10-50)."""
    from spectral_cube_tpu.cube_utils import largest_beam, smallest_beam
    from spectral_cube_tpu.beams import Beam, Beams, beams_to_bintable
    from spectral_cube_tpu.units import Quantity
    blist = [Beam(Quantity(v, "arcsec"), Quantity(v * 0.8, "arcsec"),
                  Quantity(0.0, "deg")) for v in (1.0, 1.5, 2.0)]
    bs = Beams(beams=blist)
    assert largest_beam(bs) == blist[2]
    assert smallest_beam(bs) == blist[0]
    # plain lists accepted too
    assert largest_beam(blist) == blist[2]
    bt = beams_to_bintable(bs)
    assert bt.header["NCHAN"] == 3
    assert bt.header["NPOL"] == 0
    np.testing.assert_allclose(np.asarray(bt.columns["BMAJ"]),
                               [1.0, 1.5, 2.0], rtol=1e-6)
    assert bt.units["BMAJ"] == "arcsec"
    bt2 = beams_to_bintable(bs, pols=[0, 0, 0])
    assert bt2.header["NPOL"] == 1


def test_beams_to_bintable_cube(tmp_path):
    """reference test_cube_utils.py:24-49: beams_to_bintable on a VRSC's
    beams reproduces the table columns in arcsec."""
    from ref_fixtures import data_vda_beams
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.cube_utils import beams_to_bintable
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    bt = beams_to_bintable(cube.beams)
    np.testing.assert_allclose(np.asarray(bt.columns["BMAJ"]),
                               [0.4, 0.3, 0.3, 0.4], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bt.columns["BMIN"]),
                               [0.1, 0.2, 0.2, 0.1], rtol=1e-6)
    assert list(np.asarray(bt.columns["CHAN"])) == [0, 1, 2, 3]


def test_beams_bare_float_minor_stays_degrees():
    """Review finding: a bare-float minor next to an arcsec-Quantity
    major silently rescaled to arcsec (bare floats mean degrees)."""
    from spectral_cube_tpu.units import Quantity
    from spectral_cube_tpu.beams import Beams
    b = Beams(major=Quantity([3600.0], "arcsec"), minor=[1.0])
    np.testing.assert_allclose(float(b[0].minor.to_value("deg")), 1.0,
                               rtol=1e-12)
    # omitted minor copies the major (values AND unit)
    b2 = Beams(major=Quantity([2.0], "arcsec"))
    np.testing.assert_allclose(float(b2[0].minor.to_value("arcsec")), 2.0,
                               rtol=1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_beam_deconvolve_convolve_closure(seed):
    """Property: convolve(deconvolve(target, b), b) == target for random
    elliptical beams (Wild 1970 algebra closure; a 500-beam offline
    sweep ran at < 1e-9 relative)."""
    from spectral_cube_tpu.beams import Beam, BeamError
    from spectral_cube_tpu.units import Quantity
    rng = np.random.RandomState(seed)
    checked = 0
    for _ in range(40):
        maj_t = rng.uniform(1.0, 10.0)
        min_t = rng.uniform(0.3, 1.0) * maj_t
        target = Beam(Quantity(maj_t, "arcsec"),
                      Quantity(min_t, "arcsec"),
                      Quantity(rng.uniform(-90, 90), "deg"))
        maj_b = rng.uniform(0.1, 0.9) * min_t
        b = Beam(Quantity(maj_b, "arcsec"),
                 Quantity(rng.uniform(0.3, 1.0) * maj_b, "arcsec"),
                 Quantity(rng.uniform(-90, 90), "deg"))
        try:
            resid = target.deconvolve(b)
        except BeamError:
            continue
        back = resid.convolve(b)
        assert abs(back.major_rad - target.major_rad) \
            < 1e-9 * target.major_rad
        assert abs(back.minor_rad - target.minor_rad) \
            < 1e-9 * target.major_rad
        checked += 1
    assert checked > 10


@pytest.mark.parametrize("seed", range(3))
def test_common_beam_contains_all(seed):
    """Property: the common beam deconvolves every member beam (a
    200-set offline sweep ran clean)."""
    from spectral_cube_tpu.beams import Beam, Beams
    from spectral_cube_tpu.units import Quantity
    rng = np.random.RandomState(seed)
    for _ in range(20):
        n = rng.randint(2, 8)
        blist = []
        for _ in range(n):
            a = Quantity(rng.uniform(1, 5), "arcsec")
            b = Quantity(rng.uniform(0.3, 1.0), "arcsec")
            blist.append(Beam(max(a, b), min(a, b),
                              Quantity(rng.uniform(-90, 90), "deg")))
        cb = Beams(beams=blist).common_beam()
        for b in blist:
            cb.deconvolve(b)   # must not raise


def test_as_tophat_kernel():
    """Flat circular kernel with the beam's FWHM-diameter support,
    normalized to unit sum (radio_beam Beam.as_tophat_kernel analog)."""
    b = Beam(major=Quantity(8.0, "arcsec"), minor=Quantity(8.0, "arcsec"))
    pix = Quantity(1.0, "arcsec")
    k = b.as_tophat_kernel(pix)
    assert k.shape[0] == k.shape[1] and k.shape[0] % 2 == 1
    assert k.sum() == pytest.approx(1.0, rel=1e-12)
    inside = k > 0
    # all nonzero weights are equal (a tophat)
    assert np.unique(k[inside]).size == 1
    # support radius = FWHM/2 = 4 pixels: center row spans ~9 pixels
    c = k.shape[0] // 2
    assert inside[c].sum() == 9
    # corner (r = sqrt(2)*halfsize) is outside
    assert not inside[0, 0]


def test_gaussian_transfer_matches_fft_of_kernel():
    """The analytic Fourier transfer function equals the DFT of the
    sampled Gaussian kernel (rotated elliptical beam) at low
    frequencies."""
    b = Beam(major=Quantity(6.0, "arcsec"), minor=Quantity(3.0, "arcsec"),
             pa=Quantity(30.0, "deg"))
    pix_rad = Quantity(1.0, "arcsec").to_value("rad")
    n = 65
    k = b.as_kernel(Quantity(1.0, "arcsec"), x_size=n, y_size=n)
    t_num = np.fft.fftshift(np.abs(np.fft.fft2(np.fft.ifftshift(k))))
    f_pix = np.fft.fftshift(np.fft.fftfreq(n))
    fy, fx = np.meshgrid(f_pix / pix_rad, f_pix / pix_rad, indexing="ij")
    t_ana = b.gaussian_transfer(fy, fx)
    # compare where the transfer is non-negligible (truncation of the
    # sampled kernel perturbs the deep tail)
    sel = t_ana > 1e-3
    np.testing.assert_allclose(t_num[sel], t_ana[sel], rtol=0, atol=2e-3)
    # rotation matters: the transfer is anisotropic along the beam axes
    c = n // 2
    assert not np.allclose(t_ana[c + 10, c], t_ana[c, c + 10], rtol=1e-3)
