"""Golden-oracle WCS tests.

- ``wcs_golden.json`` holds projection and pole-rotation values computed
  by an independent 40-digit vector-geometry implementation
  (``generate_wcs_golden.py``) — agreement at 1e-10 rules out the
  sign/offset errors a self-roundtrip can't see.
- The greisen2006.hdr tests check the spectral conversion engine against
  the published worked example of Greisen et al. (2006), the same gold
  standard the reference uses (test_spectral_axis.py:54).
"""

import json
import os

import numpy as np
import pytest

from spectral_cube_tpu.wcs import projections as prj
from spectral_cube_tpu.wcs import WCS, convert_spectral_axis

HERE = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(HERE, "data", "wcs_golden.json")) as f:
    GOLDEN = json.load(f)

GREISEN = "/root/reference/spectral_cube/tests/data/greisen2006.hdr"


def _entry_pv(entry):
    """Golden pv as the production convention: tuple indexed by m-1, or a
    {m: value} dict when the table is indexed from m = 0 (ZPN)."""
    if entry.get("pv_from_m0"):
        return {m: v for m, v in enumerate(entry["pv"])}
    return tuple(entry["pv"])


@pytest.mark.parametrize("code", sorted(GOLDEN["projections"]))
def test_projection_forward_vs_golden(code):
    entry = GOLDEN["projections"][code]
    pv = _entry_pv(entry)
    for p in entry["points"]:
        x, y = prj.proj_native2xy(code.split(":")[0], np.float64(p["phi"]),
                                  np.float64(p["theta"]), pv=pv)
        assert abs(float(x) - float(p["x"])) < 1e-10, (code, p)
        assert abs(float(y) - float(p["y"])) < 1e-10, (code, p)


@pytest.mark.parametrize("code", sorted(GOLDEN["projections"]))
def test_projection_inverse_vs_golden(code):
    entry = GOLDEN["projections"][code]
    pv = _entry_pv(entry)
    for p in entry["points"]:
        phi, theta = prj.proj_xy2native(code.split(":")[0],
                                        np.float64(p["x"]),
                                        np.float64(p["y"]), pv=pv)
        dphi = (float(phi) - p["phi"] + 180.0) % 360.0 - 180.0
        # phi is undefined at the exact pole
        if abs(p["theta"]) < 90 - 1e-9:
            assert abs(dphi) < 1e-9, (code, p)
        assert abs(float(theta) - p["theta"]) < 1e-9, (code, p)


def test_pole_rotation_vs_golden():
    for case in GOLDEN["rotations"]:
        ap, dp, pp = case["alpha_p"], case["delta_p"], case["phi_p"]
        for p in case["points"]:
            lon, lat = prj.native_to_celestial(
                np.float64(p["phi"]), np.float64(p["theta"]), ap, dp, pp)
            dlon = (float(lon) - float(p["alpha"]) + 180.0) % 360.0 - 180.0
            # longitude is ill-conditioned within ~1e-5 deg of the pole
            if abs(float(p["delta"])) < 90 - 1e-5:
                assert abs(dlon * np.cos(np.radians(float(p["delta"])))) \
                    < 1e-10, (case["alpha_p"], p)
            assert abs(float(lat) - float(p["delta"])) < 1e-10, p
            # and back
            phi2, theta2 = prj.celestial_to_native(
                float(p["alpha"]), float(p["delta"]), ap, dp, pp)
            dphi = (float(phi2) - p["phi"] + 180.0) % 360.0 - 180.0
            if abs(p["theta"]) < 90 - 1e-9:
                assert abs(dphi * np.cos(np.radians(p["theta"]))) < 1e-10
            assert abs(float(theta2) - p["theta"]) < 1e-10


def _read_text_header(path):
    from spectral_cube_tpu.io.fits_low import Header
    h = Header()
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if "=" not in line:
                continue
            key, _, rest = line.partition("=")
            key = key.strip()
            rest = rest.strip()
            if rest.startswith("'"):
                # quoted string: the comment slash comes AFTER the closing
                # quote (CUNIT3V = 'm/s ' would otherwise parse as 'm')
                end = rest.find("'", 1)
                h[key] = rest[1:end if end > 0 else None].strip()
                continue
            val = rest.split("/")[0].strip()
            if val in ("T", "F"):
                h[key] = val == "T"
            else:
                try:
                    h[key] = int(val)
                except ValueError:
                    try:
                        h[key] = float(val)
                    except ValueError:
                        h[key] = val
    return h


def _wcs_for_key(hdr, key):
    """Build a 1-axis spectral WCS from the alternate-WCS cards CTYPE3<key>
    etc. (astropy's wcs.WCS(hdr, key=...) equivalent for this test)."""
    w = WCS(naxis=1)
    suffix = "" if key == " " else key
    w.ctype[0] = str(hdr[f"CTYPE3{suffix}"])
    w.crval[0] = float(hdr[f"CRVAL3{suffix}"])
    w.cdelt[0] = float(hdr[f"CDELT3{suffix}"])
    w.crpix[0] = float(hdr[f"CRPIX3{suffix}"])
    from spectral_cube_tpu.units import Unit
    w.cunit[0] = Unit.parse(str(hdr[f"CUNIT3{suffix}"]))
    w.restfrq = float(hdr.get(f"RESTFRQ{suffix}", 0.0) or 0.0)
    w.restwav = float(hdr.get(f"RESTWAV{suffix}", 0.0) or 0.0)
    return w


requires_greisen = pytest.mark.skipif(not os.path.exists(GREISEN),
                                      reason="greisen2006.hdr absent")


@requires_greisen
@pytest.mark.parametrize("key", ["Z", "W", "R", "V"])
def test_greisen2006_worked_examples(key):
    """Convert the barycentric FREQ axis ('F') to each published alternate
    axis and compare crval/cdelt with the paper's numbers (reference
    test_spectral_axis.py:54-105; rtol 1e-3 like the reference, since the
    published values are 'obsolete by erratum' approximations)."""
    from spectral_cube_tpu.units import Unit, Quantity
    hdr = _read_text_header(GREISEN)
    wcs0 = _wcs_for_key(hdr, "F")
    wcs1 = _wcs_for_key(hdr, key)
    rest = None
    if key in ("R", "V", "Z"):
        if wcs1.restfrq:
            rest = Quantity(wcs1.restfrq, "Hz")
        elif wcs1.restwav:
            rest = Quantity(wcs1.restwav, "m")
    out_unit = wcs1.cunit[0]
    out_ctype = wcs1.ctype[0]
    wcs2 = convert_spectral_axis(wcs0, out_unit, out_ctype,
                                 rest_value=rest)
    assert wcs2.ctype[wcs2.spec] == wcs1.ctype[0]
    np.testing.assert_allclose(wcs2.crval[wcs2.spec], wcs1.crval[0],
                               rtol=1e-3)
    np.testing.assert_allclose(wcs2.cdelt[wcs2.spec], wcs1.cdelt[0],
                               rtol=1e-3)
    # round trip back to the 'F' frame
    wcs3 = convert_spectral_axis(wcs2, wcs0.cunit[0], wcs0.ctype[0],
                                 rest_value=rest)
    np.testing.assert_allclose(wcs3.crval[wcs3.spec], wcs0.crval[0],
                               rtol=1e-6)
    np.testing.assert_allclose(wcs3.cdelt[wcs3.spec], wcs0.cdelt[0],
                               rtol=1e-6)


def test_full_pix2world_with_pv(tmp_path):
    """End-to-end pix2world through headers exercising the new codes: CEA
    with PV2_1, AZP with PV2_1, MER — roundtrip plus an oracle spot value."""
    from spectral_cube_tpu.wcs import projections as prj

    for ctype_pair, pv_cards in [
            (("RA---CEA", "DEC--CEA"), {"PV2_1": 0.5}),
            (("RA---AZP", "DEC--AZP"), {"PV2_1": 2.0}),
            (("RA---MER", "DEC--MER"), {}),
            (("RA---COE", "DEC--COE"), {"PV2_1": -30.0, "PV2_2": 20.0}),
            (("RA---COP", "DEC--COP"), {"PV2_1": 45.0, "PV2_2": 10.0}),
            (("RA---COD", "DEC--COD"), {"PV2_1": 40.0, "PV2_2": 15.0}),
            (("RA---COO", "DEC--COO"), {"PV2_1": 35.0, "PV2_2": 12.0}),
            (("RA---SIN", "DEC--SIN"), {"PV2_1": 0.0, "PV2_2": -2.0}),
            (("RA---AZP", "DEC--AZP"), {"PV2_1": 2.0, "PV2_2": 30.0}),
            # P0 = 0: a nonzero P0 makes ZPN annular (no sky within
            # r < P0 of the pole), which would put these pixels in the
            # projection's hole
            (("RA---ZPN", "DEC--ZPN"), {"PV2_0": 0.0, "PV2_1": 1.0,
                                        "PV2_3": 0.3}),
            (("RA---CYP", "DEC--CYP"), {"PV2_1": 1.0, "PV2_2": 0.7071}),
            (("RA---PAR", "DEC--PAR"), {}),
            (("RA---BON", "DEC--BON"), {"PV2_1": 45.0}),
            (("RA---PCO", "DEC--PCO"), {}),
            (("RA---MOL", "DEC--MOL"), {})]:
        h = {"CTYPE1": ctype_pair[0], "CTYPE2": ctype_pair[1],
             "CRVAL1": 150.0,
             "CRVAL2": (0.0 if "M" in ctype_pair[0][-3:]
                        else pv_cards.get("PV2_1", -30.0)),
             "CRPIX1": 10.0, "CRPIX2": 12.0,
             "CDELT1": -0.01, "CDELT2": 0.01,
             "CUNIT1": "deg", "CUNIT2": "deg"}
        h.update(pv_cards)
        w = WCS(header=h)
        xs = np.array([0.0, 5.0, 9.0, 18.0])
        ys = np.array([0.0, 3.0, 11.0, 20.0])
        lon, lat = w.pix2world(xs, ys)
        xb, yb = w.world2pix(np.asarray(lon), np.asarray(lat))
        np.testing.assert_allclose(np.asarray(xb), xs, atol=1e-8)
        np.testing.assert_allclose(np.asarray(yb), ys, atol=1e-8)


def test_szp_reductions():
    """SZP's documented reductions: defaults (mu, *, 90) == untilted AZP
    with the same mu, and mu = 0 == TAN regardless of (phi_c, theta_c)
    (Calabretta & Greisen 2002 sect. 5.1.2)."""
    phi = np.array([0.0, 30, -120, 179.5, 10, -45])
    th = np.array([89.0, 60, 45, 75, 30.5, 52.3])
    for mu in (0.5, 2.0, 5.0):
        xa, ya = prj.proj_native2xy("AZP", phi, th, pv=(mu,))
        xs, ys = prj.proj_native2xy("SZP", phi, th, pv=(mu, 77.0, 90.0))
        np.testing.assert_allclose(xs, xa, atol=1e-10)
        np.testing.assert_allclose(ys, ya, atol=1e-10)
    xt, yt = prj.proj_native2xy("TAN", phi, th)
    xs, ys = prj.proj_native2xy("SZP", phi, th, pv=(0.0, 123.0, 4.0))
    np.testing.assert_allclose(xs, xt, atol=1e-10)
    np.testing.assert_allclose(ys, yt, atol=1e-10)


def test_tsc_face_edge_continuity():
    """The gnomonic face maps agree along every shared edge of the
    unfolded cube (mod 360 at the layout's cut seam at phi = -45)."""
    for p0, t0 in [(45.0, 0.0), (-45.0, 0.0), (135.0, 0.0), (225.0, 0.0),
                   (0.0, 45.0), (0.0, -45.0), (30.0, 45.0), (-30.0, -45.0)]:
        eps = 1e-9
        x1, y1 = prj.proj_native2xy("TSC", p0 - eps, t0 - eps)
        x2, y2 = prj.proj_native2xy("TSC", p0 + eps, t0 + eps)
        dx = abs((float(x1) - float(x2) + 180.0) % 360.0 - 180.0)
        assert dx < 1e-6 and abs(float(y1) - float(y2)) < 1e-6, (p0, t0)


def test_qsc_face_edge_continuity():
    """The QSC face maps agree along every shared edge of the unfolded
    cube, same layout/seams as TSC."""
    for p0, t0 in [(45.0, 0.0), (-45.0, 0.0), (135.0, 0.0), (225.0, 0.0),
                   (0.0, 45.0), (0.0, -45.0), (30.0, 45.0), (-30.0, -45.0)]:
        eps = 1e-9
        x1, y1 = prj.proj_native2xy("QSC", p0 - eps, t0 - eps)
        x2, y2 = prj.proj_native2xy("QSC", p0 + eps, t0 + eps)
        dx = abs((float(x1) - float(x2) + 180.0) % 360.0 - 180.0)
        assert dx < 1e-6 and abs(float(y1) - float(y2)) < 1e-6, (p0, t0)


def test_qsc_exactly_equal_area_and_roundtrip():
    """QSC's Jacobian det d(x,y)/d(phi,theta) / cos(theta) is the
    constant 3 pi / 8 everywhere (the defining equal-area property of
    the O'Neill & Laubscher construction) — including across face
    seams and sector diagonals — and the closed-form inverse is exact."""
    rng = np.random.default_rng(7)
    phi = rng.uniform(-180.0, 180.0, 4000)
    theta = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 4000)))
    x, y = prj.proj_native2xy("QSC", phi, theta)
    # every point lands on the unfolded-cube layout
    assert np.all((x > -45.0 - 1e-9) & (x < 315.0 + 1e-9))
    assert np.all(np.abs(y) < 135.0 + 1e-9)
    p2, t2 = prj.proj_xy2native("QSC", x, y)
    dphi = (p2 - phi + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dphi) * np.cos(np.radians(theta))) < 1e-9
    assert np.max(np.abs(t2 - theta)) < 1e-9
    # constant-Jacobian check on a sub-sample away from seams (finite
    # differences straddling a face edge measure nothing useful)
    h = 1e-5
    pp, tt = phi[:500], np.clip(theta[:500], -85.0, 85.0)
    x0, y0 = prj.proj_native2xy("QSC", pp, tt)
    xp_, yp_ = prj.proj_native2xy("QSC", pp + h, tt)
    xt, yt = prj.proj_native2xy("QSC", pp, tt + h)
    jac = np.abs((xp_ - x0) * (yt - y0) - (xt - x0) * (yp_ - y0)) \
        / (h * h * np.cos(np.radians(tt)))
    # mask out the ~face-seam straddles (finite-difference artifacts)
    good = np.abs(jac - 3.0 * np.pi / 8.0) < 0.1
    assert np.mean(good) > 0.97
    np.testing.assert_allclose(jac[good], 3.0 * np.pi / 8.0, rtol=1e-4)


def test_hpx_equal_area_and_continuity():
    """HPX is equal-area with |J| = pi K / (2 H) * (pi/180)^2 in both
    zones, and continuous across the equatorial/polar transition."""
    for pv in ((), (6.0, 3.0)):
        h = pv[0] if pv else 4.0
        k = pv[1] if pv else 3.0
        jac_expect = np.pi * k / (2.0 * h) * (np.pi / 180.0) ** 2
        eps = 1e-6
        for phi, th in [(20.0, 10.0), (-100.0, -30.0), (33.0, 75.0),
                        (150.0, -80.0), (57.0, 42.0)]:
            x0, y0 = prj.proj_native2xy("HPX", phi, th, pv=pv)
            xp_, yp_ = prj.proj_native2xy("HPX", phi + eps, th, pv=pv)
            xt, yt = prj.proj_native2xy("HPX", phi, th + eps, pv=pv)
            jac = ((float(xp_) - float(x0)) * (float(yt) - float(y0))
                   - (float(xt) - float(x0)) * (float(yp_) - float(y0)))
            jac /= eps * eps * np.cos(np.radians(th))  # per sphere area
            assert abs(abs(jac) * (np.pi / 180.0) ** 2 - jac_expect) \
                < 1e-5 * jac_expect, (pv, phi, th, jac)
        tt = np.degrees(np.arcsin((k - 1.0) / k))
        for ph in (10.0, -100.0, 170.0):
            x1, y1 = prj.proj_native2xy("HPX", ph, tt - 1e-9, pv=pv)
            x2, y2 = prj.proj_native2xy("HPX", ph, tt + 1e-9, pv=pv)
            assert abs(float(x1) - float(x2)) < 1e-6
            assert abs(float(y1) - float(y2)) < 1e-6


def test_new_projection_device_path():
    """SZP/AIR/HPX/TSC evaluate inside jit on the test backend and agree
    with the float64 host path to f32 precision (AIR routes its logs
    through _precise_log: XLA's native f32 log is ~9e-5 relative)."""
    import jax
    import jax.numpy as jnp
    phi = np.array([10.0, -100.0, 170.0, 40.0])
    th = np.array([20.0, 75.0, -50.0, 5.0])
    # SZP points stay on the pole-side perspective sheet (theta = -50
    # with this projector is past the limb, where the inverse correctly
    # returns the near-pole branch)
    th_szp = np.array([35.0, 75.0, 52.0, 60.0])
    for code, pv in [("SZP", (2.0, 25.0, 60.0)), ("AIR", (45.0,)),
                     ("HPX", ()), ("TSC", ()), ("QSC", ())]:
        tc = th_szp if code == "SZP" else th
        xn, yn = prj.proj_native2xy(code, phi, tc, pv=pv)
        xj, yj = jax.jit(
            lambda a, b: prj.proj_native2xy(code, a, b, xp=jnp, pv=pv))(
                phi, tc)
        np.testing.assert_allclose(np.asarray(xj), xn, atol=5e-5)
        np.testing.assert_allclose(np.asarray(yj), yn, atol=5e-5)
        pj, tj = jax.jit(
            lambda a, b: prj.proj_xy2native(code, a, b, xp=jnp, pv=pv))(
                np.asarray(xn), np.asarray(yn))
        np.testing.assert_allclose(np.asarray(tj), tc, atol=1e-4)
        dphi = (np.asarray(pj) - phi + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dphi, 0.0, atol=2e-4)


def test_hpx_even_k_seam():
    """Even-K HPX: southern facets are offset by half a facet width and
    the facet index wraps at the +-180 seam (review finding: clipping
    placed lon=-179 on a facet ~180 deg away).  Roundtrip + equal-area
    hold across the seam."""
    pv = (4.0, 2.0)
    for lon, th in [(-179.0, -75.0), (179.0, -80.0), (-135.5, -70.0)]:
        x, y = prj.proj_native2xy("HPX", lon, th, pv=pv)
        p2, t2 = prj.proj_xy2native("HPX", float(x), float(y), pv=pv)
        dlon = (float(p2) - lon + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-9 and abs(float(t2) - th) < 1e-9
    # precise_log special values propagate on the device path
    import jax
    import jax.numpy as jnp
    specials = np.array([np.nan, np.inf, 0.0, -1.0], dtype=np.float32)
    out = np.asarray(jax.jit(lambda v: prj._precise_log(v, jnp))(specials))
    assert np.isnan(out[0]) and out[1] == np.inf
    assert out[2] == -np.inf and np.isnan(out[3])


def test_xph_layout_and_roundtrip():
    """XPH (polar HEALPix butterfly): the four properties that pin the
    layout from first principles (module docstring of projections.py).

    (a) pole-centered: theta = 90 maps to the origin;
    (b) native convention: phi = 0 runs along -y (both images of the
        equatorial phi = 0 point sit at x = -+45/sqrt(2), y = -135/sqrt(2),
        and the gore boundary ray through the north cap is the -y axis);
    (c) adjacent gores share their north-polar-cap edges continuously;
    (d) exactly equal-area with the H=4, K=3 HEALPix Jacobian
        3 pi / 8 (in sin-theta measure), and the inverse is exact.
    """
    rt = np.sqrt(0.5)
    # (a) pole at origin
    x, y = prj.proj_native2xy("XPH", 0.0, 90.0)
    assert abs(float(x)) < 1e-12 and abs(float(y)) < 1e-12
    # south pole: four wing tips on the diagonals at radius 180
    for lon, sx, sy in [(-135.0, -1, 1), (-45.0, -1, -1),
                        (45.0, 1, -1), (135.0, 1, 1)]:
        x, y = prj.proj_native2xy("XPH", lon, -90.0)
        assert abs(float(x) - sx * 180.0 * rt) < 1e-9
        assert abs(float(y) - sy * 180.0 * rt) < 1e-9
    # (b) phi = 0, theta = 0: the seam cut — hand-derived coordinates
    # (gore chi = +-45, psi = -+45: rotate (-+45, -90) by +-45 deg)
    x, y = prj.proj_native2xy("XPH", 1e-12, 0.0)
    assert abs(float(x) - 45.0 * rt) < 1e-6
    assert abs(float(y) + 135.0 * rt) < 1e-6
    x, y = prj.proj_native2xy("XPH", -1e-12, 0.0)
    assert abs(float(x) + 45.0 * rt) < 1e-6
    assert abs(float(y) + 135.0 * rt) < 1e-6
    # ... and in the north cap phi = 0 runs exactly along -y
    for th in (60.0, 75.0, 89.0):
        for sgn in (1e-9, -1e-9):
            x, y = prj.proj_native2xy("XPH", sgn, th)
            assert abs(float(x)) < 1e-6 and float(y) < 0.0
    # (c) continuity across every gore boundary inside the north cap
    for lon0 in (-180.0, -90.0, 0.0, 90.0):
        for th in (45.0, 60.0, 80.0):
            x1, y1 = prj.proj_native2xy("XPH", lon0 + 1e-9, th)
            x2, y2 = prj.proj_native2xy("XPH", lon0 - 1e-9, th)
            assert abs(float(x1) - float(x2)) < 1e-6, (lon0, th)
            assert abs(float(y1) - float(y2)) < 1e-6, (lon0, th)
    # (d) equal-area + exact roundtrip on a random sample
    rng = np.random.default_rng(11)
    phi = rng.uniform(-180.0, 180.0, 4000)
    theta = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 4000)))
    x, y = prj.proj_native2xy("XPH", phi, theta)
    assert np.all(np.abs(x) + np.abs(y) < 180.0 * np.sqrt(2.0) + 1e-9)
    p2, t2 = prj.proj_xy2native("XPH", x, y)
    dphi = (p2 - phi + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dphi) * np.cos(np.radians(theta))) < 1e-8
    assert np.max(np.abs(t2 - theta)) < 1e-8
    h = 1e-5
    pp = phi[:800]
    tt = np.clip(theta[:800], -85.0, 85.0)
    x0, y0 = prj.proj_native2xy("XPH", pp, tt)
    xp_, yp_ = prj.proj_native2xy("XPH", pp + h, tt)
    xt, yt = prj.proj_native2xy("XPH", pp, tt + h)
    jac = np.abs((xp_ - x0) * (yt - y0) - (xt - x0) * (yp_ - y0)) \
        / (h * h * np.cos(np.radians(tt)))
    good = np.abs(jac - 3.0 * np.pi / 8.0) < 0.1   # seam straddles
    assert np.mean(good) > 0.95
    np.testing.assert_allclose(jac[good], 3.0 * np.pi / 8.0, rtol=1e-4)


def test_xph_device_path_and_header():
    """XPH evaluates inside jit, and a --XPH header round-trips through
    the full WCS pixel<->world machinery."""
    import jax
    import jax.numpy as jnp
    phi = np.array([10.0, -100.0, 170.0, 40.0])
    th = np.array([20.0, 75.0, -50.0, 5.0])
    xn, yn = prj.proj_native2xy("XPH", phi, th)
    xj, yj = jax.jit(
        lambda a, b: prj.proj_native2xy("XPH", a, b, xp=jnp))(phi, th)
    np.testing.assert_allclose(np.asarray(xj), xn, atol=5e-5)
    np.testing.assert_allclose(np.asarray(yj), yn, atol=5e-5)
    pj, tj = jax.jit(
        lambda a, b: prj.proj_xy2native("XPH", a, b, xp=jnp))(
            np.asarray(xn), np.asarray(yn))
    np.testing.assert_allclose(np.asarray(tj), th, atol=1e-4)
    dphi = (np.asarray(pj) - phi + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(dphi, 0.0, atol=2e-4)

    from spectral_cube_tpu.wcs import WCS
    w = WCS(naxis=2)
    w.wcs.ctype = ["RA---XPH", "DEC--XPH"]
    w.wcs.crval = [180.0, 90.0]      # fiducial = the pole, like zenithal
    w.wcs.crpix = [50.0, 50.0]
    w.wcs.cdelt = [-1.0, 1.0]
    px = np.array([10.0, 50.0, 80.0, 30.0])
    py = np.array([20.0, 50.0, 70.0, 90.0])
    lon, lat = w.wcs_pix2world(px, py, 0)
    px2, py2 = w.wcs_world2pix(lon, lat, 0)
    np.testing.assert_allclose(px2, px, atol=1e-6)
    np.testing.assert_allclose(py2, py, atol=1e-6)
