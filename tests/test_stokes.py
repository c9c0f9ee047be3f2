import numpy as np
from spectral_cube_tpu.wcs import WCS
import pytest

from spectral_cube_tpu import (SpectralCube, StokesSpectralCube,
                               BooleanArrayMask)

from conftest import make_cube_file


def _component_cubes(tmp_path, names, seeds=None):
    cubes = {}
    for i, name in enumerate(names):
        path, data = make_cube_file(tmp_path, f"{name}.fits",
                                    seed=(seeds[i] if seeds else i),
                                    with_nan=False)
        cubes[name] = SpectralCube.read(path)
    return cubes


def test_construction_and_access(tmp_path):
    cubes = _component_cubes(tmp_path, ["I", "Q", "U", "V"])
    sc = StokesSpectralCube(cubes)
    assert set(sc.components) == {"I", "Q", "U", "V"}
    assert sc.shape == (4, 3, 2)
    assert sc.stokes_type == "SKY_STOKES"
    # attribute access (reference :153-163)
    np.testing.assert_allclose(
        np.asarray(sc.I.unmasked_data[:].value),
        np.asarray(sc["I"].unmasked_data[:].value))


def test_invalid_component_rejected(tmp_path):
    cubes = _component_cubes(tmp_path, ["I"])
    cubes["BANANA"] = cubes["I"]
    with pytest.raises(ValueError):
        StokesSpectralCube(cubes)


def test_mismatched_shape_rejected(tmp_path):
    path1, _ = make_cube_file(tmp_path, "a.fits")
    path2, _ = make_cube_file(tmp_path, "b.fits", shape=(5, 3, 2))
    with pytest.raises(ValueError):
        StokesSpectralCube({"I": SpectralCube.read(path1),
                            "Q": SpectralCube.read(path2)})


def test_common_mask(tmp_path):
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    mask = np.zeros((4, 3, 2), dtype=bool)
    mask[:, 1, :] = True
    sc = StokesSpectralCube(cubes).with_mask(mask)
    icube = sc["I"]
    filled = np.asarray(icube.filled_data[:].value)
    assert np.isnan(filled[:, 0, :]).all()
    assert np.isfinite(filled[:, 1, :]).all()


def test_linear_feed_to_sky(tmp_path):
    """Feed cubes encoded as the real (Re-Im, Re+Im) cross-hand pairs
    recover IQUV exactly (reference stokes_spectral_cube.py:240-256
    normalization: I=(XX+YY)/2 etc.)."""
    cubes = _component_cubes(tmp_path, ["I", "Q", "U", "V"])
    XX = cubes["I"] + cubes["Q"]
    YY = cubes["I"] - cubes["Q"]
    XY = cubes["U"] - cubes["V"]
    YX = cubes["U"] + cubes["V"]
    feed = StokesSpectralCube({"XX": XX, "YY": YY, "XY": XY, "YX": YX})
    assert feed.stokes_type == "FEED_LINEAR"
    sky = feed.transform_basis("Sky")
    for comp in "IQUV":
        np.testing.assert_allclose(
            np.asarray(sky[comp].unmasked_data[:].value),
            np.asarray(cubes[comp].unmasked_data[:].value),
            rtol=1e-5, atol=1e-7)


def test_circular_feed_to_sky(tmp_path):
    cubes = _component_cubes(tmp_path, ["I", "Q", "U", "V"])
    RR = cubes["I"] + cubes["V"]
    LL = cubes["I"] - cubes["V"]
    RL = cubes["Q"] - cubes["U"]
    LR = cubes["Q"] + cubes["U"]
    feed = StokesSpectralCube({"RR": RR, "LL": LL, "RL": RL, "LR": LR})
    assert feed.stokes_type == "FEED_CIRCULAR"
    sky = feed.transform_basis("Sky")
    for comp in "IQUV":
        np.testing.assert_allclose(
            np.asarray(sky[comp].unmasked_data[:].value),
            np.asarray(cubes[comp].unmasked_data[:].value),
            rtol=1e-5, atol=1e-7)


def test_sky_to_feed_roundtrip(tmp_path):
    """The reference halves in BOTH directions, so its feed->sky->feed
    round-trip scales by exactly 1/2 (stokes_spectral_cube.py:240-313);
    we match that normalization for parity."""
    cubes = _component_cubes(tmp_path, ["I", "Q", "U", "V"])
    sc = StokesSpectralCube(cubes)
    back = sc.transform_basis("Linear").transform_basis("Sky")
    for comp in "IQUV":
        np.testing.assert_allclose(
            np.asarray(back[comp].unmasked_data[:].value),
            0.5 * np.asarray(cubes[comp].unmasked_data[:].value),
            rtol=1e-5, atol=1e-7)
    back_c = sc.transform_basis("Circular").transform_basis("Sky")
    for comp in "IQUV":
        np.testing.assert_allclose(
            np.asarray(back_c[comp].unmasked_data[:].value),
            0.5 * np.asarray(cubes[comp].unmasked_data[:].value),
            rtol=1e-5, atol=1e-7)


def test_delegated_geometry(tmp_path):
    from spectral_cube_tpu.units import Quantity
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    sc = StokesSpectralCube(cubes)
    slab = sc.spectral_slab(Quantity(-321.2, "km / s"),
                            Quantity(-318.7, "km / s"))
    assert slab["I"].shape[0] == 3
    sub = sc.subcube(xlo=0, xhi=1)
    assert sub["Q"].shape[2] == 1


def test_stokes_write_read_roundtrip(tmp_path):
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    sc = StokesSpectralCube(cubes)
    path = str(tmp_path / "stokes_out.fits")
    sc.write(path)
    back = StokesSpectralCube.read(path)
    assert set(back.components) == {"I", "Q"}
    np.testing.assert_allclose(
        np.asarray(back["Q"].unmasked_data[:].value),
        np.asarray(cubes["Q"].unmasked_data[:].value), rtol=1e-6)


def test_stokes_region_delegation(tmp_path):
    from conftest import make_cube_file
    p1, d1 = make_cube_file(tmp_path, "si.fits", shape=(4, 21, 21),
                            with_nan=False)
    p2, d2 = make_cube_file(tmp_path, "sq.fits", shape=(4, 21, 21), seed=9,
                            with_nan=False)
    sc = StokesSpectralCube({"I": SpectralCube.read(p1),
                             "Q": SpectralCube.read(p2)})
    sub = sc.subcube_from_ds9region("image; circle(11, 11, 5)")
    assert set(sub.components) == {"I", "Q"}
    assert sub.shape[1] < 21 and sub.shape == sub["Q"].shape
    # slices from a mask delegate to the first component
    from spectral_cube_tpu import BooleanArrayMask
    arr = np.zeros((4, 21, 21), dtype=bool)
    arr[1:3, 5:9, 2:7] = True
    slices = sc.subcube_slices_from_mask(BooleanArrayMask(arr))
    assert slices == (slice(1, 3), slice(5, 9), slice(2, 7))


def test_invalid_wcs_rejected(tmp_path):
    """Components with mismatched WCS raise (reference :76)."""
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    shifted = cubes["Q"]._new_cube_with(
        wcs=cubes["Q"].wcs.copy())
    shifted._wcs.crval[0] += 1.0
    with pytest.raises(ValueError):
        StokesSpectralCube({"I": cubes["I"], "Q": shifted})


def test_stokes_type_classification(tmp_path):
    """Feed classifications incl. partial linear (reference :98-131)."""
    for names, expect in ((["I", "Q", "U", "V"], "SKY_STOKES"),
                          (["RR", "LL"], "FEED_CIRCULAR"),
                          (["XX", "XY", "YX", "YY"], "FEED_LINEAR"),
                          (["XX"], "FEED_LINEAR")):
        sc = StokesSpectralCube(_component_cubes(tmp_path, names,
                                                 seeds=range(len(names))))
        assert sc.stokes_type == expect


def test_dir_contains_components(tmp_path):
    sc = StokesSpectralCube(_component_cubes(tmp_path, ["I", "Q"]))
    d = dir(sc)
    assert "I" in d and "Q" in d


def test_mask_invalid_type_and_shape(tmp_path):
    """Bad masks raise on attach (reference :175-189)."""
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    with pytest.raises(TypeError):
        StokesSpectralCube(cubes, mask="not a mask")
    sc = StokesSpectralCube(cubes)
    wrong = np.ones((2, 2, 2), dtype=bool)
    with pytest.raises(Exception):
        sc.with_mask(wrong)[...]


def test_separate_component_masks(tmp_path):
    """Component masks layer under the common mask (reference :191-211)."""
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    arr_i = np.zeros((4, 3, 2), bool)
    arr_i[:2] = True
    from spectral_cube_tpu import BooleanArrayMask
    mi = BooleanArrayMask(arr_i, wcs=cubes["I"].wcs, shape=(4, 3, 2))
    cubes = {"I": cubes["I"].with_mask(mi), "Q": cubes["Q"]}
    common = np.zeros((4, 3, 2), bool)
    common[1:] = True
    sc = StokesSpectralCube(cubes).with_mask(common)
    inc_i = np.asarray(sc.I.get_mask_array())
    inc_q = np.asarray(sc.Q.get_mask_array())
    # I: component AND common; Q: just common
    assert inc_i[0].sum() == 0 and inc_i[2:].sum() == 0
    assert inc_i[1].all()
    assert inc_q[0].sum() == 0 and inc_q[1:].all()


def test_getitem_slice_all_components(tmp_path):
    """cube[:2] slices every component consistently (reference
    :335-353)."""
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    sc = StokesSpectralCube(cubes)
    sliced = sc[:2]
    assert isinstance(sliced, StokesSpectralCube)
    assert sliced.shape == (2, 3, 2)
    np.testing.assert_allclose(
        np.asarray(sliced.I.unmasked_data[:].value),
        np.asarray(sc.I.unmasked_data[:2].value), equal_nan=True)
    # string access still works afterwards
    assert sliced["Q"].shape == (2, 3, 2)


def test_spectral_slab_preserves_data(tmp_path):
    from spectral_cube_tpu import Quantity
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    sc = StokesSpectralCube(cubes)
    sv = sc.I.spectral_axis
    lo, hi = sv[0], sv[2]
    slab = sc.spectral_slab(min(lo, hi), max(lo, hi))
    assert isinstance(slab, StokesSpectralCube)
    assert slab.shape[0] == 3
    np.testing.assert_allclose(
        np.asarray(slab.Q.unmasked_data[:].value),
        np.asarray(sc.Q.unmasked_data[:3].value), equal_nan=True)


def test_minimal_subcube_consistent(tmp_path):
    cubes = _component_cubes(tmp_path, ["I", "Q"])
    sc = StokesSpectralCube(cubes)
    mini = sc.minimal_subcube()
    assert isinstance(mini, StokesSpectralCube)
    assert mini.I.shape == mini.Q.shape


def test_transform_basis_incomplete_raises(tmp_path):
    """Linear basis needs I and Q at least (reference :292)."""
    sc = StokesSpectralCube(_component_cubes(tmp_path, ["I"]))
    with pytest.raises(Exception):
        sc.transform_basis("Linear")
    fl = StokesSpectralCube(_component_cubes(tmp_path, ["XX"]))
    with pytest.raises(Exception):
        fl.transform_basis("Sky")


def test_transform_basis_noop(tmp_path):
    sc = StokesSpectralCube(_component_cubes(tmp_path, ["I", "Q", "U",
                                                        "V"]))
    assert sc.transform_basis("Sky") is sc


def test_stokes_invalid_type_message():
    """reference test_stokes_spectral_cube.py:37-44: non-cube values give
    the reference's TypeError message."""
    import numpy as np
    import pytest
    from spectral_cube_tpu import StokesSpectralCube
    with pytest.raises(TypeError,
                       match="dictionary of SpectralCube objects"):
        StokesSpectralCube(dict(I=np.ones((3, 4, 5))))


def test_stokes_spectral_slab_manual_wcs():
    """reference TestStokesSubcube.test_spectral_slab: a manually-built
    FREQ WCS (no CUNIT set) defaults to Hz so Quantity slabs work."""
    import numpy as np
    from spectral_cube_tpu import (SpectralCube, StokesSpectralCube, WCS,
                                   Quantity)
    wcs = WCS(naxis=3)
    wcs.ctype = ["RA---TAN", "DEC--TAN", "FREQ"]
    wcs.crval = [0, 0, 1.4e9]
    wcs.cdelt = [1, 1, 1e6]
    wcs.crpix = [1, 1, 1]
    assert str(wcs.cunit[2]) == "Hz"
    data = np.arange(1, 5)[:, None, None, None] * np.ones((5, 8, 9))
    cube = StokesSpectralCube({k: SpectralCube(data[i], wcs=wcs)
                               for i, k in enumerate("IQUV")})
    sub = cube.spectral_slab(Quantity(1.401e9, "Hz"), Quantity(1.403e9, "Hz"))
    assert sub.shape == (3, 8, 9)
    assert np.allclose(np.asarray(sub["Q"].unmasked_data[:].value), 2)


# ---------------------------------------------------------------------------
# reference test_stokes_spectral_cube.py class-method battery
# ---------------------------------------------------------------------------

def _w3():
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "FREQ"]
    return w


_SDATA = np.arange(4)[:, None, None, None] * np.ones((5, 20, 30))


def _mkd(**kw):
    return {k: SpectralCube(v, wcs=_w3()) for k, v in kw.items()}


def test_direct_init():
    """reference test_stokes_spectral_cube.py:30-36."""
    StokesSpectralCube(_mkd(I=_SDATA[0], Q=_SDATA[1], U=_SDATA[2],
                            V=_SDATA[3]))


def test_direct_init_invalid_type():
    """reference :38-44: raw arrays are rejected."""
    with pytest.raises(TypeError):
        StokesSpectralCube(dict(I=_SDATA[0], Q=_SDATA[1]))


def test_direct_init_invalid_shape():
    """reference :46-53."""
    sd = _mkd(Q=_SDATA[1], U=_SDATA[2], V=_SDATA[3])
    sd["I"] = SpectralCube(np.ones((6, 2, 30)), wcs=_w3())
    with pytest.raises(ValueError):
        StokesSpectralCube(sd)


VALID_STOKES_LIST = ['I', 'Q', 'U', 'V', 'RR', 'LL', 'RL', 'LR', 'XX',
                     'XY', 'YX', 'YY', 'RX', 'RY', 'LX', 'LY', 'XR',
                     'XL', 'YR', 'YL', 'PP', 'PQ', 'QP', 'QQ',
                     'RCircular', 'LCircular', 'Linear', 'Ptotal',
                     'Plinear', 'PFtotal', 'PFlinear', 'Pangle']


@pytest.mark.parametrize("component", VALID_STOKES_LIST)
def test_valid_component_name(component):
    """reference :56-67: every StokesCoord symbol is accepted."""
    c = StokesSpectralCube({component: SpectralCube(_SDATA[0], wcs=_w3())})
    assert c.components == [component]


@pytest.mark.parametrize("component", ("A", "B", "IQUV", "BANANA"))
def test_invalid_component_name(component):
    """reference :69-74 + :177-181 (mask_invalid_component_name)."""
    with pytest.raises(ValueError):
        StokesSpectralCube({component: SpectralCube(_SDATA[0], wcs=_w3())})


def test_attributes():
    """reference :86-97."""
    c = StokesSpectralCube(_mkd(I=_SDATA[0], Q=_SDATA[1], U=_SDATA[2],
                                V=_SDATA[3]))
    np.testing.assert_allclose(np.asarray(c.I.unmasked_data[:].value), 0)
    np.testing.assert_allclose(np.asarray(c.Q.unmasked_data[:].value), 1)
    np.testing.assert_allclose(np.asarray(c.U.unmasked_data[:].value), 2)
    np.testing.assert_allclose(np.asarray(c.V.unmasked_data[:].value), 3)
    assert sorted(c.components) == ["I", "Q", "U", "V"]


def test_stokes_type_feed_linear_partial():
    """reference :100-131 (test_stokes_type_sky /
    test_stokes_type_feed_circular / feed_linear_partial): XX+YY alone
    still classifies FEED_LINEAR; the full-set classifications are in
    test_stokes_type_classification."""
    c = StokesSpectralCube(_mkd(XX=_SDATA[0], YY=_SDATA[1]))
    assert c.stokes_type == "FEED_LINEAR"


def test_key_access_valid():
    """reference :213-224."""
    c = StokesSpectralCube(_mkd(I=_SDATA[0], Q=_SDATA[1], U=_SDATA[2],
                                V=_SDATA[3]))
    for k in "IQUV":
        assert c[k] is c._stokes_data[k]


def test_mask_invalid_shape():
    """reference :183-192: a non-broadcastable common mask raises."""
    sd = _mkd(I=_SDATA[0], Q=_SDATA[1], U=_SDATA[2], V=_SDATA[3])
    m = BooleanArrayMask(np.random.random((5, 20, 15)) > 0.2, wcs=_w3())
    with pytest.raises(ValueError, match="broadcastable"):
        StokesSpectralCube(sd, mask=m)


def test_separate_mask():
    """reference :194-212: the common mask ANDs with each component's own
    mask, and with_mask layers a third."""
    rng = np.random.RandomState(12345)
    m1 = BooleanArrayMask(rng.random((5, 20, 30)) > 0.2, wcs=_w3())
    m2 = [BooleanArrayMask(rng.random((5, 20, 30)) > 0.4, wcs=_w3())
          for _ in range(4)]
    m3 = BooleanArrayMask(rng.random((5, 20, 30)) > 0.2, wcs=_w3())
    sd = {k: SpectralCube(_SDATA[i], wcs=_w3(), mask=m2[i])
          for i, k in enumerate("IQUV")}
    c1 = StokesSpectralCube(sd, mask=m1)
    for i, k in enumerate("IQUV"):
        np.testing.assert_array_equal(
            np.asarray(c1[k].mask.include()),
            np.asarray((m1 & m2[i]).include()))
    c2 = c1.I.with_mask(m3)
    np.testing.assert_array_equal(
        np.asarray(c2.mask.include()),
        np.asarray((m1 & m2[0] & m3).include()))


_TDATA = np.zeros((4, 5, 5))
_TDATA[0] = 10
_TDATA[1] = 2
_TDATA[2] = 3
_TDATA[3] = 4


def _mk1(**kw):
    return {k: SpectralCube(v[None, ...], wcs=_w3()) for k, v in kw.items()}


def test_linear_to_sky():
    """reference :237-249 values: I=7, Q=3, U=2.5, V=0.5j — the real
    encoding stores V's imaginary part (+0.5)."""
    c = StokesSpectralCube(_mk1(XX=_TDATA[0], XY=_TDATA[1], YX=_TDATA[2],
                                YY=_TDATA[3]))
    s = c.transform_basis("Sky")
    np.testing.assert_allclose(np.asarray(s["I"].unmasked_data[:].value), 7)
    np.testing.assert_allclose(np.asarray(s["Q"].unmasked_data[:].value), 3)
    np.testing.assert_allclose(np.asarray(s["U"].unmasked_data[:].value),
                               2.5)
    np.testing.assert_allclose(np.asarray(s["V"].unmasked_data[:].value),
                               0.5)


def test_circular_to_sky():
    """reference :251-263 values: I=7, Q=2.5, U=0.5j (imag part), V=3."""
    c = StokesSpectralCube(_mk1(RR=_TDATA[0], RL=_TDATA[1], LR=_TDATA[2],
                                LL=_TDATA[3]))
    s = c.transform_basis("Sky")
    np.testing.assert_allclose(np.asarray(s["I"].unmasked_data[:].value), 7)
    np.testing.assert_allclose(np.asarray(s["Q"].unmasked_data[:].value),
                               2.5)
    np.testing.assert_allclose(np.asarray(s["U"].unmasked_data[:].value),
                               0.5)
    np.testing.assert_allclose(np.asarray(s["V"].unmasked_data[:].value), 3)


def test_sky_to_linear():
    """reference :265-278 real components: XX=(I+Q)/2=6, YY=(I-Q)/2=4;
    the complex XY=(U+iV)/2 pair is stored as the recoverable
    (Re-Im, Re+Im) real pair."""
    c = StokesSpectralCube(_mk1(I=_TDATA[0], Q=_TDATA[1], U=_TDATA[2],
                                V=_TDATA[3]))
    lin = c.transform_basis("Linear")
    np.testing.assert_allclose(
        np.asarray(lin["XX"].unmasked_data[:].value), 6)
    np.testing.assert_allclose(
        np.asarray(lin["YY"].unmasked_data[:].value), 4)
    xy = np.asarray(lin["XY"].unmasked_data[:].value)
    yx = np.asarray(lin["YX"].unmasked_data[:].value)
    # Re = (XY+YX)/2 = U/2 = 1.5; Im = (YX-XY)/2 = V/2 = 2 (ref 1.5+2j)
    np.testing.assert_allclose((xy + yx) / 2, 1.5)
    np.testing.assert_allclose((yx - xy) / 2, 2.0)


def test_sky_to_circular():
    """reference :280-293 real components: RR=(I+V)/2=7, LL=(I-V)/2=3;
    RL=(Q+iU)/2 recoverable from the real pair (ref 1+1.5j)."""
    c = StokesSpectralCube(_mk1(I=_TDATA[0], Q=_TDATA[1], U=_TDATA[2],
                                V=_TDATA[3]))
    circ = c.transform_basis("Circular")
    np.testing.assert_allclose(
        np.asarray(circ["RR"].unmasked_data[:].value), 7)
    np.testing.assert_allclose(
        np.asarray(circ["LL"].unmasked_data[:].value), 3)
    rl = np.asarray(circ["RL"].unmasked_data[:].value)
    lr = np.asarray(circ["LR"].unmasked_data[:].value)
    np.testing.assert_allclose((rl + lr) / 2, 1.0)   # Re = Q/2
    np.testing.assert_allclose((lr - rl) / 2, 1.5)   # Im = U/2


def test_getitem_slice_preserves_data():
    """reference TestStokesSubcube:336-356 (+
    test_getitem_string_still_works)."""
    d = np.arange(1, 5)[:, None, None, None] * np.ones((5, 20, 30))
    c = StokesSpectralCube({k: SpectralCube(d[i], wcs=_w3())
                            for i, k in enumerate("IQUV")})
    sub = c[1:3, :, :]
    assert isinstance(sub, StokesSpectralCube)
    assert sub.shape == (2, 20, 30)
    np.testing.assert_allclose(
        np.asarray(sub["I"].unmasked_data[:].value), d[0, 1:3])
    np.testing.assert_allclose(
        np.asarray(sub["Q"].unmasked_data[:].value), d[1, 1:3])
    assert c["I"].shape == (5, 20, 30)   # string access still works


def test_subcube_pixel():
    """reference TestStokesSubcube:370-382 (+
    test_subcube_all_components_consistent)."""
    d = np.arange(1, 5)[:, None, None, None] * np.ones((5, 20, 30))
    c = StokesSpectralCube({k: SpectralCube(d[i], wcs=_w3())
                            for i, k in enumerate("IQUV")})
    sub = c.subcube(xlo=5, xhi=15, ylo=2, yhi=12)
    assert isinstance(sub, StokesSpectralCube)
    assert sub.shape == (5, 10, 10)
    shapes = [sub[k].shape for k in sub.components]
    assert len(set(shapes)) == 1


def test_stokes_remaining_delegations_and_errors(tmp_path):
    """CRTF/region-list/mask delegation, with_spectral_unit, repr, and
    transform_basis error branches (reference
    stokes_spectral_cube.py:225-453)."""
    from spectral_cube_tpu import BooleanArrayMask
    from spectral_cube_tpu.region import parse_crtf_region
    import spectral_cube_tpu.units as u
    p1, d1 = make_cube_file(tmp_path, "ti.fits", shape=(4, 15, 15),
                            with_nan=False)
    p2, d2 = make_cube_file(tmp_path, "tq.fits", shape=(4, 15, 15),
                            seed=5, with_nan=False)
    sc = StokesSpectralCube({"I": SpectralCube.read(p1),
                             "Q": SpectralCube.read(p2)})
    # CRTF delegation
    sub = sc.subcube_from_crtfregion("box[[4pix, 4pix], [12pix, 12pix]]")
    assert set(sub.components) == {"I", "Q"}
    assert sub.shape[1] < 15
    # region-list delegation
    regs = parse_crtf_region("box[[4pix, 4pix], [12pix, 12pix]]")
    sub2 = sc.subcube_from_regions(regs)
    assert sub2.shape == sub.shape
    # mask delegation
    arr = np.zeros((4, 15, 15), bool)
    arr[:, 3:9, 2:10] = True
    sub3 = sc.subcube_from_mask(BooleanArrayMask(arr))
    assert sub3.shape == (4, 6, 8)
    # with_spectral_unit delegates to every component
    conv = sc.with_spectral_unit(u.Hz)
    assert str(conv["I"].spectral_axis.unit) == "Hz"
    # repr names the components and shape
    r = repr(sc)
    assert "I" in r and "shape" in r
    # Sky -> Sky is the identity; feed -> feed transforms require IQUV
    assert sc.transform_basis("Sky") is sc
    feeds = StokesSpectralCube({"XX": SpectralCube.read(p1),
                                "YY": SpectralCube.read(p2)})
    with pytest.raises(ValueError):
        feeds.transform_basis("Circular")
    with pytest.raises(ValueError):
        feeds.transform_basis("Linear")
    with pytest.raises(ValueError):
        sc.transform_basis("Elliptical")
