"""Exercise the optional-package exporters with mock modules.

The reference gates to_yt/to_glue/to_pvextractor/to_ds9/find_lines on
imports of yt/glue/pvextractor/ds9/astroquery (spectral_cube.py:2363-2562,
ytcube.py); none of those packages exist in this environment, so the
wiring of each exporter — argument marshaling, coordinate scaling, frame
iteration, file handling — would otherwise be dead code that only fails
at a user's site.  These tests inject lightweight fake modules into
sys.modules and drive every exporter end to end.
"""

import os
import sys
import types

import numpy as np
import pytest

from conftest import make_cube_file
from spectral_cube_tpu import SpectralCube


@pytest.fixture
def cube(tmp_path):
    path, data = make_cube_file(tmp_path, shape=(6, 5, 4))
    return SpectralCube.read(path)


def _install(monkeypatch, name, module):
    monkeypatch.setitem(sys.modules, name, module)


# ---------------------------------------------------------------- yt ----

class _FakeDataset:
    def __init__(self):
        self.periodicity = (False, False, False)
        self.surfaces = []

    def all_data(self):
        return "ALLDATA"

    def surface(self, data_source, field, level):
        surf = _FakeSurface(field, level)
        self.surfaces.append(surf)
        return surf


class _FakeSurface:
    def __init__(self, field, level):
        self.field = field
        self.level = level
        self.calls = []

    def export_sketchfab(self, **kwargs):
        self.calls.append(("sketchfab", kwargs))
        return "sketchfab-url"

    def export_obj(self, filename, **kwargs):
        self.calls.append(("obj", filename, kwargs))

    def export_ply(self, filename, **kwargs):
        self.calls.append(("ply", filename, kwargs))


class _FakeImage(np.ndarray):
    def rescale(self, cmax):
        return np.asarray(self).view(_FakeImage)


def _fake_yt_modules(monkeypatch, record):
    yt = types.ModuleType("yt")
    loaders = types.ModuleType("yt.loaders")

    def load_uniform_grid(data, dims, length_unit, bbox=None, nprocs=1,
                          periodicity=None, **kwargs):
        record["load"] = dict(data=data, dims=dims, bbox=bbox,
                              nprocs=nprocs)
        return _FakeDataset()

    loaders.load_uniform_grid = load_uniform_grid

    class _FakeCamera:
        def __init__(self):
            self.resolution = None
            self.position = None

        def switch_orientation(self, normal_vector=None, north_vector=None):
            record["orientation"] = (tuple(np.asarray(normal_vector)),
                                     tuple(np.asarray(north_vector)))

        def iter_rotate(self, angle, nframes, rot_vector=None):
            record["rotate"] = (angle, nframes, tuple(rot_vector))
            for i in range(nframes):
                yield i

    class _FakeScene:
        def __init__(self):
            self.camera = _FakeCamera()
            self._source = types.SimpleNamespace(transfer_function=None)
            self.saved = []

        def __getitem__(self, idx):
            return self._source

        def render(self):
            # matplotlib.image.imsave requires float RGB in 0..1
            return (np.random.rand(4, 4, 4) * 0.2).view(_FakeImage)

        def save(self, path, sigma_clip=None):
            self.saved.append(path)
            open(path, "wb").close()

    def create_scene(ds, field):
        record["scene"] = _FakeScene()
        return record["scene"]

    yt.create_scene = create_scene
    yt.loaders = loaders

    tfh_mod = types.ModuleType(
        "yt.visualization.volume_rendering.transfer_function_helper")

    class TransferFunctionHelper:
        def __init__(self, ds):
            self.tf = types.SimpleNamespace(
                add_layers=lambda n, colormap=None: record.setdefault(
                    "layers", (n, colormap)))

        def set_field(self, f):
            record["tf_field"] = f

        def set_log(self, log):
            record["tf_log"] = log

        def set_bounds(self, b):
            record["tf_bounds"] = b

        def build_transfer_function(self):
            record["tf_built"] = True

    tfh_mod.TransferFunctionHelper = TransferFunctionHelper

    viz = types.ModuleType("yt.visualization")
    vr = types.ModuleType("yt.visualization.volume_rendering")
    _install(monkeypatch, "yt", yt)
    _install(monkeypatch, "yt.loaders", loaders)
    _install(monkeypatch, "yt.visualization", viz)
    _install(monkeypatch, "yt.visualization.volume_rendering", vr)
    _install(monkeypatch,
             "yt.visualization.volume_rendering.transfer_function_helper",
             tfh_mod)
    return yt


def test_to_yt_bbox_and_coordinate_scaling(monkeypatch, cube):
    record = {}
    _fake_yt_modules(monkeypatch, record)
    yc = cube.to_yt(spectral_factor=2.0)
    nz, ny, nx = cube.shape
    assert record["load"]["dims"] == [nx, ny, nz]
    assert record["load"]["data"]["flux"].shape == (nx, ny, nz)
    np.testing.assert_allclose(record["load"]["bbox"][2],
                               [0.5, 2.0 * nz + 0.5])
    # world2yt/yt2world round-trip with the spectral stretch: yt pixel
    # 3.5 on the stretched axis is cube pixel 2 ((2-0.5)*2+0.5 = 3.5)
    world = yc.yt2world([1.0, 2.0, 3.5])
    pix = yc.world2yt(list(world))
    np.testing.assert_allclose(pix, [1.0, 2.0, 3.5], atol=1e-6)


def test_ytcube_quick_render_movie(monkeypatch, cube, tmp_path):
    record = {}
    _fake_yt_modules(monkeypatch, record)

    import matplotlib
    matplotlib.use("Agg", force=True)

    import subprocess
    calls = []
    monkeypatch.setattr(subprocess, "check_call",
                        lambda cmd, **kw: calls.append(cmd))

    yc = cube.to_yt()
    outdir = str(tmp_path / "frames")
    images = yc.quick_render_movie(outdir, size=16, nframes=3)
    assert len(images) == 3
    assert record["tf_field"] == "flux"
    assert record["rotate"][1] == 3
    assert len(record["scene"].saved) == 3
    # ffmpeg assembly was invoked on the frame glob
    assert calls and calls[0][0] == "ffmpeg"
    # rescaled frames written
    assert sorted(f for f in os.listdir(outdir) if f.endswith(".png"))


def test_ytcube_quick_isocontour(monkeypatch, cube, tmp_path):
    record = {}
    _fake_yt_modules(monkeypatch, record)
    yc = cube.to_yt()
    url = yc.quick_isocontour(level="3 sigma", title="t")
    assert url == "sketchfab-url"
    surf = yc.dataset.surfaces[-1]
    assert surf.level == pytest.approx(3 * float(cube.std().value))
    obj = str(tmp_path / "iso.obj")
    yc.quick_isocontour(level=0.5, export_to="obj", filename=obj)
    assert yc.dataset.surfaces[-1].calls[0][0] == "obj"
    with pytest.raises(ValueError):
        yc.quick_isocontour(level=0.5, export_to="obj")
    with pytest.raises(ValueError):
        yc.quick_isocontour(level=0.5, export_to="vtk", filename="x")


# -------------------------------------------------------------- glue ----

def test_to_glue(monkeypatch, cube):
    created = {}

    class _Data(dict):
        def __init__(self, label=None):
            self.label = label
            self.coords = None
            super().__init__()

    class _DataCollection(list):
        pass

    class _GlueApplication:
        def __init__(self, dc):
            created["dc"] = dc
            self.started = False
            self.added = []

        def add_datasets(self, ds):
            self.added.append(ds)

        def start(self):
            self.started = True

    gluecore = types.ModuleType("glue.core")
    gluecore.Data = _Data
    gluecore.DataCollection = _DataCollection
    gluecoords = types.ModuleType("glue.core.coordinates")
    gluecoords.coordinates_from_header = lambda h: ("coords", h["NAXIS"])
    glueqt = types.ModuleType("glue.app.qt")
    glueqt.GlueApplication = _GlueApplication
    glue = types.ModuleType("glue")
    glueapp = types.ModuleType("glue.app")
    for name, mod in [("glue", glue), ("glue.core", gluecore),
                      ("glue.core.coordinates", gluecoords),
                      ("glue.app", glueapp), ("glue.app.qt", glueqt)]:
        _install(monkeypatch, name, mod)

    app = cube.to_glue(name="mycube", start_gui=False)
    data = created["dc"][0]
    assert data.label == "mycube"
    assert data["intensity"].shape == cube.shape
    assert data.coords[0] == "coords"
    # adding into an existing app
    app2 = cube.to_glue(start_gui=False, glue_app=app)
    assert app2 is app and app.added


# ------------------------------------------------------- pvextractor ----

def test_to_pvextractor(monkeypatch, cube):
    pvg = types.ModuleType("pvextractor.gui")

    class PVSlicer:
        def __init__(self, c):
            self.cube = c

    pvg.PVSlicer = PVSlicer
    pv = types.ModuleType("pvextractor")
    _install(monkeypatch, "pvextractor", pv)
    _install(monkeypatch, "pvextractor.gui", pvg)
    out = cube.to_pvextractor()
    assert isinstance(out, PVSlicer) and out.cube is cube


# --------------------------------------------------------------- ds9 ----

def test_to_ds9(monkeypatch, cube):
    loaded = {}

    class DS9:
        def __init__(self, target=None, start=None):
            loaded["ctor"] = (target, start)
            self.sets = []

        def set(self, cmd):
            self.sets.append(cmd)
            if cmd.startswith("file "):
                path = cmd.split(" ", 1)[1]
                loaded["existed_at_load"] = os.path.exists(path)

    ds9mod = types.ModuleType("ds9")
    ds9mod.DS9 = DS9
    _install(monkeypatch, "ds9", ds9mod)
    dd = cube.to_ds9(newframe=True)
    assert loaded["ctor"] == (None, True)
    assert dd.sets[0] == "frame new"
    assert dd.sets[1].startswith("file ")
    # the temp FITS file existed when ds9 was told to load it
    assert loaded["existed_at_load"]
    # ...and is cleaned up afterwards
    assert not os.path.exists(dd.sets[1].split(" ", 1)[1])


# --------------------------------------------------------- find_lines ----

def test_find_lines(monkeypatch, cube):
    q = {}

    class Splatalogue:
        @staticmethod
        def query_lines(lo, hi, **kwargs):
            q["range"] = (lo, hi)
            q["kwargs"] = kwargs
            return "LINETABLE"

    spl = types.ModuleType("astroquery.splatalogue")
    spl.Splatalogue = Splatalogue
    aq = types.ModuleType("astroquery")
    _install(monkeypatch, "astroquery", aq)
    _install(monkeypatch, "astroquery.splatalogue", spl)
    out = cube.find_lines(chemical_name="CO")
    assert out == "LINETABLE"
    lo, hi = q["range"]
    ax = cube.with_spectral_unit("GHz").spectral_axis
    assert lo == pytest.approx(float(np.asarray(ax.value).min()))
    assert hi == pytest.approx(float(np.asarray(ax.value).max()))
    assert q["kwargs"] == {"chemical_name": "CO"}
