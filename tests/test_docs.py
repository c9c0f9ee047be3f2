"""Execute every ```python block in docs/*.md (the analog of the
reference running doctests over docs/*.rst in CI, tox.ini:46).

Blocks run sequentially in one namespace per page, seeded with the free
variables the prose introduces (synthetic cubes, kernels, velocity
surfaces), so the documented API surface is guaranteed to stay runnable.
"""

import os
import re
import warnings

import numpy as np
import pytest

from conftest import make_cube_file, make_vr_cube_file

DOCS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")

REF_LMV = "/root/reference/spectral_cube/tests/data/example_cube.lmv"

# pages with executable blocks (design.md/api.md/migrating.md are prose)
PAGES = ["quickstart.md", "accessing.md", "masking.md", "errors.md",
         "beams.md", "reprojection.md", "spectral_extraction.md",
         "stokes.md", "big_data.md", "examples.md", "visualization.md",
         "metadata.md", "developing.md", "moments.md", "smoothing.md",
         "manipulating.md"]


def _blocks(page):
    text = open(os.path.join(DOCS_DIR, page)).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def _make_ns(tmp_path):
    """Namespace seeding the free variables the docs prose introduces."""
    import shutil
    from spectral_cube_tpu import SpectralCube, Quantity
    import spectral_cube_tpu.units as u
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d

    path, _ = make_cube_file(tmp_path, name="my_cube.fits",
                             shape=(12, 10, 8))
    if os.path.exists(REF_LMV):
        shutil.copy(REF_LMV, str(tmp_path / "my_cube.lmv"))
    pa, _ = make_cube_file(tmp_path, name="a.fits", shape=(6, 8, 8))
    pb, _ = make_cube_file(tmp_path, name="b.fits", shape=(6, 8, 8),
                           seed=3)
    vr_path, _ = make_vr_cube_file(tmp_path, shape=(6, 8, 8))

    base = SpectralCube.read(path)
    sv = np.asarray(base.with_spectral_unit(
        u.km_s, velocity_convention="radio").spectral_axis.value)
    vcube = base.with_spectral_unit(u.km_s, velocity_convention="radio")
    return {
        "cube": base,
        "masked": base.with_mask(base > Quantity(0.2, base.unit)),
        "vcube": vcube,
        "new_axis_quantity": Quantity(
            np.linspace(sv.min(), sv.max(), 7), "km / s"),
        "gaussian_kernel1d": gaussian_kernel1d,
        "kcube": base.to("K"),
        "vr_cube": SpectralCube.read(vr_path),
        "target_header": base.header,
        "kernel": np.ones((3, 3)) / 9.0,
        "cube_a": SpectralCube.read(pa),
        "cube_b": SpectralCube.read(pb),
        "velocity_surface": Quantity(
            np.full(base.shape[1:], sv.mean()), "km / s"),
        "v_center": Quantity(sv.mean(), "km / s"),
        "f_line1": Quantity(1.4204, "GHz"),
        "f_line2": Quantity(1.4199, "GHz"),
        "vmin": Quantity(sv.min(), "km / s"),
        "vmax": Quantity(sv.max(), "km / s"),
        "tmp_dir": tmp_path,
    }


@pytest.mark.parametrize("page", PAGES)
def test_doc_blocks_run(page, tmp_path, monkeypatch):
    if page == "quickstart.md" and not os.path.exists(REF_LMV):
        pytest.skip("quickstart's LMV block needs the reference file; "
                    "the other pages run everywhere")
    monkeypatch.chdir(tmp_path)
    ns = _make_ns(tmp_path)
    blocks = _blocks(page)
    assert blocks, f"{page} has no python blocks"
    for i, block in enumerate(blocks):
        # region examples in the docs point at real survey coordinates;
        # re-center them on the synthetic cube's WCS
        block = block.replace('circle(52.23, 31.24, 10\\")',
                              'circle(23.1837, 30.5765, 10\\")')
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                exec(compile(block, f"{page}:block{i}", "exec"), ns)
            except Exception as exc:
                raise AssertionError(
                    f"{page} block {i} failed: {type(exc).__name__}: "
                    f"{exc}\n--- block ---\n{block}") from exc


def test_all_doc_pages_listed():
    """Every docs page with python blocks is in PAGES (no silently
    untested documentation)."""
    for fname in sorted(os.listdir(DOCS_DIR)):
        if not fname.endswith(".md") or fname in PAGES:
            continue
        assert not _blocks(fname), \
            f"{fname} has python blocks but is not in test PAGES"
