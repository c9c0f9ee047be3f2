"""Execute every ```python block in docs/quickstart.md (the analog of the
reference running doctests over docs/*.rst in CI, tox.ini:46).

Blocks run sequentially in one namespace seeded with the free variables
the prose introduces (synthetic cubes, kernels, velocity surfaces), so the
documented API surface is guaranteed to stay runnable.
"""

import os
import re

import numpy as np
import pytest

from conftest import make_cube_file, make_vr_cube_file

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "quickstart.md")

REF_LMV = "/root/reference/spectral_cube/tests/data/example_cube.lmv"


def _blocks():
    text = open(DOCS).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


@pytest.mark.skipif(not os.path.exists(REF_LMV),
                    reason="reference LMV example absent")
def test_quickstart_blocks_run(tmp_path, monkeypatch):
    import shutil
    import jax.numpy as jnp
    from spectral_cube_tpu import SpectralCube, Quantity
    import spectral_cube_tpu.units as u
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d

    monkeypatch.chdir(tmp_path)
    path, _ = make_cube_file(tmp_path, name="my_cube.fits",
                             shape=(12, 10, 8))
    shutil.copy(REF_LMV, str(tmp_path / "my_cube.lmv"))
    pa, _ = make_cube_file(tmp_path, name="a.fits", shape=(6, 8, 8))
    pb, _ = make_cube_file(tmp_path, name="b.fits", shape=(6, 8, 8),
                           seed=3)
    vr_path, _ = make_vr_cube_file(tmp_path, shape=(6, 8, 8))

    base = SpectralCube.read(path)
    sv = np.asarray(base.with_spectral_unit(
        u.km_s, velocity_convention="radio").spectral_axis.value)
    ns = {
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
    }
    blocks = _blocks()
    assert len(blocks) >= 8
    for i, block in enumerate(blocks):
        # region example in the docs points at real survey coordinates;
        # re-center it on the synthetic cube's WCS
        block = block.replace('circle(52.23, 31.24, 10\\")',
                              'circle(23.1837, 30.5765, 10\\")')
        try:
            exec(compile(block, f"{DOCS}:block{i}", "exec"), ns)
        except Exception as exc:
            raise AssertionError(
                f"quickstart block {i} failed: {type(exc).__name__}: "
                f"{exc}\n--- block ---\n{block}") from exc
