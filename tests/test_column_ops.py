"""Unit tests for the vertical column operator matrices."""

import numpy as np
import pytest

from tempestmodel_tpu.ops import column_ops as co


@pytest.mark.parametrize("vo", [1, 2, 3])
def test_operator_exactness(vo):
    """Interp/diff operators are exact on the polynomials they must span."""
    nz = 12
    ops = co.build_column_ops(nz, vo)
    lev, intf = ops.reta_lev, ops.reta_int

    assert abs(ops.na_lev.sum() - 1.0) < 1e-13
    assert abs(ops.na_int.sum() - 1.0) < 1e-13

    f_n = 2.0 + 3.0 * lev
    f_i = 2.0 + 3.0 * intf

    np.testing.assert_allclose(ops.interp_i2n @ f_i, f_n, atol=1e-12)
    np.testing.assert_allclose(ops.interp_n2i @ f_n, f_i, atol=1e-12)
    np.testing.assert_allclose(ops.diff_n2n @ f_n, 3.0, atol=1e-11)
    np.testing.assert_allclose(ops.diff_i2n @ f_i, 3.0, atol=1e-11)
    np.testing.assert_allclose(ops.diff_i2i @ f_i, 3.0, atol=1e-11)
    # flux-correction n2i derivative: interior rows exact; boundary rows are
    # zeroed by the zero-boundaries flag for vo=1
    d = ops.diff_n2i @ f_n
    np.testing.assert_allclose(d[1:-1], 3.0, atol=1e-11)

    # second derivative of x^2 = 2 away from domain-boundary elements
    dd_i = ops.diffdiff_i2i @ (intf ** 2)
    np.testing.assert_allclose(dd_i[vo + 1:-(vo + 1)], 2.0, atol=1e-9)

    # penalty of element-continuous (linear) data vanishes for vo >= 2;
    # for vo=1 the midpoint representation is discontinuous at edges but the
    # penalty must still be conservative (weighted sum zero).
    pen = ops.penalty_left @ f_n + ops.penalty_right @ f_n
    if vo >= 2:
        np.testing.assert_allclose(pen, 0.0, atol=1e-12)
    np.testing.assert_allclose(np.sum(ops.na_lev * pen), 0.0, atol=1e-12)


def test_vertical_coordinate_lorenz():
    """VO1: levels at midpoints, interfaces uniform."""
    lev, intf, wl, wi = co.vertical_coordinate(8, 1)
    np.testing.assert_allclose(intf, np.linspace(0, 1, 9), atol=1e-14)
    np.testing.assert_allclose(lev, (intf[:-1] + intf[1:]) / 2, atol=1e-14)
    np.testing.assert_allclose(wl, 1.0 / 8.0, atol=1e-14)


def test_flux_correction_type2_order2():
    """Type-2 correction of order 2 is g(x) = x^2 on [0,1]: zero of
    multiplicity 2 at 0, value 1 at 1 — so g' = 2x exactly."""
    x = np.array([0.0, 0.25, 0.5, 1.0])
    d = co.flux_correction_derivatives(2, 2, x)
    np.testing.assert_allclose(d, 2.0 * x, atol=1e-12)


def test_vertical_stretch_maps():
    """Stretch maps produce monotone level placement; operators stay exact
    for linear fields on the stretched grid."""
    from tempestmodel_tpu.grid.vertical_stretch import (stretch_cubic,
                                                        stretch_piecewise_linear)
    for fn in (stretch_cubic, stretch_piecewise_linear):
        lev, intf, wl, wi = co.vertical_coordinate(12, 1, fn)
        assert (np.diff(intf) > 0).all()
        assert abs(intf[0]) < 1e-14 and abs(intf[-1] - 1.0) < 1e-12
        assert abs(wl.sum() - intf[-1]) < 1e-12
        ops = co.build_column_ops(12, 1, fn)
        f = 1.0 + 2.0 * ops.reta_lev
        np.testing.assert_allclose(ops.diff_n2n @ f, 2.0, atol=1e-10)
        np.testing.assert_allclose(
            ops.interp_n2i @ f, 1.0 + 2.0 * ops.reta_int, atol=1e-10)


class TestFVDiscretization:
    """--vdisc FV: cell-centered finite volumes with sliding-stencil
    reconstruction (GridGLL.cpp:191-250 FV branch)."""

    def test_operators_interior_exactness(self):
        from tempestmodel_tpu.ops import column_ops as co
        ops = co.build_column_ops_fv(12, 2)
        lev, intf = ops.reta_lev, ops.reta_int
        # boundary rows use the reference's one-sided (constant at vo=2)
        # stencils; interior rows are polynomial-exact
        np.testing.assert_allclose((ops.interp_n2i @ lev)[1:-1],
                                   intf[1:-1], atol=1e-12)
        np.testing.assert_allclose(ops.diff_i2n @ intf ** 2, 2 * lev,
                                   atol=1e-12)
        np.testing.assert_allclose((ops.diff_n2i @ lev ** 2)[1:-1],
                                   (2 * intf)[1:-1], atol=1e-10)
        # per-interface upwinding structure (nFiniteElements == nz)
        assert ops.vo == 1
        assert ops.wscat_left.shape == (12, 11)

    def test_requires_even_order(self):
        from tempestmodel_tpu.ops import column_ops as co
        import pytest
        with pytest.raises(ValueError):
            co.build_column_ops_fv(12, 1)
        with pytest.raises(ValueError):
            co.build_column_ops_fv(12, 3)

    def test_igw_matches_fe(self):
        """IGW theta' under FV(vo=2) matches FE(vo=1) closely (the
        lowest-order operators coincide on the uniform grid)."""
        import jax.numpy as jnp
        from tempestmodel_tpu.config import ModelConfig, GridKind
        from tempestmodel_tpu.models import nh_model
        from tempestmodel_tpu.testcases.nonhydro_xz import InertiaGravityWave
        tc = InertiaGravityWave()

        def run(vdisc, vo):
            cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=10,
                              ney=1, order=4, nz=20, ztop=tc.ztop,
                              x_extent=tc.x_extent, y_extent=tc.y_extent,
                              dt=6.0, hyperdiffusion=False,
                              vertical_order=vo,
                              vertical_discretization=vdisc,
                              vertical_solver="banded")
            geom = nh_model.build_nh_cartesian_geometry(cfg)
            s0 = tc.initial_state(geom, cfg.constants)
            fs, st = nh_model.make_nh_step(cfg, geom)
            s, c = fs(s0)
            for _ in range(9):
                s, c = st(s, c)
            return s, s0

        sF, s0F = run("FV", 2)
        sE, s0E = run("FE", 1)
        thF = np.abs(np.asarray(sF["Rt"] / sF["Rho"]
                                - s0F["Rt"] / s0F["Rho"])).max()
        thE = np.abs(np.asarray(sE["Rt"] / sE["Rho"]
                                - s0E["Rt"] / s0E["Rho"])).max()
        assert np.isfinite(thF)
        assert abs(thF - thE) / thE < 0.01
