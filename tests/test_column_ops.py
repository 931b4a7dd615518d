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
