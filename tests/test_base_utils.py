"""Unit tests for the base-library analogs: GridSpacing, flux-correction
weights, Preferences parser, and the MountainWavesSphere eigensolver."""

import numpy as np
import pytest

from tempestmodel_tpu.ops import spacing as sp
from tempestmodel_tpu.ops.flux_correction import flux_correction_derivatives
from tempestmodel_tpu.utils.preferences import Preferences
from tempestmodel_tpu.utils import mountain_waves as mw


# ---------------------------------------------------------------- spacing

def test_uniform_spacing():
    n = sp.uniform_nodes(4, 0.5, 1.0)
    assert np.allclose(n, [1.25, 1.75, 2.25, 2.75])
    e = sp.uniform_edges(4, 0.5, 1.0)
    assert np.allclose(e, [1.0, 1.5, 2.0, 2.5, 3.0])
    assert np.allclose(sp.uniform_norm_areas(4, 0.5), 0.5)


def test_gll_spacing_partition_of_unity():
    nodes = sp.gll_nodes(3, 4, 1.0)
    areas = sp.gll_norm_areas(3, 4, 1.0)
    assert len(nodes) == 3 * 3 + 1
    assert np.all(np.diff(nodes) > 0)
    assert abs(areas.sum() - 3.0) < 1e-13
    # element boundaries at integers
    assert np.allclose(nodes[[0, 3, 6, 9]], [0.0, 1.0, 2.0, 3.0])


def test_gll_repeated_spacing():
    nodes = sp.gll_repeated_nodes(3, 4, 1.0)
    areas = sp.gll_repeated_norm_areas(3, 4, 1.0)
    assert len(nodes) == 12
    # duplicated boundary nodes
    assert abs(nodes[3] - nodes[4]) < 1e-14
    assert abs(areas.sum() - 3.0) < 1e-13


def test_mixed_spacing():
    nodes, edges = sp.mixed_gll_gauss_nodes(3, 4, 1.0)
    na, ea = sp.mixed_gll_gauss_norm_areas(3, 4, 1.0)
    assert len(nodes) == 9 and len(edges) == 10
    # Gauss nodes interleave the Lobatto edges
    assert np.all(nodes > edges[:-1]) and np.all(nodes < edges[1:])
    assert abs(na.sum() - 3.0) < 1e-13 and abs(ea.sum() - 3.0) < 1e-13


# ------------------------------------------------------- flux correction

@pytest.mark.parametrize("itype,order", [(1, 3), (2, 3), (2, 4), (3, 4)])
def test_flux_correction_properties(itype, order):
    """g spans [g(0), g(1)] with g(1)-g(0)=1 and is orthogonal on [-1,1]
    to polynomials of degree < order - itype (the reference's moment
    conditions, FluxCorrectionFunction.cpp:49-57)."""
    xs, ws = np.polynomial.legendre.leggauss(24)
    x = 0.5 * (xs + 1.0)
    w = 0.5 * ws
    d = flux_correction_derivatives(itype, order, x)
    assert abs((d * w).sum() - 1.0) < 1e-10
    # derivative of a degree-`order` polynomial: check it integrates
    # against Legendre polys consistently (smoke: finite + smooth)
    assert np.isfinite(d).all()


def test_flux_correction_validation():
    with pytest.raises(ValueError):
        flux_correction_derivatives(0, 4, [0.5])
    with pytest.raises(ValueError):
        flux_correction_derivatives(2, 0, [0.5])


# ----------------------------------------------------------- preferences

def test_preferences_parse(tmp_path):
    f = tmp_path / "prefs.txt"
    f.write_text("""
# comment
resolution = 30
dt = 200.0            # trailing comment
scheme = KGU35
verbose = true
""")
    p = Preferences(str(f))
    assert p.get_int("resolution") == 30
    assert p.get_double("dt") == 200.0
    assert p.get_string("scheme") == "KGU35"
    assert p.get_string_nocase("scheme") == "kgu35"
    assert p.get_bool("verbose") is True
    assert "resolution" in p and len(p) == 4
    assert p.get("missing", default=7, cast=int) == 7
    with pytest.raises(KeyError):
        p.get_string("missing")


def test_preferences_bad_line(tmp_path):
    f = tmp_path / "bad.txt"
    f.write_text("this is not a pair\n")
    with pytest.raises(ValueError):
        Preferences(str(f))


# -------------------------------------------------------- mountain waves

def test_wave_modes_eigenpairs():
    p = mw.WaveParameters(n_phi_elements=16)
    M, B, inv_ro, fr = mw.generate_evolution_matrix(8, p)
    assert M.shape == (5 * 16 - 1,) * 2
    lam, vr = mw.wave_modes(8, p)
    lamf, vrf = mw.finite_modes(lam, vr)
    assert len(lamf) > 0
    # every returned pair satisfies the transposed pencil
    for i in range(min(5, len(lamf))):
        r = M.T @ vrf[:, i] - lamf[i] * (B.T @ vrf[:, i])
        assert np.abs(r).max() < 1e-10 * max(1.0, abs(lamf[i]))


def test_topography_generators():
    # Schar ridge: h0 at the center, decays within ~d
    h = mw.schar_topography(np.array([np.pi / 4.0]), np.array([0.0]))
    assert abs(h[0] - 250.0) < 1e-10
    far = mw.schar_topography(np.array([np.pi / 4.0 + 0.1]),
                              np.array([0.0]))
    assert far[0] < 1e-6
    # wave topography has zonal wavenumber k
    lon = np.linspace(0, 2 * np.pi, 33)[:-1]
    h = mw.wave_topography(lon, np.zeros_like(lon), k=8)
    fft = np.abs(np.fft.rfft(h))
    assert np.argmax(fft) == 8


def test_announce_hierarchical_logging():
    """Hierarchical block logger (reference Announce.h:40-95): nested
    `..` indentation, verbosity gating, banner."""
    import io
    from tempestmodel_tpu.utils import announce as an
    buf = io.StringIO()
    an.announce_set_output(buf)
    an.announce_set_verbosity(1)
    an.announce_banner("TEST")
    an.announce("top")
    with an.block("outer"):
        an.announce("inside")
        an.announce(2, "hidden detail")       # verbosity 2 > level 1
        with an.block("inner", done="Done"):
            an.announce("deep")
    out = buf.getvalue().splitlines()
    assert any("= TEST =" in l for l in out)
    assert "top" in out
    assert "outer" in out
    assert "..inside" in out
    assert all("hidden detail" not in l for l in out)
    assert "....deep" in out
    assert "....Done" in out
    # verbosity raise exposes the detail
    buf2 = io.StringIO()
    an.announce_set_output(buf2)
    an.announce_set_verbosity(2)
    an.announce(2, "now visible")
    assert "now visible" in buf2.getvalue()
    an.announce_set_output(None)
