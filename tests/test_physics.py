"""Physics parameterization tests (Held-Suarez, Kessler)."""

import numpy as np
import jax.numpy as jnp

from tempestmodel_tpu.physics.kessler import kessler_column_update


def test_kessler_rain_cycle():
    """Repeated Kessler calls: condensation -> autoconversion -> rain ->
    surface precipitation, with water mass closed except precip."""
    nz = 30
    z = jnp.linspace(100.0, 12000.0, nz)[None, :]
    rho = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) * 1.2)
    pk = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) ** 0.2875)
    theta = jnp.full((1, nz), 300.0)
    # moderately supersaturated lower atmosphere
    qv = jnp.asarray(0.030 * np.exp(-np.asarray(z) / 8000.0))
    qc = jnp.zeros((1, nz))
    qr = jnp.zeros((1, nz))

    precl_total = 0.0
    for _ in range(60):
        theta, qv, qc, qr, precl = kessler_column_update(
            theta, qv, qc, qr, rho, pk, z, 30.0)
        precl_total += float(precl[0]) * 30.0

    assert bool(jnp.isfinite(theta).all())
    assert float(qc.max()) > 1e-5          # cloud water present
    assert float(qr.max()) > 1e-6          # rain formed
    assert precl_total > 0.0               # rain reached the surface
    assert float(qv.min()) >= 0.0
    assert float(qr.min()) >= 0.0


def test_kessler_dry_column_noop():
    """A dry, subsaturated column is (almost) untouched."""
    nz = 20
    z = jnp.linspace(100.0, 10000.0, nz)[None, :]
    rho = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) * 1.2)
    pk = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) ** 0.2875)
    theta = jnp.full((1, nz), 300.0)
    qv = jnp.full((1, nz), 1e-6)           # far below saturation
    qc = jnp.zeros((1, nz))
    qr = jnp.zeros((1, nz))
    th2, qv2, qc2, qr2, precl = kessler_column_update(
        theta, qv, qc, qr, rho, pk, z, 30.0)
    np.testing.assert_allclose(np.asarray(th2), 300.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qv2), 1e-6, atol=1e-12)
    assert float(precl[0]) == 0.0
