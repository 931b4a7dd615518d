"""Cartesian x-z slice nonhydrostatic test cases.

TPU-native ports of the reference ``test/nonhydro_xz/`` battery: pointwise
initial/reference state evaluators over (x, z) converted to the prognostic
state dict (U, V, Rt, W, Rho) with Lorenz staggering.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..constants import PhysicalConstants
from ..grid.cartesian import CartesianGeometry


def _state_dict(geom: CartesianGeometry, theta_lev, rho_lev, u_lev=None,
                dtype=jnp.float64):
    """Assemble the Lorenz-staggered state from level fields (W = 0)."""
    shape = np.asarray(geom.z_lev).shape
    zeros = np.zeros(shape)
    u = zeros if u_lev is None else np.broadcast_to(u_lev, shape)
    rt = rho_lev * theta_lev
    w = np.zeros(shape[:3] + (geom.nz + 1,))
    return {
        "U": jnp.asarray(np.broadcast_to(u, shape).copy(), dtype),
        "V": jnp.asarray(zeros, dtype),
        "Rt": jnp.asarray(rt, dtype),
        "W": jnp.asarray(w, dtype),
        "Rho": jnp.asarray(rho_lev, dtype),
    }


@dataclasses.dataclass(frozen=True)
class ThermalBubble:
    """Giraldo et al. (2007) rising thermal bubble.

    Reference: ``test/nonhydro_xz/ThermalBubbleCartesianTest.cpp`` (defaults
    ThetaBar=300, ThetaC=0.5, rC=250, xC=500, zC=350; domain [0,1000]^2 m,
    36x1 elements, 72 levels).
    """
    theta_bar: float = 300.0
    theta_c: float = 0.5
    r_c: float = 250.0
    x_c: float = 500.0
    z_c: float = 350.0

    x_extent = (0.0, 1000.0)
    y_extent = (-500.0, 500.0)
    ztop = 1000.0

    def theta_perturbation(self, x, z):
        r = np.sqrt((x - self.x_c) ** 2 + (z - self.z_c) ** 2)
        return np.where(
            r <= self.r_c,
            0.5 * self.theta_c * (1.0 + np.cos(np.pi * r / self.r_c)),
            0.0)

    def _background(self, z, constants: PhysicalConstants):
        c = constants
        exner = 1.0 - c.g / (c.Cp * self.theta_bar) * z
        rho = c.P0 / (c.Rd * self.theta_bar) * exner ** (c.Cv / c.Rd)
        return rho

    def initial_state(self, geom: CartesianGeometry,
                      constants: PhysicalConstants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        x = np.asarray(geom.x)[None, :, None, None]
        theta = self.theta_bar + self.theta_perturbation(
            np.broadcast_to(x, z.shape), z)
        rho = self._background(z, constants)
        return _state_dict(geom, theta, rho, dtype=dtype)

    def reference_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        theta = np.full(z.shape, self.theta_bar)
        rho = self._background(z, constants)
        return _state_dict(geom, theta, rho, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class InertiaGravityWave:
    """Skamarock-Klemp (1994) inertia-gravity waves in a channel.

    Reference: ``test/nonhydro_xz/InertiaGravityCartesianXZTest.cpp``:
    isothermal-N background (N = 0.01 1/s), theta perturbation of width a,
    uniform U0 = 20 m/s; domain 300 km x 10 km.
    """
    n_bar: float = 0.01
    theta_0: float = 300.0
    theta_c: float = 0.01
    h_c: float = 10000.0
    a_c: float = 5000.0
    x_c: float = 100000.0
    u0: float = 20.0

    x_extent = (0.0, 300000.0)
    y_extent = (-100000.0, 100000.0)
    ztop = 10000.0

    def _background(self, z, constants: PhysicalConstants):
        c = constants
        n2 = self.n_bar ** 2
        theta = self.theta_0 * np.exp(n2 / c.g * z)
        exner = 1.0 + c.g * c.g / (c.Cp * self.theta_0 * n2) * (
            np.exp(-n2 / c.g * z) - 1.0)
        rho = c.P0 / (c.Rd * theta) * exner ** (c.Cv / c.Rd)
        return theta, rho

    def theta_perturbation(self, x, z):
        return self.theta_c * np.sin(np.pi * z / self.h_c) / (
            1.0 + ((x - self.x_c) / self.a_c) ** 2)

    def initial_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        x = np.broadcast_to(np.asarray(geom.x)[None, :, None, None], z.shape)
        theta_b, rho = self._background(z, constants)
        theta = theta_b + self.theta_perturbation(x, z)
        return _state_dict(geom, theta, rho, u_lev=self.u0, dtype=dtype)

    def reference_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        theta_b, rho = self._background(z, constants)
        return _state_dict(geom, theta_b, rho, u_lev=self.u0, dtype=dtype)
