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
class DensityCurrent:
    """Straka et al. (1993) density current.

    Reference: ``test/nonhydro_xz/DensityCurrentCartesianTest.cpp``
    (ThetaBar=300, ThetaC=-15, rC=1, xC=0, zC=3000; domain [0, 25.6 km] x
    [0, 6.4 km]).
    """
    theta_bar: float = 300.0
    theta_c: float = -15.0
    r_c: float = 1.0
    x_c: float = 0.0
    z_c: float = 3000.0
    rayleigh: bool = True

    x_extent = (0.0, 25600.0)
    y_extent = (-100.0, 100.0)
    ztop = 6400.0

    def theta_perturbation(self, x, z, exner):
        r = np.sqrt(((x - self.x_c) / 4000.0) ** 2
                    + ((z - self.z_c) / 2000.0) ** 2)
        return np.where(
            r <= self.r_c,
            0.5 * self.theta_c * (1.0 + np.cos(np.pi * r)) / exner, 0.0)

    def _background(self, z, constants: PhysicalConstants):
        c = constants
        exner = 1.0 - c.g / (c.Cp * self.theta_bar) * z
        rho = c.P0 / (c.Rd * self.theta_bar) * exner ** (c.Cv / c.Rd)
        return exner, rho

    def rayleigh_strength(self, z, x=None, y=None):
        """Sponge at the top and both lateral ends (reference ``:180-205``)."""
        strength = 8.0e-3
        depth, width = 1500.0, 3000.0
        nu = np.where(z > self.ztop - depth,
                      0.5 * strength * (1.0 + np.cos(
                          np.pi * (self.ztop - z) / depth)), 0.0)
        if x is not None:
            x0, x1 = self.x_extent
            nu_r = np.where(x > x1 - width,
                            0.5 * strength * (1.0 + np.cos(
                                np.pi * (x1 - x) / width)), 0.0)
            nu_l = np.where(x < x0 + width,
                            0.5 * strength * (1.0 + np.cos(
                                np.pi * (x - x0) / width)), 0.0)
            nu = np.maximum(nu, np.maximum(nu_r, nu_l))
        return nu

    def initial_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        x = np.broadcast_to(np.asarray(geom.x)[None, :, None, None], z.shape)
        exner, rho = self._background(z, constants)
        theta = self.theta_bar + self.theta_perturbation(x, z, exner)
        return _state_dict(geom, theta, rho, dtype=dtype)

    def reference_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        exner, rho = self._background(z, constants)
        theta = np.full(z.shape, self.theta_bar)
        return _state_dict(geom, theta, rho, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class ScharMountain:
    """Schar et al. (2002) mountain waves over terrain.

    Reference: ``test/nonhydro_xz/ScharMountainCartesianTest.cpp``
    (u0=10, Nbar=0.01, Theta0=280, hC=250, aC=5000, lC=4000; domain
    [-25 km, 25 km] x [0, 21 km]).  Exercises the terrain-following metric.
    """
    u0: float = 10.0
    n_bar: float = 0.01
    theta_0: float = 280.0
    h_c: float = 250.0
    a_c: float = 5000.0
    l_c: float = 4000.0
    rayleigh: bool = True

    x_extent = (-25000.0, 25000.0)
    y_extent = (-200.0, 200.0)
    ztop = 21000.0

    def topography(self, x, y):
        return (self.h_c * np.exp(-(x / self.a_c) ** 2)
                * np.cos(np.pi * x / self.l_c) ** 2)

    def rayleigh_strength(self, z, x=None, y=None):
        strength = 5.0e-3
        depth, width = 5000.0, 5000.0
        nu = np.where(z > self.ztop - depth,
                      0.5 * strength * (1.0 + np.cos(
                          np.pi * (self.ztop - z) / depth)), 0.0)
        if x is not None:
            x0, x1 = self.x_extent
            nu_r = np.where(x > x1 - width,
                            0.5 * strength * (1.0 + np.cos(
                                np.pi * (x1 - x) / width)), 0.0)
            nu_l = np.where(x < x0 + width,
                            0.5 * strength * (1.0 + np.cos(
                                np.pi * (x - x0) / width)), 0.0)
            nu = np.maximum(nu, np.maximum(nu_r, nu_l))
        return nu

    def _background(self, z, constants: PhysicalConstants):
        c = constants
        n2 = self.n_bar ** 2
        theta = self.theta_0 * np.exp(n2 / c.g * z)
        exner = 1.0 + c.g * c.g / (c.Cp * self.theta_0 * n2) * (
            np.exp(-n2 / c.g * z) - 1.0)
        rho = c.P0 / (c.Rd * theta) * exner ** (c.Cv / c.Rd)
        return theta, rho

    def initial_state(self, geom, constants, dtype=jnp.float64):
        z = np.asarray(geom.z_lev)
        theta, rho = self._background(z, constants)
        return _state_dict(geom, theta, rho, u_lev=self.u0, dtype=dtype)

    reference_state = initial_state


@dataclasses.dataclass(frozen=True)
class InertiaGravityWave:
    """Skamarock-Klemp (1994) inertia-gravity waves in a channel.

    Reference: ``test/nonhydro_xz/InertiaGravityCartesianXZTest.cpp``:
    isothermal-N background (N = 0.01 1/s), theta perturbation of width a,
    uniform U0 = 20 m/s; domain 300 km x 10 km.
    """
    n_bar: float = 0.01
    theta_0: float = 300.0
    theta_c: float = 1.0        # reference CLI default (ThetaC)
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
