"""DCMIP2016 test cases (moist idealized cases on the sphere).

TPU-native ports of the reference Fortran initializers
(``test/dcmip2016/interface/*.f90`` wrapped by
``test/dcmip2016/*Test.cpp``): analytic height-coordinate evaluations
vectorized over the whole grid (the Fortran per-point fixed-point
iterations are only needed in pressure coordinates, which we never use).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..constants import PhysicalConstants
from ..grid.geometry import CubedSphereGeometry
from .shallow_water import sphere_velocity_to_covariant


@dataclasses.dataclass(frozen=True)
class TropicalCyclone:
    """Reed & Jablonowski (2011) idealized tropical cyclone.

    Reference: ``test/dcmip2016/interface/tropical_cyclone_test.f90``
    (z-coordinate branch) + ``TropicalCycloneTest.cpp:134-180``.
    State: virtual potential temperature as the thermodynamic variable,
    rho the moist density, tracer 0 = rho*q (specific humidity density).
    """
    rp: float = 282000.0
    dp: float = 1115.0
    zp: float = 7000.0
    q0: float = 0.021
    gamma: float = 0.007
    ts0: float = 302.15
    p00: float = 101500.0
    cen_lat: float = np.deg2rad(10.0)
    cen_lon: float = np.deg2rad(180.0)
    zq1: float = 3000.0
    zq2: float = 8000.0
    exppr: float = 1.5
    exppz: float = 2.0
    ztrop: float = 15000.0
    qtrop: float = 1.0e-11
    const_tv: float = 0.608
    ztop: float = 30000.0
    rayleigh: bool = False

    def _fields(self, lon, lat, z, constants: PhysicalConstants):
        c = constants
        expo = c.Rd * self.gamma / c.g
        t0 = self.ts0 * (1.0 + self.const_tv * self.q0)
        ttrop = t0 - self.gamma * self.ztrop
        ptrop = self.p00 * (ttrop / t0) ** (1.0 / expo)

        f = 2.0 * c.omega * np.sin(self.cen_lat)
        gr = c.earth_radius * np.arccos(np.clip(
            np.sin(self.cen_lat) * np.sin(lat)
            + np.cos(self.cen_lat) * np.cos(lat)
            * np.cos(lon - self.cen_lon), -1.0, 1.0))

        rad_term = np.exp(-((gr / self.rp) ** self.exppr))
        zfac = np.exp(-((z / self.zp) ** self.exppz))

        trop = z > self.ztrop
        p = np.where(
            trop,
            ptrop * np.exp(-(c.g * (z - self.ztrop)) / (c.Rd * ttrop)),
            (self.p00 - self.dp * rad_term * zfac)
            * ((t0 - self.gamma * z) / t0) ** (1.0 / expo))

        # gradient-wind tangential velocity
        d1 = (np.sin(self.cen_lat) * np.cos(lat)
              - np.cos(self.cen_lat) * np.sin(lat)
              * np.cos(lon - self.cen_lon))
        d2 = np.cos(self.cen_lat) * np.sin(lon - self.cen_lon)
        d = np.maximum(1e-25, np.sqrt(d1 * d1 + d2 * d2))
        tz = t0 - self.gamma * z
        denom = (self.exppz * z * c.Rd * tz / (c.g * self.zp ** self.exppz)
                 + (1.0 - self.p00 / self.dp / rad_term / zfac))
        disc = ((f * gr / 2.0) ** 2
                - self.exppr * (gr / self.rp) ** self.exppr * c.Rd * tz
                / denom)
        vt = -f * gr / 2.0 + np.sqrt(np.maximum(disc, 0.0))
        u = np.where(trop, 0.0, (d1 / d) * vt)
        v = np.where(trop, 0.0, (d2 / d) * vt)

        q = np.where(trop, self.qtrop,
                     self.q0 * np.exp(-z / self.zq1)
                     * np.exp(-((z / self.zq2) ** self.exppz)))
        t = np.where(
            trop, ttrop,
            tz / (1.0 + self.const_tv * q)
            / (1.0 + self.exppz * c.Rd * tz * z
               / (c.g * self.zp ** self.exppz
                  * (1.0 - self.p00 / self.dp / rad_term / zfac))))
        thetav = t * (1.0 + self.const_tv * q) * (c.P0 / p) ** (c.Rd / c.Cp)
        rho = p / (c.Rd * t * (1.0 + self.const_tv * q))
        return u, v, rho, thetav, q

    def initial_state(self, geom: CubedSphereGeometry,
                      constants: PhysicalConstants, dtype=jnp.float64):
        lon = np.asarray(geom.lon)[..., None]
        lat = np.asarray(geom.lat)[..., None]
        z = np.asarray(geom.z_lev)
        u, v, rho, thetav, q = self._fields(lon, lat, z, constants)
        nz = geom.nz
        U = np.zeros(z.shape)
        V = np.zeros(z.shape)
        zl = np.zeros(z.shape[:3])
        for k in range(nz):
            U[..., k], V[..., k] = sphere_velocity_to_covariant(
                u[..., k], v[..., k], geom, constants)
        return {
            "U": jnp.asarray(U, dtype), "V": jnp.asarray(V, dtype),
            "Rt": jnp.asarray(rho * thetav, dtype),
            "W": jnp.asarray(np.zeros(z.shape[:3] + (nz + 1,)), dtype),
            "Rho": jnp.asarray(rho, dtype),
            "Tracers": jnp.asarray((rho * q)[None], dtype),
        }

    def reference_state(self, geom, constants, dtype=jnp.float64):
        """Environmental (vortex-free) profile: the far-field state."""
        lon = np.asarray(geom.lon)[..., None]
        lat = np.asarray(geom.lat)[..., None] * 0.0 + np.pi / 2.0  # far field
        z = np.asarray(geom.z_lev)
        _, _, rho, thetav, q = self._fields(
            np.zeros_like(lon), lat, z, constants)
        nz = geom.nz
        return {
            "U": jnp.asarray(np.zeros(z.shape), dtype),
            "V": jnp.asarray(np.zeros(z.shape), dtype),
            "Rt": jnp.asarray(rho * thetav, dtype),
            "W": jnp.asarray(np.zeros(z.shape[:3] + (nz + 1,)), dtype),
            "Rho": jnp.asarray(rho, dtype),
            "Tracers": jnp.asarray((rho * q)[None], dtype),
        }


@dataclasses.dataclass(frozen=True)
class MoistBaroclinicWave:
    """UMJS baroclinic wave with moisture (DCMIP2016 test 1 analog).

    Reference: ``test/dcmip2016/interface/baroclinic_wave_test.f90``
    moist branch: the dry UMJS dynamical state plus a latitude/pressure
    dependent specific humidity, run with Kessler physics.
    """
    q0: float = 0.018
    lat_w: float = np.deg2rad(40.0)   # 2*pi/9
    p_w: float = 34000.0              # halfwidth pressure
    ztop: float = 30000.0
    rayleigh: bool = False
    pert: str = "exp"

    def _dry(self):
        from .nonhydro_sphere import BaroclinicWaveUMJS
        return BaroclinicWaveUMJS(pert=self.pert, ztop=self.ztop)

    def _moisture(self, lat, pres):
        eta = pres / 1.0e5
        q = (self.q0 * np.exp(-((lat / self.lat_w) ** 4))
             * np.exp(-(((eta - 1.0) * 1.0e5 / self.p_w) ** 2)))
        return np.where(pres < 10000.0, 1.0e-12, q)

    def initial_state(self, geom, constants, dtype=jnp.float64):
        dry = self._dry()
        s = dict(dry.initial_state(geom, constants, dtype))
        c = constants
        pres = np.asarray(c.pressure_from_rhotheta(np.asarray(s["Rt"])))
        lat = np.asarray(geom.lat)[..., None]
        q = self._moisture(lat, pres)
        s["Tracers"] = jnp.asarray((q * np.asarray(s["Rho"]))[None], dtype)
        return s

    def reference_state(self, geom, constants, dtype=jnp.float64):
        dry = self._dry()
        s = dict(dry.reference_state(geom, constants, dtype))
        c = constants
        pres = np.asarray(c.pressure_from_rhotheta(np.asarray(s["Rt"])))
        lat = np.asarray(geom.lat)[..., None]
        q = self._moisture(lat, pres)
        s["Tracers"] = jnp.asarray((q * np.asarray(s["Rho"]))[None], dtype)
        return s
