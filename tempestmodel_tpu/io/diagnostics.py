"""Checksums, error norms, and conservation diagnostics.

TPU-native analogs of the reference verification machinery:
  - ``GridPatch::Checksum`` (``src/atm/GridPatch.cpp:745-930``):
    area-weighted Sum / L1 / L2 / Linf over all stored nodes.
  - ``Model::ComputeErrorNorms`` (``src/atm/Model.cpp:695-782``):
    L1/L2/Linf error vs the test-case reference state.
  - ``OutputManagerChecksum`` periodic checksum stream.
"""

from __future__ import annotations

import jax.numpy as jnp


def checksum(field, area, kind: str = "l2"):
    """Area-weighted checksum of a (6, A, B[, nz]) field.

    Matches the reference definitions: Sum = sum(f * dA); L1 = sum(|f| dA);
    L2 = sqrt(sum(f^2 dA)); Linf = max |f|.
    """
    if kind == "sum":
        return jnp.sum(field * area)
    if kind == "l1":
        return jnp.sum(jnp.abs(field) * area)
    if kind == "l2":
        return jnp.sqrt(jnp.sum(field * field * area))
    if kind == "linf":
        return jnp.max(jnp.abs(field))
    raise ValueError(kind)


def state_checksums(state: dict, area, kind: str = "l2", area_int=None):
    """Checksum of every component of a state dict.

    ``area``: level-field quadrature weights; ``area_int``: interface-field
    weights (for W on interfaces).  Tracer stacks use ``area`` per species.
    """
    out = {}
    for name, f in state.items():
        a = area
        if area_int is not None and f.ndim == area_int.ndim \
                and f.shape[-1] == area_int.shape[-1]:
            a = area_int
        if f.ndim > a.ndim:
            a = a.reshape((1,) * (f.ndim - a.ndim) + a.shape)
        elif f.ndim == a.ndim - 1:
            a = a[..., 0]
        if name == "Tracers":
            for i in range(f.shape[0]):
                out[f"Q{i}"] = checksum(f[i], area, kind)
            continue
        out[name] = checksum(f, a, kind)
    return out


def error_norms(state: dict, reference: dict, area, area_int=None):
    """L1/L2/Linf norms of (state - reference), absolute and normalized.

    Matches ``Model::ComputeErrorNorms``: normalized norms divide by the
    same norm of the reference state.
    """
    out = {}
    for name in state:
        if name not in reference:
            continue
        f = state[name]
        r = reference[name]
        a = area
        if area_int is not None and f.ndim == area_int.ndim \
                and f.shape[-1] == area_int.shape[-1]:
            a = area_int
        if f.ndim > a.ndim:
            a = a.reshape((1,) * (f.ndim - a.ndim) + a.shape)
        diff = f - r
        l1 = jnp.sum(jnp.abs(diff) * a)
        l2 = jnp.sqrt(jnp.sum(diff * diff * a))
        linf = jnp.max(jnp.abs(diff))
        r1 = jnp.sum(jnp.abs(r) * a)
        r2 = jnp.sqrt(jnp.sum(r * r * a))
        rinf = jnp.max(jnp.abs(r))
        out[name] = {
            "l1": l1, "l2": l2, "linf": linf,
            "l1_rel": jnp.where(r1 > 0, l1 / r1, l1),
            "l2_rel": jnp.where(r2 > 0, l2 / r2, l2),
            "linf_rel": jnp.where(rinf > 0, linf / rinf, linf),
        }
    return out
