"""Spectral-element tensor-product derivative operators.

TPU-native core of the reference's GLL stencil loops
(``src/atm/HorizontalDynamicsFEM.cpp:840-841`` and the per-node inner loops
at ``:701-1786``): instead of scalar gather loops per GLL node, fields with
the element-stacked layout (6, A, B, ...) are reshaped to expose the
per-element (p, p) block and derivatives become small batched matmuls that
XLA fuses and maps onto the MXU/VPU.  A fused Pallas kernel version lives in
``pallas_sem.py`` (same contract).

Conventions (matching ``GridGLL::Initialize``, ``GridGLL.cpp:86-183``):
  deriv  D[m, i] = L_m'(x_i) on the unit element [0, 1]
  stiff  S[m, i] = D[m, i] * w_i / w_m
  strong derivative at node i:  (df)_i = sum_s f_s D[s, i] / delta
  weak (variational) flux div:  (div f)_i = -sum_s f_s S[i, s] / delta
"""

from __future__ import annotations

import jax.numpy as jnp


def _split(f, ne: int, p: int):
    """(6, A, B, ...) -> (6, ne, p, ne, p, ...)."""
    rest = f.shape[3:]
    return f.reshape(f.shape[0], ne, p, ne, p, *rest)


def _merge(f):
    """(6, ne, p, ne, p, ...) -> (6, A, B, ...)."""
    rest = f.shape[5:]
    return f.reshape(f.shape[0], f.shape[1] * f.shape[2],
                     f.shape[3] * f.shape[4], *rest)


def deriv_a(f, D, ne: int, p: int, delta: float):
    """Strong-form alpha derivative of an element-stacked field."""
    fe = _split(f, ne, p)
    out = jnp.einsum("si,Pasb...->Paib...", D, fe)
    return _merge(out) / delta


def deriv_b(f, D, ne: int, p: int, delta: float):
    """Strong-form beta derivative."""
    fe = _split(f, ne, p)
    ft = jnp.moveaxis(fe, 4, -1)            # beta-node axis last
    out = jnp.einsum("si,P...s->P...i", D, ft)
    out = jnp.moveaxis(out, -1, 4)
    return _merge(out) / delta


def weak_div(fa, fb, Smat, ne: int, p: int, delta: float):
    """Variational flux divergence: -(sum_s fa_s S[i,s] + fb_s S[j,s])/delta.

    Matches the reference's stiffness-matrix update
    (``HorizontalDynamicsFEM.cpp:519-560``): returns
    d_i = -sum_s fa[s, j] S[i, s]/dA - sum_s fb[i, s] S[j, s]/dB.
    """
    fae = _split(fa, ne, p)
    fbe = _split(fb, ne, p)
    da = jnp.einsum("is,Pasb...->Paib...", Smat, fae)
    # beta direction: contract the inner-node axis of B
    fbt = jnp.moveaxis(fbe, 4, -1)          # (6, ne, p, ne, ..., p)
    db = jnp.einsum("is,P...s->P...i", Smat, fbt)
    db = jnp.moveaxis(db, -1, 4)
    return -(_merge(da) + _merge(db)) / delta


def deriv_both(f, D, ne: int, p: int, delta: float):
    """(df/da, df/db) in one call."""
    fe = _split(f, ne, p)
    da = jnp.einsum("si,Pasb...->Paib...", D, fe)
    ft = jnp.moveaxis(fe, 4, -1)
    db = jnp.einsum("si,P...s->P...i", D, ft)
    db = jnp.moveaxis(db, -1, 4)
    return _merge(da) / delta, _merge(db) / delta
