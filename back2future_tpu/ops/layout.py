"""Shared TPU layout-pinning and env-flag helpers.

XLA's layout assignment couples producers and consumers; two places in
the model profit from explicit layout constraints (measured on v5e, see
BENCHMARKS.md):

  * the small-channel image pyramid (models/pwc.py) — channels-major
    puts W in lanes and H in sublanes, full lane packing for C=3/12
    elementwise pipelines;
  * the warp gather operand (ops/warp.py) — row-major keeps gathered
    rows contiguous.

Both use the experimental `jax.experimental.layout` API, which has
churned names (Layout / DeviceLocalLayout / Format); this module is the
single shim so both sites degrade identically when the API moves again.
"""

from __future__ import annotations

import os

import jax

_FALSY = ("", "0", "false", "no", "off", "none")


def env_flag(name: str) -> bool:
    """True when env var `name` is set to a truthy value ("0"/"false"/
    "off"/"no"/"none"/unset are all False)."""
    return os.environ.get(name, "").strip().lower() not in _FALSY


def pin_layout(x: jax.Array, major_to_minor: tuple) -> jax.Array:
    """Constrain `x` to the given layout on TPU; no-op off-TPU or when
    the experimental layout API is unavailable. Layout is
    representation-only — numerics are identical either way."""
    if jax.default_backend() != "tpu":
        return x
    try:
        from jax.experimental import layout as jlayout

        return jlayout.with_layout_constraint(
            x, jlayout.Layout(major_to_minor=tuple(major_to_minor)))
    except Exception:  # pragma: no cover - experimental API
        return x
