"""Robust penalty functions (criterions/penalty/*.lua).

Each penalty provides `apply(x)` and its derivative `der(x)`; for all three,
`der` equals the true derivative of `apply`, so criterions that only deviate
from autodiff elsewhere can rely on autodiff through penalties.

Replicated effective behavior (per SURVEY.md §2.3): L1Penalty's constructor
alpha is ignored in the reference (`0.5 or alpha` bug,
criterions/penalty/L1_function.lua:17) — alpha is always 0.5, including the
KITTI `L1Penalty(0.38)` call site (model.lua:196-198).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuadraticPenalty:
    def apply(self, x):
        return x * x

    def der(self, x):
        return 2.0 * x


@dataclasses.dataclass(frozen=True)
class L1Penalty:
    """(x^2 + 1e-6)^0.5 (criterions/penalty/L1_function.lua:15-26)."""
    eps: float = 1e-6

    def apply(self, x):
        return jnp.sqrt(x * x + self.eps)

    def der(self, x):
        return x / jnp.sqrt(x * x + self.eps)


@dataclasses.dataclass(frozen=True)
class LorentzianPenalty:
    """log(1 + x^2/(2 eps^2)) (criterions/penalty/Lorentzian_function.lua)."""
    eps: float = 0.05

    def apply(self, x):
        return jnp.log1p(0.5 * x * x / (self.eps * self.eps))

    def der(self, x):
        return 2.0 * x / (x * x + 2.0 * self.eps * self.eps)


def make_penalty(name: str):
    """Penalty factory mirroring model.lua:185-226 option strings."""
    if name == "Quadratic":
        return QuadraticPenalty()
    if name == "L1":
        return L1Penalty()
    if name == "Lorentzian":
        return LorentzianPenalty()
    if name == "Dirac":
        # LorentzianPenalty with set_eps(0.001) (model.lua:221-223)
        return LorentzianPenalty(eps=0.001)
    raise ValueError(f"unknown penalty {name!r}")
