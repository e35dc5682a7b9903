"""Seeded random parameter-set generation for HyperBand
(``org/apache/spark/ml/tuning/ParamRangeSpecifier.scala``,
``generators/RandomParamSetGenerator.scala:16-61``).

A param space maps name → either an iterable of choices or a (min, max)
range.  Sampling is seeded and name-sorted for determinism: ranges draw
uniform doubles, iterables draw uniform choices.
"""

from __future__ import annotations

import random


class ParamSpace:
    """name → ('range', (lo, hi)) | ('choice', [values])."""

    def __init__(self) -> None:
        self.specs: dict[str, tuple[str, object]] = {}

    def add_range(self, name: str, lo: float, hi: float) -> "ParamSpace":
        self.specs[name] = ("range", (float(lo), float(hi)))
        return self

    def add_choices(self, name: str, values: list) -> "ParamSpace":
        self.specs[name] = ("choice", list(values))
        return self


def random_param_sets(space: ParamSpace, n: int, seed: int = 999) -> list[dict]:
    """n seeded samples; params visited in sorted-name order so the draw
    sequence is reproducible regardless of insertion order."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        params = {}
        for name in sorted(space.specs):
            kind, spec = space.specs[name]
            if kind == "range":
                lo, hi = spec
                params[name] = rng.uniform(lo, hi)
            else:
                params[name] = spec[rng.randrange(len(spec))]
        out.append(params)
    return out
