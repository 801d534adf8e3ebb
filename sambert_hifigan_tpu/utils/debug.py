"""Shape observability.

The reference sprays unconditional print() of tensor shapes through every
forward (reference: models/phoneme_embedding.py:58-73,
models/variance_adaptor.py:75-778, models/acoustic_model.py:232-263) plus an
inconsistently-defaulted DEBUG_SHAPES env var (reference: models/frontend.py:17
defaults ON, models/bert_encoder.py:49 defaults OFF).

Prints inside jitted functions are impossible, so the TPU replacements are:
  * assert_shape / assert_rank — trace-time structural assertions (free at
    runtime; they fire during tracing with real static shapes),
  * trace_shape — logs shapes AT TRACE TIME when DEBUG_SHAPES=1 (one line per
    compilation, not per step — strictly more useful than the reference's
    per-call spam),
  * debug_value — optional jax.debug.print passthrough for runtime VALUES
    when DEBUG_SHAPES=2.

DEBUG_SHAPES defaults OFF everywhere (the reference's frontend-on default is
one of the quirks SURVEY.md section 7.3.7d says to fix, not copy).
"""

from __future__ import annotations

import os
from typing import Sequence, Union

import jax

Dim = Union[int, None]


def _level() -> int:
    try:
        return int(os.getenv("DEBUG_SHAPES", "0"))
    except ValueError:
        return 1


def assert_rank(x, rank: int, name: str = "tensor") -> None:
    if x.ndim != rank:
        raise AssertionError(f"{name}: expected rank {rank}, got shape {x.shape}")


def assert_shape(x, expected: Sequence[Dim], name: str = "tensor") -> None:
    """None entries are wildcards: assert_shape(h, (None, 128, 256), 'henc')."""
    if x.ndim != len(expected):
        raise AssertionError(
            f"{name}: expected rank {len(expected)} {tuple(expected)}, got {x.shape}"
        )
    for i, (got, want) in enumerate(zip(x.shape, expected)):
        if want is not None and got != want:
            raise AssertionError(
                f"{name}: dim {i} expected {want}, got {got} (shape {x.shape})"
            )


def trace_shape(name: str, *arrays) -> None:
    """Log shapes once per trace when DEBUG_SHAPES >= 1."""
    if _level() >= 1:
        shapes = ", ".join(f"{tuple(a.shape)}:{a.dtype}" for a in arrays)
        print(f"[trace-shape] {name}: {shapes}")


def debug_value(fmt: str, *values) -> None:
    """Runtime value printing inside jit when DEBUG_SHAPES >= 2."""
    if _level() >= 2:
        jax.debug.print(fmt, *values)
