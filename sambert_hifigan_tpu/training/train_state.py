"""Train-state containers (flax.struct pytrees, donate-able under jit)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class AcousticTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    # EMA copy of params (training/optim.py); None when ema_decay == 0 —
    # a None subtree has no leaves, so default-recipe checkpoints keep the
    # exact pre-EMA structure.
    ema_params: Any = None


@flax.struct.dataclass
class VocoderTrainState:
    """Two parameter trees + two optimizers, mirroring the reference's
    AdamW(G) / AdamW(MSD+MPD) pair (reference: demo_ablation_modes.py:71-78)."""

    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray
    # EMA of the generator only (discriminators are discarded at inference).
    g_ema_params: Any = None
