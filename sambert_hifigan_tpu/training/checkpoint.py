"""Checkpoint/resume (orbax).

The reference carries `save_interval`/`checkpoint_dir` config keys with no
consumer — no torch.save exists anywhere in its tree (first-class absence I-3,
reference: configs/config.yaml:23,45, tasks.md:315-322).  Here: orbax
checkpoints of the full train state (both GAN parameter trees + both optimizer
states + step), stamped with the mel-config fingerprint so a resume with a
drifted audio config fails loudly (the consistency invariant,
reference: README.md:175-190).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from ..config import AudioConfig, ConfigError, mel_config_fingerprint

# EMA leaf -> the parameter tree it averages (training/optim.py).  Used to
# reconcile EMA presence between a checkpoint and the resume target, so
# turning --ema-decay on/off across a resume never structure-mismatches.
_EMA_SOURCES = {"ema_params": "params", "g_ema_params": "g_params"}


def _ema_field(target: Any) -> Optional[str]:
    if dataclasses.is_dataclass(target):
        names = {f.name for f in dataclasses.fields(target)}
        for n in _EMA_SOURCES:
            if n in names:
                return n
    return None


class CheckpointManager:
    """Thin wrapper over orbax StandardCheckpointer with step-numbered dirs
    and mel-fingerprint validation."""

    def __init__(self, directory: str, audio: AudioConfig, keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.audio = audio
        self.keep = keep
        # Synchronous checkpointer: orbax's AsyncCheckpointer trips a
        # "cannot schedule new futures after shutdown" on repeated saves
        # under Python 3.12 in this image.
        self._ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:09d}"

    def save(self, step: int, state: Any) -> None:
        path = self._step_dir(step)
        self._ckptr.save(path / "state", state)
        meta = {
            "step": int(step),
            "mel_fingerprint": list(map(str, mel_config_fingerprint(self.audio))),
        }
        field = _ema_field(state)
        if field is not None:
            meta["ema"] = getattr(state, field) is not None
        (path / "meta.json").write_text(json.dumps(meta))
        self._gc()

    def _gc(self) -> None:
        steps = sorted(self.all_steps())
        for s in steps[: -self.keep]:
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def all_steps(self):
        out = []
        for p in self.directory.glob("step_*"):
            if (p / "meta.json").exists():
                out.append(int(p.name.split("_")[1]))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def has_ema(self, step: Optional[int] = None) -> bool:
        """True when the (latest or given-step) checkpoint carries an EMA
        parameter copy (training/optim.py).  Lets inference/eval CLIs
        allocate the EMA slot in their restore target so the averaged
        weights survive the restore instead of being reconciled away."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return False
        meta = json.loads((self._step_dir(step) / "meta.json").read_text())
        return bool(meta.get("ema", False))

    def _validated_step_dir(self, step: Optional[int]) -> Tuple[Path, int]:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = self._step_dir(step)
        meta = json.loads((path / "meta.json").read_text())
        want = list(map(str, mel_config_fingerprint(self.audio)))
        if meta["mel_fingerprint"] != want:
            raise ConfigError(
                "Checkpoint was trained with a different mel configuration: "
                f"{meta['mel_fingerprint']} vs current {want}. Refusing to "
                "resume (mel consistency invariant)."
            )
        return path, step

    def restore_tree(self, step: Optional[int] = None) -> Tuple[Any, int]:
        """Target-less restore: the raw saved state as nested dicts, exactly
        as written.  For inference/eval CLIs — no optimizer is reconstructed,
        so a checkpoint trained with ANY optimizer knobs (LR schedule,
        accumulation wrapping, EMA) loads under the default config, which a
        structural `restore(target)` cannot do (the optimizer state tree
        differs).  Validates the mel fingerprint."""
        path, step = self._validated_step_dir(step)
        return self._ckptr.restore(path / "state"), step

    def restore(self, target: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore into the structure of `target` (an abstract or concrete
        state pytree).  Validates the mel fingerprint."""
        path, step = self._validated_step_dir(step)
        meta = json.loads((path / "meta.json").read_text())
        field = _ema_field(target)
        ckpt_ema = bool(meta.get("ema", False))
        tgt_ema = field is not None and getattr(target, field) is not None
        if field is not None and tgt_ema != ckpt_ema:
            src = _EMA_SOURCES[field]
            if ckpt_ema:
                # checkpoint carries an EMA copy but the resume config turned
                # it off: restore with a matching structure, then drop it.
                shaped = dataclasses.replace(
                    target, **{field: getattr(target, src)}
                )
                abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, shaped)
                state = self._ckptr.restore(path / "state", abstract)
                state = dataclasses.replace(state, **{field: None})
            else:
                # EMA newly enabled on a pre-EMA checkpoint: restore without
                # it and seed the average from the restored parameters.
                bare = dataclasses.replace(target, **{field: None})
                abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, bare)
                state = self._ckptr.restore(path / "state", abstract)
                seed = jax.tree.map(jnp.array, getattr(state, src))
                state = dataclasses.replace(state, **{field: seed})
            return state, step
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = self._ckptr.restore(path / "state", abstract)
        return state, step
