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
import threading
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from ..config import AudioConfig, ConfigError, mel_config_fingerprint

# Fields downcast by --save-precision bf16: discriminator weights and ALL
# optimizer moments.  Master (generator/acoustic) params and EMA copies stay
# f32 — they are what inference loads.  Halves the ~900 MB GAN checkpoint
# that the demo runs measured taking minutes through this image's tunnel
# (docs/demo_run_v2/REPORT.md).
_BF16_FIELDS = ("d_params", "d_opt_state", "g_opt_state", "opt_state")

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
        # under Python 3.12 in this image.  Background saves are provided by
        # save(..., background=True) instead: a device-side snapshot + one
        # plain thread around this synchronous checkpointer.
        self._ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        self._save_thread: Optional[threading.Thread] = None
        self._save_error: Optional[BaseException] = None

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:09d}"

    @staticmethod
    def _cast_for_save(state: Any, precision: Optional[str]) -> Any:
        """Downcast the _BF16_FIELDS subtrees' f32 leaves to bf16 (restore
        casts them back — see restore()).  precision None/'f32' is identity."""
        if precision in (None, "f32", "float32"):
            return state
        if precision != "bf16":
            raise ValueError(f"unknown save precision: {precision!r}")
        if not dataclasses.is_dataclass(state):
            return state
        def to_bf16(x):
            if not (hasattr(x, "dtype") and x.dtype == jnp.float32):
                return x
            if hasattr(x, "astype"):
                return x.astype(jnp.bfloat16)
            # abstract leaves (jax.ShapeDtypeStruct targets in restore())
            return jax.ShapeDtypeStruct(x.shape, jnp.bfloat16)

        cast = lambda t: jax.tree.map(to_bf16, t)  # noqa: E731
        names = {f.name for f in dataclasses.fields(state)}
        repl = {n: cast(getattr(state, n)) for n in _BF16_FIELDS if n in names}
        return dataclasses.replace(state, **repl)

    def wait(self) -> None:
        """Block until any in-flight background save lands (and re-raise its
        error, if it failed)."""
        t = self._save_thread
        if t is not None:
            t.join()
            self._save_thread = None
        if self._save_error is not None:
            err, self._save_error = self._save_error, None
            raise err

    def drain(self) -> Optional[BaseException]:
        """wait() that RETURNS a stashed background-save error instead of
        raising — for emergency paths (divergence/preemption) that must
        still attempt a final save after a failed interval save."""
        try:
            self.wait()
        except BaseException as e:
            return e
        return None

    def save(
        self,
        step: int,
        state: Any,
        precision: Optional[str] = None,
        background: bool = False,
    ) -> None:
        """Write a checkpoint.  background=True snapshots the state on-device
        (donation-safe: the trainer's next step can reuse the old buffers)
        and runs the device->host fetch + disk write on a thread, so a save
        no longer stalls training for the multi-minute tunnel transfer
        (VERDICT r03 item 5).  One save is in flight at a time; errors
        surface on the next save()/wait()."""
        state = self._cast_for_save(state, precision)
        meta = {
            "step": int(step),
            "mel_fingerprint": list(map(str, mel_config_fingerprint(self.audio))),
        }
        if precision:
            meta["precision"] = precision
        field = _ema_field(state)
        if field is not None:
            meta["ema"] = getattr(state, field) is not None
        if not background:
            self.wait()
            self._write(step, state, meta)
            return
        # Device-side copy detaches the snapshot from donated buffers; HBM
        # copies are cheap next to the host fetch the thread will do.
        snap = jax.tree.map(
            lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
            state,
        )
        self.wait()

        def run():
            try:
                self._write(step, jax.device_get(snap), meta)
            except BaseException as e:  # surfaced by the next wait()
                self._save_error = e

        self._save_thread = threading.Thread(
            target=run, name=f"ckpt-save-{step}", daemon=True
        )
        self._save_thread.start()

    def _write(self, step: int, state: Any, meta: dict) -> None:
        path = self._step_dir(step)
        if path.exists() and not (path / "meta.json").exists():
            # Aborted earlier save (killed between orbax's state commit and
            # the meta.json marker): all_steps() ignores the dir, but orbax
            # refuses to overwrite the committed state — clear and rewrite.
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        self._ckptr.save(path / "state", state)
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

    def _restore_shaped(self, path: Path, shaped: Any, precision) -> Any:
        """Restore into `shaped`'s structure, honoring a bf16-saved
        checkpoint: the abstract target mirrors the save-time downcast, and
        restored leaves are upcast back to the caller's dtypes."""
        as_saved = self._cast_for_save(shaped, precision)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, as_saved)
        state = self._ckptr.restore(path / "state", abstract)
        if precision == "bf16":
            state = jax.tree.map(
                lambda t, s: s.astype(t.dtype)
                if hasattr(t, "dtype") and hasattr(s, "dtype") and s.dtype != t.dtype
                else s,
                shaped,
                state,
            )
        return state

    def restore(self, target: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore into the structure of `target` (an abstract or concrete
        state pytree).  Validates the mel fingerprint."""
        path, step = self._validated_step_dir(step)
        meta = json.loads((path / "meta.json").read_text())
        precision = meta.get("precision")
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
                state = self._restore_shaped(path, shaped, precision)
                state = dataclasses.replace(state, **{field: None})
            else:
                # EMA newly enabled on a pre-EMA checkpoint: restore without
                # it and seed the average from the restored parameters.
                bare = dataclasses.replace(target, **{field: None})
                state = self._restore_shaped(path, bare, precision)
                seed = jax.tree.map(jnp.array, getattr(state, src))
                state = dataclasses.replace(state, **{field: seed})
            return state, step
        state = self._restore_shaped(path, target, precision)
        return state, step
