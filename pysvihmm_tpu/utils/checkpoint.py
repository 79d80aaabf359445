"""Checkpoint / resume of training state (SURVEY.md §5).

The reference keeps variational parameters only in memory (no persistence);
for pod-scale elastic training we checkpoint the full device-side state
pytree — global variational params, the SVI step counter (so the
(t + tau)^(-kappa) schedule resumes correctly — BASELINE config 5), the PRNG
key, and any adaptive-step-size state — via msgpack (flax.serialization).
Writes are atomic (tmp + rename) so a preempted host never leaves a torn
checkpoint. Orbax is available in the environment for larger deployments;
this hand-rolled path has no async machinery to misbehave under restart
tests and is itself round-trip tested.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save(path: str, state: Any) -> None:
    """Atomically write a pytree checkpoint (host-local)."""
    state_np = jax.tree.map(np.asarray, jax.device_get(state))
    data = serialization.to_bytes(state_np)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore(path: str, target: Any) -> Any:
    """Load a checkpoint into the structure of ``target`` (same pytree)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def latest_step_path(directory: str, prefix: str = "ckpt_") -> str | None:
    """Find the highest-step checkpoint file ``{prefix}{step}.msgpack``."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".msgpack"):
            try:
                step = int(name[len(prefix) : -len(".msgpack")])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best


def save_step(directory: str, step: int, state: Any, prefix: str = "ckpt_", keep: int = 3) -> str:
    """Save ``state`` as the step-numbered checkpoint and prune old ones."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{prefix}{step}.msgpack")
    save(path, state)
    # prune
    steps = []
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".msgpack"):
            try:
                steps.append(int(name[len(prefix) : -len(".msgpack")]))
            except ValueError:
                pass
    for s in sorted(steps)[:-keep]:
        os.remove(os.path.join(directory, f"{prefix}{s}.msgpack"))
    return path


class OrbaxCheckpointer:
    """Orbax-backed step-numbered checkpointing (production/multi-host tier).

    Same role as :func:`save_step` / :func:`latest_step_path` / :func:`restore`
    but via ``orbax.checkpoint.CheckpointManager``: async writes, atomic
    finalization, retention, and multi-host coordination (every process
    participates in the save; Orbax elects the writers) — use this tier on
    pod slices, the msgpack tier for single-host runs and tests.

        ckpt = OrbaxCheckpointer(directory, keep=3)
        ckpt.save(step, state)            # non-blocking
        state = ckpt.restore(state_like)  # latest step
        ckpt.close()                      # drain async writes
    """

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=self._ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def restore(self, target: Any, step: int | None = None) -> Any:
        """Restore into the STRUCTURE of ``target`` (a matching pytree of
        arrays, e.g. a freshly-initialized state). Defaults to latest step."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint found")
        return self._mngr.restore(
            step, args=self._ocp.args.StandardRestore(target)
        )

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
