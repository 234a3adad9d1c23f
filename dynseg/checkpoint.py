"""Checkpoint save/restore — SURVEY.md C16.

The reference uses tf.train.Saver (periodic save, restore for testing /
resume). Rebuilt on orbax-checkpoint: params + batch_stats + opt_state +
iteration + the scheduler's score table + numpy RNG states, so a resumed
run continues the SAME dynamic-scale trajectory (recovery story:
"restart from last checkpoint", SURVEY.md §5)."""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from dynseg.sched.scheduler import ScaleScheduler
from dynseg.train import TrainState, Trainer


class CheckpointManager:
    def __init__(self, output_path: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(os.path.join(output_path, "checkpoints"))
        self.max_to_keep = max_to_keep
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = self._make_mgr()

    def _make_mgr(self) -> ocp.CheckpointManager:
        return ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.max_to_keep, create=True
            ),
        )

    def reset_for_fresh_run(self) -> bool:
        """Delete checkpoints left by a PREVIOUS run in this output_path.

        A fresh (non-resume) training run must not inherit them: orbax
        silently refuses saves at steps <= an older run's latest (so the
        new run's periodic checkpoints are no-ops until it outlives the
        old one, and validate_test would score the OLD weights), and a
        stale best.json/best/ gates --keep_best against a metric the new
        run never produced (review r2). Returns True if state was
        removed — the caller should log it."""
        import shutil

        had_best = (self.best_record() is not None
                    or os.path.isdir(os.path.join(self.dir, "best")))
        if self.mgr.latest_step() is None and not had_best:
            return False
        self.mgr.close()
        if hasattr(self, "_best"):
            self._best.close()
            del self._best
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = self._make_mgr()
        return True

    def save(self, it: int, state: TrainState, scheduler: ScaleScheduler) -> None:
        sched_state = scheduler.state_dict()
        self.mgr.save(
            it,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                scheduler=ocp.args.JsonSave(_jsonable(sched_state)),
            ),
        )
        self.mgr.wait_until_finished()

    def save_stats(self, stats: dict) -> None:
        """Sidecar with everything `--operation predict` needs to run the
        model on unlabeled imagery WITHOUT the training dataset: the
        training normalization stats + input/output dims (the reference
        has no such path — its normalization is recomputed from training
        data at test time)."""
        with open(os.path.join(self.dir, "stats.json"), "w") as f:
            json.dump(_jsonable(stats), f, indent=2)

    def load_stats(self) -> Optional[dict]:
        path = os.path.join(self.dir, "stats.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return _unjsonable(json.load(f))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    # -- best-validation tracking (beyond the reference, which keeps only
    #    the last periodic save) ---------------------------------------- #
    def _best_mgr(self) -> ocp.CheckpointManager:
        if not hasattr(self, "_best"):
            self._best = ocp.CheckpointManager(
                os.path.join(self.dir, "best"),
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )
        return self._best

    def best_record(self) -> Optional[dict]:
        path = os.path.join(self.dir, "best.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save_best(self, metric: float, it: int, state: TrainState,
                  scheduler: ScaleScheduler) -> bool:
        """Keep the single checkpoint with the highest validation metric
        under checkpoints/best/. Returns True if this one became the best."""
        rec = self.best_record()
        if rec is not None and float(metric) <= float(rec["metric"]):
            return False
        mgr = self._best_mgr()
        saved = mgr.save(
            it,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                scheduler=ocp.args.JsonSave(_jsonable(scheduler.state_dict())),
            ),
        )
        if not saved:
            # orbax silently refuses steps <= the latest saved step (e.g.
            # a stale best/ from a previous run in the same output_path).
            # Never let best.json claim weights that were not written.
            return False
        mgr.wait_until_finished()
        with open(os.path.join(self.dir, "best.json"), "w") as f:
            json.dump({"metric": float(metric), "step": int(it)}, f)
        return True

    def restore(
        self, trainer: Trainer, scheduler: ScaleScheduler,
        step: Optional[int] = None, best: bool = False,
    ) -> Tuple[TrainState, int]:
        """Restore into a freshly-initialized state template (shapes/dtypes
        from trainer.init_state)."""
        template = trainer.init_state(jax.random.key(0))
        return self.restore_state(template, scheduler, step, best=best)

    def restore_state(
        self,
        template: TrainState,
        scheduler: Optional[ScaleScheduler] = None,
        step: Optional[int] = None,
        best: bool = False,
    ) -> Tuple[TrainState, int]:
        """Trainer-free restore (predict path: no training tiles needed —
        build the template with train.init_state_template). best=True
        restores the highest-validation-metric checkpoint (save_best)."""
        mgr = self._best_mgr() if best else self.mgr
        step = mgr.latest_step() if step is None else step
        if step is None:
            # user-facing error; not assert (vanishes under python -O)
            raise FileNotFoundError(
                f"no {'best ' if best else ''}checkpoint under {self.dir}"
            )
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                scheduler=ocp.args.JsonRestore(),
            ),
        )
        if scheduler is not None:
            scheduler.load_state_dict(_unjsonable(restored["scheduler"]))
        return restored["state"], step


def _jsonable(obj):
    """numpy-state dicts -> pure JSON (orbax JsonSave requirement)."""
    return json.loads(json.dumps(obj, default=_np_default))


def _np_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return {"__ndarray__": o.tolist(), "dtype": str(o.dtype)}
    raise TypeError(f"not jsonable: {type(o)}")


def _unjsonable(obj):
    if isinstance(obj, dict):
        if "__ndarray__" in obj:
            return np.array(obj["__ndarray__"], dtype=obj["dtype"])
        return {k: _unjsonable(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_unjsonable(v) for v in obj]
    return obj
