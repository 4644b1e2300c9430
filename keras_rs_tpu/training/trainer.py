"""Host-side training loop.

Replaces Keras' `model.fit` with an explicit loop around a jitted train
step: metrics are functional MeanStates updated on device, logging is
host-side, and profiling is first-class (`profile_dir=` captures a trace of
a few steps, parity with the ml_perf example's jax.profiler usage,
examples/ml_perf/main.py:330-356).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu.metrics.ranking_metric import RankingMetric
from keras_rs_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)

logger = logging.getLogger("keras_rs_tpu")


def prefetch_to_device(
    iterator: Iterable[Any], size: int = 2, sharding: Any = None
):
    """Overlaps host->device transfer with compute.

    Keeps `size` batches in flight: each batch is device_put
    (asynchronously) while the previous ones execute — the standard
    double-buffered input pipeline for a production train loop.

    `sharding` places each batch directly in its training layout (e.g.
    `mesh_lib.batch_sharding(mesh)` for data-parallel batches) instead of
    committing the full global batch to the default device — on a
    multi-device mesh an uncommitted put would both undo the batch
    sharding (forcing a reshard inside the step) and concentrate the
    whole batch in one device's HBM. Pass a single sharding for every
    leaf or a pytree of shardings matching the batch structure.
    """
    import collections

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class Trainer:
    """Minimal, explicit trainer.

    Args:
        model: a pytree Module.
        optimizer: an optax GradientTransformation (applied to trainable
            leaves; Overwrite-wrapped leaves are assigned from cotangents).
        loss_fn: callable (model, batch) -> scalar loss or (loss, aux).
        has_aux: whether loss_fn returns (loss, aux).
    """

    def __init__(
        self,
        model: Any,
        optimizer: optax.GradientTransformation,
        loss_fn: Callable[..., Any],
        *,
        has_aux: bool = False,
    ) -> None:
        self.optimizer = optimizer
        self.loss_fn = loss_fn
        self.has_aux = has_aux
        self.state = create_train_state(model, optimizer)
        self._step_fn = make_train_step(
            loss_fn, optimizer, has_aux=has_aux
        )

    @property
    def model(self) -> Any:
        return self.state.model

    def fit(
        self,
        data: Iterable[Any],
        *,
        epochs: int = 1,
        steps_per_epoch: int | None = None,
        log_every: int = 100,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (10, 20),
        prefetch: int = 0,
        prefetch_sharding: Any = None,
        validation_fn: Callable[[Any], float] | None = None,
        checkpoint_dir: str | None = None,
        metrics_log: str | None = None,
    ) -> dict[str, list[float]]:
        """Runs the training loop.

        prefetch: >0 keeps that many batches device_put in flight
            (overlaps host->device transfer with compute).
        prefetch_sharding: sharding (or pytree of shardings) for the
            prefetched batches — on a multi-device mesh pass the batch
            sharding so prefetch does not undo it.
        validation_fn(model) -> float: run after each epoch; with
            `checkpoint_dir`, the LOWEST value's state is kept at
            <checkpoint_dir>/best (plus <checkpoint_dir>/last each
            epoch) — checkpoint-restart is the failure-recovery story
            (SURVEY.md §5).
        metrics_log: path of a JSONL file appended with one record per
            epoch (observability without a TensorBoard dependency).
        """
        import json as _json

        history: dict[str, list[float]] = {"loss": []}
        if validation_fn is not None:
            history["val"] = []
        best_val = float("inf")
        global_step = 0
        for epoch in range(epochs):
            epoch_data = data() if callable(data) else data
            if prefetch:
                epoch_data = prefetch_to_device(
                    epoch_data, prefetch, sharding=prefetch_sharding
                )
            losses = []
            t0 = time.time()
            for i, batch in enumerate(epoch_data):
                if steps_per_epoch is not None and i >= steps_per_epoch:
                    break
                if profile_dir and global_step == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                self.state, out = self._step_fn(self.state, batch)
                if profile_dir and global_step == profile_steps[1]:
                    jax.block_until_ready(out)
                    jax.profiler.stop_trace()
                loss = out[0] if self.has_aux else out
                losses.append(loss)
                global_step += 1
                if log_every and (i + 1) % log_every == 0:
                    logger.info(
                        "epoch %d step %d loss %.5f",
                        epoch,
                        i + 1,
                        float(losses[-1]),
                    )
            if not losses:
                raise ValueError(
                    "Dataset yielded no batches. For multi-epoch training "
                    "pass a callable returning a fresh iterator per epoch."
                )
            epoch_loss = float(np.mean([float(l) for l in losses]))
            history["loss"].append(epoch_loss)
            record = {
                "epoch": epoch,
                "loss": epoch_loss,
                "seconds": round(time.time() - t0, 2),
            }
            if checkpoint_dir is not None:
                from keras_rs_tpu.training.checkpoint import (
                    save_checkpoint,
                )

                save_checkpoint(f"{checkpoint_dir}/last", self.state)
            if validation_fn is not None:
                val = float(validation_fn(self.state.model))
                history["val"].append(val)
                record["val"] = val
                if checkpoint_dir is not None and val < best_val:
                    best_val = val
                    save_checkpoint(
                        f"{checkpoint_dir}/best", self.state
                    )
            if metrics_log:
                with open(metrics_log, "a") as f:
                    f.write(_json.dumps(record) + "\n")
            logger.info(
                "epoch %d done in %.1fs loss %.5f",
                epoch,
                time.time() - t0,
                epoch_loss,
            )
        return history

    def evaluate(
        self,
        data: Iterable[Any],
        metric_fns: Mapping[str, RankingMetric] | None = None,
        eval_fn: Callable[..., tuple] | None = None,
        *,
        report_loss: bool = True,
    ) -> dict[str, float]:
        """Evaluates metrics (and optionally the training loss) over a
        dataset.

        `eval_fn(model, batch)` adapts a batch into metric inputs and may
        return `(y_true, y_pred)` or `(y_true, y_pred, sample_weight)`;
        it defaults to treating the batch as (x, y) with model(x) as
        predictions. With `report_loss=True` the trainer's `loss_fn` is
        also averaged over the dataset and returned under "loss"
        (weighted by each batch's sample count so uneven batches average
        correctly).
        """
        metric_fns = metric_fns or {}
        if eval_fn is None:
            eval_fn = lambda model, batch: (batch[1], model(batch[0]))

        @jax.jit
        def update_all(model, states, batch):
            out = eval_fn(model, batch)
            y_true, y_pred = out[0], out[1]
            sample_weight = out[2] if len(out) > 2 else None
            new_states = {
                name: metric_fns[name].update(
                    states[name], y_true, y_pred, sample_weight
                )
                for name in metric_fns
            }
            if report_loss:
                loss_out = self.loss_fn(model, batch)
                loss = loss_out[0] if self.has_aux else loss_out
                n = jnp.asarray(
                    jax.tree_util.tree_leaves(y_pred)[0].shape[0],
                    jnp.float32,
                )
                new_states["__loss__"] = (
                    states["__loss__"][0] + loss * n,
                    states["__loss__"][1] + n,
                )
            return new_states

        states: dict[str, Any] = {
            name: m.init_state() for name, m in metric_fns.items()
        }
        if report_loss:
            states["__loss__"] = (
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
            )
        n_batches = 0
        for batch in data:
            states = update_all(self.state.model, states, batch)
            n_batches += 1
        if n_batches == 0:
            raise ValueError("evaluate() received an empty dataset.")
        results = {
            name: float(m.result_from_state(states[name]))
            for name, m in metric_fns.items()
        }
        if report_loss:
            total, count = states["__loss__"]
            results["loss"] = float(total) / max(float(count), 1.0)
        return results
