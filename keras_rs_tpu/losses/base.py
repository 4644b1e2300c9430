"""Loss base class with Keras-compatible reduction semantics.

The reference subclasses `keras.losses.Loss`; we reimplement the same
contract (call -> per-element losses, then sample weighting and reduction)
on top of the pytree Module system so losses are jit-compatible callables.

Reductions (parity with Keras 3):
  * "sum_over_batch_size" (default) and "mean": sum(loss * sw) / numel(loss)
  * "sum": sum(loss * sw)
  * "mean_with_sample_weight": sum(loss * sw) / sum(broadcast sw)
  * None / "none": unreduced weighted losses
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from keras_rs_tpu.core.module import Module
from keras_rs_tpu.types import Tensor

_VALID_REDUCTIONS = (
    "sum_over_batch_size",
    "sum",
    "mean",
    "mean_with_sample_weight",
    "none",
    None,
)


class Loss(Module):
    def __init__(
        self,
        reduction: str | None = "sum_over_batch_size",
        name: str | None = None,
        dtype: Any = jnp.float32,
    ) -> None:
        if reduction not in _VALID_REDUCTIONS:
            raise ValueError(
                f"Invalid `reduction`: {reduction!r}. Must be one of "
                f"{_VALID_REDUCTIONS}."
            )
        self.reduction = reduction
        self.name = name or type(self).__name__
        self.dtype = jnp.dtype(dtype)

    def call(self, y_true: Tensor, y_pred: Tensor) -> Tensor:
        raise NotImplementedError

    def __call__(
        self,
        y_true: Any,
        y_pred: Tensor,
        sample_weight: Tensor | None = None,
    ) -> Tensor:
        losses = self.call(y_true, y_pred)
        losses = jnp.asarray(losses, self.dtype)

        if sample_weight is not None:
            sample_weight = jnp.asarray(sample_weight, self.dtype)
            # Align trailing dims: (B,) weights against (B, L) losses, etc.
            while sample_weight.ndim < losses.ndim:
                sample_weight = sample_weight[..., None]
            losses = losses * sample_weight

        if self.reduction in (None, "none"):
            return losses
        total = jnp.sum(losses)
        if self.reduction == "sum":
            return total
        if self.reduction == "mean_with_sample_weight":
            if sample_weight is None:
                divisor = jnp.asarray(losses.size, self.dtype)
            else:
                divisor = jnp.sum(
                    jnp.broadcast_to(sample_weight, losses.shape)
                )
            return total / divisor
        # "sum_over_batch_size" / "mean"
        return total / losses.size

    def get_config(self) -> dict[str, Any]:
        return {"reduction": self.reduction, "name": self.name}


def unpack_labels_and_mask(
    y_true: Any,
) -> tuple[Tensor, Tensor | None]:
    """Unpacks the `{"labels": ..., "mask": ...}` dict protocol."""
    mask = None
    if isinstance(y_true, dict):
        if "labels" not in y_true:
            raise ValueError(
                '`"labels"` should be present in `y_true`. Received: '
                f"`y_true` = {y_true}"
            )
        mask = y_true.get("mask", None)
        y_true = y_true["labels"]
    y_true = jnp.asarray(y_true)
    if mask is not None:
        mask = jnp.asarray(mask)
    return y_true, mask
