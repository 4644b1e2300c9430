"""Weight regularizers (L1 / L2 / L1L2) and the module-tree reg loss.

The reference inherits regularizers from Keras: `FeatureCross` forwards
`kernel_regularizer`/`bias_regularizer` to its Dense sublayers
(keras_rs/src/layers/feature_interaction/feature_cross.py:103-149) and
`EmbedReduce` accepts `embeddings_regularizer` via
`keras.layers.Embedding`. Keras collects the penalties as layer losses
summed into the training loss.

Here modules are pytrees and the loss is an explicit function, so the
same capability is functional: layers that accept regularizers record
them in a static `_regularizers: {attr_name: Regularizer}` dict, and
`regularization_loss(model)` walks the module tree and sums
`reg(param)` over every registered attribute — add it to the loss inside
your loss_fn:

    def loss_fn(model, batch):
        return data_loss(model, batch) + regularization_loss(model)

Penalty math matches keras.regularizers: L1 = l1 * sum(|x|),
L2 = l2 * sum(x^2) (note: NOT 1/2 * sum(x^2)).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from keras_rs_tpu.types import Tensor


class Regularizer:
    """Base class; subclasses implement `__call__(x) -> scalar`."""

    def __call__(self, x: Tensor) -> Tensor:
        raise NotImplementedError

    def get_config(self) -> dict[str, Any]:
        return {}

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "Regularizer":
        return cls(**config)

    def __repr__(self) -> str:
        cfg = ", ".join(f"{k}={v!r}" for k, v in self.get_config().items())
        return f"{type(self).__name__}({cfg})"


class L1L2(Regularizer):
    """`l1 * sum(|x|) + l2 * sum(x^2)` (keras.regularizers.L1L2 parity)."""

    def __init__(self, l1: float = 0.0, l2: float = 0.0) -> None:
        self.l1 = float(l1)
        self.l2 = float(l2)

    def __call__(self, x: Tensor) -> Tensor:
        x = jnp.asarray(x)
        out = jnp.zeros((), jnp.result_type(x.dtype, jnp.float32))
        if self.l1:
            out = out + self.l1 * jnp.sum(jnp.abs(x))
        if self.l2:
            out = out + self.l2 * jnp.sum(jnp.square(x))
        return out

    def get_config(self) -> dict[str, Any]:
        return {"l1": self.l1, "l2": self.l2}

    # Config-based equality/hash: regularizers live in pytree static aux
    # data, so value semantics keep treedefs (and jit cache keys) stable
    # across equal instances.
    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and (self.l1, self.l2) == (
            other.l1,
            other.l2,
        )

    def __hash__(self) -> int:
        return hash((type(self).__name__, self.l1, self.l2))


class L1(L1L2):
    def __init__(self, l1: float = 0.01) -> None:
        super().__init__(l1=l1)

    def get_config(self) -> dict[str, Any]:
        return {"l1": self.l1}


class L2(L1L2):
    def __init__(self, l2: float = 0.01) -> None:
        super().__init__(l2=l2)

    def get_config(self) -> dict[str, Any]:
        return {"l2": self.l2}


_BY_NAME = {"l1": L1, "l2": L2, "l1_l2": L1L2, "l1l2": L1L2}


def get(identifier: Any) -> Regularizer | None:
    """Resolves a regularizer like keras.regularizers.get (None passes)."""
    if identifier is None or isinstance(identifier, Regularizer):
        return identifier
    if isinstance(identifier, str):
        name = identifier.lower()
        if name in _BY_NAME:
            return _BY_NAME[name]()
        raise ValueError(f"Unknown regularizer: {identifier!r}")
    if callable(identifier):
        return _Wrapped(identifier)
    raise ValueError(f"Cannot interpret regularizer: {identifier!r}")


class _Wrapped(Regularizer):
    """Adapter for a bare callable `x -> scalar`."""

    def __init__(self, fn: Any) -> None:
        self.fn = fn

    def __call__(self, x: Tensor) -> Tensor:
        return self.fn(x)

    def get_config(self) -> dict[str, Any]:
        raise ValueError(
            "Callable regularizers cannot be serialized; use L1/L2/L1L2."
        )


def serialize(reg: Regularizer | None) -> dict[str, Any] | None:
    if reg is None:
        return None
    return {"class_name": type(reg).__name__, "config": reg.get_config()}


def deserialize(spec: Any) -> Regularizer | None:
    if spec is None:
        return None
    if isinstance(spec, str):
        return get(spec)
    by_class = {"L1": L1, "L2": L2, "L1L2": L1L2}
    return by_class[spec["class_name"]].from_config(spec["config"])


def regularization_loss(tree: Any) -> Tensor:
    """Sums registered weight penalties over a module tree.

    Walks every `Module` in the pytree; each contributes
    `sum(reg(getattr(m, attr)))` over its static `_regularizers` dict.
    Returns a scalar (0.0 when nothing is registered). jit/grad safe.
    """
    from keras_rs_tpu.core.module import Module

    total = jnp.zeros((), jnp.float32)

    def visit(node: Any) -> None:
        nonlocal total
        if isinstance(node, Module):
            regs = getattr(node, "_regularizers", None)
            if regs:
                for attr, reg in regs.items():
                    value = getattr(node, attr, None)
                    if value is not None and reg is not None:
                        total = total + reg(value)
            children, _ = node._tree_flatten()
            for child in children:
                visit(child)
        elif isinstance(node, (list, tuple)):
            for child in node:
                visit(child)
        elif isinstance(node, dict):
            for child in node.values():
                visit(child)

    visit(tree)
    return total
