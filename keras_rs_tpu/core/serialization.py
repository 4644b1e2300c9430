"""Registry-based serialization (get_config / from_config round-trips).

Parity with the reference's `keras_rs_export` decorator
(keras_rs/src/api_export.py:14-23), which registers classes with Keras'
serialization machinery. Here we keep our own registry keyed by the public
API path, so `serialize(obj)` / `deserialize(spec)` round-trip any exported
layer, loss or metric without a Keras dependency.
"""

from __future__ import annotations

from typing import Any, Callable, TypeVar

T = TypeVar("T")

_REGISTRY: dict[str, type] = {}
_REVERSE: dict[type, str] = {}


def export(path: str | tuple[str, ...]) -> Callable[[type], type]:
    """Class decorator registering the class under its public API path(s)."""

    paths = (path,) if isinstance(path, str) else tuple(path)

    def decorator(cls: type) -> type:
        for p in paths:
            if p in _REGISTRY and _REGISTRY[p] is not cls:
                raise ValueError(f"Duplicate export path: {p}")
            _REGISTRY[p] = cls
        _REVERSE.setdefault(cls, paths[0])
        # Also register the bare class name as a convenience alias.
        _REGISTRY.setdefault(cls.__name__, cls)
        return cls

    return decorator


def get_registered_name(cls: type) -> str:
    return _REVERSE.get(cls, cls.__name__)


def get_registered_class(name: str) -> type:
    if name not in _REGISTRY:
        raise ValueError(f"Unknown registered class: {name!r}")
    return _REGISTRY[name]


def serialize(obj: Any) -> dict[str, Any] | None:
    if obj is None:
        return None
    return {
        "class_name": get_registered_name(type(obj)),
        "config": obj.get_config(),
    }


def deserialize(spec: Any) -> Any:
    if spec is None:
        return None
    cls = get_registered_class(spec["class_name"])
    return cls.from_config(spec["config"])
