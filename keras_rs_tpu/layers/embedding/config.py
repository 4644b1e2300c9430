"""Embedding table and feature configuration.

Semantic parity with keras_rs/src/layers/embedding/
distributed_embedding_config.py:12-132, rebuilt without Keras: initializers
come from keras_rs_tpu.core.initializers, optimizers are the fused
in-kernel embedding optimizers from
keras_rs_tpu.layers.embedding.optimizers.

Defaults mirror the reference: VarianceScaling(mode="fan_out",
truncated_normal) initializer, "adam" optimizer, "mean" combiner, "auto"
placement, max_ids/max_unique_ids per partition = 256.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Union

from keras_rs_tpu.core import initializers as init_lib
from keras_rs_tpu.types import Shape

PLACEMENTS = ("auto", "sharded", "default_device", "sparsecore")
COMBINERS = ("mean", "sum", "sqrtn")


@dataclasses.dataclass(eq=False)
class TableConfig:
    """Configuration for one embedding table.

    `placement`:
      * "auto": sharded across the mesh when a mesh with >1 device is in
        use, else on the default device.
      * "sharded" (alias "sparsecore" for reference compatibility):
        MOD row-sharded across the mesh with the fused-optimizer lookup
        kernel; an error is raised if no mesh is available.
      * "default_device": a plain replicated EmbedReduce table.
    """

    name: str
    vocabulary_size: int
    embedding_dim: int
    initializer: Union[str, Any] = dataclasses.field(
        default_factory=lambda: init_lib.VarianceScaling(mode="fan_out")
    )
    optimizer: Union[str, Any] = "adam"
    combiner: str = "mean"
    placement: str = "auto"
    max_ids_per_partition: int = 256
    max_unique_ids_per_partition: int = 256
    # Storage dtype of the table: "float32" or "bfloat16" (bf16 halves HBM
    # footprint; updates use stochastic rounding, see ops/quant.py).
    dtype: str = "float32"

    def __post_init__(self) -> None:
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"Invalid table dtype {self.dtype!r}; use float32 or "
                "bfloat16."
            )
        if self.combiner not in COMBINERS:
            raise ValueError(
                f"Invalid combiner {self.combiner!r}; use one of {COMBINERS}."
            )
        if self.placement not in PLACEMENTS:
            raise ValueError(
                f"Invalid placement {self.placement!r}; use one of "
                f"{PLACEMENTS}."
            )
        if self.vocabulary_size <= 0 or self.embedding_dim <= 0:
            raise ValueError(
                "vocabulary_size and embedding_dim must be positive."
            )

    def get_config(self) -> dict[str, Any]:
        from keras_rs_tpu.layers.embedding import optimizers as opt_lib

        initializer = self.initializer
        if not isinstance(initializer, str):
            initializer = init_lib.serialize(initializer)
        optimizer = self.optimizer
        if not isinstance(optimizer, str):
            optimizer = opt_lib.serialize(optimizer)
        return {
            "name": self.name,
            "vocabulary_size": self.vocabulary_size,
            "embedding_dim": self.embedding_dim,
            "initializer": initializer,
            "optimizer": optimizer,
            "combiner": self.combiner,
            "placement": self.placement,
            "max_ids_per_partition": self.max_ids_per_partition,
            "max_unique_ids_per_partition": self.max_unique_ids_per_partition,
            "dtype": self.dtype,
        }

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "TableConfig":
        from keras_rs_tpu.layers.embedding import optimizers as opt_lib

        config = dict(config)
        if not isinstance(config["initializer"], str):
            config["initializer"] = init_lib.deserialize(
                config["initializer"]
            )
        if not isinstance(config["optimizer"], str):
            config["optimizer"] = opt_lib.deserialize(config["optimizer"])
        return cls(**config)


@dataclasses.dataclass(eq=False)
class FeatureConfig:
    """Binds one input feature to a table.

    `input_shape` is (global_batch_size, valence) — valence is the max
    number of ids per sample (the multi-hot width); `output_shape` is
    (global_batch_size, embedding_dim).
    """

    name: str
    table: TableConfig
    input_shape: Shape
    output_shape: Shape

    def __post_init__(self) -> None:
        if len(self.input_shape) not in (1, 2):
            raise ValueError(
                "`input_shape` must be (batch,) or (batch, valence); got "
                f"{self.input_shape}."
            )
        if (
            len(self.output_shape) != 2
            or self.output_shape[-1] != self.table.embedding_dim
        ):
            raise ValueError(
                "`output_shape` must be (batch, embedding_dim) with "
                f"embedding_dim={self.table.embedding_dim}; got "
                f"{self.output_shape}."
            )

    @property
    def batch_size(self) -> int:
        return self.input_shape[0]

    @property
    def valence(self) -> int:
        return self.input_shape[1] if len(self.input_shape) == 2 else 1

    def get_config(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "table": self.table.get_config(),
            "input_shape": tuple(self.input_shape),
            "output_shape": tuple(self.output_shape),
        }

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "FeatureConfig":
        config = dict(config)
        config["table"] = TableConfig.from_config(config["table"])
        return cls(**config)
