"""Deep & Cross Network comparison on toy data with explicit cross terms.

Parity with examples/dcn.py in the reference: synthetic data with known
feature crosses, comparing (a) stacked full-rank FeatureCross, (b)
low-rank FeatureCross, (c) deep-only MLP, with the RMSE mean +- std
protocol over 10 runs (examples/dcn.py:460-521, same run count
as the reference).

Run: python examples/dcn.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers import MLP, FeatureCross


def make_cross_data(n=8192, seed=0):
    """y depends on explicit feature products (examples/dcn.py:69-80)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(n, 6)).astype(np.float32)
    y = (
        0.1 * x[:, 0]
        + 0.4 * x[:, 1] * x[:, 2]
        + 0.7 * x[:, 3] * x[:, 4]
        + 0.2 * x[:, 5] * x[:, 0]
    ).astype(np.float32)
    return x, y


class CrossModel(Module):
    def __init__(self, kind, key):
        k1, k2, k3 = jax.random.split(key, 3)
        dim = 6
        if kind == "cross_full":
            self.cross = FeatureCross(dim, key=k1)
        elif kind == "cross_lowrank":
            self.cross = FeatureCross(dim, key=k1, projection_dim=3)
        else:
            self.cross = None
        self.mlp = MLP(dim, (32, 32, 1), key=k2)

    def __call__(self, x):
        if self.cross is not None:
            x = self.cross(x)
        return self.mlp(x)[..., 0]


def run_once(kind, seed):
    x, y = make_cross_data(seed=0)
    model = CrossModel(kind, jax.random.key(seed))

    def loss_fn(m, batch):
        bx, by = batch
        return jnp.mean((m(bx) - by) ** 2)

    trainer = training.Trainer(model, optax.adam(0.01), loss_fn)

    def data():
        idx = np.random.default_rng(seed).permutation(len(x))
        for i in range(0, len(x), 512):
            j = idx[i : i + 512]
            yield jnp.asarray(x[j]), jnp.asarray(y[j])

    trainer.fit(data, epochs=8, log_every=0)
    xt, yt = make_cross_data(n=2048, seed=123)
    pred = np.asarray(trainer.model(jnp.asarray(xt)))
    return float(np.sqrt(np.mean((pred - yt) ** 2)))


def main(num_runs=10):
    results = {}
    for kind in ("cross_full", "cross_lowrank", "deep_only"):
        rmses = [run_once(kind, s) for s in range(num_runs)]
        results[kind] = (np.mean(rmses), np.std(rmses))
        print(
            f"{kind:14s} RMSE {np.mean(rmses):.4f} +- {np.std(rmses):.4f}"
        )
    return results


if __name__ == "__main__":
    main()
