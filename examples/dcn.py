"""Deep & Cross Network (DCNv2) — a full walkthrough.

Counterpart of the reference's examples/dcn.py (566 lines), which makes
the case for explicit feature crossing in three acts:

  1. TOY DATA with KNOWN cross terms (:69-80): y is a sum of explicit
     feature PRODUCTS, which a `FeatureCross` layer models in one layer
     (x0 * (W x) recovers xi*xj terms) while a plain MLP must
     approximate them — the cross models win at equal-or-smaller size.
  2. INSPECTING the learned cross kernel: for DCNv2 the (i, j) entry of
     W couples xi with xj, so on the toy task |W| should light up
     exactly at the generating pairs — the reference visualizes this as
     a heatmap (:418-466); here the learned pair weights are printed
     against the ground truth.
  3. The 10-RUN RMSE mean +- std PROTOCOL (:460-521) over three
     architectures — stacked full-rank cross, low-rank cross
     (projection_dim constrains W's rank; at large dims it also cuts
     its parameters — at these 6 features the sizes happen to tie),
     deep-only — with parameter counts, mirroring the reference's
     accounting.

Run: python examples/dcn.py            (10 runs/arch, ~1 min CPU)
     python examples/dcn.py --runs 3
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keras_rs_tpu import training
from keras_rs_tpu.core.module import Module
from keras_rs_tpu.layers import MLP, FeatureCross

# The generating cross structure: (i, j, coefficient) products.
TRUE_CROSSES = [(1, 2, 0.4), (3, 4, 0.7), (5, 0, 0.2)]


def make_cross_data(n=8192, seed=0):
    """y depends on explicit feature products (examples/dcn.py:69-80)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(n, 6)).astype(np.float32)
    y = 0.1 * x[:, 0]
    for i, j, c in TRUE_CROSSES:
        y = y + c * x[:, i] * x[:, j]
    return x, y.astype(np.float32)


class CrossModel(Module):
    """Optional FeatureCross followed by an MLP head."""

    def __init__(self, kind, key):
        k1, k2 = jax.random.split(key)
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


def param_count(model) -> int:
    return sum(
        x.size
        for x in jax.tree_util.tree_leaves(model)
        if hasattr(x, "size")
    )


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
    # Held-out RMSE on freshly generated data from the same function.
    xt, yt = make_cross_data(n=2048, seed=123)
    pred = np.asarray(trainer.model(jnp.asarray(xt)))
    rmse = float(np.sqrt(np.mean((pred - yt) ** 2)))
    return rmse, trainer.model


class CrossLinear(Module):
    """FeatureCross + LINEAR readout: W must model the crosses itself
    (with an MLP head downstream, the head can absorb them and W stays
    uninformative — this is why the reference's heatmap model is cross
    + linear, examples/dcn.py:418-466)."""

    def __init__(self, key):
        k1, k2 = jax.random.split(key)
        self.cross = FeatureCross(6, key=k1)
        self.w = jax.random.normal(k2, (6,)) * 0.1

    def __call__(self, x):
        return self.cross(x) @ self.w


def inspect_cross_kernel() -> None:
    """Act 2: train cross+linear on the toy task and check that the
    learned |W| couples exactly the TRUE generating pairs."""
    x, y = make_cross_data(n=16384, seed=0)
    model = CrossLinear(jax.random.key(0))

    def loss_fn(m, batch):
        bx, by = batch
        return jnp.mean((m(bx) - by) ** 2)

    trainer = training.Trainer(model, optax.adam(0.01), loss_fn)

    def data():
        for i in range(0, len(x), 512):
            yield jnp.asarray(x[i : i + 512]), jnp.asarray(y[i : i + 512])

    trainer.fit(data, epochs=80, log_every=0)
    # Effective coefficient of the xi*xj product in the readout:
    # cross(x)_k = x_k * (x @ W)_k + x_k, so through the linear head
    # coeff(xi*xj) = w_j * W[i, j] + w_i * W[j, i].
    W = np.asarray(trainer.model.cross.kernel)
    w = np.asarray(trainer.model.w)
    coupling = np.abs(W * w[None, :] + (W * w[None, :]).T)
    true_pairs = {(i, j) for i, j, _ in TRUE_CROSSES}
    true_pairs |= {(j, i) for i, j in true_pairs}
    other = [
        coupling[i, j]
        for i in range(6)
        for j in range(i + 1, 6)
        if (i, j) not in true_pairs
    ]
    print("  cross+linear probe — RECOVERED product coefficients "
          "(true in parens; max spurious pair last):")
    mx_other = float(np.max(other))
    for i, j, c in TRUE_CROSSES:
        mark = "OK" if coupling[i, j] > mx_other else "??"
        print(
            f"    x{i}*x{j}: {coupling[i, j]:.3f} (true {c})  [{mark}]"
        )
    print(f"    max non-generating pair: {mx_other:.3f}")


def main(num_runs=10):
    results = {}
    for kind in ("cross_full", "cross_lowrank", "deep_only"):
        rmses = []
        model = None
        for s in range(num_runs):
            rmse, model = run_once(kind, s)
            rmses.append(rmse)
        n_params = param_count(model)
        results[kind] = (np.mean(rmses), np.std(rmses))
        print(
            f"{kind:14s} RMSE {np.mean(rmses):.4f} +- "
            f"{np.std(rmses):.4f}  ({n_params:,} params)"
        )
    inspect_cross_kernel()
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=10)
    main(p.parse_args().runs)
