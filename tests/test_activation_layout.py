"""Pins the SAMPLE-major segment/activation layout contract.

The three preprocessing backends are fuzz-tested for bit-parity against
each other; this test pins the ABSOLUTE layout they must all implement:

  seg = (global_sample % Bl) * F + feature_index   (then globalized by
  + src_device * S_l), so the lookup's [D * S_l, dim] activation block
  is ordered (global_sample, feature) and `split_activations` is a pure
  reshape + static slice — no transpose between the embedding path and
  the dense stack (VERDICT r2 #1; the feature-major layout used to cost
  a materialized [B, F, dim] permutation in the downstream concat).
"""

import jax
import numpy as np

from keras_rs_tpu.layers.embedding import preprocessing
from keras_rs_tpu.layers.embedding.config import FeatureConfig, TableConfig
from keras_rs_tpu.layers.embedding.lookup import split_activations
from keras_rs_tpu.layers.embedding.stacking import build_stacks


def _stack(num_shards=2, batch=8, F=3):
    tables = [
        TableConfig(
            name=f"t{i}",
            vocabulary_size=64,
            embedding_dim=8,
            combiner="sum",
            max_ids_per_partition=32,
            max_unique_ids_per_partition=32,
        )
        for i in range(F)
    ]
    feats = [
        FeatureConfig(
            name=f"f{i}",
            table=t,
            input_shape=(batch, 1),
            output_shape=(batch, t.embedding_dim),
        )
        for i, t in enumerate(tables)
    ]
    stacks = build_stacks(feats, num_shards)
    assert len(stacks) == 1
    return stacks[0]


def test_segment_ids_are_sample_major():
    stack = _stack()
    D = stack.num_shards
    B = stack.batch_size
    Bl = B // D
    F = stack.num_features
    S_l = F * Bl
    # One id per (sample, feature): entry -> segment is unambiguous.
    inputs = {
        f.name: np.arange(B, dtype=np.int64)[:, None] % 64
        for f in stack.features
    }
    coo, _ = preprocessing.preprocess_stack(
        stack, inputs, backend="numpy"
    )
    for d in range(D):
        for s in range(D):
            for slot, gseg, gain in zip(
                coo.send_slots[d, s],
                coo.send_segs[d, s],
                coo.send_gains[d, s],
            ):
                if gain == 0:
                    continue  # padding
                seg = gseg - d * S_l  # un-globalize
                sample_local, fi = divmod(int(seg), F)
                assert 0 <= fi < F and 0 <= sample_local < Bl
                # Recover the id this entry looked up and check it is
                # the one feature fi produced for this global sample.
                b_global = d * Bl + sample_local
                fspec = next(
                    f for f in stack.features if f.feature_index == fi
                )
                tspec = stack.table_spec(fspec.table_name)
                # Invert the rotated-MOD map: row r lives on shard
                # (r + rot) % D at slot offset + r // D.
                rid = (slot - tspec.local_offset) * D + (
                    (s - tspec.rotation) % D
                )
                assert rid == inputs[fspec.name][b_global, 0]


def test_split_activations_is_transpose_free():
    stack = _stack()
    B = stack.batch_size
    F = stack.num_features
    acts_shape = (B * F, stack.stack_dim)

    jaxpr = jax.make_jaxpr(lambda a: split_activations(stack, a))(
        np.zeros(acts_shape, np.float32)
    )
    prims = {eqn.primitive.name for eqn in jaxpr.jaxpr.eqns}
    assert "transpose" not in prims, prims

    # And the values: row b*F + f of the activation block IS feature f
    # of global sample b.
    acts = np.arange(np.prod(acts_shape), dtype=np.float32).reshape(
        acts_shape
    )
    feats = split_activations(stack, acts)
    for fspec in stack.features:
        got = np.asarray(feats[fspec.name])
        want = acts.reshape(B, F, -1)[
            :, fspec.feature_index, : fspec.embedding_dim
        ]
        np.testing.assert_array_equal(got, want)
