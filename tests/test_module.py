import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_rs_tpu.core import initializers
from keras_rs_tpu.core.module import Module, trainable_mask


class Inner(Module):
    def __init__(self, key):
        self.w = jax.random.normal(key, (4, 4))
        self.scale = 2.0  # static: not an array

    def __call__(self, x):
        return x @ self.w * self.scale


class Outer(Module):
    non_trainable_fields = ("buffer",)

    def __init__(self, key):
        k1, k2 = jax.random.split(key)
        self.inner = Inner(k1)
        self.bias = jnp.zeros((4,))
        self.buffer = jax.random.normal(k2, (4,))
        self.name = "outer"
        self.sizes = [4, 4]

    def __call__(self, x):
        return self.inner(x) + self.bias + self.buffer


def test_module_is_pytree():
    m = Outer(jax.random.key(0))
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 3  # w, bias, buffer
    m2 = jax.tree_util.tree_map(lambda x: x * 0, m)
    assert isinstance(m2, Outer)
    assert m2.name == "outer"
    assert m2.sizes == [4, 4]
    np.testing.assert_allclose(np.asarray(m2.bias), 0.0)


def test_jit_through_module():
    m = Outer(jax.random.key(0))
    x = jnp.ones((2, 4))

    @jax.jit
    def f(m, x):
        return m(x)

    out = f(m, x)
    expected = x @ m.inner.w * 2.0 + m.bias + m.buffer
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_grad_through_module():
    m = Outer(jax.random.key(0))
    x = jnp.ones((2, 4))

    def loss(m, x):
        return jnp.sum(m(x) ** 2)

    grads = jax.grad(loss)(m, x)
    assert isinstance(grads, Outer)
    assert grads.inner.w.shape == (4, 4)
    assert float(jnp.abs(grads.inner.w).sum()) > 0


def test_trainable_mask():
    m = Outer(jax.random.key(0))
    mask = trainable_mask(m)
    assert mask.inner.w is True
    assert mask.bias is True
    assert mask.buffer is False


def test_replace():
    m = Outer(jax.random.key(0))
    m2 = m.replace(bias=jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(m2.bias), 1.0)
    np.testing.assert_allclose(np.asarray(m.bias), 0.0)
    with pytest.raises(AttributeError):
        m.replace(nonexistent=1)


def test_static_changes_recompile_not_crash():
    m = Outer(jax.random.key(0))
    traces = []

    @jax.jit
    def f(m, x):
        traces.append(1)
        return m(x)

    x = jnp.ones((2, 4))
    f(m, x)
    f(m, x)
    assert len(traces) == 1
    m2 = m.replace(name="other")
    f(m2, x)
    assert len(traces) == 2  # static attr participates in cache key


def test_variance_scaling_matches_keras_semantics():
    key = jax.random.key(42)
    init = initializers.VarianceScaling(
        scale=1.0, mode="fan_out", distribution="truncated_normal"
    )
    w = init(key, (1000, 64))
    # Post-correction std should be ~sqrt(1/64).
    assert abs(float(w.std()) - (1.0 / 8.0)) < 0.01
    assert float(jnp.abs(w).max()) <= 2.0 / 0.879 * (1.0 / 8.0) + 1e-5

    gu = initializers.get("glorot_uniform")
    w2 = gu(key, (256, 256))
    limit = np.sqrt(3.0 * 1.0 / 256.0)
    assert float(w2.max()) <= limit + 1e-6
    assert float(w2.min()) >= -limit - 1e-6


def test_initializer_serialization_roundtrip():
    init = initializers.VarianceScaling(scale=2.0, mode="fan_in")
    spec = initializers.serialize(init)
    restored = initializers.deserialize(spec)
    assert restored.get_config() == init.get_config()
