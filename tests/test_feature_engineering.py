"""FeatureSpace-parity transforms: buckets, crosses, lookups, text."""

import numpy as np

from keras_rs_tpu.data.feature_engineering import (
    TextVectorizer,
    Vocabulary,
    bucketize,
    hash_cross,
    hash_strings,
)


def test_bucketize():
    got = bucketize([1.0, 25.0, 99.0], [10, 50])
    np.testing.assert_array_equal(got, [0, 1, 2])


def test_hash_cross_deterministic_and_bounded():
    a = np.arange(1000)
    b = (a * 7) % 13
    h1 = hash_cross([a, b], num_bins=64)
    h2 = hash_cross([a, b], num_bins=64)
    np.testing.assert_array_equal(h1, h2)
    assert h1.min() >= 0 and h1.max() < 64
    # order matters (it's a cross, not a sum)
    h3 = hash_cross([b, a], num_bins=64)
    assert (h1 != h3).any()
    # reasonably uniform
    counts = np.bincount(h1, minlength=64)
    assert counts.max() < 4 * counts.mean()


def test_hash_strings():
    h = hash_strings(["action", "comedy", "action"], 100)
    assert h[0] == h[2] and h[0] != h[1]
    assert 0 <= h.min() and h.max() < 100


def test_vocabulary_oov():
    v = Vocabulary(["a", "b", "c"])
    np.testing.assert_array_equal(v.lookup(["b", "zzz", "a"]), [2, 0, 1])
    assert v.size == 4


def test_text_vectorizer_padded_output():
    tv = TextVectorizer(output_sequence_length=4).adapt(
        ["The Matrix", "Toy Story", "The Lion King"]
    )
    ids, w = tv(["the lion king", "matrix unknownword"])
    assert ids.shape == (2, 4) and w.shape == (2, 4)
    np.testing.assert_array_equal(w[0], [1, 1, 1, 0])
    assert ids[0, 0] == ids[1, 0] * 0 + tv.vocab.lookup(["the"])[0]
    assert ids[1, 1] == 0  # OOV


def test_text_vectorizer_vocab_cap():
    # keras semantics: max_tokens caps the VOCABULARY (incl. OOV id 0).
    tv = TextVectorizer(max_tokens=3, output_sequence_length=4)
    tv.adapt(["a b c d e f"])
    assert tv.vocabulary_size == 3
    ids, _ = tv(["a b c"])
    assert ids[0, 2] == 0  # "c" fell past the cap -> OOV
