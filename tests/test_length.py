"""Tests for static-shape length regulation (replaces the reference's broken
jit regulator, SURVEY.md §2.6) and padding helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.ops import length as L


def _numpy_repeat_regulate(enc: np.ndarray, durs: np.ndarray) -> np.ndarray:
    """The reference's host-side regulator semantics
    (/root/reference/scripts/synthesize.py:48-61)."""
    return np.repeat(enc, durs, axis=0)


def test_length_regulate_matches_numpy_repeat():
    rng = np.random.default_rng(0)
    enc = rng.standard_normal((1, 5, 7)).astype(np.float32)
    durs = np.array([[2, 3, 1, 4, 2]], dtype=np.int32)
    total = int(durs.sum())
    frames, mask = L.length_regulate(jnp.asarray(enc), jnp.asarray(durs), total)
    want = _numpy_repeat_regulate(enc[0], durs[0])
    np.testing.assert_allclose(np.asarray(frames[0]), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask[0]), np.ones(total))


def test_length_regulate_budget_and_mask():
    enc = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    durs = jnp.array([[2, 1, 1]], dtype=jnp.int32)
    frames, mask = L.length_regulate(enc, durs, total_frames=8)
    # 4 real frames, 4 masked (and zeroed) tail frames.
    np.testing.assert_array_equal(
        np.asarray(mask[0]), [1, 1, 1, 1, 0, 0, 0, 0]
    )
    np.testing.assert_allclose(np.asarray(frames[0, 4:]), 0.0)
    # Example from reference docstring (encoder.py:393-396).
    np.testing.assert_allclose(
        np.asarray(frames[0, :4, 0]), [0.0, 0.0, 2.0, 4.0]
    )


def test_length_regulate_batched_jit():
    rng = np.random.default_rng(1)
    enc = rng.standard_normal((3, 10, 4)).astype(np.float32)
    durs = rng.integers(0, 5, size=(3, 10)).astype(np.int32)
    fn = jax.jit(lambda e, d: L.length_regulate(e, d, 64))
    frames, mask = fn(jnp.asarray(enc), jnp.asarray(durs))
    assert frames.shape == (3, 64, 4)
    for b in range(3):
        want = _numpy_repeat_regulate(enc[b], durs[b])
        t = want.shape[0]
        np.testing.assert_allclose(np.asarray(frames[b, :t]), want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mask[b]).sum(), t)


def test_gaussian_upsample_soft_matches_hard_roughly():
    rng = np.random.default_rng(2)
    enc = rng.standard_normal((1, 4, 3)).astype(np.float32)
    durs = np.array([[3, 3, 3, 3]], dtype=np.float32)
    soft, mask = L.gaussian_upsample(
        jnp.asarray(enc), jnp.asarray(durs), 12, temperature=50.0
    )
    hard, _ = L.length_regulate(
        jnp.asarray(enc), jnp.asarray(durs).astype(jnp.int32), 12
    )
    # With a sharp temperature the centers of each phoneme segment agree.
    np.testing.assert_allclose(
        np.asarray(soft[0, 1]), np.asarray(hard[0, 1]), atol=1e-2
    )
    assert float(mask.sum()) == 12


def test_padding_mask():
    m = L.padding_mask(jnp.array([2, 5]), 6)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, True, False, False, False, False],
         [True, True, True, True, True, False]],
    )


def test_pad_time_to_multiple():
    x = jnp.ones((2, 7, 3))
    y = L.pad_time_to_multiple(x, 4, axis=1)
    assert y.shape == (2, 8, 3)
    np.testing.assert_allclose(np.asarray(y[:, 7]), 0.0)
    z = L.pad_time_to_multiple(y, 4, axis=1)
    assert z.shape == (2, 8, 3)


def test_durations_from_log_matches_reference_inversion():
    # Reference: clip(round(exp(p) - 1), 1, 1e6), synthesize.py:44.
    p = jnp.array([[0.0, 1.0, 3.0]])
    d = L.durations_from_log(p)
    np.testing.assert_array_equal(
        np.asarray(d), np.clip(np.round(np.exp([[0, 1, 3]]) - 1), 1, 1e6)
    )
    assert d.dtype == jnp.int32
