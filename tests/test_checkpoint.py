"""Orbax checkpoint tests: full-state resume, best tracking, retention."""

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.train import TrainState, adam_clipped
from iris_tts_tpu.train.checkpoint import (
    CheckpointManager,
    load_params,
    save_params,
)


def _make_state(seed=0):
    key = jax.random.PRNGKey(seed)
    params = {
        "w": jax.random.normal(key, (4, 4)),
        "b": jnp.zeros((4,)),
    }
    return TrainState.create(params, adam_clipped(1e-3), key)


def _advance(state, n=3):
    for _ in range(n):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
    return state


def test_full_state_roundtrip(tmp_path):
    state = _advance(_make_state())
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state)

    template = _make_state(seed=99)  # different values, same structure
    restored = mgr.restore(template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state restored too (reference loses it — SURVEY.md §5).
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.opt_state),
        jax.tree_util.tree_leaves(state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(restored.rng), np.asarray(state.rng)
    )
    mgr.close()


def test_ema_params_survive_roundtrip(tmp_path):
    """The EMA average is part of the saved state: a resumed GAN must not
    silently restart the average from the raw params."""
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (4, 4)), "b": jnp.zeros((4,))}
    state = _advance(
        TrainState.create(params, adam_clipped(1e-3), key, ema_decay=0.9)
    )
    assert state.ema_params is not None
    # EMA has diverged from raw params after 3 updates.
    assert float(
        jnp.abs(state.ema_params["w"] - state.params["w"]).max()
    ) > 0
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state)

    template = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), adam_clipped(1e-3), key,
        ema_decay=0.9,
    )
    restored = mgr.restore(template)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.ema_params),
        jax.tree_util.tree_leaves(state.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored.serving_params is restored.ema_params
    mgr.close()


def test_ema_flag_mismatch_on_resume_raises(tmp_path):
    """Resuming an EMA run with a template that forgot --ema_decay must be
    LOUD: an ema_params=None template is an empty pytree node, so Orbax
    would silently skip the saved average (destroying it at next save)."""
    key = jax.random.PRNGKey(0)
    params = {"w": jnp.ones((2, 2))}
    state = _advance(
        TrainState.create(params, adam_clipped(1e-3), key, ema_decay=0.9)
    )
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state)

    bare = TrainState.create(params, adam_clipped(1e-3), key)
    with np.testing.assert_raises_regex(ValueError, "ema_decay"):
        mgr.restore(bare)
    # The matching template restores fine (and keeps the average — see
    # test_ema_params_survive_roundtrip).
    ok = TrainState.create(params, adam_clipped(1e-3), key, ema_decay=0.9)
    assert int(mgr.restore(ok).step) == int(state.step)
    mgr.close()


def test_best_tracking(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck")
    s1 = _advance(_make_state(), 1)
    assert mgr.save(1, s1, val_metric=0.5) is True
    s2 = _advance(s1, 1)
    assert mgr.save(2, s2, val_metric=0.9) is False  # worse
    s3 = _advance(s2, 1)
    assert mgr.save(3, s3, val_metric=0.1) is True  # better

    best = mgr.restore_best(_make_state(seed=5))
    assert int(best.step) == int(s3.step)
    mgr.close()


def test_resume_continues_training(tmp_path):
    """Save mid-run, restore, keep training — bit-exact continuation."""
    state = _advance(_make_state(), 2)
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state)

    cont_a = _advance(state, 2)
    restored = mgr.restore(_make_state(seed=7))
    cont_b = _advance(restored, 2)
    for a, b in zip(
        jax.tree_util.tree_leaves(cont_a.params),
        jax.tree_util.tree_leaves(cont_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_bare_params_roundtrip(tmp_path):
    params = {"layer": {"kernel": np.arange(6.0).reshape(2, 3)}}
    save_params(tmp_path / "p", params)
    again = load_params(tmp_path / "p", template=params)
    np.testing.assert_array_equal(
        np.asarray(again["layer"]["kernel"]), params["layer"]["kernel"]
    )


def test_epoch_counter_survives_roundtrip(tmp_path):
    """TrainState.epoch is checkpointed; resume_if_available reads it
    directly (review fix: no steps-per-epoch guessing)."""
    import jax.numpy as jnp

    from iris_tts_tpu.train.loop import resume_if_available

    state = _advance(_make_state(), 5)
    state = state.replace(epoch=jnp.asarray(3, jnp.int32))
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state)

    restored, start_epoch = resume_if_available(mgr, _make_state(seed=9))
    assert start_epoch == 3
    assert int(restored.epoch) == 3
    mgr.close()


def test_average_checkpoints(tmp_path):
    """scripts/average_checkpoints.py: the averaged params are the exact
    mean of the selected steps; missing steps error."""
    from scripts.average_checkpoints import average_stage_params

    key = jax.random.PRNGKey(0)
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=10)
    vals = [1.0, 2.0, 6.0]
    for i, v in enumerate(vals):
        state = TrainState.create(
            {"w": jnp.full((2, 2), v)}, adam_clipped(1e-3), key
        ).replace(step=jnp.asarray(i + 1, jnp.int32))
        mgr.save(i + 1, state)
    mgr.close()

    avg, used = average_stage_params(tmp_path / "ck", last=3)
    assert used == [1, 2, 3]
    np.testing.assert_allclose(avg["w"], np.full((2, 2), 3.0))

    avg2, used2 = average_stage_params(tmp_path / "ck", steps=[2, 3])
    np.testing.assert_allclose(avg2["w"], np.full((2, 2), 4.0))

    with np.testing.assert_raises_regex(ValueError, "not retained"):
        average_stage_params(tmp_path / "ck", steps=[99])


def test_restore_raw_decouples_optimizer(tmp_path):
    """Template-free restore works even when the consumer's optimizer
    differs from the one that trained the checkpoint (review blocker)."""
    import optax

    from iris_tts_tpu.train import TrainState

    # Train-side: schedule-based optimizer (ScaleByScheduleState in tree).
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 5, 50)
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (3, 3))}
    state = TrainState.create(params, adam_clipped(sched), key)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)

    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(int(state.step), state, val_metric=1.0)

    got = mgr.restore_best_params()
    np.testing.assert_array_equal(
        np.asarray(got["w"]), np.asarray(state.params["w"])
    )
    mgr.close()


def test_async_save_settles_before_read(tmp_path):
    """Periodic saves are async (training continues while orbax commits);
    every read path (latest_step/restore, incl. from a fresh manager after
    close) observes only settled, complete checkpoints."""
    from iris_tts_tpu.train import TrainState

    key = jax.random.PRNGKey(0)
    state = TrainState.create(
        {"w": jax.random.normal(key, (4, 4))}, adam_clipped(1e-3), key
    )
    mgr = CheckpointManager(tmp_path / "ck")
    for _ in range(3):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
        mgr.save(int(state.step), state)  # async (wait defaults False)
    # Same-manager read settles in-flight commits first.
    assert mgr.latest_step() == 3
    got = mgr.restore(state)
    np.testing.assert_array_equal(
        np.asarray(got.params["w"]), np.asarray(state.params["w"])
    )
    mgr.close()  # waits, then closes
    fresh = CheckpointManager(tmp_path / "ck")
    assert fresh.latest_step() == 3
    got2 = fresh.restore(state)
    np.testing.assert_array_equal(
        np.asarray(got2.params["w"]), np.asarray(state.params["w"])
    )
    fresh.close()


def test_epoch_pinned_retention_survives_step_drift(tmp_path):
    """keep_every_n is in EPOCHS: pinned epoch-boundary saves survive
    max_to_keep eviction even when step numbers drift off steps_per_epoch
    multiples (mid-epoch preemption resume) — orbax's keep_period is in
    raw step units and silently broke this policy."""
    from iris_tts_tpu.train import TrainState

    key = jax.random.PRNGKey(0)
    state = TrainState.create(
        {"w": jax.random.normal(key, (2, 2))}, adam_clipped(1e-3), key
    )
    mgr = CheckpointManager(tmp_path / "ck", keep_every_n=2, max_to_keep=2)
    # Drifted step numbers (not multiples of anything): epochs 1..6.
    steps = [7, 13, 22, 31, 40, 49]
    for epoch, step in enumerate(steps, start=1):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
        mgr.save(step, state, epoch=epoch, wait=True)
    kept = set(mgr.all_steps())
    # Epoch multiples of 2 → steps 13, 31, 49 pinned forever; plus up to
    # max_to_keep recent ones.
    assert {13, 31, 49} <= kept, kept
    mgr.close()
    # Pins persist across manager instances.
    fresh = CheckpointManager(tmp_path / "ck", keep_every_n=2, max_to_keep=2)
    assert {13, 31, 49} <= set(fresh.all_steps())
    fresh.close()


def test_config_record_is_never_clobbered_on_resume(tmp_path):
    """The config that trained the checkpoints is the authoritative record:
    constructing a manager with a DIFFERENT config must not overwrite it."""
    from iris_tts_tpu.config import IrisConfig, EncoderConfig

    cfg1 = IrisConfig(encoder=EncoderConfig(vocab_size=41))
    mgr = CheckpointManager(tmp_path / "ck", cfg1)
    mgr.close()
    cfg2 = IrisConfig(encoder=EncoderConfig(vocab_size=99))
    mgr2 = CheckpointManager(tmp_path / "ck", cfg2)
    assert mgr2.load_config().encoder.vocab_size == 41  # original preserved
    mgr2.close()
