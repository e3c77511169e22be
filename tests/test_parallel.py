"""Mesh/sharding tests on the 8 virtual CPU devices (SURVEY.md §4
"multi-node without a real cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from iris_tts_tpu.config import MeshConfig
from iris_tts_tpu.parallel.mesh import (
    build_mesh,
    data_sharding,
    replicate_params,
    shard_batch,
)
from iris_tts_tpu.parallel.sharding import (
    batch_sharding_tree,
    tp_param_sharding,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_build_mesh_shapes(devices):
    mesh = build_mesh(MeshConfig(), devices)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = build_mesh(
        MeshConfig(data_parallel=4, model_parallel=2), devices
    )
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data_parallel=3, model_parallel=2), devices)


def test_shard_batch_places_on_data_axis(devices):
    mesh = build_mesh(MeshConfig(), devices)
    batch = {"x": jnp.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == PartitionSpec("data")
    np.testing.assert_array_equal(
        np.asarray(sharded["x"]), np.asarray(batch["x"])
    )


def test_tp_param_sharding_rules(devices):
    cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = build_mesh(cfg, devices)
    params = {
        "wide": jnp.ones((16, 64)),  # shard last dim over model
        "narrow": jnp.ones((4, 3)),  # too small / indivisible → replicate
        "vec": jnp.ones((7,)),  # 1-D → replicate
    }
    placed = tp_param_sharding(params, mesh, cfg)
    assert placed["wide"].sharding.spec == PartitionSpec(None, "model")
    assert placed["narrow"].sharding.spec == PartitionSpec()
    assert placed["vec"].sharding.spec == PartitionSpec()


def test_sharded_computation_matches_single_device(devices):
    """A jitted matmul over (data, model)-sharded operands must equal the
    unsharded result — XLA inserts correct collectives."""
    cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = build_mesh(cfg, devices)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))

    want = np.asarray(x @ w)

    xs = batch_sharding_tree({"x": x}, mesh, cfg)["x"]
    ws = tp_param_sharding({"w": w}, mesh, cfg)["w"]
    got = np.asarray(jax.jit(lambda a, b: a @ b)(xs, ws))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_graft_dryrun_multichip(devices):
    """The driver's multichip validation path itself."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_replicate_params(devices):
    mesh = build_mesh(MeshConfig(), devices)
    params = {"a": jnp.ones((4, 4))}
    rep = replicate_params(params, mesh)
    assert rep["a"].sharding.spec == PartitionSpec()
    assert len(rep["a"].sharding.device_set) == 8


def test_pipeline_use_mesh_end_to_end_equality(devices):
    """TTSPipeline.use_mesh: the full public synthesize() path on an
    8-virtual-device data mesh returns the SAME audio as single-device
    (params replicated, batch dim sharded, pad rows dropped)."""
    from tests.test_pipeline import _small_config
    from iris_tts_tpu.models import TTSPipeline

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    pipe.phoneme_buckets = (16, 32)
    pipe.frame_buckets = (32, 64, 128)
    texts = [f"hello number {i}" for i in range(5)]  # 5 rows: forces padding
    want = pipe.synthesize(texts, seed=11, fused=False)

    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1), devices)
    pipe.use_mesh(mesh)
    got = pipe.synthesize(texts, seed=11, fused=False)
    assert len(got) == len(want) == 5
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)

    # single utterance (fused path) also runs on the mesh
    one = pipe.synthesize("just one utterance", seed=4)
    assert one.ndim == 1 and np.isfinite(one).all()


def test_pipeline_use_mesh_model_parallel_equality(devices):
    """Synthesis equality with model_parallel=2 (VERDICT r2 item 3): both
    the two-stage and the fused single-dispatch paths on a 4x2
    (data, model) mesh — params' wide channel dims actually sharded over
    ``model`` — must match single-device output."""
    from tests.test_pipeline import _small_config
    from iris_tts_tpu.models import TTSPipeline

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    pipe.phoneme_buckets = (16, 32)
    pipe.frame_buckets = (32, 64, 128)
    texts = [f"hello number {i}" for i in range(5)]
    want_staged = pipe.synthesize(texts, seed=11, fused=False)
    want_fused = pipe.synthesize(texts, seed=12, fused=True)

    cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = build_mesh(cfg, devices)
    pipe.use_mesh(mesh, cfg)
    # The TP hook really sharded something over the model axis.
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x: x.sharding.spec, pipe.params,
            is_leaf=lambda x: hasattr(x, "sharding"),
        )
    )
    assert any("model" in str(s) for s in specs)

    got_staged = pipe.synthesize(texts, seed=11, fused=False)
    got_fused = pipe.synthesize(texts, seed=12, fused=True)
    for a, b in zip(got_staged, want_staged):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)
    for a, b in zip(got_fused, want_fused):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_hifigan_512ch_tensor_parallel_equality(devices):
    """Production-topology HiFiGAN (512-initial-channel MRF ladder,
    models/hifigan.py) vocoded with its conv channels sharded over
    ``model`` on a 4x2 mesh equals the single-device waveform — the
    activations flow through sharded 512/256/128-ch stages and GSPMD
    inserts the collectives."""
    from iris_tts_tpu.config import HiFiGANConfig
    from iris_tts_tpu.models.hifigan import HiFiGANGenerator

    cfg_hg = HiFiGANConfig()  # production: 512 initial channels, 8-8-2-2
    gen = HiFiGANGenerator(config=cfg_hg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((8, 24, 80)).astype(np.float32))
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:1])["params"]
    want = np.asarray(jax.jit(gen.apply)({"params": params}, mel))

    mesh_cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = build_mesh(mesh_cfg, devices)
    p_tp = tp_param_sharding(params, mesh, mesh_cfg)
    assert any(
        "model" in str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(p_tp)
        if hasattr(x, "sharding") and x.ndim >= 2 and x.shape[-1] >= 128
    )
    mel_sharded = batch_sharding_tree({"mel": mel}, mesh, mesh_cfg)["mel"]
    got = np.asarray(
        jax.jit(gen.apply)({"params": p_tp}, mel_sharded)
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=2e-5)


def test_vocode_sharded_equality(devices):
    """Sequence-parallel vocoding (TTSPipeline.vocode_sharded): the mel
    TIME axis split into receptive-field-overlap windows, one per device
    of an 8-device mesh, reassembles to the SAME samples as the full
    single-dispatch vocode — including an uneven length that exercises
    the boundary-aligned last window and host trimming."""
    from tests.test_pipeline import _small_config
    from iris_tts_tpu.models import TTSPipeline

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    up = pipe.config.hifigan.total_upsample
    n_mels = pipe.config.hifigan.in_channels
    rng = np.random.default_rng(7)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1), devices)

    base_cache = pipe._vocode_sp._cache_size()
    # 200/203: even and uneven splits; 230 would differ under mere
    # round-up-to-chunk padding (224 vs 256) — the traced shape must be
    # chunk*n_dev so the WHOLE chunk band shares one executable.
    for t in (200, 203, 230):
        mel = rng.standard_normal((t, n_mels)).astype(np.float32)
        want = pipe.vocode(mel)
        got = pipe.vocode_sharded(mel, mesh)
        assert got.shape == want.shape == (t * up,)
        np.testing.assert_array_equal(got, want)
    # Novel lengths inside one chunk band reuse ONE executable:
    # window offsets are traced data, and T pads to chunk*n_dev.
    assert pipe._vocode_sp._cache_size() == base_cache + 1

    # pcm16 device-side quantization matches host quantization of vocode
    mel = rng.standard_normal((160, n_mels)).astype(np.float32)
    want16 = (
        np.clip(pipe.vocode(mel), -1.0, 1.0) * 32767.0
    ).astype(np.int16)
    got16 = pipe.vocode_sharded(mel, mesh, pcm16=True)
    assert got16.dtype == np.int16
    np.testing.assert_array_equal(got16, want16)

    # short-mel fallback goes through the plain full pass
    short = rng.standard_normal((8, n_mels)).astype(np.float32)
    np.testing.assert_array_equal(
        pipe.vocode_sharded(short, mesh), pipe.vocode(short)
    )

    # window lanes span BOTH axes of a (data, model) mesh
    cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh42 = build_mesh(cfg, devices)
    mel = rng.standard_normal((192, n_mels)).astype(np.float32)
    np.testing.assert_array_equal(
        pipe.vocode_sharded(mel, mesh42), pipe.vocode(mel)
    )


def test_mesh_training_placement_matches_single_device(devices):
    """The training CLIs' --mesh wiring (scripts.common
    mesh_training_placement): 3 data-parallel duration-train steps on the
    8-virtual-device mesh produce the same params as single-device steps —
    GSPMD's inserted gradient reduction is exact, and the counter-based
    PRNG makes the dropout keys value-identical under sharding."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.common import mesh_training_placement

    import optax

    from iris_tts_tpu.train import TrainState
    from iris_tts_tpu.train.steps import make_duration_train_step
    from tests.test_train_steps import CFG, _duration_batch, \
        _init_duration_state

    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(CFG.encoder, dropout=0.0),
        duration=dataclasses.replace(CFG.duration, dropout=0.0),
    )
    key = jax.random.PRNGKey(11)
    base = _init_duration_state(key)
    rng = np.random.default_rng(11)
    # 8 rows: divisible by the 8-device data axis.
    b4 = _duration_batch(rng)
    batch = {k: jnp.concatenate([v, v]) for k, v in b4.items()}

    # SGD, not Adam: Adam's ~sign(g) early updates amplify float-ulp
    # cross-sharding grad differences (same rationale as the accumulation
    # equivalence test).
    step = jax.jit(make_duration_train_step(cfg))
    single = TrainState.create(base.params, optax.sgd(1e-2), key)
    for _ in range(3):
        single, m_single = step(single, batch)

    meshed = TrainState.create(base.params, optax.sgd(1e-2), key)
    meshed, place_batch = mesh_training_placement(meshed)
    placed = place_batch(batch)
    assert len(placed["phoneme_ids"].sharding.device_set) == 8
    for _ in range(3):
        meshed, m_mesh = step(meshed, placed)

    np.testing.assert_allclose(
        float(m_mesh["duration_loss"]), float(m_single["duration_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(meshed.params),
        jax.tree_util.tree_leaves(single.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )


def test_mesh_training_tensor_parallel_matches_single_device(devices):
    """--mesh --model_parallel 2: params AND optimizer moments tensor-shard
    over the model axis of a 4x2 mesh (trailing output-channel dims via the
    serving TP rule) while the batch shards over data. 3 duration-train
    steps match single-device training — GSPMD's inserted psums for the
    sharded backward contractions reassociate floats, hence the slightly
    looser tolerance than the pure-DP test above."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.common import mesh_training_placement

    import optax

    from iris_tts_tpu.train import TrainState
    from iris_tts_tpu.train.steps import make_duration_train_step
    from tests.test_train_steps import CFG, _duration_batch, \
        _init_duration_state

    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(CFG.encoder, dropout=0.0),
        duration=dataclasses.replace(CFG.duration, dropout=0.0),
    )
    key = jax.random.PRNGKey(13)
    base = _init_duration_state(key)
    rng = np.random.default_rng(13)
    b4 = _duration_batch(rng)
    batch = {k: jnp.concatenate([v, v]) for k, v in b4.items()}

    step = jax.jit(make_duration_train_step(cfg))
    single = TrainState.create(base.params, optax.sgd(1e-2), key)
    for _ in range(3):
        single, m_single = step(single, batch)

    meshed = TrainState.create(base.params, optax.sgd(1e-2), key)
    meshed, place_batch = mesh_training_placement(meshed, model_parallel=2)
    # at least one wide param leaf (and its Adam-shaped shadow in the opt
    # state, if any) is actually SHARDED, not replicated
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(meshed.params)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "model_parallel=2 placed nothing sharded"
    placed = place_batch(batch)
    assert len(placed["phoneme_ids"].sharding.device_set) == 8
    for _ in range(3):
        meshed, m_mesh = step(meshed, placed)

    np.testing.assert_allclose(
        float(m_mesh["duration_loss"]), float(m_single["duration_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(meshed.params),
        jax.tree_util.tree_leaves(single.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pipeline_parallel_synthesizer_matches_fused(devices):
    """Two-stage pipeline parallelism (parallel/pp.py): text→mel on one
    4-device group, vocoder on the other, batches streaming through both.
    Per-batch outputs must match the single-group fused path for the same
    seeds (the stage split cuts the fused executable at the mel boundary;
    same ops, so CPU results agree to float-reassociation tolerance)."""
    from tests.test_pipeline import _small_config
    from iris_tts_tpu.models import TTSPipeline
    from iris_tts_tpu.parallel import PipelineParallelSynthesizer

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    pp = PipelineParallelSynthesizer(pipe, devices, split=4, inflight=2)
    batches = [
        ["hello world", "pipeline parallel"],
        ["the quick brown fox", "jumps over", "the lazy dog", "again"],
        ["single"],
    ]
    got = list(pp.synthesize_batches(batches, seed=3))
    assert [len(g) for g in got] == [2, 4, 1]
    for texts, outs in zip(batches, got):
        want = pipe.synthesize(texts, seed=3, fused=True)
        if isinstance(want, np.ndarray):
            want = [want]
        for g, w in zip(outs, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(g, w, atol=1e-6, rtol=1e-5)

    # pcm16 rides the stage-2 executable
    outs16 = pp.synthesize(["quantized on device"], seed=1, pcm16=True)
    want16 = pipe.synthesize("quantized on device", seed=1, fused=True,
                             pcm16=True)
    assert outs16[0].dtype == np.int16
    np.testing.assert_allclose(
        outs16[0].astype(np.int32), want16.astype(np.int32), atol=1
    )

    # a bare string is ONE utterance returning ONE waveform (the
    # TTSPipeline.synthesize contract), never per-character texts
    single = pp.synthesize("hello world", seed=3)
    assert isinstance(single, np.ndarray)
    np.testing.assert_allclose(
        single, pipe.synthesize("hello world", seed=3, fused=True),
        atol=1e-6, rtol=1e-5,
    )
    got_str_batches = list(pp.synthesize_batches(["hello world"], seed=3))
    assert len(got_str_batches) == 1 and len(got_str_batches[0]) == 1
    np.testing.assert_allclose(
        got_str_batches[0][0], single, atol=1e-6, rtol=1e-5
    )

    # uneven split and guards
    pp31 = PipelineParallelSynthesizer(pipe, devices[:4], split=3)
    np.testing.assert_allclose(
        pp31.synthesize(["uneven groups"], seed=2)[0],
        pipe.synthesize("uneven groups", seed=2, fused=True),
        atol=1e-6, rtol=1e-5,
    )
    with pytest.raises(ValueError):
        PipelineParallelSynthesizer(pipe, devices[:1])
    with pytest.raises(ValueError):
        PipelineParallelSynthesizer(pipe, devices, split=8)


def test_gan_mesh_training_matches_single_device(devices):
    """train_hifigan --mesh wiring: one alternating disc+gen GAN round with
    both TrainStates mesh-placed and the (mel, audio) batch sharded over
    data matches the single-device round (SGD for the linear-in-grads
    comparison, as in the other placement tests)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import optax

    from scripts.common import mesh_training_placement

    from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
    from iris_tts_tpu.models.hifigan import HiFiGANGenerator
    from iris_tts_tpu.train import TrainState
    from iris_tts_tpu.train.gan import make_gan_steps
    from tests.test_gan import _CFG as cfg

    key = jax.random.PRNGKey(5)
    k_g, k_d = jax.random.split(key)
    T = 16
    hop = cfg.hifigan.total_upsample
    gen = HiFiGANGenerator(config=cfg.hifigan)
    disc = HiFiGANDiscriminators(periods=(2,), num_scales=1, width=0.05)
    p_gen = jax.jit(gen.init)(
        k_g, jnp.zeros((1, T, cfg.hifigan.in_channels))
    )["params"]
    p_disc = jax.jit(disc.init)(k_d, jnp.zeros((1, T * hop)))["params"]
    rng = np.random.default_rng(5)
    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((8, T, cfg.hifigan.in_channels)),
            jnp.float32,
        ),
        "audio": jnp.asarray(
            0.3 * rng.standard_normal((8, T * hop)), jnp.float32
        ),
    }
    disc_step, gen_step = make_gan_steps(cfg, periods=(2,), num_scales=1,
                                         disc_width=0.05)
    disc_step, gen_step = jax.jit(disc_step), jax.jit(gen_step)

    def one_round(g, d, b):
        d, dm = disc_step(g, d, b)
        g, gm = gen_step(g, d, b)
        return g, d, {**dm, **gm}

    g1 = TrainState.create(p_gen, optax.sgd(1e-3), k_g)
    d1 = TrainState.create(p_disc, optax.sgd(1e-3), k_d)
    g1, d1, m1 = one_round(g1, d1, batch)

    g2 = TrainState.create(p_gen, optax.sgd(1e-3), k_g)
    d2 = TrainState.create(p_disc, optax.sgd(1e-3), k_d)
    g2, place_batch = mesh_training_placement(g2)
    d2, _ = mesh_training_placement(d2)
    placed = place_batch(batch)
    assert len(placed["mel"].sharding.device_set) == 8
    g2, d2, m2 = one_round(g2, d2, placed)

    np.testing.assert_allclose(
        float(m2["disc_loss"]), float(m1["disc_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2["gen_total"]), float(m1["gen_total"]), rtol=1e-5
    )
    for side1, side2 in ((g1, g2), (d1, d2)):
        for a, b in zip(
            jax.tree_util.tree_leaves(side2.params),
            jax.tree_util.tree_leaves(side1.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6
            )


def test_mesh_training_with_accumulation(devices):
    """--mesh + --accum_steps combined: microbatches stack in FRONT, so the
    data axis shards axis 1 (PartitionSpec(None, 'data')); the accumulated
    sharded step equals the single-device full-batch step."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import optax

    from scripts.common import mesh_training_placement

    from iris_tts_tpu.train import TrainState, split_microbatches
    from iris_tts_tpu.train.steps import make_duration_train_step
    from tests.test_train_steps import CFG, _duration_batch, \
        _init_duration_state

    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(CFG.encoder, dropout=0.0),
        duration=dataclasses.replace(CFG.duration, dropout=0.0),
    )
    key = jax.random.PRNGKey(12)
    base = _init_duration_state(key)
    rng = np.random.default_rng(12)
    b4 = _duration_batch(rng)
    # 16 rows = 2 microbatches of 8 (each spreading over the 8 devices).
    batch = {k: jnp.concatenate([v] * 4) for k, v in b4.items()}

    single = TrainState.create(base.params, optax.sgd(1e-2), key)
    single, _ = jax.jit(make_duration_train_step(cfg))(single, batch)

    meshed = TrainState.create(base.params, optax.sgd(1e-2), key)
    meshed, place_batch = mesh_training_placement(meshed, accum_steps=2)
    placed = place_batch(split_microbatches(batch, 2))
    assert placed["phoneme_ids"].shape == (2, 8, batch["phoneme_ids"].shape[1])
    step = jax.jit(make_duration_train_step(cfg, accum_steps=2))
    meshed, _ = step(meshed, placed)

    for a, b in zip(
        jax.tree_util.tree_leaves(meshed.params),
        jax.tree_util.tree_leaves(single.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )
