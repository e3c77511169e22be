"""Neural G2P: model, checkpoint round trip, frontend ladder, quality gate.

The reference's OOV path is the neural g2p_en package
(/root/reference/src/iris/text.py:186-190); ours is a transformer trained on
the shipped CMUdict (models/g2p.py + scripts/train_g2p.py) with the rule
engine as backstop. The quality gate at the bottom pins the shipped
checkpoint's held-out PER well below the rule engine's ~0.23.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.models.g2p import (
    CHAR_PAD, G2PConfig, G2PTransformer, PHONE_BOS, PHONE_EOS, N_SPECIAL,
    encode_word, greedy_decode,
)
from iris_tts_tpu.text.neural_g2p import (
    DEFAULT_CHECKPOINT, NeuralG2P, load_g2p, save_g2p,
)

REPO = Path(__file__).resolve().parent.parent

TINY = G2PConfig(embed_dim=32, num_heads=2, enc_blocks=1, dec_blocks=1,
                 max_word_len=12, max_phone_len=14)


@pytest.fixture(scope="module")
def tiny_model():
    model = G2PTransformer(TINY)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, TINY.max_word_len), jnp.int32),
        jnp.zeros((2, TINY.max_phone_len), jnp.int32),
    )
    return model, params


def test_encode_word():
    assert encode_word("cat", 6) == [3, 1, 20, CHAR_PAD, CHAR_PAD, CHAR_PAD]
    assert encode_word("o'er", 6)[:4] == [15, 27, 5, 18]
    assert encode_word("abc123", 12) is None  # digits unsupported
    assert encode_word("x" * 13, 12) is None  # too long
    assert encode_word("", 12) is None


def test_model_shapes_and_masking(tiny_model):
    model, params = tiny_model
    chars = jnp.asarray(
        [encode_word("cat", TINY.max_word_len),
         encode_word("dog", TINY.max_word_len)], jnp.int32
    )
    pin = jnp.zeros((2, TINY.max_phone_len), jnp.int32).at[:, 0].set(
        PHONE_BOS
    )
    logits = model.apply(params, chars, pin)
    assert logits.shape == (2, TINY.max_phone_len, TINY.phone_vocab)
    assert bool(jnp.isfinite(logits).all())

    # Causality: changing a LATER decoder input must not change the logits
    # at an earlier position.
    pin2 = pin.at[:, 5].set(7)
    logits2 = model.apply(params, chars, pin2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :5]), np.asarray(logits2[:, :5]),
        rtol=0, atol=1e-5,
    )
    assert not np.allclose(np.asarray(logits[:, 5:]),
                           np.asarray(logits2[:, 5:]), atol=1e-5)


def test_char_padding_is_inert(tiny_model):
    """Extra PAD chars beyond the word must not change the encoding."""
    model, params = tiny_model
    a = jnp.asarray([encode_word("cats", TINY.max_word_len)], jnp.int32)
    enc_a, valid = model.apply(params, a, method=G2PTransformer.encode)
    # Same word with the pad tail forced to a different PAD run length is
    # impossible by construction, so check invariance differently: encoding
    # of the valid prefix must not depend on batch padding rows.
    b = jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
    enc_b, _ = model.apply(params, b, method=G2PTransformer.encode)
    np.testing.assert_allclose(
        np.asarray(enc_a[0]), np.asarray(enc_b[0]), atol=1e-5
    )
    assert bool(valid[0, :4].all()) and not bool(valid[0, 4:].any())


def test_greedy_decode_contract(tiny_model):
    model, params = tiny_model
    chars = jnp.asarray(
        [encode_word("cat", TINY.max_word_len)] * 3, jnp.int32
    )
    toks = np.asarray(greedy_decode(model, params, chars))
    assert toks.shape == (3, TINY.max_phone_len)
    assert (toks[:, 0] == PHONE_BOS).all()
    # Identical inputs decode identically (deterministic).
    assert (toks[0] == toks[1]).all() and (toks[1] == toks[2]).all()
    # After an EOS, only PAD follows.
    row = toks[0, 1:]
    eos = np.nonzero(row == PHONE_EOS)[0]
    if eos.size:
        assert (row[eos[0] + 1:] == 0).all()


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    model, params = tiny_model
    path = tmp_path / "g2p.npz"
    save_g2p(path, params, TINY, meta={"val_per": 0.5})
    restored, cfg, meta = load_g2p(path)
    assert cfg == TINY
    assert meta["val_per"] == 0.5
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )  # fp16 storage

    # Decoding through the wrapper is identical to decoding the restored
    # params directly.
    g = NeuralG2P(path)
    out = g("zzyzx")
    toks = np.asarray(greedy_decode(
        model, restored,
        jnp.asarray([encode_word("zzyzx", TINY.max_word_len)], jnp.int32),
    ))[0]
    want = []
    for t in toks[1:]:
        if t == PHONE_EOS or t < N_SPECIAL:
            break
        want.append(int(t))
    from iris_tts_tpu.text.lexicon import ARPABET
    assert out == [ARPABET[t - N_SPECIAL] for t in want]


def test_wrapper_failure_modes(tmp_path):
    g = NeuralG2P(tmp_path / "missing.npz")
    assert g("anything") == []  # no checkpoint → graceful empty
    assert not NeuralG2P.available(tmp_path / "missing.npz")

    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    g2 = NeuralG2P(bad)
    assert g2("anything") == []  # corrupt checkpoint → graceful empty


def test_frontend_ladder(tmp_path, monkeypatch):
    """Lexicon beats neural G2P; neural-off falls back to rules; the
    env kill switch works."""
    from iris_tts_tpu.text.frontend import TextProcessor
    from iris_tts_tpu.text.g2p import g2p

    proc_rules = TextProcessor(neural_g2p=False)
    # In-lexicon word: identical regardless of G2P backend.
    assert proc_rules.word_to_phonemes("hello") == ["HH", "AH", "L", "OW"]
    # OOV through rules engine.
    oov = "brontolimity"
    assert proc_rules.word_to_phonemes(oov) == g2p(oov)

    monkeypatch.setenv("IRIS_NEURAL_G2P", "0")
    assert not NeuralG2P.available()
    proc_auto = TextProcessor()
    assert proc_auto.neural_g2p is None


def test_numpy_decode_matches_jax(tmp_path, tiny_model):
    """The host NumPy inference path reproduces the jax greedy decode
    token-for-token (same checkpoint, fp16 round trip on both sides)."""
    model, params = tiny_model
    path = tmp_path / "g2p.npz"
    save_g2p(path, params, TINY)

    words = ["cat", "dog", "zzyzx", "a", "supercal"]
    chars = jnp.asarray(
        [encode_word(w, TINY.max_word_len) for w in words], jnp.int32
    )
    restored, _, _ = load_g2p(path)
    want = np.asarray(greedy_decode(model, restored, chars))

    g = NeuralG2P(path)
    assert g._load()
    got = g._net.greedy_decode(np.asarray(chars))
    # Early exit pads the tail with PAD; compare the full buffer.
    np.testing.assert_array_equal(got, want)

    # Logits agree numerically too (not just argmax).
    enc, valid = g._net.encode(np.asarray(chars))
    logits_np = g._net.decode_step(want, enc, valid)
    logits_jax = model.apply(
        restored, chars, jnp.asarray(want, jnp.int32)
    )
    np.testing.assert_allclose(
        logits_np, np.asarray(logits_jax), rtol=1e-4, atol=1e-4
    )


def test_sentence_oov_prefetch_batches_one_dispatch():
    """All OOV words of a sentence go through ONE predict_batch call; the
    per-word ladder then serves from the memo cache."""
    from iris_tts_tpu.text.frontend import TextProcessor

    calls = []

    class Spy:
        def predict_batch(self, words):
            calls.append(list(words))
            return [["T", "EH", "S", "T"] for _ in words]

        def __call__(self, word):
            return self.predict_batch([word])[0]

    proc = TextProcessor(neural_g2p=Spy())
    out = proc.text_to_phonemes("hello zorblatt and quuxify")
    # one batched prefetch containing exactly the two OOV words...
    assert calls[0] == ["zorblatt", "quuxify"]
    # ...then one per-word call each from the ladder (Spy has no cache; the
    # real wrapper memoizes, which test_checkpoint_roundtrip covers).
    assert out.split().count("EH") == 2  # one spy result per OOV word
    assert "HH" in out  # in-lexicon "hello" untouched


def test_train_script_smoke(tmp_path):
    """End-to-end CLI: tiny subsample, 2 epochs, checkpoint loads + decodes."""
    out = tmp_path / "g2p_tiny.npz"
    # Clean env (same pattern as tests/test_scripts.py): drop the site
    # customization dir from PYTHONPATH so JAX_PLATFORMS=cpu sticks and the
    # subprocess never dials hardware from inside the suite.
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root",
           "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache_cpu"),
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "5"}
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/train_g2p.py"),
         "--max_entries", "300", "--epochs", "2", "--batch_size", "128",
         "--embed_dim", "32", "--enc_blocks", "1", "--dec_blocks", "1",
         "--eval_every", "2", "--output", str(out)],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    g = NeuralG2P(out)
    phones = g("wug")
    from iris_tts_tpu.text.lexicon import ARPABET
    assert all(p in ARPABET for p in phones)


@pytest.mark.skipif(
    not DEFAULT_CHECKPOINT.exists(),
    reason="shipped g2p checkpoint not present",
)
def test_shipped_checkpoint_quality():
    """Held-out PER gate for the shipped checkpoint.

    Mirrors tests/test_text.py's rule-G2P measurement (PER ~0.23): the
    neural model must beat it decisively on the SAME deterministic held-out
    split it never trained on (crc32 % 50 == 0, scripts/train_g2p.py).
    """
    import zlib

    from iris_tts_tpu.text.lexicon import Lexicon

    g = NeuralG2P()
    table = Lexicon()._table
    val = [w for w in sorted(table)
           if zlib.crc32(w.encode()) % 50 == 0 and w.isalpha()]
    sample = val[::12]  # ~200 held-out words, deterministic
    assert len(sample) > 150

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[len(b)]

    preds = g.predict_batch(sample)
    err = den = exact = 0
    for w, pred in zip(sample, preds):
        ref = table[w]
        err += lev(pred, ref)
        den += len(ref)
        exact += pred == ref
    per = err / den
    print(f"neural g2p vs CMUdict held-out: PER={per:.3f} "
          f"exact={exact / len(sample):.3f}")
    assert per < 0.12  # rule engine measures ~0.23 on its own gate
    assert exact / len(sample) > 0.5


def test_oov_differential_golden():
    """OOV differential set (VERDICT r3 item 8, the g2p_en head-to-head the
    reference relied on at text.py:186-190): 59 words absent from CMUdict
    with hand-audited expected ARPABET (tests/data/g2p_oov_golden.txt).
    Gates word-exact agreement >= 0.85 and phone-level agreement >= 0.93
    (current model: 57/59 exact; the two curated divergences are encoded
    as targets, not model echoes). Also reports the rule engine's rate for
    comparison — the neural model must beat it."""
    from pathlib import Path

    from iris_tts_tpu.text.lexicon import Lexicon
    from iris_tts_tpu.text.neural_g2p import NeuralG2P

    if not NeuralG2P.available():
        import pytest

        pytest.skip("neural G2P checkpoint not available")

    golden_file = Path(__file__).parent / "data" / "g2p_oov_golden.txt"
    cases = []
    for line in golden_file.read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        word, phones = line.split(" || ")
        cases.append((word, phones.split()))
    assert len(cases) >= 50

    lex = Lexicon()
    still_oov = [w for w, _ in cases if lex.lookup(w) is None]
    assert len(still_oov) == len(cases), (
        "golden words entered the lexicon; regenerate the set"
    )

    g2p = NeuralG2P()
    preds = g2p.predict_batch([w for w, _ in cases])

    def phone_agreement(a, b):
        # simple alignment-free measure: Levenshtein via difflib ratio
        import difflib

        return difflib.SequenceMatcher(None, a, b).ratio()

    exact = sum(p == want for p, (_, want) in zip(preds, cases))
    phone = sum(
        phone_agreement(p, want) for p, (_, want) in zip(preds, cases)
    ) / len(cases)
    word_exact = exact / len(cases)
    misses = [
        (w, " ".join(want), " ".join(p))
        for p, (w, want) in zip(preds, cases)
        if p != want
    ]
    print(f"neural G2P OOV agreement: word-exact {word_exact:.3f}, "
          f"phone {phone:.3f}; misses: {misses}")
    assert word_exact >= 0.85, misses
    assert phone >= 0.93

    # rule engine on the same set, for the differential report
    from iris_tts_tpu.text.g2p import g2p as rule_g2p

    rule_exact = sum(
        rule_g2p(w) == want for w, want in cases
    ) / len(cases)
    print(f"rule engine word-exact on the same set: {rule_exact:.3f}")
    assert word_exact > rule_exact, (
        "neural G2P no longer beats the rule engine on the OOV set"
    )
