"""Train the neural G2P transformer on the shipped CMUdict.

Replaces the reference's g2p_en dependency (/root/reference/src/iris/text.py:
186-190) with a model trained by this framework itself. The whole dataset
(~130k word/pronunciation pairs) lives on device and every epoch runs as ONE
``lax.scan`` dispatch — the idiomatic shape for a tunneled TPU where each
dispatch costs a fixed round trip (contrast the reference's per-step
``train_on_batch`` host loop, train_encoder.py:192-237).

The resulting checkpoint (fp16 npz + JSON manifest, ~6 MB) ships inside the
package at ``iris_tts_tpu/text/data/g2p_transformer.npz`` and is loaded
lazily by the frontend for out-of-lexicon words.

Usage:
    python scripts/train_g2p.py --output iris_tts_tpu/text/data/g2p_transformer.npz
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.common import setup_logging

logger = logging.getLogger(__name__)


def build_dataset(cfg, max_entries: int = 0):
    """CMUdict table → (chars [N,W], phone_in [N,T], phone_out [N,T],
    is_val [N]) int32/bool numpy arrays.

    Deterministic 2% validation split by word CRC so the held-out set is
    stable across runs (and across the test suite, which re-derives it).
    """
    from iris_tts_tpu.models.g2p import (
        N_SPECIAL, PHONE_EOS, PHONE_BOS, PHONE_PAD, encode_word,
    )
    from iris_tts_tpu.text.lexicon import ARPABET, Lexicon

    phone_to_id = {p: N_SPECIAL + i for i, p in enumerate(ARPABET)}
    table = Lexicon()._table
    words = sorted(table)
    if max_entries:
        words = words[:: max(1, len(words) // max_entries)]

    chars, pin, pout, is_val = [], [], [], []
    w_max, t_max = cfg.max_word_len, cfg.max_phone_len
    for word in words:
        cid = encode_word(word, w_max)
        phones = table[word]
        if cid is None or len(phones) + 2 > t_max:
            continue
        pid = [phone_to_id.get(p) for p in phones]
        if any(p is None for p in pid):
            continue
        seq_in = [PHONE_BOS] + pid
        seq_out = pid + [PHONE_EOS]
        pad = t_max - len(seq_in)
        chars.append(cid)
        pin.append(seq_in + [PHONE_PAD] * pad)
        pout.append(seq_out + [PHONE_PAD] * pad)
        is_val.append(zlib.crc32(word.encode()) % 50 == 0)
    return (
        np.asarray(chars, np.int32),
        np.asarray(pin, np.int32),
        np.asarray(pout, np.int32),
        np.asarray(is_val, bool),
    )


def phone_error_rate(pred: list, ref: list) -> int:
    """Levenshtein distance between two phone sequences."""
    m, n = len(pred), len(ref)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(
                dp[j] + 1, dp[j - 1] + 1,
                prev + (pred[i - 1] != ref[j - 1]),
            )
            prev = cur
    return dp[n]


def evaluate(model, params, chars_val, pout_val, batch: int = 512):
    """Greedy-decode the validation split; return (PER, word exact-match)."""
    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.models.g2p import PHONE_EOS, N_SPECIAL, greedy_decode

    decode = jax.jit(lambda p, c: greedy_decode(model, p, c))
    err = tot = exact = 0
    n = chars_val.shape[0]
    for i in range(0, n, batch):
        chunk = chars_val[i : i + batch]
        real = chunk.shape[0]
        if real < batch:  # pad to the bucket so the jit cache stays at 1
            chunk = np.pad(chunk, ((0, batch - real), (0, 0)))
        toks = np.asarray(decode(params, jnp.asarray(chunk)))[:real]
        for row, ref_row in zip(toks, pout_val[i : i + batch]):
            pred = []
            for t in row[1:]:
                if t == PHONE_EOS or t < N_SPECIAL:
                    break
                pred.append(int(t))
            ref = [int(t) for t in ref_row if t >= N_SPECIAL]
            err += phone_error_rate(pred, ref)
            tot += len(ref)
            exact += pred == ref
    return err / max(tot, 1), exact / max(n, 1)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=Path,
                        default=Path("iris_tts_tpu/text/data/"
                                     "g2p_transformer.npz"))
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--embed_dim", type=int, default=192)
    parser.add_argument("--enc_blocks", type=int, default=3)
    parser.add_argument("--dec_blocks", type=int, default=3)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--warmup_frac", type=float, default=0.05)
    parser.add_argument("--label_smoothing", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval_every", type=int, default=10)
    parser.add_argument("--max_entries", type=int, default=0,
                        help="subsample the dict (smoke tests)")
    args = parser.parse_args()
    setup_logging()

    import jax
    import jax.numpy as jnp
    import optax

    from iris_tts_tpu.models.g2p import G2PConfig, G2PTransformer
    from iris_tts_tpu.text.neural_g2p import save_g2p

    cfg = G2PConfig(
        embed_dim=args.embed_dim,
        enc_blocks=args.enc_blocks,
        dec_blocks=args.dec_blocks,
    )
    chars, pin, pout, is_val = build_dataset(cfg, args.max_entries)
    tr = ~is_val
    chars_tr, pin_tr, pout_tr = chars[tr], pin[tr], pout[tr]
    chars_val, pout_val = chars[is_val], pout[is_val]
    logger.info("dataset: %d train / %d val entries", chars_tr.shape[0],
                chars_val.shape[0])

    model = G2PTransformer(cfg)
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, cfg.max_word_len), jnp.int32),
        jnp.zeros((2, cfg.max_phone_len), jnp.int32),
        deterministic=False,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info("model: %.2fM params", n_params / 1e6)

    b = min(args.batch_size, chars_tr.shape[0])
    steps_per_epoch = chars_tr.shape[0] // b
    total_steps = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, int(total_steps * args.warmup_frac), total_steps,
        end_value=args.lr * 1e-2,
    )
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    # Dataset resident on device; each epoch is one lax.scan dispatch over a
    # freshly-uploaded shuffle permutation.
    dc, dpi, dpo = jnp.asarray(chars_tr), jnp.asarray(pin_tr), \
        jnp.asarray(pout_tr)

    def loss_fn(p, c, yi, yo, drop_rng):
        logits = model.apply(
            p, c, yi, deterministic=False, rngs={"dropout": drop_rng}
        )
        mask = (yo != 0).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, yo)
        return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def epoch_fn(params, opt_state, perm, epoch):
        def step(carry, i):
            p, o = carry
            idx = jax.lax.dynamic_slice(perm, (i * b,), (b,))
            c, yi, yo = dc[idx], dpi[idx], dpo[idx]
            drop = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), epoch),
                i,
            )
            loss, grads = jax.value_and_grad(loss_fn)(p, c, yi, yo, drop)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(steps_per_epoch)
        )
        return params, opt_state, losses.mean()

    epoch_jit = jax.jit(epoch_fn, donate_argnums=(0, 1))
    shuffle_rng = np.random.default_rng(args.seed)

    t_start = time.time()
    for epoch in range(args.epochs):
        perm = jnp.asarray(
            shuffle_rng.permutation(chars_tr.shape[0]).astype(np.int32)
        )
        params, opt_state, loss = epoch_jit(
            params, opt_state, perm, jnp.asarray(epoch, jnp.int32)
        )
        loss = float(loss)  # host sync: one fetch per epoch
        logger.info("epoch %3d/%d  loss %.4f  (%.1fs)", epoch + 1,
                    args.epochs, loss, time.time() - t_start)
        if (epoch + 1) % args.eval_every == 0 or epoch + 1 == args.epochs:
            per, exact = evaluate(model, params, chars_val, pout_val)
            logger.info("  val PER %.4f  word exact-match %.3f", per, exact)

    per, exact = evaluate(model, params, chars_val, pout_val)
    save_g2p(args.output, params, cfg,
             meta={"val_per": round(per, 4),
                   "val_exact": round(exact, 4),
                   "train_entries": int(chars_tr.shape[0]),
                   "epochs": args.epochs})
    logger.info("saved %s  (val PER %.4f, exact %.3f)", args.output, per,
                exact)


if __name__ == "__main__":
    main()
