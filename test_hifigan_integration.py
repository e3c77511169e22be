"""HiFiGAN integration check: import → checkpoint convert/load → inference.

Rebuild of /root/reference/test_hifigan_integration.py:15-80 — returns a
nonzero exit code on failure so it can gate CI. Without a checkpoint it
exercises the conversion machinery on a synthetic torch state dict.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="torch generator.ckpt; synthetic if omitted")
    args = parser.parse_args()

    print("1. imports...")
    from iris_tts_tpu.config import HiFiGANConfig
    from iris_tts_tpu.convert.hifigan_torch import (
        convert_hifigan_state_dict,
        load_pretrained_hifigan,
    )
    from iris_tts_tpu.models.hifigan import HiFiGANGenerator, HiFiGANVocoder

    print("   ✓")

    cfg = HiFiGANConfig()
    if args.checkpoint:
        print(f"2. loading checkpoint {args.checkpoint}...")
        vocoder = load_pretrained_hifigan(args.checkpoint, cfg)
    else:
        print("2. no checkpoint given — building a synthetic torch state "
              "dict to exercise the converter...")
        try:
            import torch
            import torch.nn as tnn
        except ImportError:
            print("   torch unavailable; using random flax init instead")
            from iris_tts_tpu.models.hifigan import create_vocoder

            vocoder = create_vocoder(cfg)
        else:
            torch.manual_seed(0)
            sd = {}
            def wn(name, shape):
                w = torch.randn(*shape) * 0.01
                sd[f"{name}.weight_v"] = w
                sd[f"{name}.weight_g"] = w.norm(
                    dim=tuple(range(1, w.ndim)), keepdim=True
                )
                sd[f"{name}.bias"] = torch.zeros(
                    shape[1] if "ups" in name else shape[0]
                )
            wn("conv_pre", (512, 80, 7))
            ch = 512
            nk = len(cfg.resblock_kernel_sizes)
            for i, (u, k) in enumerate(
                zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
            ):
                wn(f"ups.{i}", (ch, ch // 2, k))
                ch //= 2
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
                ):
                    n = i * nk + j
                    for c in range(len(rd)):
                        wn(f"resblocks.{n}.convs1.{c}", (ch, ch, rk))
                        wn(f"resblocks.{n}.convs2.{c}", (ch, ch, rk))
            wn("conv_post", (1, ch, 7))
            params = convert_hifigan_state_dict(sd, cfg)
            vocoder = HiFiGANVocoder(params, cfg)
    print("   ✓")

    print("3. dummy-mel inference...")
    mel = np.random.default_rng(0).standard_normal((80, 20)).astype(np.float32)
    audio = np.asarray(vocoder(mel))
    expected = 20 * cfg.total_upsample
    assert audio.shape == (expected,), audio.shape
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0
    print(f"   ✓ audio {audio.shape}, range "
          f"[{audio.min():.3f}, {audio.max():.3f}]")
    print("ALL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
