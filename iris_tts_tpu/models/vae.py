"""PortaSpeech-style text-conditioned VAE with a volume-preserving flow.

TPU-native rebuild of /root/reference/src/iris/vae.py:10-497 as stateless
flax modules:

* FiLM conditioning (vae.py:10-34),
* dilated-conv WaveNet residual blocks with GELU + FiLM (vae.py:37-77,
  dilation cycle ``2**(i % 4)``),
* strided-conv temporal downsampling / repeat-2× upsampling (vae.py:80-159),
* additive (volume-preserving) coupling flow with zero-initialised output
  convs (vae.py:162-252),
* the triple-conditioned VAE itself (vae.py:255-497): separate mean /
  **zero-initialised logvar** heads, flow-in-latent-space, decode, and a
  ``generate`` path that samples the prior and runs the inverse flow.

Differences from the reference (deliberate, TPU-first):
* mel layout is time-major ``[B, T, n_mels]`` end to end (channels on the
  lane dim; the pipeline offers reference-layout adapters),
* RNG is explicit flax rng streams (``sample``/``dropout``) instead of a
  stateful Keras SeedGenerator (vae.py:292),
* all shapes static; callers pre-pad T to a multiple of ``2**down_stages``
  via :func:`iris_tts_tpu.ops.pad_time_to_multiple`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iris_tts_tpu.config import VAEConfig
from iris_tts_tpu.models.layers import Conv1d


class FiLM(nn.Module):
    """Feature-wise linear modulation: y = gamma(cond) * x + beta(cond)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        gamma_beta = nn.Dense(
            2 * self.channels, dtype=self.dtype, name="proj"
        )(cond)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return gamma * x + beta


class WaveNetResBlock(nn.Module):
    """x + res_proj(dropout(FiLM(gelu(dilated_conv(x)), cond)))
    (reference: vae.py:37-77 — no LayerNorm, following PortaSpeech)."""

    channels: int
    kernel_size: int
    dilation: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = Conv1d(
            self.channels,
            self.kernel_size,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv",
        )(x)
        h = nn.gelu(h)
        h = FiLM(self.channels, dtype=self.dtype, name="film")(h, cond)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + Conv1d(
            self.channels, 1, dtype=self.dtype, name="res_proj"
        )(h)


class TemporalDownsample(nn.Module):
    """num_stages × [stride-2 conv → GELU]: T → T / 2**num_stages
    (reference: vae.py:80-117)."""

    channels: int
    num_stages: int = 2
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_stages):
            x = Conv1d(
                self.channels,
                self.kernel_size,
                stride=2,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.gelu(x)
        return x


class TemporalUpsample(nn.Module):
    """num_stages × [repeat-2× → conv → GELU] (reference: vae.py:120-159)."""

    channels: int
    num_stages: int = 2
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_stages):
            x = jnp.repeat(x, 2, axis=1)
            x = Conv1d(
                self.channels,
                self.kernel_size,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.gelu(x)
        return x


class APCoupling(nn.Module):
    """Additive coupling (volume-preserving, log-det = 0) with FiLM-modulated
    translation and a zero-initialised output conv (reference: vae.py:162-216
    — the zero init is PortaSpeech's stability trick)."""

    channels: int
    hidden_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: jnp.ndarray, reverse: bool = False
    ) -> jnp.ndarray:
        half = self.channels // 2
        x1, x2 = jnp.split(x, 2, axis=-1)
        cond_embed = nn.Dense(half, dtype=self.dtype, name="cond_proj")(cond)
        cond_embed = nn.gelu(cond_embed)
        h = x1 + cond_embed
        h = Conv1d(
            self.hidden_channels, 3, dtype=self.dtype, name="net_pre"
        )(h)
        h = nn.gelu(h)
        t = Conv1d(
            half,
            1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="net_post",
        )(h)
        t = FiLM(half, dtype=self.dtype, name="film")(t, cond_embed)
        y2 = x2 - t if reverse else x2 + t
        return jnp.concatenate([x1, y2], axis=-1)


class VolumePreservingFlow(nn.Module):
    """Stack of additive couplings; exactly invertible
    (reference: vae.py:219-252)."""

    channels: int
    num_layers: int = 4
    hidden_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: jnp.ndarray, reverse: bool = False
    ) -> jnp.ndarray:
        layers = [
            APCoupling(
                self.channels,
                self.hidden_channels,
                dtype=self.dtype,
                name=f"ap_{i}",
            )
            for i in range(self.num_layers)
        ]
        for layer in reversed(layers) if reverse else layers:
            x = layer(x, cond, reverse=reverse)
        return x


class TextConditionedVAE(nn.Module):
    """Triple-conditioned VAE (reference: vae.py:255-497).

    ``__call__``: training/reconstruction path — posterior encode, sample,
    forward flow, decode. ``generate``: inference path — prior sample,
    inverse flow, decode. Mel layout is time-major [B, T, n_mels]; T must be
    a multiple of ``2**down_stages``.
    """

    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32
    # Rematerialize the WaveNet residual blocks in the backward pass
    # (jax.checkpoint via nn.remat): the blocks' GELU/FiLM/dropout
    # activations — the bulk of training memory at [B, T, C] per block —
    # are recomputed from each block's input instead of stored, trading
    # one extra forward per block for ~num_blocks× less activation HBM.
    # `deterministic` is a static argument (it selects python control
    # flow in nn.Dropout).
    remat: bool = False

    def setup(self):
        cfg = self.config
        block_cls = (
            nn.remat(WaveNetResBlock, static_argnums=(3,))
            if self.remat else WaveNetResBlock
        )
        self.in_proj = Conv1d(
            cfg.model_channels, 1, dtype=self.dtype, name="in_proj"
        )
        self.enc_blocks = [
            block_cls(
                cfg.model_channels,
                cfg.wavenet_kernel_size,
                dilation=2 ** (i % 4),
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"enc_block_{i}",
            )
            for i in range(cfg.num_wavenet_blocks)
        ]
        self.downsample = TemporalDownsample(
            cfg.model_channels, cfg.down_stages, 5, dtype=self.dtype,
            name="downsample",
        )
        self.down_cond_proj = Conv1d(
            cfg.model_channels, 1, dtype=self.dtype, name="down_cond_proj"
        )
        self.latent_mean_proj = nn.Dense(
            cfg.latent_dim, dtype=self.dtype, name="latent_mean_proj"
        )
        # Zero-initialised logvar head: posterior starts at N(mean, I)
        # (reference: vae.py:316-325).
        self.latent_logvar_proj = nn.Dense(
            cfg.latent_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="latent_logvar_proj",
        )
        self.flow = VolumePreservingFlow(
            cfg.latent_dim,
            cfg.flow_layers,
            cfg.flow_hidden,
            dtype=self.dtype,
            name="vpflow",
        )
        self.latent_dec_proj = nn.Dense(
            cfg.model_channels, dtype=self.dtype, name="latent_dec_proj"
        )
        self.dec_blocks = [
            block_cls(
                cfg.model_channels,
                cfg.wavenet_kernel_size,
                dilation=2 ** (i % 4),
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"dec_block_{i}",
            )
            for i in range(cfg.decoder_blocks)
        ]
        self.upsample = TemporalUpsample(
            cfg.model_channels, cfg.down_stages, 5, dtype=self.dtype,
            name="upsample",
        )
        self.out_proj = Conv1d(
            cfg.n_mels, 1, dtype=self.dtype, name="out_proj"
        )
        self.residual_proj = nn.Dense(
            cfg.cond_dim, dtype=self.dtype, name="residual_proj"
        )

    # -- shared pieces -------------------------------------------------------

    def _latent_cond(self, frame_cond: jnp.ndarray) -> jnp.ndarray:
        """Frame-level cond → latent-rate cond (reference: vae.py:360-364)."""
        return self.downsample(self.down_cond_proj(frame_cond))

    def _decode(
        self, z: jnp.ndarray, lat_cond: jnp.ndarray, deterministic: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.latent_dec_proj(z)
        for block in self.dec_blocks:
            d = block(d, lat_cond, deterministic)
        d_up = self.upsample(d)
        recon = self.out_proj(d_up)  # [B, T, n_mels]
        residual = self.residual_proj(d_up)  # [B, T, cond_dim]
        return recon, residual

    # -- training path -------------------------------------------------------

    def __call__(
        self,
        mel: jnp.ndarray,
        frame_cond: jnp.ndarray,
        deterministic: bool = True,
        return_u: bool = False,
    ):
        """Posterior encode + reconstruct (reference: vae.py:366-422).

        Args:
            mel: [B, T, n_mels] target mel (time-major).
            frame_cond: [B, T, cond_dim] frame-aligned text conditioning.
            return_u: additionally return ``u = flow(z)`` — the flow-prior
                image of the sampled latent, whose NLL trains the flow as
                the prior in ``flow_prior`` mode (losses.vae_loss).
        Returns:
            recon [B, T, n_mels], (mean, logvar) at latent rate, residual
            [B, T, cond_dim] — plus ``u`` when ``return_u``.
        """
        cfg = self.config
        h = self.in_proj(mel)
        for block in self.enc_blocks:
            h = block(h, frame_cond, deterministic)

        lat_cond = self._latent_cond(frame_cond)
        lat_h = self.downsample(h)

        mean = self.latent_mean_proj(lat_h)
        logvar = self.latent_logvar_proj(lat_h)

        if deterministic:
            z = mean  # eval: use the posterior mean (reference: vae.py:353-358)
        else:
            eps = jax.random.normal(
                self.make_rng("sample"), mean.shape, dtype=mean.dtype
            )
            z = mean + jnp.exp(0.5 * logvar) * eps

        u = self.flow(z, lat_cond, reverse=False)
        # flow_prior (PortaSpeech): decode the posterior sample itself —
        # the SAME space generate() decodes (flow⁻¹(N(0,I))); the flow
        # only shapes the prior. Reference mode: decode(flow(z)), kept
        # for converted-checkpoint parity (vae.py:401).
        z_dec = z if cfg.flow_prior else u
        recon, residual = self._decode(z_dec, lat_cond, deterministic)
        if return_u:
            return recon, (mean, logvar), residual, u
        return recon, (mean, logvar), residual

    # -- inference path ------------------------------------------------------

    def generate(
        self,
        frame_cond: jnp.ndarray,
        z_prior: Optional[jnp.ndarray] = None,
        temperature: float = 1.0,
    ):
        """Sample prior → inverse flow → decode (reference: vae.py:448-482).

        Args:
            frame_cond: [B, T, cond_dim]; T divisible by the down factor.
            z_prior: optional [B, T', latent_dim] latent override.
            temperature: prior stddev scale (new knob; 1.0 = reference).
        Returns:
            mel [B, T, n_mels], residual [B, T, cond_dim].
        """
        cfg = self.config
        lat_cond = self._latent_cond(frame_cond)
        if z_prior is None:
            b, tp = lat_cond.shape[0], lat_cond.shape[1]
            z_prior = temperature * jax.random.normal(
                self.make_rng("sample"),
                (b, tp, cfg.latent_dim),
                dtype=lat_cond.dtype,
            )
        z = self.flow(z_prior, lat_cond, reverse=True)
        return self._decode(z, lat_cond, deterministic=True)
