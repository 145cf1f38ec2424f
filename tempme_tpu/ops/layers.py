"""Small shared layers: merge/affinity heads, feed-forward, MLP-mixer block.

Initializer choices mirror the reference (xavier_normal on merge weights,
TGAT/TGAT.py:19-22; qkv projections N(0, sqrt(2/(d_in+d_k))),
TGAT/TGAT.py:96-98) so training dynamics are comparable.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

xavier_normal = nn.initializers.xavier_normal()


class GatedMerge(nn.Module):
    """Two-branch merge with optional per-item rescale of the first branch
    (reference ``MergeLayer``, TGAT/TGAT.py:9-34):
    out = fc22(relu(fc12(x2))) + fc21(relu(fc11(x1))) * explain_weight.
    """
    dim3: int
    dim4: int

    @nn.compact
    def __call__(self, x1, x2, explain_weight: Optional[jnp.ndarray] = None):
        x21 = nn.Dense(self.dim4, kernel_init=xavier_normal, name="fc21")(
            nn.relu(nn.Dense(self.dim3, kernel_init=xavier_normal, name="fc11")(x1)))
        x22 = nn.Dense(self.dim4, kernel_init=xavier_normal, name="fc22")(
            nn.relu(nn.Dense(self.dim3, kernel_init=xavier_normal, name="fc12")(x2)))
        if explain_weight is not None:
            x21 = x21 * explain_weight[..., None]
        return x22 + x21


class ConcatMerge(nn.Module):
    """concat -> MLP -> out (reference ``MergeLayer_final`` / TGN MergeLayer,
    TGAT/TGAT.py:37-52, TGN/modules/utils.py:6-19)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        h = nn.relu(nn.Dense(self.hidden, kernel_init=xavier_normal, name="fc1")(x))
        return nn.Dense(self.out, kernel_init=xavier_normal, name="fc2")(h)


class FeedForward(nn.Module):
    """Two-layer GELU FFN with dropout (GraphM/graphmixer.py:237-264)."""
    dim: int
    expansion: float
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(int(self.expansion * self.dim))(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class MixerBlock(nn.Module):
    """Token-mix + channel-mix MLP-mixer block with optional explain-weight
    gating at the reference's three injection points
    (GraphM/graphmixer.py:267-316)."""
    num_tokens: int
    num_channels: int
    token_expansion: float = 0.5
    channel_expansion: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, explain_weights: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # x: [B, tokens, channels]; explain_weights: [B, tokens]
        if explain_weights is not None:
            x = x * explain_weights[..., None]
        h = nn.LayerNorm(epsilon=1e-5, name="token_norm")(jnp.swapaxes(x, 1, 2))
        h = FeedForward(self.num_tokens, self.token_expansion, self.dropout,
                        name="token_ffn")(h, deterministic)
        h = jnp.swapaxes(h, 1, 2)
        if explain_weights is not None:
            h = h * explain_weights[..., None]
        x = h + x
        h = nn.LayerNorm(epsilon=1e-5, name="channel_norm")(x)
        h = FeedForward(self.num_channels, self.channel_expansion, self.dropout,
                        name="channel_ffn")(h, deterministic)
        if explain_weights is not None:
            h = h * explain_weights[..., None]
        return h + x
