"""Time encodings shared by all models.

Two families exist in the reference:

* Bochner-style with a trainable frequency vector: ``cos(t * w + phi)``,
  w init 1/10^linspace(0,9,d) (TGAT/TGAT.py:220-241, models/explainer.py:45-59)
* linear-cos: ``cos(W t + b)`` with W: 1->d initialized the same way, trainable
  in TGN (TGN/modules/embedding_module.py:90-102) and frozen in GraphMixer
  (GraphM/graphmixer.py:21-50,90).

Both reduce to cos(t * w + b); they differ only in trainability, so one module
with a ``trainable`` switch covers all three uses.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def _freq_init(dim: int) -> np.ndarray:
    return (1.0 / 10 ** np.linspace(0, 9, dim)).astype(np.float32)


class TimeEncode(nn.Module):
    """cos(t * w + b) time encoding. Input [..., L] -> output [..., L, dim]."""
    dim: int
    trainable: bool = True

    @nn.compact
    def __call__(self, ts: jnp.ndarray) -> jnp.ndarray:
        w_init = _freq_init(self.dim)
        if self.trainable:
            w = self.param("freq", lambda k: jnp.asarray(w_init))
            b = self.param("phase", lambda k: jnp.zeros((self.dim,), jnp.float32))
        else:
            w = jnp.asarray(w_init)
            b = jnp.zeros((self.dim,), jnp.float32)
        return jnp.cos(ts[..., None] * w + b)


class PosEncode(nn.Module):
    """Order-based positional encoding (reference ``PosEncode``,
    TGAT/TGAT.py:244-255): embeds ``ts.argsort()`` per row through an
    ``nn.Embedding(seq_len, dim)`` — exact reference semantics, including the
    quirk that argsort output (sorting *indices*, not ranks) is what gets
    embedded. Input [..., L] -> [..., L, dim]; requires L <= seq_len (the
    reference's nn.Embedding would raise an index error past that)."""
    dim: int
    seq_len: int

    @nn.compact
    def __call__(self, ts: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "pos_table", nn.initializers.normal(stddev=0.02),
            (self.seq_len, self.dim))
        length = ts.shape[-1]
        assert length <= self.seq_len, (
            f"PosEncode: sequence length {length} exceeds seq_len "
            f"{self.seq_len}")
        order = jnp.argsort(ts, axis=-1)            # [..., L] ints < L
        return table[order]                         # [..., L, dim]


class EmptyEncode(nn.Module):
    """Zero time encoding (reference ``EmptyEncode``, TGAT/TGAT.py:258-266):
    ablates temporal information entirely."""
    dim: int

    @nn.compact
    def __call__(self, ts: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(ts.shape + (self.dim,), jnp.float32)


def make_time_encoder(method: str, dim: int, seq_len: int = 64,
                      trainable: bool = True, name: str = "time_encoder"):
    """Factory over the reference's ``use_time`` flag values
    ('time' | 'pos' | 'empty', TGAT/TGAT.py:435-445)."""
    if method == "time":
        return TimeEncode(dim=dim, trainable=trainable, name=name)
    if method == "pos":
        return PosEncode(dim=dim, seq_len=seq_len, name=name)
    if method == "empty":
        return EmptyEncode(dim=dim, name=name)
    raise ValueError(f"unknown time encoding method: {method!r}")
