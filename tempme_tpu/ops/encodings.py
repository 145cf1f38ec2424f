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
