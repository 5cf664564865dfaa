"""Stacked self-attention with optional absolute/relative positions.

Parity: /root/reference/npf/architectures/selfattn.py:10-100 — a stack of
`n_attn_layers` (default 2) attenders, default "transformer", optional
sinusoidal positional encodings, final linear resize. Mask-aware: padded
points neither attend nor are attended to.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import init as winit
from .attention import get_attender
from .encoders import RelativeSinusoidalEncodings, SinusoidalEncodings


class SelfAttention(nn.Module):
    out_dim: Optional[int] = None
    n_attn_layers: int = 2
    attention: str = "transformer"
    positional: Optional[str] = None  # {"absolute", "relative", None}
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, positions=None, mask=None, **kwargs):
        x_dim = x.shape[-1]

        rel_pos_enc = None
        attender_kwargs = {}
        if self.positional == "absolute":
            x = x + SinusoidalEncodings(x_dim, name="pos_encoder")(positions)
        elif self.positional == "relative":
            rel_pos_enc = RelativeSinusoidalEncodings(x_dim, name="rel_pos_encoder")(
                positions, positions
            )
            attender_kwargs["is_relative_pos"] = True
        elif self.positional is not None:
            raise ValueError(f"Unknown positional={self.positional}")

        out = x
        for i in range(self.n_attn_layers):
            attender = get_attender(
                self.attention,
                x_dim,
                x_dim,
                x_dim,
                name=f"attn_{i}",
                dtype=self.dtype,
                **attender_kwargs,
            )
            if rel_pos_enc is not None:
                out = attender(out, out, out, mask_keys=mask, rel_pos_enc=rel_pos_enc)
            else:
                out = attender(out, out, out, mask_keys=mask)

        if self.out_dim is not None:
            out = nn.Dense(
                self.out_dim,
                kernel_init=winit.switchable(winit.xavier_uniform),
                dtype=self.dtype,
                name="resize",
            )(out)
        return out
