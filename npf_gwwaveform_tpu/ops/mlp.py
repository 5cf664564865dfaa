"""General MLP with the reference's hidden-size clamping and residual options.

Behavioral parity with /root/reference/npf/architectures/mlp.py:12-115:
hidden-size clamp rules (mlp.py:64-79), forward order
to_hidden -> act -> dropout -> (linear -> act -> +res -> dropout)* -> out
(mlp.py:95-109), kaiming-uniform hidden init + xavier output init
(mlp.py:111-115). Dtype note: matmuls run in the module dtype (bfloat16 by
default on TPU) with float32 params.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import init as winit


class _DenseParams(nn.Module):
    """Declare exactly nn.Dense's param tree ({kernel, bias}) without running
    its compute — the fused-kernel path reads the params and computes in one
    pallas_call, so checkpoints are interchangeable with the Dense path
    (same pattern as ops/cnn.py _BandedDepthwise)."""

    features: int
    kernel_init: Callable
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init, (in_features, self.features))
        b = (self.param("bias", winit.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


def _clamp_hidden(hidden_size, input_size, output_size, is_force_hid_smaller):
    if is_force_hid_smaller and hidden_size > max(output_size, input_size):
        return max(output_size, input_size)
    if hidden_size < min(output_size, input_size):
        return min(output_size, input_size)
    return hidden_size


class MLP(nn.Module):
    """n-hidden-layer MLP.

    Attributes mirror the reference constructor: `output_size`,
    `hidden_size=32`, `n_hidden_layers=1`, `activation`, `is_bias`, `dropout`,
    `is_force_hid_smaller`, `is_res`. Input size is inferred from the call.
    """

    output_size: int
    hidden_size: int = 32
    n_hidden_layers: int = 1
    activation: Callable = nn.relu
    is_bias: bool = True
    dropout: float = 0.0
    is_force_hid_smaller: bool = False
    is_res: bool = False
    dtype: Optional[jnp.dtype] = None
    # run the whole chain in one fused Pallas kernel (weights VMEM-resident,
    # no inter-layer HBM round trips — ops/pallas/mlp_chain_kernel.py).
    # Requires dropout == 0, relu activation, n_hidden_layers >= 1; param
    # tree is identical to the Dense path, so checkpoints interchange.
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        input_size = x.shape[-1]
        hidden_size = _clamp_hidden(
            self.hidden_size, input_size, self.output_size, self.is_force_hid_smaller
        )
        hid_init = winit.linear_init_for(self.activation)

        if (self.fused and self.dropout == 0 and self.n_hidden_layers >= 1
                and self.activation is nn.relu):
            from .pallas.mlp_chain_kernel import fused_relu_mlp

            w0, b0 = _DenseParams(
                hidden_size, hid_init, self.is_bias, name="to_hidden"
            )(input_size)
            pairs = [
                _DenseParams(hidden_size, hid_init, self.is_bias,
                             name=f"linear_{i}")(hidden_size)
                for i in range(self.n_hidden_layers - 1)
            ]
            if pairs:
                whs = jnp.stack([w for w, _ in pairs])
                bhs = (None if pairs[0][1] is None
                       else jnp.stack([b for _, b in pairs]))
            else:
                whs = jnp.zeros((0, hidden_size, hidden_size), jnp.float32)
                bhs = jnp.zeros((0, hidden_size), jnp.float32)
            wout, bout = _DenseParams(
                self.output_size, winit.mlp_out_init, self.is_bias, name="out"
            )(hidden_size)
            return fused_relu_mlp(
                x, w0, b0, whs, bhs, wout, bout,
                is_res=self.is_res, compute_dtype=self.dtype or x.dtype,
            )

        def dense(features, kernel_init, name):
            return nn.Dense(
                features,
                use_bias=self.is_bias,
                kernel_init=kernel_init,
                bias_init=winit.zeros,
                dtype=self.dtype,
                name=name,
            )

        out = dense(hidden_size, hid_init, "to_hidden")(x)
        out = self.activation(out)
        if self.dropout > 0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        x = out

        for i in range(self.n_hidden_layers - 1):
            out = dense(hidden_size, hid_init, f"linear_{i}")(x)
            out = self.activation(out)
            if self.is_res:
                out = out + x
            if self.dropout > 0:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
            x = out

        # intended: xavier (linear_init(None)); realized: kaiming-relu — the
        # one branch the reference actually reaches (mlp.py:115 passes the
        # STRING default "relu")
        return dense(self.output_size, winit.mlp_out_init, "out")(x)
