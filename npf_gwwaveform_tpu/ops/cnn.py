"""Depthwise-separable CNN stack for Conv[C|L]NP grid processing.

Parity targets: /root/reference/npf/architectures/cnn.py — `ConvBlock`
(:56-123), `ResConvBlock` (:126-215, pre-activation ResNet with the residual
added *before* the pointwise conv), `CNN` (:307-380), `UnetCNN` (:383-516,
channel doubling capped at `max_nchannels`, optional shared-bottleneck), and
`GaussianConv2d` (:24-53); plus `make_abs_conv` (npf/utils/helpers.py:316-331)
used by GridConvCNP's density-normalized context embedding.

TPU-first: everything is channel-LAST (the native XLA conv layout, no
channels_to_2nd_dim transposes), works for 1-D [B,L,C] and 2-D [B,H,W,C]
inputs alike, and depthwise+pointwise pairs are left for XLA to fuse.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import init as winit


def _norm_layer(norm: str, name: str, eps: float = 1e-3):
    """eps default is OUR training-stability bump (the reference's own
    ConvCNP notebook bumps BatchNorm eps after NaNs; torch's default is
    1e-5). For strict parity with the reference's pretrained 1-D
    checkpoints — trained at torch's default — pass eps=1e-5."""
    if norm in (None, "identity"):
        return lambda x, train=True: x
    if norm == "layer":
        ln = nn.LayerNorm(name=name)
        return lambda x, train=True: ln(x)
    if norm == "batch":
        bn = nn.BatchNorm(
            use_running_average=None, momentum=0.9, epsilon=eps, name=name
        )
        return lambda x, train=True: bn(x, use_running_average=not train)
    raise ValueError(f"Unknown norm={norm}")


class _BandedDepthwise(nn.Module):
    """Depthwise conv1d computed as per-channel banded [N, N] matmuls.

    A `feature_group_count=C` conv is 128 independent 1-in/1-out convs —
    near-zero MXU utilization on TPU. The identical linear map as a banded
    matrix contraction IS an MXU op (measured A/B:
    experiments/bench_depthwise.py, results/depthwise_bench.json). Params
    (`kernel` [k, 1, C], `bias` [C]) match the grouped `nn.Conv` it
    replaces, so checkpoints are interchangeable; outputs agree to dtype
    rounding. Zero-pad SAME only; O(N^2 * C) band memory — for moderate
    grids (the 192-768-pt induced grids), not the 6144-pt long-context
    regime."""

    kernel_size: int
    use_bias: bool = True
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 3, "banded depthwise is 1-D only"
        n, c = x.shape[-2], x.shape[-1]
        k, dil = self.kernel_size, self.dilation
        kernel = self.param("kernel", winit.kaiming_normal_fanout, (k, 1, c))
        # XLA convs are cross-correlations with SAME pad_low = ((k-1)*dil)//2
        # (asymmetric for even k): out[m] = sum_t x[m + t*dil - pad_low]*w[t]
        # => x[i] contributes to out[j] through tap t = (i - j + pad_low)/dil
        pad_low = ((k - 1) * dil) // 2
        diff = jnp.arange(n)[:, None] - jnp.arange(n)[None, :]
        num = diff + pad_low
        t = num // dil
        valid = (num % dil == 0) & (t >= 0) & (t < k)
        t = jnp.clip(t, 0, k - 1)
        band = jnp.where(valid[..., None], kernel[:, 0, :][t], 0.0)  # [n,n,c]
        dt = self.dtype or x.dtype
        y = jnp.einsum(
            "bnc,cnm->bmc", x.astype(dt), jnp.transpose(band, (2, 0, 1)).astype(dt)
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y + bias.astype(dt)
        return y


def depthwise_conv(kernel_size, use_bias, padding, dilation, dtype, name,
                   banded=False, n_spatial=1, in_chan=None):
    """The depthwise stage, in either lowering (same params either way)."""
    if banded and n_spatial == 1 and padding == "SAME":
        return _BandedDepthwise(
            kernel_size, use_bias=use_bias, dilation=dilation, dtype=dtype,
            name=name,
        )
    return nn.Conv(
        in_chan,
        kernel_size=(kernel_size,) * n_spatial,
        padding=padding,
        feature_group_count=in_chan,
        use_bias=use_bias,
        kernel_dilation=(dilation,) * n_spatial,
        kernel_init=winit.kaiming_normal_fanout,
        dtype=dtype,
        name=name,
    )


class DepthSepConv(nn.Module):
    """Depthwise conv then pointwise 1x1 (ref helpers.py:354-403).
    kernel_size is an int; spatial rank inferred from the input."""

    out_chan: int
    kernel_size: int
    use_bias: bool = True
    padding: str = "SAME"  # or "CIRCULAR" for periodic boundaries
    dilation: int = 1
    banded: bool = False  # MXU banded-matmul depthwise (1-D SAME only)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_spatial = x.ndim - 2
        in_chan = x.shape[-1]
        x = depthwise_conv(
            self.kernel_size,
            use_bias=self.use_bias,
            padding=self.padding,
            dilation=self.dilation,
            dtype=self.dtype,
            name="depthwise",
            banded=self.banded,
            n_spatial=n_spatial,
            in_chan=in_chan,
        )(x)
        return nn.Conv(
            self.out_chan,
            kernel_size=(1,) * n_spatial,
            use_bias=self.use_bias,
            kernel_init=winit.kaiming_normal_fanout,
            dtype=self.dtype,
            name="pointwise",
        )(x)


class ConvBlock(nn.Module):
    """norm -> act -> depth-sep conv (reference cnn.py:56-123)."""

    out_chan: int
    kernel_size: int = 5
    norm: Optional[str] = None
    activation: Callable = nn.relu
    padding: str = "SAME"
    norm_eps: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = _norm_layer(self.norm, "norm", self.norm_eps)(x, train)
        x = self.activation(x)
        return DepthSepConv(
            self.out_chan, self.kernel_size, padding=self.padding,
            dtype=self.dtype, name="conv"
        )(x)


class ResConvBlock(nn.Module):
    """Pre-activation residual depthwise-separable block
    (reference cnn.py:126-215). The residual joins BEFORE the pointwise conv
    so the block can change channel count."""

    out_chan: int
    kernel_size: int = 5
    norm: Optional[str] = None
    activation: Callable = nn.relu
    n_conv_layers: int = 1
    is_bias: bool = True
    padding: str = "SAME"  # "CIRCULAR" gives full translation equivariance
    norm_eps: float = 1e-3
    dilation: int = 1
    banded: bool = False  # MXU banded-matmul depthwise (1-D SAME only)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert self.n_conv_layers in (1, 2)
        if self.kernel_size % 2 == 0:
            raise ValueError(f"kernel_size={self.kernel_size} must be odd")
        n_spatial = x.ndim - 2
        in_chan = x.shape[-1]

        out = x
        if self.n_conv_layers == 2:
            out = _norm_layer(self.norm, "norm1", self.norm_eps)(out, train)
            out = self.activation(out)
            out = DepthSepConv(
                in_chan,
                self.kernel_size,
                use_bias=self.is_bias,
                padding=self.padding,
                dilation=self.dilation,
                banded=self.banded,
                dtype=self.dtype,
                name="conv1",
            )(out)

        out = _norm_layer(self.norm, "norm2", self.norm_eps)(out, train)
        out = self.activation(out)
        out = depthwise_conv(
            self.kernel_size,
            use_bias=self.is_bias,
            padding=self.padding,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv2_depthwise",
            banded=self.banded,
            n_spatial=n_spatial,
            in_chan=in_chan,
        )(out)
        out = out + x  # residual before pointwise (cnn.py:212-213)
        return nn.Conv(
            self.out_chan,
            kernel_size=(1,) * n_spatial,
            use_bias=self.is_bias,
            kernel_init=winit.kaiming_normal_fanout,
            dtype=self.dtype,
            name="conv2_pointwise",
        )(out)


class ResNormalizedConvBlock(nn.Module):
    """Residual block with NORMALIZED convolutions (Knutsson & Westin 1993),
    parity with reference cnn.py:218-304: the input carries 2*C channels —
    first half signal, second half confidence in [0,1]. The signal path is
    divided by a confidence "density" (the same convs applied to confidence),
    the confidence is monotonically increased through a learned
    sigmoid(density * softplus(temperature) + bias), and both halves go
    through the shared pointwise conv. No normalization layers by design
    (the reference forces Normalization=Identity).

    Output: 2*out_chan channels ([signal', confidence']).
    """

    out_chan: int
    kernel_size: int = 5
    activation: Callable = nn.relu
    is_bias: bool = True
    padding: str = "SAME"
    norm: Optional[str] = None  # accepted for CNN compat; must be None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.norm not in (None, "identity"):
            raise ValueError("ResNormalizedConvBlock forbids normalization")
        if self.kernel_size % 2 == 0:
            raise ValueError(f"kernel_size={self.kernel_size} must be odd")
        n_spatial = x.ndim - 2
        in_chan = x.shape[-1] // 2

        signal, conf_1 = jnp.split(x, 2, axis=-1)
        # confidence must stay in [0,1] (may drift via pointwise transforms)
        conf_1 = jnp.clip(conf_1, 0.0, 1.0)
        x_s = signal * conf_1

        conv1 = DepthSepConv(
            in_chan,
            self.kernel_size,
            use_bias=self.is_bias,
            padding=self.padding,
            dtype=self.dtype,
            name="conv1",
        )
        conv2_depthwise = nn.Conv(
            in_chan,
            kernel_size=(self.kernel_size,) * n_spatial,
            padding=self.padding,
            feature_group_count=in_chan,
            use_bias=self.is_bias,
            kernel_init=winit.kaiming_normal_fanout,
            dtype=self.dtype,
            name="conv2_depthwise",
        )
        conv2_pointwise = nn.Conv(
            self.out_chan,
            kernel_size=(1,) * n_spatial,
            use_bias=self.is_bias,
            kernel_init=winit.kaiming_normal_fanout,
            dtype=self.dtype,
            name="conv2_pointwise",
        )

        numerator = conv1(self.activation(x_s))
        numerator = conv2_depthwise(self.activation(numerator))
        density = conv2_depthwise(conv1(conf_1))
        out = numerator / jnp.clip(density, 1e-5)

        # learned monotone confidence update (ref cnn.py:295-299);
        # temperature ~ U(-0.05, 0.05), bias = 0 (ref reset_parameters)
        temperature = self.param(
            "temperature",
            lambda k, s: jax.random.uniform(k, s, minval=-0.05, maxval=0.05),
            (1,),
        )
        bias = self.param("bias", winit.zeros, (1,))
        conf_2 = conf_1 + jax.nn.sigmoid(
            density * jax.nn.softplus(temperature) + bias
        )
        conf_2 = jnp.clip(conf_2, None, 1.0)

        out = out + x_s  # residual before pointwise
        out = conv2_pointwise(out)
        conf_2 = conv2_pointwise(conf_2)
        return jnp.concatenate([out, conf_2], axis=-1)


def _channel_list(n_channels: Union[int, Sequence[int]], n_blocks: int):
    if isinstance(n_channels, int):
        chans = [n_channels] * (n_blocks + 1)
    else:
        chans = list(n_channels)
    assert len(chans) == n_blocks + 1, f"{len(chans)} != {n_blocks + 1}"
    return chans


class CNN(nn.Module):
    """Sequential stack of ConvBlocks, channel-last (reference cnn.py:307-380).

    `dilations` (one per block, e.g. (1, 1, 2, 4, 8)) makes the stack
    MULTI-SCALE: undilated early blocks keep full grid resolution while
    dilated later blocks extend the physical receptive field without the
    smoothing a wider kernel causes — the fix for the resolution-vs-RF
    trade-off seen on dense induced grids (RESULTS.md GW d128 analysis).
    Dilation is an extension over the reference (its CNN is undilated);
    default None preserves exact reference behavior."""

    n_channels: Union[int, Sequence[int]]
    n_blocks: int = 3
    kernel_size: int = 5
    norm: Optional[str] = None
    padding: str = "SAME"
    dilations: Optional[Sequence[int]] = None
    ConvBlockModule: Callable[..., nn.Module] = ResConvBlock
    block_kwargs: Optional[dict] = None
    # rematerialize each block on the backward pass (jax.checkpoint): block
    # activations are recomputed instead of stored, cutting peak HBM by
    # ~n_blocks x activation size in the long-waveform / dense-grid regime
    # at the cost of one extra forward per block. Numerics are unchanged.
    remat: bool = False
    # MXU banded-matmul lowering of the depthwise convs (see
    # _BandedDepthwise). Only passed to blocks when True so block modules
    # without the field keep working.
    banded: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        chans = _channel_list(self.n_channels, self.n_blocks)
        if self.dilations is not None and len(self.dilations) != self.n_blocks:
            raise ValueError(
                f"dilations {self.dilations} must have n_blocks={self.n_blocks} entries"
            )
        Block = self.ConvBlockModule
        if self.remat:
            # `train` (arg 2 counting self) must stay static under the
            # lifted checkpoint — it selects the BatchNorm branch
            Block = nn.remat(Block, static_argnums=(2,))
        for i, out_chan in enumerate(chans[1:]):
            dil = {} if self.dilations is None else {"dilation": int(self.dilations[i])}
            if self.banded:
                dil["banded"] = True
            x = Block(
                out_chan,
                kernel_size=self.kernel_size,
                norm=self.norm,
                padding=self.padding,
                dtype=self.dtype,
                name=f"block_{i}",
                **dil,
                **(self.block_kwargs or {}),
            )(x, train)
        return x


class UnetCNN(nn.Module):
    """U-Net over the grid (reference cnn.py:383-516): down blocks with
    max-pool, bottleneck, up blocks with linear upsampling + skip concat.
    Channel count doubles per down level, capped at `max_nchannels`."""

    n_channels: Union[int, Sequence[int]]
    n_blocks: int = 5
    kernel_size: int = 5
    norm: Optional[str] = None
    max_nchannels: int = 256
    pooling_size: int = 2
    is_force_same_bottleneck: bool = False
    ConvBlockModule: Callable[..., nn.Module] = ResConvBlock
    block_kwargs: Optional[dict] = None
    remat: bool = False  # see CNN.remat
    dtype: Optional[jnp.dtype] = None

    def _in_out_channels(self):
        assert self.n_blocks % 2 == 1, f"n_blocks={self.n_blocks} not odd"
        if isinstance(self.n_channels, int):
            chans = [2**i * self.n_channels for i in range(self.n_blocks // 2 + 1)]
            chans = chans + chans[::-1]
            chans = (
                chans[:1] + [min(c, self.max_nchannels) for c in chans[1:-1]] + chans[-1:]
            )
        else:
            chans = list(self.n_channels)
        return list(zip(chans, chans[1:]))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_out = self._in_out_channels()
        n_down = self.n_blocks // 2
        n_spatial = x.ndim - 2

        Block = self.ConvBlockModule
        if self.remat:
            Block = nn.remat(Block, static_argnums=(2,))

        def block(i, out_chan, x):
            return Block(
                out_chan,
                kernel_size=self.kernel_size,
                norm=self.norm,
                dtype=self.dtype,
                name=f"block_{i}",
                **(self.block_kwargs or {}),
            )(x, train)

        residuals = []
        for i in range(n_down):
            x = block(i, in_out[i][1], x)
            residuals.append(x)
            x = nn.max_pool(
                x,
                window_shape=(self.pooling_size,) * n_spatial,
                strides=(self.pooling_size,) * n_spatial,
            )

        x = block(n_down, in_out[n_down][1], x)

        if self.is_force_same_bottleneck and train:
            # average bottlenecks of paired samples of the same function
            # (reference cnn.py:466-475); first/second half of batch pair up
            b = x.shape[0]
            x_mean = 0.5 * (x[: b // 2] + x[b // 2 :])
            x = jnp.concatenate([x_mean, x_mean], axis=0)

        for i in range(n_down + 1, self.n_blocks):
            new_spatial = tuple(s * self.pooling_size for s in x.shape[1:-1])
            x = jax.image.resize(
                x, (x.shape[0], *new_spatial, x.shape[-1]), method="linear"
            )
            x = jnp.concatenate([x, residuals[n_down - i]], axis=-1)
            x = block(i, in_out[i][1], x)
        return x


class GaussianConv2d(nn.Module):
    """Learned separable Gaussian blur (reference cnn.py:24-53)."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.kernel_size % 2 == 1
        w_x = self.param("weights_x", winit.ones, (1,))
        w_y = self.param("weights_y", winit.ones, (1,))
        half = self.kernel_size // 2
        exponent = -((jnp.arange(self.kernel_size, dtype=jnp.float32) - half) ** 2)
        mx = jax.nn.softmax(exponent * w_x)
        my = jax.nn.softmax(exponent * w_y)
        filt = jnp.outer(mx, my)  # [k, k]
        in_chan = x.shape[-1]
        # depthwise conv: HWIO kernel [k,k,1,in_chan] with groups=in_chan
        kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, in_chan))
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=in_chan,
        )


class AbsConv(nn.Module):
    """Depthwise conv with |weights| — a nonnegative smoothing kernel usable
    as a density estimator (ref make_abs_conv, npf/utils/helpers.py:316-331).
    Used by GridConvCNP's context-to-induced embedding (gridconvnp.py:83-90).
    """

    kernel_size: int = 11
    use_bias: bool = False
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_spatial = x.ndim - 2
        in_chan = x.shape[-1]
        kernel = self.param(
            "kernel",
            winit.kaiming_normal_fanout,
            (self.kernel_size,) * n_spatial + (1, in_chan),
        )
        if self.padding == "CIRCULAR":
            # periodic boundary (ref CircularPad2d + make_padded_conv,
            # npf/utils/helpers.py:334-406): wrap-pad then VALID conv
            p = self.kernel_size // 2
            pads = ((0, 0),) + ((p, p),) * n_spatial + ((0, 0),)
            x = jnp.pad(x, pads, mode="wrap")
            pad_arg = "VALID"
        else:
            pad_arg = self.padding
        dn_in = "NWC" if n_spatial == 1 else "NHWC"
        dn_k = "WIO" if n_spatial == 1 else "HWIO"
        return jax.lax.conv_general_dilated(
            x,
            jnp.abs(kernel).astype(x.dtype),
            window_strides=(1,) * n_spatial,
            padding=pad_arg,
            dimension_numbers=(dn_in, dn_k, dn_in),
            feature_group_count=in_chan,
        )
