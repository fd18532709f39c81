"""Conv blocks (channel-last NHWC — the TPU-native layout).

Parity: reference `cflearn/modules/core/convs/` — `Conv2d` (gain/scale
support, `basic.py:41`), `DepthWiseConv2d` (:187), `Interpolate` (:312),
`UpsampleConv2d` (:328), attention blocks `CABlock`/`ECABlock`/`SEBlock`
(:389-460), residual blocks (`residual.py` — `ResidualBlock`,
`ResidualBlockWithTimeEmbedding`, the diffusion-UNet resblock).
"""

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import zero_module
from ...ops.conv import conv_call
from ...ops.group_norm import gn_call
from .activations import build_activation

_Pad = Union[str, int, Tuple[int, int]]


def _norm_padding(padding: _Pad) -> Any:
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    return [tuple(padding), tuple(padding)]


class Conv2d(nnx.Module):
    """2D conv with optional weight gain/scale + circular padding support
    (reference `convs/basic.py:41`; circular mode backs the diffusion API's
    tiling feature, `api/multimodal/diffusion.py:1258`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        *,
        kernel_size: int = 3,
        stride: int = 1,
        padding: _Pad = "same",
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
        gain: float = 1.0,
        weight_scale: Optional[float] = None,
        transform_kernel: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        self.padding_mode = "zeros"
        self.conv = nnx.Conv(
            in_channels,
            out_channels,
            kernel_size=(kernel_size, kernel_size),
            strides=(stride, stride),
            padding=_norm_padding(padding),
            kernel_dilation=(dilation, dilation),
            feature_group_count=groups,
            use_bias=bias,
            rngs=rngs,
        )
        # reference semantics (`convs/basic.py:41`): `gain` is an INIT gain
        # (xavier-normal), `weight_scale` is the runtime multiplier — gain
        # must not scale activations every forward pass
        if gain != 1.0:
            fan_in = in_channels * kernel_size * kernel_size // groups
            fan_out = out_channels * kernel_size * kernel_size // groups
            std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
            k = self.conv.kernel[...]
            self.conv.kernel[...] = std * jax.random.normal(rngs.params(), k.shape, k.dtype)
        self.weight_scale = weight_scale
        self.transform_kernel = transform_kernel

    def set_circular(self, circular: bool) -> None:
        self.padding_mode = "circular" if circular else "zeros"

    def _kernel(self) -> jax.Array:
        k = self.conv.kernel[...]
        if self.transform_kernel:
            # [1,2,1]/4 smoothing via 4 shifted copies (reference :147-151)
            k = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
            k = (k[1:, 1:] + k[:-1, 1:] + k[1:, :-1] + k[:-1, :-1]) / 4.0
        return k

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.transform_kernel or self.padding_mode == "circular":
            kernel = self._kernel()
            if self.padding_mode == "circular":
                kh, kw = kernel.shape[:2]
                x = jnp.pad(
                    x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)), mode="wrap"
                )
                padding: Any = "VALID"
            else:
                padding = self.conv.padding
                if isinstance(padding, str):
                    padding = padding.upper()
            out = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=self.conv.strides,
                padding=padding,
                rhs_dilation=self.conv.kernel_dilation,
                feature_group_count=self.conv.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.conv.bias is not None:
                out = out + self.conv.bias[...]
        else:
            out = conv_call(self.conv, x)
        if self.weight_scale is not None:
            out = out * self.weight_scale
        return out


class DepthWiseConv2d(nnx.Module):
    """Depthwise conv, no pointwise stage (reference `convs/basic.py:187`
    is a single groups=dim conv — an extra pointwise layer would have no
    checkpoint counterpart)."""

    def __init__(self, dim: int, *, kernel_size: int = 3, rngs: nnx.Rngs) -> None:
        self.depth_wise = nnx.Conv(
            dim,
            dim,
            kernel_size=(kernel_size, kernel_size),
            padding="SAME",
            feature_group_count=dim,
            rngs=rngs,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.depth_wise(x)


class Interpolate(nnx.Module):
    """Resize by factor (reference `convs/basic.py:312`)."""

    def __init__(self, factor: float = 2.0, mode: str = "nearest", *, rngs: Optional[nnx.Rngs] = None) -> None:
        self.factor = factor
        self.mode = mode

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        new_shape = (b, int(round(h * self.factor)), int(round(w * self.factor)), c)
        return jax.image.resize(x, new_shape, method=self.mode)


def interpolate(x: jax.Array, *, factor: Optional[float] = None, size: Optional[Tuple[int, int]] = None, mode: str = "nearest") -> jax.Array:
    b, h, w, c = x.shape
    if size is None:
        assert factor is not None
        size = (int(round(h * factor)), int(round(w * factor)))
    return jax.image.resize(x, (b, size[0], size[1], c), method=mode)


class UpsampleConv2d(nnx.Module):
    """Nearest-upsample + conv (reference `convs/basic.py:328`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        *,
        kernel_size: int = 3,
        factor: float = 2.0,
        mode: str = "nearest",
        bias: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.factor = factor
        self.mode = mode
        self.conv = Conv2d(
            in_channels, out_channels, kernel_size=kernel_size, padding="same", bias=bias, rngs=rngs
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.factor != 1.0:
            x = interpolate(x, factor=self.factor, mode=self.mode)
        return self.conv(x)


class Downsample(nnx.Module):
    """Strided-conv (or avg-pool) downsample.

    Padding conventions differ across the reference stacks: the SD VAE
    encoder pads asymmetrically (0,1,0,1) (`encoder/attn.py:25`), while the
    SD UNet's `ResDownsample` uses a symmetric padding=1 stride-2 conv
    (`core/convs/residual.py:94`). Default stays the VAE convention;
    the UNet passes `symmetric=True`."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        *,
        use_conv: bool = True,
        symmetric: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        out_channels = out_channels or in_channels
        self.use_conv = use_conv
        if use_conv:
            pad = (1, 1) if symmetric else (0, 1)
            self.conv = nnx.Conv(
                in_channels,
                out_channels,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=[pad, pad],
                rngs=rngs,
            )
        else:
            self.conv = None

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return self.conv(x)
        return nnx.avg_pool(x, (2, 2), strides=(2, 2))


class SEBlock(nnx.Module):
    """Squeeze-excite (reference `convs/basic.py:460`)."""

    def __init__(self, in_channels: int, latent_channels: int, *, rngs: nnx.Rngs) -> None:
        self.down = nnx.Linear(in_channels, latent_channels, rngs=rngs)
        self.up = nnx.Linear(latent_channels, in_channels, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = jnp.mean(x, axis=(1, 2))
        w = jax.nn.relu(self.down(w))
        w = jax.nn.sigmoid(self.up(w))
        return x * w[:, None, None, :]


class ECABlock(nnx.Module):
    """Efficient channel attention (reference `convs/basic.py:424`)."""

    def __init__(self, kernel_size: int = 3, *, rngs: nnx.Rngs) -> None:
        self.conv = nnx.Conv(1, 1, kernel_size=(kernel_size,), padding="SAME", use_bias=False, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = jnp.mean(x, axis=(1, 2))[:, :, None]  # (B, C, 1)
        w = self.conv(w)[:, :, 0]
        w = jax.nn.sigmoid(w)
        return x * w[:, None, None, :]


class CABlock(nnx.Module):
    """Coordinate Attention (reference `convs/basic.py:389` — separate H/W
    pooled paths through a shared bottleneck, per-row and per-column sigmoid
    gates; NOT plain channel attention)."""

    def __init__(self, num_channels: int, reduction: int = 32, *, rngs: nnx.Rngs) -> None:
        latent = max(8, num_channels // reduction)
        self.conv_in = nnx.Conv(num_channels, latent, kernel_size=(1, 1), rngs=rngs)
        self.norm = nnx.BatchNorm(latent, rngs=rngs)
        self.conv_h = nnx.Conv(latent, num_channels, kernel_size=(1, 1), rngs=rngs)
        self.conv_w = nnx.Conv(latent, num_channels, kernel_size=(1, 1), rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        net_h = jnp.mean(x, axis=2, keepdims=True)  # (b, h, 1, c)
        net_w = jnp.mean(x, axis=1, keepdims=True)  # (b, 1, w, c)
        net_w_t = net_w.transpose(0, 2, 1, 3)  # (b, w, 1, c)
        net = jnp.concatenate([net_h, net_w_t], axis=1)  # (b, h+w, 1, c)
        net = self.conv_in(net)
        net = self.norm(net)
        net = _h_swish(net)
        gate_h, gate_w = net[:, :h], net[:, h:]
        gate_h = jax.nn.sigmoid(self.conv_h(gate_h))  # (b, h, 1, c)
        gate_w = jax.nn.sigmoid(self.conv_w(gate_w)).transpose(0, 2, 1, 3)  # (b, 1, w, c)
        return x * gate_h * gate_w


def _h_swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.relu6(x + 3.0) / 6.0


class ResidualBlock(nnx.Module):
    """GroupNorm→SiLU→conv ×2 with skip (reference `convs/residual.py`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        *,
        dropout: float = 0.0,
        num_groups: int = 32,
        eps: float = 1e-6,
        rngs: nnx.Rngs,
    ) -> None:
        out_channels = out_channels or in_channels
        self.norm1 = nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=eps, rngs=rngs)
        self.conv1 = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.norm2 = nnx.GroupNorm(out_channels, num_groups=num_groups, epsilon=eps, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None
        # NOT zero-initialized: only the time-embedding UNet resblock zeros
        # its conv2 in the reference (`residual.py:202`)
        self.conv2 = nnx.Conv(out_channels, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        if in_channels != out_channels:
            self.shortcut = nnx.Conv(in_channels, out_channels, kernel_size=(1, 1), rngs=rngs)
        else:
            self.shortcut = None

    def __call__(self, x: jax.Array) -> jax.Array:
        net = gn_call(self.norm1, x, silu=True)
        net = conv_call(self.conv1, net)
        net = gn_call(self.norm2, net, silu=True)
        if self.dropout is not None:
            net = self.dropout(net)
        net = conv_call(self.conv2, net)
        skip = x if self.shortcut is None else self.shortcut(x)
        return skip + net


class ResidualBlockWithTimeEmbedding(nnx.Module):
    """Diffusion-UNet resblock: time embedding injected between the convs
    (reference `convs/residual.py` — used by `UNetDiffuser`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        *,
        time_embed_dim: int,
        dropout: float = 0.0,
        num_groups: int = 32,
        eps: float = 1e-5,
        use_scale_shift_norm: bool = False,
        up: bool = False,
        down: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        out_channels = out_channels or in_channels
        self.use_scale_shift_norm = use_scale_shift_norm
        # reference openaimodel ResBlock up/down: resample BOTH the hidden
        # branch (after norm+act) and the skip, conv-free (avg-pool / nearest)
        self.up = up
        self.down = down
        self.norm1 = nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=eps, rngs=rngs)
        self.conv1 = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        embed_out = 2 * out_channels if use_scale_shift_norm else out_channels
        self.time_proj = nnx.Linear(time_embed_dim, embed_out, rngs=rngs)
        self.norm2 = nnx.GroupNorm(out_channels, num_groups=num_groups, epsilon=eps, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None
        # zero-initialized (reference `residual.py:202` zero_module): the
        # residual branch starts as identity — from-scratch training parity
        self.conv2 = zero_module(
            nnx.Conv(out_channels, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        )
        if in_channels != out_channels:
            self.shortcut = nnx.Conv(in_channels, out_channels, kernel_size=(1, 1), rngs=rngs)
        else:
            self.shortcut = None

    @staticmethod
    def _down2(net: jax.Array) -> jax.Array:
        return jax.lax.reduce_window(
            net, jnp.zeros((), net.dtype), jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * jnp.asarray(0.25, net.dtype)

    @staticmethod
    def _up2(net: jax.Array) -> jax.Array:
        b, h, w, c = net.shape
        return jax.image.resize(net, (b, h * 2, w * 2, c), "nearest")

    def __call__(self, x: jax.Array, time_embed: jax.Array) -> jax.Array:
        net = gn_call(self.norm1, x, silu=True)
        if self.down:
            net, x = self._down2(net), self._down2(x)
        elif self.up:
            net, x = self._up2(net), self._up2(x)
        net = conv_call(self.conv1, net)
        emb = self.time_proj(jax.nn.silu(time_embed))[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb, 2, axis=-1)
            net = gn_call(self.norm2, net) * (1.0 + scale) + shift
            net = jax.nn.silu(net)
        else:
            net = net + emb
            net = gn_call(self.norm2, net, silu=True)
        if self.dropout is not None:
            net = self.dropout(net)
        net = conv_call(self.conv2, net)
        skip = x if self.shortcut is None else self.shortcut(x)
        return skip + net


class GaussianBlur3(nnx.Module):
    """Fixed depthwise [1,2,1]⊗[1,2,1]/16 blur (reference
    `convs/basic.py:27`)."""

    def __init__(self, in_channels: int, *, rngs: Optional[nnx.Rngs] = None) -> None:
        base = jnp.array([1.0, 2.0, 1.0])
        kernel = base[:, None] * base[None, :] / 16.0
        # HWIO, one group per channel
        self.kernel = nnx.Variable(jnp.tile(kernel[:, :, None, None], (1, 1, 1, in_channels)))
        self.in_channels = in_channels

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.lax.conv_general_dilated(
            x,
            self.kernel[...].astype(x.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.in_channels,
        )


def conv_nd(n: int, in_channels: int, out_channels: int, kernel_size: int, *, stride: int = 1, padding: Union[int, str] = 0, rngs: nnx.Rngs, **kwargs: Any) -> nnx.Module:
    """Rank-n convolution (reference `convs/basic.py:519`). NHWC-family
    layouts (channels-last)."""
    if isinstance(padding, int):
        pad: Any = [(padding, padding)] * n
    else:
        pad = padding
    return nnx.Conv(
        in_channels,
        out_channels,
        kernel_size=(kernel_size,) * n,
        strides=(stride,) * n,
        padding=pad,
        rngs=rngs,
        **kwargs,
    )


def get_conv_blocks(
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    stride: int,
    *,
    bias: bool = True,
    norm_type: Optional[str] = None,
    norm_kwargs: Optional[Any] = None,
    activation: Optional[Any] = None,
    pre_activate: bool = False,
    rngs: nnx.Rngs,
    **conv2d_kwargs: Any,
) -> Any:
    """[conv, norm?, activation?] (or pre-activated order) — reference
    `convs/basic.py:529`. Returns a list of callables; compose with
    `toolkit.misc.Sequential` or apply in order."""
    from .norms import NormFactory

    conv = Conv2d(
        in_channels,
        out_channels,
        kernel_size=kernel_size,
        stride=stride,
        bias=bias,
        rngs=rngs,
        **conv2d_kwargs,
    )
    blocks: list = []
    if not pre_activate:
        blocks.append(conv)
    if norm_type is not None and norm_type != "none":
        factory = NormFactory(norm_type)
        norm_dim = in_channels if pre_activate else out_channels
        blocks.append(factory.make(norm_dim, rngs=rngs, **(norm_kwargs or {})))
    if activation is not None:
        if isinstance(activation, str):
            activation = build_activation(activation, rngs=rngs)
        blocks.append(activation)
    if pre_activate:
        blocks.append(conv)
    return blocks


class ResDownsample(nnx.Module):
    """Symmetric stride-2 conv (or avg-pool) downsample with the reference
    UNet signature (reference `convs/residual.py:86`)."""

    def __init__(
        self,
        in_channels: int,
        use_conv: bool,
        *,
        out_channels: Optional[int] = None,
        padding: int = 1,
        rngs: nnx.Rngs,
    ) -> None:
        out_channels = out_channels or in_channels
        if not use_conv and in_channels != out_channels:
            raise ValueError("`in_channels` must equal `out_channels` when `use_conv=False`")
        self.net = Downsample(
            in_channels, out_channels, use_conv=use_conv, symmetric=padding == 1, rngs=rngs
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.net(x)


class ResUpsample(nnx.Module):
    """2x nearest upsample + optional conv3x3 (reference
    `convs/residual.py:120`)."""

    def __init__(
        self,
        in_channels: int,
        use_conv: bool,
        *,
        out_channels: Optional[int] = None,
        padding: int = 1,
        rngs: nnx.Rngs,
    ) -> None:
        out_channels = out_channels or in_channels
        if use_conv:
            self.conv = nnx.Conv(
                in_channels,
                out_channels,
                kernel_size=(3, 3),
                padding=[(padding, padding)] * 2,
                rngs=rngs,
            )
        else:
            self.conv = nnx.data(None)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = interpolate(x, factor=2.0, mode="nearest")
        if self.conv is not None:
            x = self.conv(x)
        return x


class ResidualBlockV2(nnx.Module):
    """Pre-activation residual block: (norm→act→conv) x2 + skip (reference
    `convs/residual.py:54`)."""

    def __init__(
        self,
        dim: int,
        dropout: float,
        kernel_size: int = 3,
        stride: int = 1,
        *,
        norm_type: Optional[str] = "batch_norm",
        rngs: nnx.Rngs,
        **kwargs: Any,
    ) -> None:
        from .norms import NormFactory

        factory = NormFactory(norm_type)
        self.norm1 = factory.make(dim, rngs=rngs)
        self.conv1 = Conv2d(dim, dim, kernel_size=kernel_size, stride=stride, padding="same", rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if 0.0 < dropout < 1.0 else None
        self.norm2 = factory.make(dim, rngs=rngs)
        self.conv2 = Conv2d(dim, dim, kernel_size=kernel_size, stride=stride, padding="same", rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        net = x
        if self.norm1 is not None:
            net = self.norm1(net)
        net = self.conv1(jax.nn.leaky_relu(net, 0.2))
        if self.dropout is not None:
            net = self.dropout(net)
        if self.norm2 is not None:
            net = self.norm2(net)
        # no activation before conv2: the reference's second get_conv_blocks
        # call leaves `activation` at its None default
        # (`convs/residual.py:76-79`) — norm -> conv only
        net = self.conv2(net)
        return x + net


def max_pool2d_with_indices(x: jax.Array, kernel_size: int, stride: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """NHWC max pool returning flat spatial argmax indices (for
    `MaxUnpool2d`)."""
    stride = stride or kernel_size
    b, h, w, c = x.shape
    flat_idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w, 1)
    flat_idx = jnp.broadcast_to(flat_idx, x.shape)

    def reducer(a, b_):
        av, ai = a
        bv, bi = b_
        take_b = bv > av
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    neg_inf = jnp.finfo(x.dtype).min
    vals, idxs = jax.lax.reduce_window(
        (x, flat_idx),
        (neg_inf, jnp.int32(0)),
        reducer,
        (1, kernel_size, kernel_size, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return vals, idxs


class MaxUnpool2d(nnx.Module):
    """Scatter pooled values back to their argmax positions (reference
    `convs/basic.py:294`; indices as produced by
    `max_pool2d_with_indices`)."""

    def __init__(self, kernel_size: int, stride: Optional[int] = None, *, rngs: Optional[nnx.Rngs] = None) -> None:
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size

    def __call__(self, x: jax.Array, indices: jax.Array, output_size: Tuple[int, int]) -> jax.Array:
        b, h, w, c = x.shape
        oh, ow = output_size
        flat = jnp.zeros((b, oh * ow, c), x.dtype)
        idx = indices.reshape(b, h * w, c)
        vals = x.reshape(b, h * w, c)
        out = jax.vmap(
            lambda f, i, v: jax.vmap(
                lambda fc, ic, vc: fc.at[ic].set(vc), in_axes=-1, out_axes=-1
            )(f, i, v)
        )(flat, idx, vals)
        return out.reshape(b, oh, ow, c)
