"""`UNetDiffuser` — the SD UNet — and `ControlNet`.

Parity: reference `cflearn/modules/multimodal/diffusion/unet.py` —
`timestep_embedding` (:52), `TimestepBlock`/`TimestepAttnSequential`
(:25/:31), `UNetDiffuser` (:97 — ResBlocks + SpatialTransformer at configured
downsample rates, gradient-checkpoint support), `ControlNet` (:325 —
zero-conv control branch returning per-block residuals).

TPU-native: channel-last NHWC; attention via the Pallas flash kernel
(`cflearn_tpu.ops.attention`); `use_checkpoint` maps to `jax.checkpoint`
rematerialisation of each block in training.
"""

import math
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....toolkit.misc import resolve_checkpoint_policy
from ...common import register_module, zero_module
from ...core.attentions import MultiHeadSpatialAttention
from ...core.convs import Downsample, ResidualBlockWithTimeEmbedding, UpsampleConv2d
from ...core.mixed_stacks import SpatialTransformer, SpatialTransformerHooks


def walk_transformer_blocks(unet: "UNetDiffuser") -> List[Any]:
    """BasicTransformerBlocks in forward call order (reference
    `walk_spatial_transformer_hooks`, `mixed_stacks/api.py:905`)."""
    blocks: List[Any] = []
    stages = list(unet.input_blocks) + [unet.mid] + list(unet.output_blocks)
    for stage in stages:
        for mod in getattr(stage, "mods", []):
            if isinstance(mod, SpatialTransformer):
                blocks.extend(list(mod.blocks))
    return blocks


def style_reference_write_gates(unet: "UNetDiffuser", reference_weight: float) -> List[bool]:
    """Per-block bank gates in call order. The reference sorts blocks by
    channel width descending and enables the first `reference_weight`
    fraction (`before_unet_forward`, `mixed_stacks/api.py:744-752`)."""
    blocks = walk_transformer_blocks(unet)
    widths = [-int(b.norm1.num_features) for b in blocks]
    order = list(np.argsort(np.asarray(widths), kind="stable"))
    n = max(1, len(blocks))
    gates = [False] * len(blocks)
    for rank, call_idx in enumerate(order):
        gates[call_idx] = reference_weight > rank / n
    return gates


def timestep_embedding(timesteps: jax.Array, dim: int, *, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding (reference `unet.py:52`)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class _InBlock(nnx.Module):
    """One input/output stage: optional resblock/transformer/sampler chain
    (reference `TimestepAttnSequential`, `unet.py:31`)."""

    def __init__(self, modules: List[nnx.Module]) -> None:
        self.mods = nnx.List(modules)

    def __call__(
        self,
        net: jax.Array,
        time_embed: jax.Array,
        context: Optional[jax.Array] = None,
        *,
        hooks: Optional[SpatialTransformerHooks] = None,
    ) -> jax.Array:
        for mod in self.mods:
            if isinstance(mod, ResidualBlockWithTimeEmbedding):
                net = mod(net, time_embed)
            elif isinstance(mod, SpatialTransformer):
                net = mod(net, context, hooks=hooks)
            else:
                net = mod(net)
        return net


@register_module("diffusion/unet")
class UNetDiffuser(nnx.Module):
    """SD UNet (reference `unet.py:97`). SD-1.5 config:
    in/out 4 channels, start 320, multipliers (1,2,4,4), attention at
    downsample rates (1,2,4), 8 heads (dim-head 40/80/160), context 768."""

    def __init__(
        self,
        *,
        in_channels: int = 4,
        out_channels: int = 4,
        start_channels: int = 320,
        num_res_blocks: int = 2,
        attention_downsample_rates: Tuple[int, ...] = (1, 2, 4),
        channel_multipliers: Tuple[int, ...] = (1, 2, 4, 4),
        num_heads: Optional[int] = 8,
        num_head_channels: Optional[int] = None,
        use_spatial_transformer: bool = True,
        num_transformer_layers: int = 1,
        context_dim: Optional[int] = 768,
        use_linear_in_transformer: bool = False,
        use_scale_shift_norm: bool = False,
        num_classes: Optional[int] = None,
        dropout: float = 0.0,
        use_checkpoint: Union[bool, str] = False,
        resample_with_conv: bool = True,
        resample_with_resblock: bool = False,
        hint_channels: Optional[int] = None,  # set on ControlNet
        rngs: nnx.Rngs,
    ) -> None:
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.use_checkpoint = use_checkpoint
        if isinstance(use_checkpoint, str):
            # validate the policy name NOW — a typo would otherwise surface
            # as a bare AttributeError at trace time, deep inside jit
            resolve_checkpoint_policy(use_checkpoint)
        time_embed_dim = start_channels * 4
        self.time_fc1 = nnx.Linear(start_channels, time_embed_dim, rngs=rngs)
        self.time_fc2 = nnx.Linear(time_embed_dim, time_embed_dim, rngs=rngs)
        self.start_channels = start_channels
        self.num_classes = num_classes
        if num_classes is not None:
            self.label_embed = nnx.Embed(num_classes, time_embed_dim, rngs=rngs)
        else:
            self.label_embed = None

        def make_attn(ch: int) -> nnx.Module:
            if num_head_channels is not None:
                heads = ch // num_head_channels
                head_dim = num_head_channels
            else:
                heads = num_heads or 8
                head_dim = ch // heads
            if use_spatial_transformer:
                return SpatialTransformer(
                    ch,
                    heads,
                    head_dim,
                    num_layers=num_transformer_layers,
                    context_dim=context_dim,
                    dropout=dropout,
                    use_linear=use_linear_in_transformer,
                    rngs=rngs,
                )
            return MultiHeadSpatialAttention(ch, num_heads=heads, rngs=rngs)

        # input blocks --------------------------------------------------------
        self.conv_in = nnx.Conv(in_channels, start_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        input_blocks: List[_InBlock] = []
        input_chans: List[int] = [start_channels]
        ch = start_channels
        ds = 1
        for level, mult in enumerate(channel_multipliers):
            for _ in range(num_res_blocks):
                out_ch = start_channels * mult
                mods: List[nnx.Module] = [
                    ResidualBlockWithTimeEmbedding(
                        ch,
                        out_ch,
                        time_embed_dim=time_embed_dim,
                        dropout=dropout,
                        use_scale_shift_norm=use_scale_shift_norm,
                        rngs=rngs,
                    )
                ]
                ch = out_ch
                if ds in attention_downsample_rates:
                    mods.append(make_attn(ch))
                input_blocks.append(_InBlock(mods))
                input_chans.append(ch)
            if level != len(channel_multipliers) - 1:
                # reference `unet.py` resample options: a time-embedded
                # ResBlock with built-in downsampling (`resample_with_resblock`,
                # LDM-inpainting arch) or a strided/pooled Downsample
                if resample_with_resblock:
                    down_mod: nnx.Module = ResidualBlockWithTimeEmbedding(
                        ch, ch, time_embed_dim=time_embed_dim, dropout=dropout,
                        use_scale_shift_norm=use_scale_shift_norm, down=True, rngs=rngs,
                    )
                else:
                    down_mod = Downsample(ch, use_conv=resample_with_conv, symmetric=True, rngs=rngs)
                input_blocks.append(_InBlock([down_mod]))
                input_chans.append(ch)
                ds *= 2
        self.input_blocks = nnx.List(input_blocks)
        self.input_chans = input_chans

        # middle --------------------------------------------------------------
        self.mid = _InBlock(
            [
                ResidualBlockWithTimeEmbedding(
                    ch, ch, time_embed_dim=time_embed_dim, dropout=dropout,
                    use_scale_shift_norm=use_scale_shift_norm, rngs=rngs
                ),
                make_attn(ch),
                ResidualBlockWithTimeEmbedding(
                    ch, ch, time_embed_dim=time_embed_dim, dropout=dropout,
                    use_scale_shift_norm=use_scale_shift_norm, rngs=rngs
                ),
            ]
        )

        # output blocks -------------------------------------------------------
        output_blocks: List[_InBlock] = []
        chans = list(input_chans)
        for level, mult in reversed(list(enumerate(channel_multipliers))):
            for i in range(num_res_blocks + 1):
                skip_ch = chans.pop()
                out_ch = start_channels * mult
                mods = [
                    ResidualBlockWithTimeEmbedding(
                        ch + skip_ch,
                        out_ch,
                        time_embed_dim=time_embed_dim,
                        dropout=dropout,
                        use_scale_shift_norm=use_scale_shift_norm,
                        rngs=rngs,
                    )
                ]
                ch = out_ch
                if ds in attention_downsample_rates:
                    mods.append(make_attn(ch))
                if level != 0 and i == num_res_blocks:
                    if resample_with_resblock:
                        mods.append(
                            ResidualBlockWithTimeEmbedding(
                                ch, ch, time_embed_dim=time_embed_dim, dropout=dropout,
                                use_scale_shift_norm=use_scale_shift_norm, up=True, rngs=rngs,
                            )
                        )
                    else:
                        mods.append(UpsampleConv2d(ch, ch, factor=2.0, rngs=rngs))
                    ds //= 2
                output_blocks.append(_InBlock(mods))
        self.output_blocks = nnx.List(output_blocks)

        self.norm_out = nnx.GroupNorm(ch, num_groups=32, epsilon=1e-5, rngs=rngs)
        self.conv_out = zero_module(
            nnx.Conv(ch, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        )

    # ------------------------------------------------------------------ fwd

    @property
    def param_dtype(self) -> Any:
        return self.conv_in.kernel[...].dtype

    def time_embed(self, timesteps: jax.Array) -> jax.Array:
        emb = timestep_embedding(timesteps, self.start_channels)
        # keep the whole net in the params' dtype (bf16 inference shouldn't
        # silently promote everything back to f32 through the f32 sinusoids)
        emb = emb.astype(self.param_dtype)
        return self.time_fc2(jax.nn.silu(self.time_fc1(emb)))

    def __call__(
        self,
        net: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        *,
        control: Optional[List[jax.Array]] = None,
        hooks: Optional[SpatialTransformerHooks] = None,
        deep_cache: Optional[jax.Array] = None,
        cache_cut: Optional[int] = None,
        return_cache: bool = False,
    ) -> Any:
        """`deep_cache`/`cache_cut`/`return_cache` implement DeepCache (Ma et
        al. 2023) feature reuse: with `cache_cut=c`, a FULL pass (`deep_cache
        is None`, `return_cache=True`) additionally returns the feature
        entering `output_blocks[-(c+1)]`; a SHALLOW pass (`deep_cache`
        given) computes only the first `c` input blocks and the last `c+1`
        output blocks, splicing the cached deep feature in — skipping the
        deep levels + mid block entirely."""
        p_dtype = self.param_dtype
        net = net.astype(p_dtype)
        if context is not None:
            context = context.astype(p_dtype)
        time_embed = self.time_embed(timesteps)
        if self.label_embed is not None and labels is not None:
            time_embed = time_embed + self.label_embed(labels)
        hs: List[jax.Array] = []
        net = self.conv_in(net)
        hs.append(net)

        def run_block(block: Any, *args: Any, **kw: Any) -> jax.Array:
            if self.use_checkpoint:
                # rematerialize per block in training (reference
                # `use_checkpoint`; jax.checkpoint trades FLOPs for HBM).
                # A string selects a selective-remat policy from
                # jax.checkpoint_policies (e.g. "dots_saveable" keeps
                # matmul/attention outputs resident and recomputes only the
                # cheap norm/elementwise chains — less recompute than full
                # remat, less HBM than no remat).
                policy = None
                if isinstance(self.use_checkpoint, str):
                    policy = resolve_checkpoint_policy(self.use_checkpoint)
                return jax.checkpoint(lambda *a: block(*a, **kw), policy=policy)(*args)
            return block(*args, **kw)

        shallow = deep_cache is not None and cache_cut is not None
        cache_out: Optional[jax.Array] = None
        if shallow:
            for block in list(self.input_blocks)[:cache_cut]:
                net = run_block(block, net, time_embed, context, hooks=hooks)
                hs.append(net)
            net = deep_cache.astype(p_dtype)
            out_blocks = list(self.output_blocks)[-(cache_cut + 1):]
            cache_out = deep_cache
        else:
            for block in self.input_blocks:
                net = run_block(block, net, time_embed, context, hooks=hooks)
                hs.append(net)
            net = self.mid(net, time_embed, context, hooks=hooks)
            if control is not None:
                net = net + control[-1]
            out_blocks = list(self.output_blocks)
        capture_at = None if cache_cut is None else len(self.output_blocks) - (cache_cut + 1)
        for i, block in enumerate(out_blocks):
            if not shallow and return_cache and i == capture_at:
                cache_out = net
            skip = hs.pop()
            if control is not None:
                skip = skip + control[len(hs)]
            net = jnp.concatenate([net, skip], axis=-1)
            net = run_block(block, net, time_embed, context, hooks=hooks)
        net = jax.nn.silu(self.norm_out(net))
        out = self.conv_out(net)
        if return_cache:
            return out, cache_out
        return out


@register_module("diffusion/control_net")
class ControlNet(nnx.Module):
    """Zero-conv control branch (reference `unet.py:325`): a copy of the UNet
    encoder fed `hint`, returning per-block residuals for injection."""

    def __init__(
        self,
        *,
        hint_channels: int = 3,
        in_channels: int = 4,
        start_channels: int = 320,
        num_res_blocks: int = 2,
        attention_downsample_rates: Tuple[int, ...] = (1, 2, 4),
        channel_multipliers: Tuple[int, ...] = (1, 2, 4, 4),
        num_heads: int = 8,
        context_dim: Optional[int] = 768,
        use_linear_in_transformer: bool = False,
        num_transformer_layers: int = 1,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        # hint encoder: 8x downsample conv stack with zero final conv
        chs = [16, 16, 32, 32, 96, 96, 256]
        mods: List[nnx.Module] = []
        prev = hint_channels
        strides = [1, 1, 2, 1, 2, 1, 2]
        for c, s in zip(chs, strides):
            # explicit symmetric padding=1 (torch convention, reference
            # `unet.py:446-454`): XLA's stride-2 "SAME" pads (0,1) which would
            # shift the conv window by one pixel vs converted weights
            mods.append(
                nnx.Conv(prev, c, kernel_size=(3, 3), strides=(s, s), padding=[(1, 1), (1, 1)], rngs=rngs)
            )
            prev = c
        self.hint_blocks = nnx.List(mods)
        self.hint_out = zero_module(
            nnx.Conv(prev, start_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        )
        self.unet = UNetDiffuser(
            in_channels=in_channels,
            out_channels=in_channels,
            start_channels=start_channels,
            num_res_blocks=num_res_blocks,
            attention_downsample_rates=attention_downsample_rates,
            channel_multipliers=channel_multipliers,
            num_heads=num_heads,
            context_dim=context_dim,
            use_linear_in_transformer=use_linear_in_transformer,
            num_transformer_layers=num_transformer_layers,
            dropout=dropout,
            rngs=rngs,
        )
        self.zero_convs = nnx.List(
            [
                zero_module(nnx.Conv(c, c, kernel_size=(1, 1), rngs=rngs))
                for c in self.unet.input_chans
            ]
        )
        mid_ch = self.unet.input_chans[-1]
        self.mid_zero = zero_module(nnx.Conv(mid_ch, mid_ch, kernel_size=(1, 1), rngs=rngs))

    def __call__(
        self,
        net: jax.Array,
        hint: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        *,
        max_levels: Optional[int] = None,
    ) -> List[jax.Array]:
        """`max_levels` truncates the residual list (and the compute that
        would produce the deeper ones) — shallow DeepCache passes only
        consume the first `cut+1` residuals, the rest ride the cached deep
        feature."""
        time_embed = self.unet.time_embed(timesteps)
        guided = hint
        for conv in self.hint_blocks:
            guided = jax.nn.silu(conv(guided))
        guided = self.hint_out(guided)
        outs: List[jax.Array] = []
        h = self.unet.conv_in(net) + guided
        outs.append(self.zero_convs[0](h))
        if max_levels is not None and len(outs) >= max_levels:
            return outs
        for i, block in enumerate(self.unet.input_blocks):
            h = block(h, time_embed, context)
            outs.append(self.zero_convs[i + 1](h))
            if max_levels is not None and len(outs) >= max_levels:
                return outs
        h = self.unet.mid(h, time_embed, context)
        outs.append(self.mid_zero(h))
        return outs
