from .attention import flash_attention, sdp_attn, xla_attention
from .group_norm import group_norm
