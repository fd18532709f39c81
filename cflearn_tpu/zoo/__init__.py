from .common import (
    SDVersions,
    ae_kl_f4,
    ae_kl_f8,
    ae_kl_f16,
    ae_vq_f4,
    ae_vq_f8,
    clip,
    clip_large,
    esr,
    esr_anime,
    ldm_sd,
    ldm_sd_inpainting,
    ldm_sd_v2,
    load_module,
    load_sd,
    parse_config,
)
from . import convert
