from .translator import TranslatorAPI
from .vq_vae import VQVAEInference
