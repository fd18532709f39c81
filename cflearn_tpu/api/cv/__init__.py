from .annotator import Annotator, ControlNetHints
from .translator import TranslatorAPI
from .vq_vae import VQVAEInference
from . import third_party
