from .clip import CLIPExtractor
from .diffusion import DiffusionAPI
