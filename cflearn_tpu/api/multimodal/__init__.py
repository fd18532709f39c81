from .clip import CLIPExtractor
from .diffusion import ControlledDiffusionAPI
from .diffusion import DiffusionAPI
from .diffusion import InpaintingMode
from .diffusion import InpaintingSettings
