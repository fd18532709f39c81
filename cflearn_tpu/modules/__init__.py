from .common import PrefixModules, build_module, module_registry, register_module
from . import core, cv, ml, multimodal, nlp
