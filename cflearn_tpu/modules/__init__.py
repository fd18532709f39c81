from .common import PrefixModules, build_module, module_registry, register_module
from .core import activations, mappings, norms
from .ml import fcnn, linear
