from . import activations, mappings, norms
